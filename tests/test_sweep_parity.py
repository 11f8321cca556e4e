"""Golden parity: the JAX sweep must reproduce the reference recursion
(via the float64 NumPy oracle) exactly when driven with identical
randomness -- per-rank log weights, log likelihoods, ELBO, and the
de-biased log likelihood.  This validates every quirk flag documented in
SweepConfig against the literal reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.dataio import dataset_from_strings, load_dataset
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import JC69, ReferenceQ
from phylo_tpu.oracle.reference_vcsmc import OracleVCSMC
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


def make_decisions(rng, N, K, rates_l, rates_r):
    R = N - 1
    ancestors = np.zeros((R, K), dtype=np.int32)
    pairs = np.zeros((R, K, 2), dtype=np.int32)
    branches_l = np.zeros((R, K))
    branches_r = np.zeros((R, K))
    for r in range(R):
        ancestors[r] = rng.integers(0, K, size=K)
        n_active = N - r
        for k in range(K):
            p = rng.choice(n_active, size=2, replace=False)
            pairs[r, k] = p
        branches_l[r] = rng.exponential(1.0 / rates_l[r], size=K)
        branches_r[r] = rng.exponential(1.0 / rates_r[r], size=K)
    return dict(
        ancestors=jnp.asarray(ancestors),
        pairs=jnp.asarray(pairs),
        branches_l=jnp.asarray(branches_l),
        branches_r=jnp.asarray(branches_r),
    )


def run_both(genome, model, K=6, seed=0, **config_kwargs):
    N = genome.shape[0]
    rng = np.random.default_rng(seed)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    # perturb branch rates so left != right exposes rate-mixing bugs
    params["branches"]["log_rates_l"] = params["branches"][
        "log_rates_l"
    ] + jnp.asarray(rng.normal(0, 0.3, N - 1))
    params["branches"]["log_rates_r"] = params["branches"][
        "log_rates_r"
    ] + jnp.asarray(rng.normal(0, 0.3, N - 1))

    rates_l = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    rates_r = np.exp(np.asarray(params["branches"]["log_rates_r"]))
    decisions = make_decisions(rng, N, K, rates_l, rates_r)

    config = SweepConfig(K=K, **config_kwargs)
    leaves = jnp.asarray(genome, dtype=jnp.float64)
    result = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config,
        decisions=decisions,
    )

    oracle = OracleVCSMC(
        genome,
        np.asarray(model.Q(params["model"])),
        np.asarray(model.stationary(params["model"])),
        rates_l, rates_r, K,
        q_raw_subtraction=config.q_raw_subtraction,
        resample_branch_history=config.resample_branch_history,
        right_multiplier_bug=config.right_multiplier_bug,
    )
    want = oracle.run(jax.tree.map(np.asarray, decisions))
    return result, want


STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC"]


@pytest.mark.parametrize("model_cls", [JC69, ReferenceQ])
def test_parity_reference_strings(model_cls):
    ds = dataset_from_strings(STRINGS)
    got, want = run_both(ds.genome, model_cls(A=4), K=6, seed=1)
    np.testing.assert_allclose(
        np.asarray(got.log_likelihood), want["log_likelihood"], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.log_weights), want["log_weights"], rtol=1e-9
    )
    np.testing.assert_allclose(float(got.elbo), want["elbo"], rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(got.log_likelihood_R), want["log_likelihood_R"],
        rtol=1e-9,
    )
    np.testing.assert_allclose(np.asarray(got.v_minus), want["v_minus"])


@pytest.mark.parametrize(
    "config_kwargs",
    [
        dict(),
        dict(q_raw_subtraction=False),
        dict(resample_branch_history=True),
        dict(right_multiplier_bug=False),
        dict(rescale=False),
    ],
)
def test_parity_quirk_flags(config_kwargs):
    ds = dataset_from_strings(STRINGS)
    got, want = run_both(
        ds.genome, ReferenceQ(A=4), K=5, seed=2, **config_kwargs
    )
    np.testing.assert_allclose(
        np.asarray(got.log_weights), want["log_weights"], rtol=1e-9
    )
    np.testing.assert_allclose(float(got.elbo), want["elbo"], rtol=1e-9)


def test_parity_primates_small_subset():
    ds = load_dataset("primate_data_wang")
    genome = ds.genome[:6, :120]  # keep the oracle fast
    got, want = run_both(genome, ReferenceQ(A=4), K=4, seed=3)
    np.testing.assert_allclose(
        np.asarray(got.log_weights), want["log_weights"], rtol=1e-8
    )
    np.testing.assert_allclose(float(got.elbo), want["elbo"], rtol=1e-8)
    np.testing.assert_allclose(
        np.asarray(got.log_likelihood_R), want["log_likelihood_R"],
        rtol=1e-8,
    )


def test_parity_gapped_alignment():
    # gaps (-, ?) encode as all-ones; parity must hold through them
    strings = ["ACT-TGAG?G", "AC?TTGACAG", "ACTTTG-CTG", "ACTT?GACTC",
               "ACTTTGAC--"]
    ds = dataset_from_strings(strings)
    got, want = run_both(ds.genome, JC69(A=4), K=4, seed=4)
    np.testing.assert_allclose(
        np.asarray(got.log_weights), want["log_weights"], rtol=1e-9
    )
