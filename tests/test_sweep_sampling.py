"""Sampled-path sweep tests: jit, determinism under a fixed key, gradient
flow, resampling strategies, and the K=1 telescoping property."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import JC69, ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC",
           "ACTTCGACTG"]


def setup(model_cls=ReferenceQ, dtype=jnp.float64):
    ds = dataset_from_strings(STRINGS)
    model = model_cls(A=4)
    params = {
        "model": model.init_params(dtype),
        "branches": init_branch_params(ds.N, dtype=dtype),
    }
    return jnp.asarray(ds.genome, dtype=dtype), model, params


def test_jit_and_determinism():
    leaves, model, params = setup()
    config = SweepConfig(K=8)

    @jax.jit
    def run(key, params):
        return sample_phylogenies(key, leaves, model, params, config).elbo

    key = jax.random.PRNGKey(42)
    e1 = run(key, params)
    e2 = run(key, params)
    assert np.isfinite(float(e1))
    assert float(e1) == float(e2)
    e3 = run(jax.random.PRNGKey(43), params)
    assert float(e1) != float(e3)


@pytest.mark.parametrize("strategy",
                         ["multinomial", "systematic", "stratified", "none"])
def test_resampling_strategies_finite(strategy):
    leaves, model, params = setup()
    config = SweepConfig(K=8, resampling=strategy)
    res = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config
    )
    assert np.isfinite(np.asarray(res.log_weights)).all()
    assert np.isfinite(float(res.elbo))
    if strategy == "none":
        np.testing.assert_array_equal(
            np.asarray(res.ancestors),
            np.tile(np.arange(8), (leaves.shape[0] - 1, 1)),
        )


def test_gradients_flow_to_all_params():
    leaves, model, params = setup()
    config = SweepConfig(K=8)

    def loss(params):
        return -sample_phylogenies(
            jax.random.PRNGKey(7), leaves, model, params, config
        ).elbo

    g = jax.grad(loss)(params)
    for name, arr in [
        ("log_rates_l", g["branches"]["log_rates_l"]),
        ("log_rates_r", g["branches"]["log_rates_r"]),
        ("y_q", g["model"]["y_q"]),
        ("y_station", g["model"]["y_station"]),
    ]:
        a = np.asarray(arr)
        assert np.isfinite(a).all(), name
        assert np.abs(a).max() > 0, f"zero gradient for {name}"


def test_f32_matches_f64_to_tolerance():
    # identical injected randomness; only arithmetic precision differs
    from tests.test_sweep_parity import make_decisions

    leaves64, model, params64 = setup(dtype=jnp.float64)
    leaves32 = leaves64.astype(jnp.float32)
    params32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        params64,
    )
    N = leaves64.shape[0]
    rng = np.random.default_rng(5)
    rates = np.exp(np.asarray(params64["branches"]["log_rates_l"]))
    dec = make_decisions(rng, N, 8, rates, rates)
    dec32 = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        dec,
    )
    config = SweepConfig(K=8)
    key = jax.random.PRNGKey(11)
    e64 = float(
        sample_phylogenies(key, leaves64, model, params64, config,
                           decisions=dec).elbo
    )
    e32 = float(
        sample_phylogenies(key, leaves32, model, params32, config,
                           decisions=dec32).elbo
    )
    assert abs(e64 - e32) / abs(e64) < 1e-3


def test_k1_no_resampling_telescopes():
    """With K=1 and no resampling, log Z_SMC equals the sum of the single
    particle's log weights (each logsumexp is over one particle)."""
    leaves, model, params = setup()
    config = SweepConfig(K=1, resampling="none")
    res = sample_phylogenies(
        jax.random.PRNGKey(3), leaves, model, params, config
    )
    np.testing.assert_allclose(
        float(res.elbo), float(res.log_weights.sum()), rtol=1e-12
    )


def test_taxa_permutation_invariance_distribution():
    """Permuting taxa order leaves the per-particle leaf likelihood
    bookkeeping consistent: the rank-0 forest data log-likelihood before
    any merge depends only on the set of leaves.  We check the determin-
    istic pieces: leaf log-likelihood sums match under permutation."""
    from phylo_tpu.pruning.felsenstein import root_log_likelihood

    leaves, model, params = setup()
    pi = model.stationary(params["model"])
    perm = np.random.default_rng(0).permutation(leaves.shape[0])
    a = float(root_log_likelihood(leaves, pi).sum())
    b = float(root_log_likelihood(leaves[perm], pi).sum())
    np.testing.assert_allclose(a, b, rtol=1e-12)
