"""Invariant-sites (+I) and FreeRates (+R) across-site rate mixtures.

Framework extensions beyond GammaSites (the reference has no rate
heterogeneity at all).  Both ride the same product-space machinery
(models.substitution._SiteMixture): category weights enter ONLY through
the root stationary vector, so correctness is pinned against an
explicit per-category Felsenstein mixture computed with scipy expm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm as scipy_expm

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import (
    GTR,
    JC69,
    FreeRates,
    GammaSites,
    ReferenceQ,
)
from phylo_tpu.pruning.fixed_tree import tree_log_likelihood
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

# constant first site so the invariant category has something to love
STRINGS = ["AACTTGAGAG", "AACTTGACAG", "ACCTTGACTG", "ACCTTGACTC"]

RECORD = {
    "merges": np.array([[0, 1], [2, 3], [4, 5]]),
    "branches": np.array(
        [[0.31, 0.52], [0.18, 0.77], [0.44, 0.25]]
    ),
}


def _manual_mixture_ll(genome, base, bparams, rates, weights, record):
    """Per-category Felsenstein over the BASE alphabet, mixed at the
    root with the category weights: sum_s log sum_c w_c L_s^(c).
    ReferenceQ's transition is raw expm(Qb) under the `data @ P`
    contraction; GTR's is expm(Q^T b) (merge orientation) -- use the
    model's own transition so the oracle matches either convention."""
    merges = np.asarray(record["merges"])
    branches = np.asarray(record["branches"])
    pi = np.asarray(base.stationary(bparams))
    N = genome.shape[0]
    site_lik = 0.0
    for r_c, w_c in zip(rates, weights):
        P = np.asarray(
            base.transition(bparams, jnp.asarray(branches * r_c))
        )                                           # (R, 2, A, A)
        msgs = list(np.asarray(genome, np.float64))
        for q in range(merges.shape[0]):
            m1 = msgs[int(merges[q, 0])] @ P[q, 0]
            m2 = msgs[int(merges[q, 1])] @ P[q, 1]
            msgs.append(m1 * m2)
        site_lik = site_lik + w_c * (msgs[-1] @ pi)  # (S,)
    return np.log(site_lik).sum()


@pytest.mark.parametrize("G", [1, 3])
def test_invariant_gamma_matches_manual_mixture(G):
    ds = dataset_from_strings(STRINGS, name=f"inv_manual_{G}")
    base = GTR(A=4)
    m = GammaSites(base, G=G, invariant=True)
    params = m.init_params(jnp.float64)
    params["log_alpha"] = jnp.float64(np.log(0.7))
    params["logit_pinv"] = jnp.float64(-0.8)
    params["base"]["log_exch"] = jnp.asarray(
        np.linspace(-0.3, 0.4, 6), jnp.float64
    )
    params["base"]["y_station"] = jnp.asarray(
        [0.1, -0.2, 0.3, 0.0], jnp.float64
    )

    leaves = jnp.asarray(m.expand_leaves(ds.genome), jnp.float64)
    got = float(
        tree_log_likelihood(leaves, m, {"model": params}, RECORD)
    )

    rates = np.asarray(m.rates(params))
    weights = np.asarray(m.weights(params))
    assert rates[0] == 0.0 and rates.shape == (G + 1,)
    np.testing.assert_allclose(weights.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose((rates * weights).sum(), 1.0, rtol=1e-12)
    want = _manual_mixture_ll(
        ds.genome, base, params["base"], rates, weights, RECORD
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_freerates_matches_manual_mixture():
    ds = dataset_from_strings(STRINGS, name="fr_manual")
    base = ReferenceQ(A=4)
    m = FreeRates(base, G=4)
    params = m.init_params(jnp.float64)
    params["w_logits"] = jnp.asarray([0.2, -0.5, 0.9, 0.0], jnp.float64)
    params["log_rates"] = jnp.asarray([-1.2, -0.1, 0.4, 1.3], jnp.float64)

    leaves = jnp.asarray(m.expand_leaves(ds.genome), jnp.float64)
    got = float(
        tree_log_likelihood(leaves, m, {"model": params}, RECORD)
    )

    rates = np.asarray(m.rates(params))
    weights = np.asarray(m.weights(params))
    np.testing.assert_allclose(weights.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose((rates * weights).sum(), 1.0, rtol=1e-12)
    want = _manual_mixture_ll(
        ds.genome, base, params["base"], rates, weights, RECORD
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_invariant_category_boosts_constant_sites():
    """The rate-0 category contributes pi_a per CONSTANT site and ~0 for
    variable sites: raising p_inv must raise the constant site's
    likelihood share and lower a clearly variable site's."""
    ds = dataset_from_strings(STRINGS, name="inv_const")
    base = JC69(A=4)
    m = GammaSites(base, G=2, invariant=True)
    params = m.init_params(jnp.float64)

    def site_liks(logit):
        p = dict(params, logit_pinv=jnp.float64(logit))
        leaves = jnp.asarray(m.expand_leaves(ds.genome), jnp.float64)
        P = m.transition(p, jnp.asarray(RECORD["branches"]))
        pi = m.stationary(p)
        merges = RECORD["merges"]
        msgs = [leaves[i] for i in range(4)]
        for q in range(merges.shape[0]):
            m1 = msgs[int(merges[q, 0])] @ P[q, 0]
            m2 = msgs[int(merges[q, 1])] @ P[q, 1]
            msgs.append(m1 * m2)
        return np.asarray(msgs[-1] @ pi)

    lo, hi = site_liks(-6.0), site_liks(2.0)
    assert hi[0] > lo[0]          # site 0 is constant (all 'A')
    # invariant mass reweights likelihood toward constant sites
    # relative to variable ones (site 1 is A/A/C/C)
    assert hi[0] / hi[1] > lo[0] / lo[1]


def test_pinv_gradient_matches_finite_differences():
    ds = dataset_from_strings(STRINGS, name="inv_grad")
    m = GammaSites(ReferenceQ(A=4), G=2, invariant=True)
    params = m.init_params(jnp.float64)
    leaves = jnp.asarray(m.expand_leaves(ds.genome), jnp.float64)

    def ll(logit):
        p = dict(params, logit_pinv=logit)
        return tree_log_likelihood(leaves, m, {"model": p}, RECORD)

    g = float(jax.grad(ll)(jnp.float64(-1.0)))
    eps = 1e-6
    fd = (float(ll(jnp.float64(-1.0 + eps)))
          - float(ll(jnp.float64(-1.0 - eps)))) / (2 * eps)
    assert np.isfinite(g) and g != 0.0
    np.testing.assert_allclose(g, fd, rtol=1e-5, atol=1e-10)


def test_freerates_gradients_flow_to_all_params():
    ds = dataset_from_strings(STRINGS, name="fr_grad")
    m = FreeRates(JC69(A=4), G=3)
    params = {"model": m.init_params(jnp.float64),
              "branches": init_branch_params(ds.N, dtype=jnp.float64)}
    leaves = jnp.asarray(m.expand_leaves(ds.genome))

    def loss(p):
        return -sample_phylogenies(
            jax.random.PRNGKey(0), leaves, m, p, SweepConfig(K=4)
        ).elbo

    g = jax.grad(loss)(params)
    for name in ("w_logits", "log_rates"):
        arr = np.asarray(g["model"][name])
        assert np.isfinite(arr).all() and np.any(arr != 0.0), name


def test_invariant_sweep_blocked_matches_dense():
    """The rate-0 block (identity transitions) must survive the blocked
    merge + manual-VJP paths bit-compatibly with the dense product
    form."""
    ds = dataset_from_strings(STRINGS, name="inv_blocked")
    m = GammaSites(ReferenceQ(A=4), G=3, invariant=True)
    params = {"model": m.init_params(jnp.float64),
              "branches": init_branch_params(ds.N, dtype=jnp.float64)}
    leaves = jnp.asarray(m.expand_leaves(ds.genome), jnp.float64)

    outs = {}
    for blocked in (False, True):
        cfg = SweepConfig(K=6, blocked_merge=blocked)

        def loss(p):
            return -sample_phylogenies(
                jax.random.PRNGKey(5), leaves, m, p, cfg
            ).elbo

        outs[blocked] = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(
        float(outs[False][0]), float(outs[True][0]), rtol=1e-12
    )
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_train_invariant_and_freerates_end_to_end(tmp_path):
    from phylo_tpu.train import TrainConfig, train

    ds = dataset_from_strings(STRINGS, name="mix_train")
    for kw in ({"invariant_sites": True},
               {"gamma_categories": 2, "invariant_sites": True},
               {"gamma_categories": 3, "free_rates": True}):
        cfg = TrainConfig(
            n_particles=6, batch_size=10, num_epoch=2, optimizer="Adam",
            dtype="float64", results_dir=str(tmp_path), log_every=0,
            **kw,
        )
        res = train(ds, cfg)
        assert np.isfinite(res.elbo), kw
        if kw.get("free_rates"):
            assert "log_rates" in res.params["model"]
        else:
            assert "logit_pinv" in res.params["model"]


def test_get_model_specs(tmp_path):
    """'+'-separated model specs (gtr+g4+i, jc69+r3, <paml>.dat+f)
    resolve to the composed model classes."""
    from phylo_tpu.models.substitution import GTR, get_model

    m = get_model("gtr+g4+i")
    assert isinstance(m, GammaSites) and m.G == 4 and m.invariant
    assert isinstance(m.base, GTR)

    m = get_model("jc69+i")
    assert isinstance(m, GammaSites) and m.G == 1 and m.invariant

    m = get_model("reference+r3")
    assert isinstance(m, FreeRates) and m.G == 3

    m = get_model("HKY+g")          # case-insensitive, default G=4
    assert isinstance(m, GammaSites) and m.G == 4 and not m.invariant

    with pytest.raises(ValueError, match="cannot combine"):
        get_model("gtr+g4+r2")
    with pytest.raises(ValueError, match="unknown model modifier"):
        get_model("gtr+q9")
    with pytest.raises(ValueError, match="requires a PAML"):
        get_model("gtr+f")

    # .dat base with +f and a mixture
    from tests.test_empirical_protein import _synthetic_dat
    from phylo_tpu.models.empirical import EmpiricalProtein

    path = tmp_path / "m.dat"
    path.write_text(_synthetic_dat()[0])
    m = get_model(f"{path}+f+g2")
    assert isinstance(m, GammaSites) and m.G == 2
    assert isinstance(m.base, EmpiricalProtein) and m.base.plus_f


def test_trainer_rejects_spec_plus_flags():
    from phylo_tpu.train import TrainConfig
    from phylo_tpu.train.trainer import init_params

    ds = dataset_from_strings(STRINGS, name="spec_excl")
    cfg = TrainConfig(n_particles=4, substitution_model="gtr+g2",
                      gamma_categories=3)
    with pytest.raises(ValueError, match="already includes"):
        init_params(ds, cfg)


def test_freerates_invariant_mutually_exclusive():
    from phylo_tpu.train import TrainConfig
    from phylo_tpu.train.trainer import init_params

    ds = dataset_from_strings(STRINGS, name="mix_excl")
    cfg = TrainConfig(n_particles=4, free_rates=True,
                      invariant_sites=True, gamma_categories=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        init_params(ds, cfg)
