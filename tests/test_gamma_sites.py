"""Discrete-Gamma rate heterogeneity (GammaSites product-space model).

The reference has no rate heterogeneity; this is a framework extension
(ROADMAP round 1 item 7).  Correctness is pinned three ways: the
category-rate discretization against scipy's gammaincinv, the
product-space likelihood against an explicit per-category Felsenstein
average, and end-to-end training with a learnable alpha.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special
from scipy.linalg import expm as scipy_expm

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import (
    JC69,
    GammaSites,
    ReferenceQ,
    discrete_gamma_rates,
)
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC"]


@pytest.mark.parametrize("alpha", [0.3, 0.7, 1.0, 2.5, 10.0])
@pytest.mark.parametrize("G", [2, 4, 8])
def test_discrete_gamma_rates_match_scipy(alpha, G):
    got = np.asarray(discrete_gamma_rates(jnp.float64(alpha), G))
    # scipy reference: mean-of-bin rates via gammaincinv boundaries
    p = np.arange(1, G) / G
    y = scipy.special.gammaincinv(alpha, p)
    q1 = np.concatenate([[0.0], scipy.special.gammainc(alpha + 1, y),
                         [1.0]])
    want = G * np.diff(q1)
    np.testing.assert_allclose(got, want, rtol=1e-8)
    np.testing.assert_allclose(got.mean(), 1.0, rtol=1e-12)
    assert (np.diff(got) > 0).all()     # monotone categories


def test_rates_differentiable_in_alpha():
    def mean_low_rate(log_alpha):
        return discrete_gamma_rates(jnp.exp(log_alpha), 4)[0]

    g = jax.grad(mean_low_rate)(jnp.float64(0.0))
    eps = 1e-6
    fd = (
        float(mean_low_rate(jnp.float64(eps)))
        - float(mean_low_rate(jnp.float64(-eps)))
    ) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_product_space_blocks():
    m = GammaSites(ReferenceQ(A=4), G=3)
    params = m.init_params(jnp.float64)
    q = np.asarray(m.Q(params))
    r = np.asarray(m.rates(params))
    qb = np.asarray(m.base.Q(params["base"]))
    assert q.shape == (12, 12)
    for g in range(3):
        blk = q[g * 4:(g + 1) * 4, g * 4:(g + 1) * 4]
        np.testing.assert_allclose(blk, r[g] * qb, rtol=1e-12)
    # off-diagonal blocks are exactly zero (categories never mix)
    np.testing.assert_allclose(q[0:4, 4:8], 0.0)
    pi = np.asarray(m.stationary(params))
    np.testing.assert_allclose(pi.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(pi[:4] * 3,
                               np.asarray(m.base.stationary(params["base"])))


def test_single_merge_likelihood_is_category_average(rng):
    # two leaves joined at a root: product-space likelihood must equal
    # the explicit (1/G) sum_g of per-category Felsenstein likelihoods
    G = 4
    m = GammaSites(ReferenceQ(A=4), G=G)
    params = m.init_params(jnp.float64)
    params["log_alpha"] = jnp.float64(np.log(0.6))
    ds = dataset_from_strings(STRINGS[:2])
    leaves = m.expand_leaves(ds.genome)        # (2, S, 16)
    b1, b2 = 0.37, 0.81

    P1 = np.asarray(m.transition(params, jnp.float64(b1)))
    P2 = np.asarray(m.transition(params, jnp.float64(b2)))
    pi = np.asarray(m.stationary(params))
    msg = (leaves[0] @ P1) * (leaves[1] @ P2)  # (S, 16)
    got = np.log(msg @ pi).sum()

    qb = np.asarray(m.base.Q(params["base"]))
    pib = np.asarray(m.base.stationary(params["base"]))
    r = np.asarray(m.rates(params))
    liks = []
    for g in range(G):
        p1 = scipy_expm(r[g] * qb * b1)
        p2 = scipy_expm(r[g] * qb * b2)
        msg_g = (ds.genome[0] @ p1) * (ds.genome[1] @ p2)
        liks.append(msg_g @ pib)               # (S,)
    want = np.log(np.mean(liks, axis=0)).sum()
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_gamma_equals_base_at_g1():
    ds = dataset_from_strings(STRINGS)
    base = ReferenceQ(A=4)
    gam = GammaSites(base, G=1)
    pb = {"model": base.init_params(jnp.float64),
          "branches": init_branch_params(ds.N, dtype=jnp.float64)}
    pg = {"model": {"base": pb["model"],
                    "log_alpha": jnp.float64(0.0)},
          "branches": pb["branches"]}
    cfg = SweepConfig(K=6)
    res_b = sample_phylogenies(
        jax.random.PRNGKey(3), jnp.asarray(ds.genome), base, pb, cfg
    )
    res_g = sample_phylogenies(
        jax.random.PRNGKey(3), jnp.asarray(gam.expand_leaves(ds.genome)),
        gam, pg, cfg,
    )
    np.testing.assert_allclose(float(res_b.elbo), float(res_g.elbo),
                               rtol=1e-10)


def test_gamma_sweep_gradients_include_alpha():
    ds = dataset_from_strings(STRINGS)
    m = GammaSites(JC69(A=4), G=3)
    params = {"model": m.init_params(jnp.float64),
              "branches": init_branch_params(ds.N, dtype=jnp.float64)}
    leaves = jnp.asarray(m.expand_leaves(ds.genome))

    def loss(p):
        return -sample_phylogenies(
            jax.random.PRNGKey(0), leaves, m, p, SweepConfig(K=4)
        ).elbo

    g = jax.grad(loss)(params)
    ga = float(g["model"]["log_alpha"])
    assert np.isfinite(ga) and ga != 0.0
    eps = 1e-6
    hi = jax.tree.map(lambda x: x, params)
    hi["model"] = dict(params["model"],
                       log_alpha=params["model"]["log_alpha"] + eps)
    lo = dict(hi)
    lo["model"] = dict(params["model"],
                       log_alpha=params["model"]["log_alpha"] - eps)
    fd = (float(loss(hi)) - float(loss(lo))) / (2 * eps)
    np.testing.assert_allclose(ga, fd, rtol=1e-4, atol=1e-8)


def test_train_gamma_end_to_end(tmp_path):
    from phylo_tpu.train import TrainConfig, train

    ds = dataset_from_strings(STRINGS)
    cfg = TrainConfig(
        n_particles=6, batch_size=10, num_epoch=2, optimizer="Adam",
        dtype="float64", results_dir=str(tmp_path), log_every=0,
        gamma_categories=4,
    )
    res = train(ds, cfg)
    assert np.isfinite(res.elbo)
    assert "log_alpha" in res.params["model"]


def test_blocked_merge_matches_dense():
    """SweepConfig.blocked_merge: same values, same gradients as the
    dense product-space path (the blocked contraction + its custom VJP
    in pruning.felsenstein._contract_blocked)."""
    ds = dataset_from_strings(STRINGS, name="gamma_blocked")
    model = GammaSites(ReferenceQ(A=4), G=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(model.expand_leaves(ds.genome), jnp.float64)

    outs = {}
    for blocked in (False, True):
        cfg = SweepConfig(K=6, blocked_merge=blocked)

        def loss(p):
            return -sample_phylogenies(
                jax.random.PRNGKey(5), leaves, model, p, cfg
            ).elbo

        outs[blocked] = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(
        float(outs[False][0]), float(outs[True][0]), rtol=1e-12
    )
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_contract_blocked_bwd_variants():
    """Both PHYLO_BLOCKED_BWD variants of the blocked-contraction VJP
    (unrolled multiply-add reverse, dense-assembled reverse) match
    jax.grad of an explicitly dense block-diagonal contraction."""
    from phylo_tpu.pruning import felsenstein as fz

    rng = np.random.default_rng(3)
    G, A, S, K = 3, 4, 17, 5
    m = jnp.asarray(rng.random((K, G, A, S)))
    P = jnp.asarray(rng.random((K, G, A, A)))

    def dense(m, P):
        out = jnp.einsum("kgas,kgab->kgbs", m, P)
        return jnp.sum(jnp.sin(out))

    want = jax.grad(dense, argnums=(0, 1))(m, P)

    old = fz._BLOCKED_BWD
    try:
        for variant in ("unrolled", "dense"):
            fz._BLOCKED_BWD = variant

            def blocked(m, P):
                return jnp.sum(jnp.sin(fz._contract_blocked(m, P)))

            got = jax.grad(blocked, argnums=(0, 1))(m, P)
            for w, g in zip(want, got):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(w), rtol=1e-9, atol=1e-12,
                    err_msg=variant,
                )
    finally:
        fz._BLOCKED_BWD = old


def test_blocked_merge_manual_vjp_matches_xla_ad():
    """Round-3: blocked_merge is now eligible for the manual whole-sweep
    VJP (the prologue linearizes at per-block transitions and the merge
    backward runs against the dense-assembled block-diagonal form,
    bit-exact in f32).  Gradients must match XLA AD over the same
    blocked sweep."""
    ds = dataset_from_strings(STRINGS, name="gamma_blocked_manual")
    model = GammaSites(ReferenceQ(A=4), G=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(model.expand_leaves(ds.genome), jnp.float64)

    outs = {}
    for manual in (False, True):
        cfg = SweepConfig(K=6, blocked_merge=True, manual_vjp=manual)

        def loss(p):
            return -sample_phylogenies(
                jax.random.PRNGKey(5), leaves, model, p, cfg
            ).elbo

        outs[manual] = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(
        float(outs[False][0]), float(outs[True][0]), rtol=1e-12
    )
    for a, b in zip(jax.tree.leaves(outs[False][1]),
                    jax.tree.leaves(outs[True][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)
        assert np.any(np.asarray(a) != 0.0)
