"""pruning.kernels: the fused op's reference implementation must agree
with the composed felsenstein primitives (the Pallas path itself is
exercised against _ref_impl on real TPU hardware; see CLAUDE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from phylo_tpu.pruning.felsenstein import (
    merge_messages_sm,
    root_log_likelihood_sm,
)
from phylo_tpu.pruning.kernels import _ref_impl, fused_merge_loglik


def _inputs(rng, K=6, S=50, A=4):
    m1 = jnp.asarray(rng.uniform(0.05, 1, (K, A, S)))
    m2 = jnp.asarray(rng.uniform(0.05, 1, (K, A, S)))
    Q = np.full((A, A), 1 / A) - np.eye(A)
    Pl = jnp.asarray(
        np.stack([scipy.linalg.expm(Q * b)
                  for b in rng.exponential(0.3, K)])
    )
    Pr = jnp.asarray(
        np.stack([scipy.linalg.expm(Q * b)
                  for b in rng.exponential(0.3, K)])
    )
    pi = jnp.asarray(np.full(A, 1 / A))
    w = jnp.ones((S,))
    return m1, m2, Pl, Pr, pi, w


def test_ref_impl_matches_composed_primitives(rng):
    m1, m2, Pl, Pr, pi, w = _inputs(rng)
    merged, rootll, logscale = _ref_impl(m1, m2, Pl, Pr, pi, w)
    merged2, lsc2 = merge_messages_sm(m1, m2, Pl, Pr, site_weights=w)
    ll2 = root_log_likelihood_sm(merged2, pi, lsc2, site_weights=w)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(merged2),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(logscale), np.asarray(lsc2),
                               rtol=1e-10)
    # rootll is computed on the UNSCALED merge, so it already contains
    # the per-site scale total: rootll == loglik(scaled) + logscale
    np.testing.assert_allclose(np.asarray(rootll), np.asarray(ll2),
                               rtol=1e-10)


def test_fused_entrypoint_gradients(rng):
    m1, m2, Pl, Pr, pi, w = _inputs(rng, K=3, S=20)

    def f(Pl, m1):
        merged, rootll, logscale = fused_merge_loglik(
            m1, m2, Pl, Pr, pi, w
        )
        return rootll.sum() + logscale.sum() + merged.sum()

    g_fused = jax.grad(f, argnums=(0, 1))(Pl, m1)

    def f_ref(Pl, m1):
        merged, rootll, logscale = _ref_impl(m1, m2, Pl, Pr, pi, w)
        return rootll.sum() + logscale.sum() + merged.sum()

    g_ref = jax.grad(f_ref, argnums=(0, 1))(Pl, m1)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10)


def test_weighted_sites_zero_out_contributions(rng):
    m1, m2, Pl, Pr, pi, _ = _inputs(rng, S=30)
    w_full = jnp.ones((30,))
    w_half = w_full.at[15:].set(0.0)
    _, r_full, s_full = _ref_impl(m1, m2, Pl, Pr, pi, w_full)
    _, r_half, s_half = _ref_impl(m1, m2, Pl, Pr, pi, w_half)
    # masked reduction equals computing on the first 15 sites only
    _, r_sub, s_sub = _ref_impl(
        m1[:, :, :15], m2[:, :, :15], Pl, Pr, pi, jnp.ones((15,))
    )
    np.testing.assert_allclose(np.asarray(r_half), np.asarray(r_sub),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_half), np.asarray(s_sub),
                               rtol=1e-12)


def test_fused_pair_loglik_ref_path(rng):
    from phylo_tpu.pruning.kernels import _pair_ll_ref, fused_pair_loglik

    m1, m2, Pl, Pr, pi, w = _inputs(rng, K=5, S=40)
    M = 3
    Plm = jnp.stack([Pl, Pr, Pl])
    Prm = jnp.stack([Pr, Pl, Pr])
    got = fused_pair_loglik(m1, m2, Plm, Prm, pi, w)
    want = _pair_ll_ref(m1, m2, Plm, Prm, pi, w)
    assert got.shape == (M, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-12)
