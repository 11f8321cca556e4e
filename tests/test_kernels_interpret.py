"""Pallas kernel BODIES exercised in CI via interpret mode on CPU.

tests/test_kernels.py validates the composed jnp reference (_ref_impl);
these tests run the actual _kernel / _kernel_ll code paths through
pallas_call(interpret=True) so a kernel regression cannot ship green
without a TPU (VERDICT round-1 weak item 4 / ROADMAP item 10).

Shapes deliberately hit the padding edges: K not a multiple of the
particle tile, S off the 128-lane grid, A = 4 and 7 (spike data), and
zero site weights (the padding convention).
"""

import numpy as np
import pytest

from phylo_tpu.pruning import kernels


@pytest.fixture
def interpret_mode():
    kernels.INTERPRET = True
    yield
    kernels.INTERPRET = False


def _inputs(rng, K, S, A, M=None, zero_tail=0):
    m1 = rng.uniform(0.05, 1.0, (K, A, S))
    m2 = rng.uniform(0.05, 1.0, (K, A, S))
    shape = (M, K) if M is not None else (K,)
    P_l = rng.uniform(0.05, 1.0, shape + (A, A))
    P_r = rng.uniform(0.05, 1.0, shape + (A, A))
    pi = rng.uniform(0.1, 1.0, (A,))
    pi = pi / pi.sum()
    w = rng.uniform(0.5, 2.0, (S,))
    if zero_tail:
        w[-zero_tail:] = 0.0
    return m1, m2, P_l, P_r, pi, w


@pytest.mark.parametrize(
    "K,S,A,zero_tail",
    [
        (5, 33, 4, 0),     # K < TK, S < TS: both axes padded
        (64, 128, 4, 0),   # exact tiles
        (70, 130, 4, 3),   # off-tile both axes + zero-weight tail
        (8, 150, 7, 2),    # spike alphabet A=7
    ],
)
def test_fused_merge_kernel_body_matches_ref(interpret_mode, rng, K, S, A,
                                             zero_tail):
    args = _inputs(rng, K, S, A, zero_tail=zero_tail)
    merged, rootll, logscale = kernels.fused_merge_loglik(*args)
    m_ref, r_ref, l_ref = kernels._ref_impl(*args)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(m_ref),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(rootll), np.asarray(r_ref),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(logscale), np.asarray(l_ref),
                               rtol=1e-12)


@pytest.mark.parametrize(
    "K,S,A,M",
    [
        (5, 33, 4, 3),     # tiny, padded everywhere
        (16, 128, 4, 10),  # reference autorun M
        (130, 70, 4, 2),   # K > 128 -> 128-lane particle tiles + pad
        (8, 40, 7, 4),     # A=7
    ],
)
@pytest.mark.parametrize("fwd_v2", [True, False])
def test_pair_loglik_kernel_body_matches_ref(interpret_mode, rng, K, S, A,
                                             M, fwd_v2, monkeypatch):
    monkeypatch.setattr(kernels, "TWIST_FWD_V2", fwd_v2)
    args = _inputs(rng, K, S, A, M=M)
    out = kernels.fused_pair_loglik(*args)
    ref = kernels._pair_ll_ref(*args)
    assert out.shape == (M, K)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-12)


def test_kernel_gradients_flow_through_interpret(interpret_mode, rng):
    # custom_vjp routes gradients through _ref_impl regardless of the
    # forward path; check they are finite and match the pure-ref grads.
    import jax
    import jax.numpy as jnp

    args = tuple(jnp.asarray(a) for a in _inputs(rng, 5, 33, 4))

    def loss_kernel(m1):
        _, rootll, logscale = kernels.fused_merge_loglik(m1, *args[1:])
        return jnp.sum(rootll + logscale)

    def loss_ref(m1):
        _, rootll, logscale = kernels._ref_impl(m1, *args[1:])
        return jnp.sum(rootll + logscale)

    g_k = jax.grad(loss_kernel)(args[0])
    g_r = jax.grad(loss_ref)(args[0])
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-12)


@pytest.mark.parametrize(
    "K,S,A,M",
    [
        (5, 33, 4, 3),
        (16, 128, 4, 10),
        (130, 70, 4, 2),   # K > 128: 128-lane tiles + pad
        (8, 40, 7, 4),
    ],
)
@pytest.mark.parametrize("v2", [True, False])
def test_pair_loglik_backward_kernels_match_jnp_vjp(interpret_mode, rng,
                                                    K, S, A, M, v2,
                                                    monkeypatch):
    # The production twist op: XLA forward + Pallas backward.  Both the
    # round-3 T-matrix kernel (_kernel_ll_bwd2, default) and the
    # round-2 kernel (_kernel_ll_bwd) must match the jnp VJP exactly
    # (same f32/f64 arithmetic, single pass).
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TWIST_BWD_V2", v2)
    args = tuple(jnp.asarray(a) for a in _inputs(rng, K, S, A, M=M))
    g = jnp.asarray(rng.normal(0, 1.0, (M, K)))

    got = kernels._pair_ll_bwd_pallas(*args, g)
    import jax

    _, vjp = jax.vjp(kernels._pair_ll_ref, *args)
    want = vjp(g)
    names = ["dm1", "dm2", "dP_l", "dP_r", "dpi", "dw"]
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


def test_pair_loglik_custom_vjp_dispatch(interpret_mode, rng):
    # end-to-end: jax.grad through pair_loglik uses the Pallas backward
    # under INTERPRET and matches grads of the plain reference
    import jax
    import jax.numpy as jnp

    args = tuple(jnp.asarray(a) for a in _inputs(rng, 6, 50, 4, M=3))

    def loss_k(m1):
        return jnp.sum(kernels.pair_loglik(m1, *args[1:]) ** 2)

    def loss_r(m1):
        return jnp.sum(kernels._pair_ll_ref(m1, *args[1:]) ** 2)

    g_k = jax.grad(loss_k)(args[0])
    g_r = jax.grad(loss_r)(args[0])
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-9)


@pytest.mark.parametrize(
    "K,S,A",
    [(5, 33, 4), (64, 128, 4), (70, 130, 4), (8, 150, 7), (130, 70, 4)],
)
def test_merge_backward_kernel_matches_jnp_vjp(interpret_mode, rng, K, S,
                                               A):
    import jax
    import jax.numpy as jnp

    args = tuple(jnp.asarray(a) for a in _inputs(rng, K, S, A))
    gm = jnp.asarray(rng.normal(0, 1.0, (K, A, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    got = kernels._merge_bwd_pallas(*args, gm, gr, gl)
    _, vjp = jax.vjp(kernels._ref_impl, *args)
    want = vjp((gm, gr, gl))
    for n, a, b in zip(["dm1", "dm2", "dP_l", "dP_r", "dpi", "dw"], got,
                       want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


def test_merge_backward_kernel_handles_max_ties(interpret_mode, rng):
    # Engineered exact ties in the per-site rescale max: identical P
    # columns + uniform pi make every w_plane equal, so reduce_max's
    # split-among-ties cotangent routing is exercised for real.
    import jax
    import jax.numpy as jnp

    K, S, A = 6, 40, 4
    m1 = jnp.asarray(rng.uniform(0.05, 1.0, (K, A, S)))
    m2 = jnp.asarray(rng.uniform(0.05, 1.0, (K, A, S)))
    col = rng.uniform(0.05, 1.0, (K, A, 1))
    P_l = jnp.asarray(np.broadcast_to(col, (K, A, A)))
    P_r = jnp.asarray(np.broadcast_to(col, (K, A, A)))
    pi = jnp.full((A,), 1.0 / A)
    w = jnp.asarray(rng.uniform(0.5, 2.0, (S,)))
    gm = jnp.asarray(rng.normal(0, 1.0, (K, A, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    got = kernels._merge_bwd_pallas(m1, m2, P_l, P_r, pi, w, gm, gr, gl)
    _, vjp = jax.vjp(kernels._ref_impl, m1, m2, P_l, P_r, pi, w)
    want = vjp((gm, gr, gl))
    for n, a, b in zip(["dm1", "dm2", "dP_l", "dP_r", "dpi", "dw"], got,
                       want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


def _rank_inputs(rng, K, R, N, A, S):
    import jax.numpy as jnp

    buf = jnp.asarray(rng.uniform(0.05, 1.0, (K, R, A, S)))
    leaves = jnp.asarray(rng.uniform(0.05, 1.0, (N, A, S)))
    # children: mix of leaves (node < N) and internals (N..N+R-1)
    nodes = rng.integers(0, N + R, (2, K))
    rows = rng.integers(0, K, (2, K))
    idx = jnp.asarray(
        np.stack([rows[0], nodes[0], rows[1], nodes[1]]), jnp.int32
    )
    P_l = jnp.asarray(rng.uniform(0.05, 1.0, (K, A, A)))
    P_r = jnp.asarray(rng.uniform(0.05, 1.0, (K, A, A)))
    pi = rng.uniform(0.1, 1.0, (A,))
    pi = jnp.asarray(pi / pi.sum())
    w = jnp.asarray(rng.uniform(0.5, 2.0, (S,)))
    return buf, leaves, idx, P_l, P_r, pi, w


@pytest.mark.parametrize("K,R,N,A,S", [(8, 5, 6, 4, 128), (16, 3, 4, 4, 256)])
def test_fused_rank_update_matches_ref(interpret_mode, rng, K, R, N, A, S,
                                       monkeypatch):
    """Round-3 fused per-rank kernel (gather + merge + in-place
    scatter): full parity with the jnp reference chain, including the
    leaf-vs-internal DMA source select and the aliased column write."""
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs(rng, K, R, N, A, S)
    outc = jnp.asarray([R - 1], jnp.int32)

    buf_k, rll_k, lsc_k = kernels.fused_rank_update(
        leaves, buf, idx, outc, P_l, P_r, pi, w
    )
    buf_r, rll_r, lsc_r = kernels._fused_rank_ref(
        leaves, buf, idx, outc, P_l, P_r, pi, w
    )
    np.testing.assert_allclose(np.asarray(buf_k), np.asarray(buf_r),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(rll_k), np.asarray(rll_r),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(lsc_k), np.asarray(lsc_r),
                               rtol=1e-12)


@pytest.mark.parametrize("K,R,N,A,S", [(8, 5, 6, 4, 128), (16, 3, 4, 4, 256)])
def test_fused_rank_bwd_matches_jnp_vjp(interpret_mode, rng, K, R, N, A, S,
                                        monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs(rng, K, R, N, A, S)
    gm = jnp.asarray(rng.normal(0, 1.0, (K, A, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    got = kernels.fused_rank_bwd(leaves, buf, idx, gm, gr, gl, P_l, P_r,
                                 pi, w)
    want = kernels._fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl,
                                       P_l, P_r, pi, w)
    names = ["dm1", "dm2", "dPl", "dPr", "dpi", "dw"]
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


@pytest.mark.parametrize("K,R,N,A,S", [(8, 5, 6, 4, 128), (16, 3, 4, 4, 256)])
def test_fused_rank_update_save_children(interpret_mode, rng, K, R, N, A,
                                         S, monkeypatch):
    """save_children=True returns the gathered children verbatim (the
    residuals the DMA-free backward consumes) alongside unchanged
    primary outputs."""
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs(rng, K, R, N, A, S)
    outc = jnp.asarray([R - 1], jnp.int32)

    buf_k, rll_k, lsc_k, c1_k, c2_k = kernels.fused_rank_update(
        leaves, buf, idx, outc, P_l, P_r, pi, w, save_children=True
    )
    buf_r, rll_r, lsc_r, c1_r, c2_r = kernels._fused_rank_ref(
        leaves, buf, idx, outc, P_l, P_r, pi, w, save_children=True
    )
    for n, a, b in zip(
        ["buf", "rootll", "logscale", "child_l", "child_r"],
        (buf_k, rll_k, lsc_k, c1_k, c2_k),
        (buf_r, rll_r, lsc_r, c1_r, c2_r),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14,
            err_msg=n,
        )


@pytest.mark.parametrize("K,R,N,A,S", [(8, 5, 6, 4, 128), (16, 3, 4, 4, 256)])
def test_fused_rank_bwd_saved_matches_regather(interpret_mode, rng, K, R,
                                               N, A, S, monkeypatch):
    """The DMA-free backward on saved children == the re-gather
    backward on the same (buf, idx) resolution."""
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs(rng, K, R, N, A, S)
    outc = jnp.asarray([R - 1], jnp.int32)
    _, _, _, m1, m2 = kernels._fused_rank_ref(
        leaves, buf, idx, outc, P_l, P_r, pi, w, save_children=True
    )
    gm = jnp.asarray(rng.normal(0, 1.0, (K, A, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    got = kernels.fused_rank_bwd_saved(m1, m2, gm, gr, gl, P_l, P_r,
                                       pi, w)
    want = kernels.fused_rank_bwd(leaves, buf, idx, gm, gr, gl, P_l,
                                  P_r, pi, w)
    for n, a, b in zip(["dm1", "dm2", "dPl", "dPr", "dpi", "dw"], got,
                       want):
        # dpi/dw come back as per-program partials; compare the sums
        if n in ("dpi", "dw"):
            a, b = np.asarray(a).sum(0), np.asarray(b).sum(0)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


def test_fused_rank_bwd_handles_max_ties(interpret_mode, rng, monkeypatch):
    # identical P columns + uniform pi -> every w_plane ties at the max
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    K, R, N, A, S = 8, 4, 5, 4, 128
    buf, leaves, idx, _, _, _, w = _rank_inputs(rng, K, R, N, A, S)
    col = rng.uniform(0.05, 1.0, (K, A, 1))
    P_l = jnp.asarray(np.broadcast_to(col, (K, A, A)))
    P_r = jnp.asarray(np.broadcast_to(col, (K, A, A)))
    pi = jnp.full((A,), 1.0 / A)
    gm = jnp.asarray(rng.normal(0, 1.0, (K, A, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    got = kernels.fused_rank_bwd(leaves, buf, idx, gm, gr, gl, P_l, P_r,
                                 pi, w)
    want = kernels._fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl,
                                       P_l, P_r, pi, w)
    for n, a, b in zip(["dm1", "dm2", "dPl", "dPr", "dpi", "dw"], got,
                       want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


def test_fused_merge_custom_vjp_dispatches_to_kernel(interpret_mode, rng):
    import jax
    import jax.numpy as jnp

    kernels.MERGE_BWD_KERNEL = True
    try:
        _run_merge_vjp_dispatch(jax, jnp, rng)
    finally:
        kernels.MERGE_BWD_KERNEL = False


def _run_merge_vjp_dispatch(jax, jnp, rng):
    args = tuple(jnp.asarray(a) for a in _inputs(rng, 6, 50, 4))

    def loss_k(m1, pi):
        merged, rootll, lsc = kernels.fused_merge_loglik(
            m1, args[1], args[2], args[3], pi, args[5]
        )
        return jnp.sum(merged ** 2) + jnp.sum(rootll) + jnp.sum(lsc)

    def loss_r(m1, pi):
        merged, rootll, lsc = kernels._ref_impl(
            m1, args[1], args[2], args[3], pi, args[5]
        )
        return jnp.sum(merged ** 2) + jnp.sum(rootll) + jnp.sum(lsc)

    g_k = jax.grad(loss_k, argnums=(0, 1))(args[0], args[4])
    g_r = jax.grad(loss_r, argnums=(0, 1))(args[0], args[4])
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9)


# ---------------------------------------------------------------------
# Blocked (GammaSites) variants of the fused rank kernels: G rate
# categories, block-diagonal transitions in (K, G, A, A) form.  The
# parity oracle is the dense-assembled block-diagonal path
# (kernels.blockdiag_dense), bit-exact in f32.
# ---------------------------------------------------------------------


def _rank_inputs_blocked(rng, K, R, N, G, A, S):
    import jax.numpy as jnp

    GA = G * A
    buf = jnp.asarray(rng.uniform(0.05, 1.0, (K, R, GA, S)))
    leaves = jnp.asarray(rng.uniform(0.05, 1.0, (N, GA, S)))
    nodes = rng.integers(0, N + R, (2, K))
    rows = rng.integers(0, K, (2, K))
    idx = jnp.asarray(
        np.stack([rows[0], nodes[0], rows[1], nodes[1]]), jnp.int32
    )
    P_l = jnp.asarray(rng.uniform(0.05, 1.0, (K, G, A, A)))
    P_r = jnp.asarray(rng.uniform(0.05, 1.0, (K, G, A, A)))
    pi = rng.uniform(0.1, 1.0, (GA,))
    pi = jnp.asarray(pi / pi.sum())
    w = jnp.asarray(rng.uniform(0.5, 2.0, (S,)))
    return buf, leaves, idx, P_l, P_r, pi, w


@pytest.mark.parametrize("K,R,N,G,A,S", [(8, 5, 6, 4, 4, 128),
                                         (8, 3, 4, 2, 4, 256)])
def test_fused_rank_update_blocked_matches_dense(interpret_mode, rng, K,
                                                 R, N, G, A, S,
                                                 monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs_blocked(
        rng, K, R, N, G, A, S
    )
    outc = jnp.asarray([R - 1], jnp.int32)

    got = kernels.fused_rank_update(leaves, buf, idx, outc, P_l, P_r,
                                    pi, w)
    want = kernels.fused_rank_update(
        leaves, buf, idx, outc, kernels.blockdiag_dense(P_l),
        kernels.blockdiag_dense(P_r), pi, w,
    )
    for n, a, b in zip(["buf", "rootll", "logscale"], got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14, err_msg=n)


@pytest.mark.parametrize("K,R,N,G,A,S", [(8, 5, 6, 4, 4, 128)])
def test_fused_rank_bwd_blocked_matches_jnp_vjp(interpret_mode, rng, K,
                                                R, N, G, A, S,
                                                monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs_blocked(
        rng, K, R, N, G, A, S
    )
    GA = G * A
    gm = jnp.asarray(rng.normal(0, 1.0, (K, GA, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    got = kernels.fused_rank_bwd(leaves, buf, idx, gm, gr, gl, P_l,
                                 P_r, pi, w)
    want = kernels._fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl,
                                       P_l, P_r, pi, w)
    for n, a, b in zip(["dm1", "dm2", "dPl", "dPr", "dpi", "dw"], got,
                       want):
        assert np.asarray(a).shape == np.asarray(b).shape, n
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


# ---------------------------------------------------------------------
# Wide-alphabet (MXU) rank kernel bodies: G*A*A > WIDE_UNROLL_CAP
# routes _kernel_rank_wide / _rank_bwd_core_wide (codon A=61 -> 64,
# protein A=20 -> 24 dense or G-blocked).  The MXU dot reassociates
# the A-contraction sums, so parity is relative-tolerance here (the
# narrow bodies replicate the reference multiply-add order exactly).
# ---------------------------------------------------------------------


def _rank_inputs_wide(rng, K, R, N, G, A, S):
    import jax.numpy as jnp

    GA = G * A
    buf = jnp.asarray(rng.uniform(0.05, 1.0, (K, R, GA, S)))
    leaves = jnp.asarray(rng.uniform(0.05, 1.0, (N, GA, S)))
    nodes = rng.integers(0, N + R, (2, K))
    rows = rng.integers(0, K, (2, K))
    idx = jnp.asarray(
        np.stack([rows[0], nodes[0], rows[1], nodes[1]]), jnp.int32
    )
    shape_p = (K, G, A, A) if G > 1 else (K, A, A)
    P_l = jnp.asarray(rng.uniform(0.05, 1.0, shape_p))
    P_r = jnp.asarray(rng.uniform(0.05, 1.0, shape_p))
    pi = rng.uniform(0.1, 1.0, (GA,))
    pi = jnp.asarray(pi / pi.sum())
    w = jnp.asarray(rng.uniform(0.5, 2.0, (S,)))
    return buf, leaves, idx, P_l, P_r, pi, w


def _assert_rel(name, got, want, rtol):
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape, name
    scale = np.max(np.abs(want)) + 1e-30
    np.testing.assert_allclose(got / scale, want / scale, rtol=0,
                               atol=rtol, err_msg=name)


WIDE_CASES = [
    (8, 3, 4, 1, 16, 128),   # dense, smallest wide alphabet
    (8, 3, 4, 1, 64, 256),   # dense codon-like (61 padded to 64)
    (8, 3, 4, 2, 12, 128),   # blocked wide (G*A^2 = 288 > cap)
]


@pytest.mark.parametrize("K,R,N,G,A,S", WIDE_CASES)
def test_fused_rank_update_wide_matches_ref(interpret_mode, rng, K, R, N,
                                            G, A, S, monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    assert kernels.wide_rank_kernel(G, A)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs_wide(
        rng, K, R, N, G, A, S
    )
    outc = jnp.asarray([R - 1], jnp.int32)

    got = kernels.fused_rank_update(leaves, buf, idx, outc, P_l, P_r,
                                    pi, w, save_children=True)
    kernels.INTERPRET = False
    want = kernels._fused_rank_ref(leaves, buf, idx, outc, P_l, P_r,
                                   pi, w, save_children=True)
    kernels.INTERPRET = True
    names = ["buf", "rootll", "logscale", "child_l", "child_r"]
    for n, a, b in zip(names, got, want):
        _assert_rel(n, a, b, 2e-6)


@pytest.mark.parametrize("K,R,N,G,A,S", WIDE_CASES)
def test_fused_rank_bwd_wide_matches_jnp_vjp(interpret_mode, rng, K, R,
                                             N, G, A, S, monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs_wide(
        rng, K, R, N, G, A, S
    )
    GA = G * A
    gm = jnp.asarray(rng.normal(0, 1.0, (K, GA, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    kernels.INTERPRET = False
    want = kernels._fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl,
                                       P_l, P_r, pi, w)
    outc = jnp.asarray([R - 1], jnp.int32)
    _, _, _, m1, m2 = kernels._fused_rank_ref(
        leaves, buf, idx, outc, P_l, P_r, pi, w, save_children=True
    )
    kernels.INTERPRET = True
    names = ["dm1", "dm2", "dPl", "dPr", "dpi", "dw"]
    # DMA re-gather variant
    got = kernels.fused_rank_bwd(leaves, buf, idx, gm, gr, gl, P_l,
                                 P_r, pi, w)
    for n, a, b in zip(names, got, want):
        if n in ("dpi", "dw"):
            a, b = np.asarray(a).sum(0), np.asarray(b).sum(0)
        _assert_rel("regather:" + n, a, b, 5e-6)
    # saved-children variant
    got_s = kernels.fused_rank_bwd_saved(m1, m2, gm, gr, gl, P_l, P_r,
                                         pi, w)
    for n, a, b in zip(names, got_s, want):
        if n in ("dpi", "dw"):
            a, b = np.asarray(a).sum(0), np.asarray(b).sum(0)
        _assert_rel("saved:" + n, a, b, 5e-6)


def test_fused_rank_bwd_wide_handles_max_ties(interpret_mode, rng,
                                              monkeypatch):
    """All planes tie at the per-site max: the wide backward must split
    the reduce_max cotangent among ties exactly like jax.vjp."""
    import jax.numpy as jnp

    monkeypatch.setattr(kernels, "TKF", 4)
    K, R, N, A, S = 8, 3, 4, 16, 128
    buf = jnp.ones((K, R, A, S)) * 0.5
    leaves = jnp.ones((N, A, S)) * 0.5
    nodes = rng.integers(0, N + R, (2, K))
    rows = rng.integers(0, K, (2, K))
    idx = jnp.asarray(
        np.stack([rows[0], nodes[0], rows[1], nodes[1]]), jnp.int32
    )
    # constant-column transitions -> every output plane identical
    P_l = jnp.ones((K, A, A)) * 0.3
    P_r = jnp.ones((K, A, A)) * 0.4
    pi = jnp.ones((A,)) / A
    w = jnp.ones((S,))
    gm = jnp.asarray(rng.normal(0, 1.0, (K, A, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))

    got = kernels.fused_rank_bwd(leaves, buf, idx, gm, gr, gl, P_l,
                                 P_r, pi, w)
    kernels.INTERPRET = False
    want = kernels._fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl,
                                       P_l, P_r, pi, w)
    kernels.INTERPRET = True
    for n, a, b in zip(["dm1", "dm2", "dPl", "dPr", "dpi", "dw"], got,
                       want):
        if n in ("dpi", "dw"):
            a, b = np.asarray(a).sum(0), np.asarray(b).sum(0)
        _assert_rel(n, a, b, 5e-6)


def test_pair_loglik_bwd_m_chunking_matches_unchunked(interpret_mode,
                                                      rng, monkeypatch):
    """Paper-scale M = K blows the twist backward kernel's (M, tk, A*A)
    vmem blocks; _pair_ll_bwd_pallas chunks the M axis with lax.map
    (additive dm, separable dP rows, zero-g padding).  Chunked output
    must equal the unchunked kernel, including a non-divisible M."""
    import jax.numpy as jnp

    K, S, A, M = 8, 128, 4, 5
    m1 = jnp.asarray(rng.uniform(0.05, 1.0, (K, A, S)))
    m2 = jnp.asarray(rng.uniform(0.05, 1.0, (K, A, S)))
    P_l = jnp.asarray(rng.uniform(0.05, 1.0, (M, K, A, A)))
    P_r = jnp.asarray(rng.uniform(0.05, 1.0, (M, K, A, A)))
    pi = rng.uniform(0.1, 1.0, (A,))
    pi = jnp.asarray(pi / pi.sum())
    w = jnp.asarray(rng.uniform(0.5, 2.0, (S,)))
    g = jnp.asarray(rng.normal(0, 1.0, (M, K)))

    want = kernels._pair_ll_bwd_pallas(m1, m2, P_l, P_r, pi, w, g)
    monkeypatch.setattr(kernels, "TWIST_BWD_M_CHUNK", 2)   # 5 -> 3 chunks
    got = kernels._pair_ll_bwd_pallas(m1, m2, P_l, P_r, pi, w, g)
    for n, a, b in zip(["dm1", "dm2", "dPl", "dPr", "dpi", "dw"], got,
                       want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-13, err_msg=n)
