"""Fused Pallas TPU kernel for the Felsenstein pruning hot op.

One kernel evaluates, per (particle-tile, site-tile) grid cell:

    u = P_l^T contracted with m1   (states through the left branch)
    v = P_r^T contracted with m2
    w = u * v                      (Hadamard merge)
    merged = w / max_A w           (per-site Felsenstein rescale)
    rootll   += sum_s w_s * log(pi . w)   (site-weighted, accumulated)
    logscale += sum_s w_s * log(max_A w)

replacing the reference's expm -> matmul -> matmul -> multiply -> matmul
-> log -> reduce chain (reference vcsmc.py:180-188,231-245) with a single
VMEM-resident pass: the merged message is produced AND consumed on-chip,
so HBM sees each message exactly once -- and the A-contraction runs in
native float32 on the VPU, avoiding both the TPU's bfloat16 default
matmul precision and XLA's 6-pass f32-emulation cost.

Layout: the sweep's native states-major (K, A, S) -- site tiles ride the
128-wide vector lanes, the A axis is a tiny unrolled loop, particle
tiles ride the leading block dim.  No transposes at the kernel boundary.
Transition matrices ride as (K, A*A) rows; the scalar reductions
accumulate into (K, 1) outputs across the (sequential) site-tile grid
dimension.  The backward pass is delegated to the jnp reference
implementation via custom_vjp (residuals = inputs), so the kernel
accelerates forward/eval paths with exact AD semantics.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax

TK = 64    # particles per block (grid coarseness: keep program count
           # low -- hundreds of tiny programs per rank cost more in
           # per-program overhead than the arithmetic itself)
TS = 128   # site padding granularity (lane width)
TS_MAX = 512   # preferred site-tile size

# Run the pallas_call sites in interpret mode (pure-jnp emulation of the
# kernel bodies) and take the kernel path even off-TPU.  CI sets this to
# exercise _kernel/_kernel_ll on CPU against _ref_impl
# (tests/test_kernels_interpret.py); never enable in production.
INTERPRET = False


def _site_tile(Sp):
    """Largest multiple of 128 that divides Sp, capped at TS_MAX."""
    t = TS_MAX
    while t > TS and Sp % t:
        t -= TS
    return t


def _ref_impl(m1, m2, P_l, P_r, pi, weights):
    """jnp reference of the fused op on states-major (K, A, S) inputs.
    Returns (merged_scaled, rootll, logscale), site-weighted.

    The A-contractions are explicit multiply-adds: exact f32 on the VPU,
    avoiding both the TPU bfloat16 matmul default and the 6-pass
    'highest' emulation (this function is also the kernel's backward)."""
    # sum_a m[k,a,s] * P[k,a,b] -> (K, B, S)
    u = jnp.sum(m1[:, :, None, :] * P_l[:, :, :, None], axis=1)
    v = jnp.sum(m2[:, :, None, :] * P_r[:, :, :, None], axis=1)
    w = u * v
    scale = jnp.maximum(
        jnp.max(w, axis=-2), jnp.finfo(w.dtype).tiny
    )                                                   # (K, S)
    merged = w / scale[:, None, :]
    site_ll = jnp.log(
        jnp.sum(w * pi[None, :, None], axis=1)
    )                                                   # unscaled
    rootll = jnp.sum(site_ll * weights[None, :], axis=-1)
    logscale = jnp.sum(jnp.log(scale) * weights[None, :], axis=-1)
    return merged, rootll, logscale


def _kernel(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
            merged_ref, rootll_ref, logscale_ref, *, A):
    from jax.experimental import pallas as pl

    js = pl.program_id(1)

    weights = w_ref[:]        # (1, TS)

    w_planes = []
    for b in range(A):
        u_b = None
        v_b = None
        for a in range(A):
            pl_ab = pl_ref[:, a * A + b][:, None]      # (TK, 1)
            pr_ab = pr_ref[:, a * A + b][:, None]
            tu = m1_ref[:, a, :] * pl_ab               # (TK, TS)
            tv = m2_ref[:, a, :] * pr_ab
            u_b = tu if u_b is None else u_b + tu
            v_b = tv if v_b is None else v_b + tv
        w_planes.append(u_b * v_b)

    scale = w_planes[0]
    for b in range(1, A):
        scale = jnp.maximum(scale, w_planes[b])
    tiny = jnp.finfo(scale.dtype).tiny
    scale = jnp.maximum(scale, tiny)

    site_lik = None
    for b in range(A):
        merged_ref[:, b, :] = w_planes[b] / scale
        term = w_planes[b] * pi_ref[0, b]
        site_lik = term if site_lik is None else site_lik + term

    rootll_part = jnp.sum(
        jnp.log(site_lik) * weights, axis=-1, keepdims=True
    )                                                   # (TK, 1)
    logscale_part = jnp.sum(
        jnp.log(scale) * weights, axis=-1, keepdims=True
    )

    @pl.when(js == 0)
    def _():
        rootll_ref[:] = jnp.zeros_like(rootll_ref)
        logscale_ref[:] = jnp.zeros_like(logscale_ref)

    rootll_ref[:] += rootll_part
    logscale_ref[:] += logscale_part


def _pallas_forward(m1, m2, P_l, P_r, pi, weights):
    """Inputs in native layout: m1/m2 (Kp, A, Sp), P (Kp, A*A),
    pi (1, A), weights (1, Sp); Kp % TK == 0, Sp % TS == 0."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, A, Sp = m1.shape
    ts = _site_tile(Sp)
    grid = (K // TK, Sp // ts)
    dtype = m1.dtype

    msg_spec = pl.BlockSpec(
        (TK, A, ts), lambda ik, js: (ik, 0, js),
        memory_space=pltpu.VMEM,
    )
    p_spec = pl.BlockSpec(
        (TK, A * A), lambda ik, js: (ik, 0), memory_space=pltpu.VMEM
    )
    pi_spec = pl.BlockSpec(
        (1, A), lambda ik, js: (0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (1, ts), lambda ik, js: (0, js), memory_space=pltpu.VMEM
    )
    acc_spec = pl.BlockSpec(
        (TK, 1), lambda ik, js: (ik, 0), memory_space=pltpu.VMEM
    )

    merged, rootll, logscale = pl.pallas_call(
        functools.partial(_kernel, A=A),
        grid=grid,
        interpret=INTERPRET,
        in_specs=[msg_spec, msg_spec, p_spec, p_spec, pi_spec, w_spec],
        out_specs=[msg_spec, acc_spec, acc_spec],
        out_shape=[
            jax.ShapeDtypeStruct((K, A, Sp), dtype),
            jax.ShapeDtypeStruct((K, 1), dtype),
            jax.ShapeDtypeStruct((K, 1), dtype),
        ],
    )(m1, m2, P_l, P_r, pi, weights)
    return merged, rootll[:, 0], logscale[:, 0]


def _round_up(x, m):
    return -(-x // m) * m


@jax.custom_vjp
def fused_merge_loglik(m1, m2, P_l, P_r, pi, weights):
    """Fused pruning merge + root log-likelihood (states-major).

    m1, m2: (K, A, S) scaled child messages; P_l, P_r: (K, A, A);
    pi: (A,); weights: (S,) site weights (1s when unweighted).

    Returns (merged_scaled (K, A, S), rootll (K,), logscale (K,)).
    Uses the Pallas TPU kernel on TPU backends, the jnp reference
    elsewhere; gradients always via the jnp reference.
    """
    return _forward(m1, m2, P_l, P_r, pi, weights)


def _forward(m1, m2, P_l, P_r, pi, weights):
    if jax.default_backend() != "tpu" and not INTERPRET:
        return _ref_impl(m1, m2, P_l, P_r, pi, weights)
    K, A, S = m1.shape
    Kp = _round_up(K, TK)
    Sp = _round_up(S, TS)
    # padded sites carry weight 0 and message 1; padded particles get
    # all-ones transitions (results sliced away)
    pad_msg = ((0, Kp - K), (0, 0), (0, Sp - S))
    m1k = jnp.pad(m1, pad_msg, constant_values=1.0)
    m2k = jnp.pad(m2, pad_msg, constant_values=1.0)
    pk_l = jnp.pad(P_l.reshape(K, A * A), ((0, Kp - K), (0, 0)),
                   constant_values=1.0)
    pk_r = jnp.pad(P_r.reshape(K, A * A), ((0, Kp - K), (0, 0)),
                   constant_values=1.0)
    wk = jnp.pad(weights[None], ((0, 0), (0, Sp - S)))
    merged, rootll, logscale = _pallas_forward(
        m1k, m2k, pk_l, pk_r, pi[None], wk
    )
    return merged[:K, :, :S], rootll[:K], logscale[:K]


def _fwd(m1, m2, P_l, P_r, pi, weights):
    out = _forward(m1, m2, P_l, P_r, pi, weights)
    return out, (m1, m2, P_l, P_r, pi, weights)


# Pallas backward for the merge op: measured SLOWER than XLA's own VJP
# at primate/K=2048 (fwd+bwd 42.8 ms vs 40.1; batch-256 step 16.6 vs
# 14.8, tools/perf_probe.py round 2) -- unlike the twist op, XLA fuses
# this reverse chain well, so the default stays on the jnp VJP.  The
# kernel is kept (with interpret-mode CI parity incl. max-tie routing)
# for future tile-shape work; flip MERGE_BWD_KERNEL to re-measure.
MERGE_BWD_KERNEL = False


def _bwd(residuals, cotangents):
    if MERGE_BWD_KERNEL and (jax.default_backend() == "tpu" or INTERPRET):
        return _merge_bwd_pallas(*residuals, *cotangents)
    _, vjp = jax.vjp(_ref_impl, *residuals)
    return vjp(cotangents)


def _kernel_merge_bwd(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
                      gm_ref, gr_ref, gl_ref,
                      dm1_ref, dm2_ref, dpl_ref, dpr_ref, dpi_ref,
                      *, A, n_js):
    """Streaming backward of _ref_impl (merge + rootll + logscale).

    Replicates jax.vjp(_ref_impl) exactly, including reduce_max's
    split-among-ties cotangent routing and the maximum(raw, tiny)
    half-split at equality.  One pass per (particle-tile, site-tile):
    the XLA-derived reverse chain cost ~7.6 ms/run of scattered
    reduce/mul passes at primate K=2048 (xprof round 2).
    """
    from jax.experimental import pallas as pl

    ik = pl.program_id(0)
    js = pl.program_id(1)
    w = w_ref[:]                                        # (1, TS)
    dtype = w.dtype

    pl_c = [pl_ref[:, c][:, None] for c in range(A * A)]
    pr_c = [pr_ref[:, c][:, None] for c in range(A * A)]

    u = []
    v = []
    wp = []
    site = None
    for b in range(A):
        u_b = None
        v_b = None
        for a in range(A):
            tu = m1_ref[:, a, :] * pl_c[a * A + b]
            tv = m2_ref[:, a, :] * pr_c[a * A + b]
            u_b = tu if u_b is None else u_b + tu
            v_b = tv if v_b is None else v_b + tv
        u.append(u_b)
        v.append(v_b)
        wp.append(u_b * v_b)
        term = wp[b] * pi_ref[0, b]
        site = term if site is None else site + term

    raw = wp[0]
    for b in range(1, A):
        raw = jnp.maximum(raw, wp[b])
    tiny = jnp.finfo(dtype).tiny
    scale = jnp.maximum(raw, tiny)

    gr = gr_ref[:]                                      # (TK, 1)
    gl = gl_ref[:]
    dsite = (gr * w) / site                             # (TK, TS)
    dscale = (gl * w) / scale
    inv_scale = 1.0 / scale
    for b in range(A):
        dscale = dscale - gm_ref[:, b, :] * (
            wp[b] * inv_scale * inv_scale
        )
    draw = dscale * (
        (raw > tiny).astype(dtype) + 0.5 * (raw == tiny).astype(dtype)
    )
    neq = None
    eqs = []
    for b in range(A):
        eq = (wp[b] == raw).astype(dtype)
        eqs.append(eq)
        neq = eq if neq is None else neq + eq

    @pl.when(js == 0)
    def _():
        dpl_ref[:] = jnp.zeros_like(dpl_ref)
        dpr_ref[:] = jnp.zeros_like(dpr_ref)

    dm1 = [None] * A
    dm2 = [None] * A
    cols_l = [None] * (A * A)
    cols_r = [None] * (A * A)
    dpi = []
    for b in range(A):
        dwp_b = (
            gm_ref[:, b, :] * inv_scale
            + dsite * pi_ref[0, b]
            + draw * (eqs[b] / neq)
        )
        du_b = dwp_b * v[b]
        dv_b = dwp_b * u[b]
        for a in range(A):
            t1 = du_b * pl_c[a * A + b]
            t2 = dv_b * pr_c[a * A + b]
            dm1[a] = t1 if dm1[a] is None else dm1[a] + t1
            dm2[a] = t2 if dm2[a] is None else dm2[a] + t2
            cols_l[a * A + b] = jnp.sum(
                du_b * m1_ref[:, a, :], axis=-1
            )
            cols_r[a * A + b] = jnp.sum(
                dv_b * m2_ref[:, a, :], axis=-1
            )
        dpi.append(jnp.sum(dsite * wp[b]))
    for a in range(A):
        dm1_ref[:, a, :] = dm1[a]
        dm2_ref[:, a, :] = dm2[a]
    dpl_ref[:] += jnp.stack(cols_l, axis=-1)            # (TK, A*A)
    dpr_ref[:] += jnp.stack(cols_r, axis=-1)
    dpi_ref[:] = jnp.stack(dpi)[None, None, :]          # (1, 1, A)


def _merge_dw_ref(m1, m2, P_l, P_r, pi, gr, gl):
    """dll/dweights for the merge op (jnp; dead-code-eliminated whenever
    the weights cotangent is unused, which is always in training)."""
    u = jnp.sum(m1[:, :, None, :] * P_l[:, :, :, None], axis=1)
    v = jnp.sum(m2[:, :, None, :] * P_r[:, :, :, None], axis=1)
    w = u * v
    scale = jnp.maximum(jnp.max(w, axis=-2), jnp.finfo(w.dtype).tiny)
    site = jnp.sum(w * pi[None, :, None], axis=1)
    return jnp.sum(
        gr[:, None] * jnp.log(site) + gl[:, None] * jnp.log(scale),
        axis=0,
    )


def _merge_bwd_pallas(m1, m2, P_l, P_r, pi, weights, gm, gr, gl):
    """Exact cotangents of _ref_impl in one streaming Pallas pass.

    m1, m2: (K, A, S); P_l, P_r: (K, A, A); pi: (A,); weights: (S,);
    gm: (K, A, S) merged-message cotangent; gr, gl: (K,) rootll /
    logscale cotangents.  Returns (dm1, dm2, dP_l, dP_r, dpi, dw).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K, A, S = m1.shape
    dtype = m1.dtype
    if K >= 128:
        tk = 128
        Kp = _round_up(K, tk)
    else:
        tk = Kp = _round_up(K, 8)
    Sp = _round_up(S, TS)
    ts = TS_MAX // 2
    while ts > TS and Sp % ts:
        ts -= TS
    n_ik = Kp // tk
    n_js = Sp // ts

    pad_msg = ((0, Kp - K), (0, 0), (0, Sp - S))
    m1k = jnp.pad(m1, pad_msg, constant_values=1.0)
    m2k = jnp.pad(m2, pad_msg, constant_values=1.0)
    pk_l = jnp.pad(P_l.reshape(K, A * A), ((0, Kp - K), (0, 0)),
                   constant_values=1.0)
    pk_r = jnp.pad(P_r.reshape(K, A * A), ((0, Kp - K), (0, 0)),
                   constant_values=1.0)
    wk = jnp.pad(weights[None], ((0, 0), (0, Sp - S)))
    # zero cotangents on all padding -> padded contributions vanish
    gmk = jnp.pad(gm, pad_msg)
    grk = jnp.pad(gr[:, None], ((0, Kp - K), (0, 0)))
    glk = jnp.pad(gl[:, None], ((0, Kp - K), (0, 0)))

    msg_spec = pl.BlockSpec((tk, A, ts), lambda ik, js: (ik, 0, js),
                            memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((tk, A * A), lambda ik, js: (ik, 0),
                          memory_space=pltpu.VMEM)
    kvec_spec = pl.BlockSpec((tk, 1), lambda ik, js: (ik, 0),
                             memory_space=pltpu.VMEM)
    dm1, dm2, dpl, dpr, dpi_part = pl.pallas_call(
        functools.partial(_kernel_merge_bwd, A=A, n_js=n_js),
        grid=(n_ik, n_js),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            msg_spec, msg_spec, p_spec, p_spec,
            pl.BlockSpec((1, A), lambda ik, js: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda ik, js: (0, js),
                         memory_space=pltpu.VMEM),
            msg_spec, kvec_spec, kvec_spec,
        ],
        out_specs=[
            msg_spec, msg_spec,
            # accumulated over the (innermost, consecutive) js steps
            p_spec, p_spec,
            # per-program write-once partials, summed below
            pl.BlockSpec((1, 1, A), lambda ik, js: (ik * n_js + js, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Kp, A, Sp), dtype),
            jax.ShapeDtypeStruct((Kp, A, Sp), dtype),
            jax.ShapeDtypeStruct((Kp, A * A), dtype),
            jax.ShapeDtypeStruct((Kp, A * A), dtype),
            jax.ShapeDtypeStruct((n_ik * n_js, 1, A), dtype),
        ],
    )(m1k, m2k, pk_l, pk_r, pi[None], wk, gmk, grk, glk)

    dpi = dpi_part.sum(axis=(0, 1))
    dw = _merge_dw_ref(m1, m2, P_l, P_r, pi, gr, gl)
    return (
        dm1[:K, :, :S],
        dm2[:K, :, :S],
        dpl[:K].reshape(K, A, A),
        dpr[:K].reshape(K, A, A),
        dpi,
        dw,
    )


fused_merge_loglik.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------
# Twist variant: log-likelihoods of M look-ahead merges per particle,
# WITHOUT writing the merged messages (VNCSMC potentials only need the
# scalar; the reference materializes the full M*K x S x A tensor,
# vncsmc.py:355-356).  The M axis is the innermost grid dimension so a
# message block is fetched once and reused for all M subsamples.
# ---------------------------------------------------------------------


def _kernel_ll(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
               rootll_ref, *, A):
    from jax.experimental import pallas as pl

    js = pl.program_id(1)
    m = pl.program_id(2)

    weights = w_ref[:]        # (1, TS)

    site_lik = None
    for b in range(A):
        u_b = None
        v_b = None
        for a in range(A):
            pl_ab = pl_ref[0, :, a * A + b][:, None]   # (TK, 1)
            pr_ab = pr_ref[0, :, a * A + b][:, None]
            tu = m1_ref[:, a, :] * pl_ab
            tv = m2_ref[:, a, :] * pr_ab
            u_b = tu if u_b is None else u_b + tu
            v_b = tv if v_b is None else v_b + tv
        term = (u_b * v_b) * pi_ref[0, b]
        site_lik = term if site_lik is None else site_lik + term

    part = jnp.sum(jnp.log(site_lik) * weights, axis=-1)   # (TK,)

    @pl.when((js == 0) & (m == 0))
    def _():
        rootll_ref[:] = jnp.zeros_like(rootll_ref)

    rootll_ref[m, :] += part


def fused_pair_loglik(m1, m2, P_l, P_r, pi, weights):
    """Data log-likelihoods of M candidate merges per particle.

    m1, m2: (K, A, S) scaled child messages (shared across M);
    P_l, P_r: (M, K, A, A); pi: (A,); weights: (S,).
    Returns (M, K) float: sum_s w_s log(pi . (m1 P_l^m)(m2 P_r^m)).

    Gradients via the jnp reference (custom_vjp); non-TPU backends use
    the reference directly.

    STATUS: exactly correct on TPU (interpret-mode CI coverage in
    tests/test_kernels_interpret.py) and wired into the twist module
    behind TwistConfig.use_pallas_ll, including the ROADMAP-suggested
    shape that folds pairs x M x K into the particle-tile axis of ONE
    pallas_call per chunk (no vmap).  Round-2 v5e measurements
    (tools/perf_probe.py) still favor the jnp multiply-add path at every
    probed scale (betacorona K=32 M=10 fwd 316 vs 94 ms; primate K=32
    31 vs 21 ms; primate K=256 185 vs 129 ms): the (K-tile, site-tile,
    M) program grid re-fetches message tiles per program while XLA keeps
    them pipelined inside a single fusion.  Round 3 retried with the
    M-in-program layout that made the BACKWARD kernel win
    (_kernel_ll_fwd2, PHYLO_TWIST_FWD_V2): each message block is now
    fetched once and reused across all M subsamples -- still loses
    (betacorona K=32 M=10 fwd 123.6 vs 44.5 ms with prefix-skip
    chunking; primate K=32 25.5 vs 21.7).  The forward is a single
    multiply-add chain with NO tensor re-reads for XLA to botch, so the
    fusion is already near streaming-optimal; use_pallas_ll stays
    False (and note its custom VJP takes the jnp-reference backward,
    not the streaming Pallas backward -- fwd+bwd 1704 vs 552 ms).
    """
    return _pair_ll(m1, m2, P_l, P_r, pi, weights)


def _kernel_ll_fwd2(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
                    out_ref, *, A, M):
    """Forward pair-loglik with the M subsamples unrolled INSIDE the
    program (fori_loop) instead of riding the grid: each message block
    is fetched once and reused for all M subsamples -- the re-fetch per
    (pair, m) program is why the round-2 forward kernel (_kernel_ll)
    lost to the XLA fusion (fused_pair_loglik STATUS)."""
    from jax import lax
    from jax.experimental import pallas as pl

    js = pl.program_id(1)
    w = w_ref[:]                                        # (1, TS)

    @pl.when(js == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(m, _):
        P_row_l = pl_ref[m]                             # (tk, A*A)
        P_row_r = pr_ref[m]
        pl_c = [P_row_l[:, c][:, None] for c in range(A * A)]
        pr_c = [P_row_r[:, c][:, None] for c in range(A * A)]
        site_lik = None
        for b in range(A):
            u_b = None
            v_b = None
            for a in range(A):
                tu = m1_ref[:, a, :] * pl_c[a * A + b]
                tv = m2_ref[:, a, :] * pr_c[a * A + b]
                u_b = tu if u_b is None else u_b + tu
                v_b = tv if v_b is None else v_b + tv
            term = (u_b * v_b) * pi_ref[0, b]
            site_lik = term if site_lik is None else site_lik + term
        out_ref[m, :] += jnp.sum(jnp.log(site_lik) * w, axis=-1)
        return 0

    lax.fori_loop(0, M, body, 0)


def _pair_ll_forward2(m1, m2, P_l, P_r, pi, weights):
    """M-in-program forward kernel launcher (same padding contract as
    _pair_ll_bwd_pallas)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, A, _ = P_l.shape
    S = m1.shape[-1]
    dtype = m1.dtype
    if K >= 128:
        tk = 128
        Kp = _round_up(K, tk)
    else:
        tk = Kp = _round_up(K, 8)
    Sp = _round_up(S, TS)
    ts = _site_tile(Sp)
    n_ik = Kp // tk
    n_js = Sp // ts

    pad_msg = ((0, Kp - K), (0, 0), (0, Sp - S))
    m1k = jnp.pad(m1, pad_msg, constant_values=1.0)
    m2k = jnp.pad(m2, pad_msg, constant_values=1.0)
    pk_l = jnp.pad(P_l.reshape(M, K, A * A),
                   ((0, 0), (0, Kp - K), (0, 0)), constant_values=1.0)
    pk_r = jnp.pad(P_r.reshape(M, K, A * A),
                   ((0, 0), (0, Kp - K), (0, 0)), constant_values=1.0)
    wk = jnp.pad(weights[None], ((0, 0), (0, Sp - S)))

    msg_spec = pl.BlockSpec((tk, A, ts), lambda ik, js: (ik, 0, js),
                            memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((M, tk, A * A), lambda ik, js: (0, ik, 0),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_ll_fwd2, A=A, M=M),
        grid=(n_ik, n_js),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            msg_spec, msg_spec, p_spec, p_spec,
            pl.BlockSpec((1, A), lambda ik, js: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda ik, js: (0, js),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tk), lambda ik, js: (0, ik),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Kp), dtype),
    )(m1k, m2k, pk_l, pk_r, pi[None], wk)
    return out[:, :K]


def _pair_ll_ref(m1, m2, P_l, P_r, pi, weights):
    M, K, A, _ = P_l.shape
    site_lik = None
    for b in range(A):
        u_b = None
        v_b = None
        for a in range(A):
            tu = m1[None, :, a, :] * P_l[:, :, a, b, None]
            tv = m2[None, :, a, :] * P_r[:, :, a, b, None]
            u_b = tu if u_b is None else u_b + tu
            v_b = tv if v_b is None else v_b + tv
        term = (u_b * v_b) * pi[b]
        site_lik = term if site_lik is None else site_lik + term
    return jnp.sum(jnp.log(site_lik) * weights[None, None, :], axis=-1)


@jax.custom_vjp
def _pair_ll(m1, m2, P_l, P_r, pi, weights):
    return _pair_ll_forward(m1, m2, P_l, P_r, pi, weights)


def _pair_ll_forward(m1, m2, P_l, P_r, pi, weights):
    if jax.default_backend() != "tpu" and not INTERPRET:
        return _pair_ll_ref(m1, m2, P_l, P_r, pi, weights)
    if TWIST_FWD_V2:
        return _pair_ll_forward2(m1, m2, P_l, P_r, pi, weights)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, A, _ = P_l.shape
    S = m1.shape[-1]
    # the (M, Kp) accumulator puts particles on LANES, so the particle
    # tile must be 128-aligned (or cover all of Kp exactly)
    if K >= 128:
        tk = 128
        Kp = _round_up(K, tk)
    else:
        tk = Kp = _round_up(K, 8)
    Sp = _round_up(S, TS)
    ts = _site_tile(Sp)

    pad_msg = ((0, Kp - K), (0, 0), (0, Sp - S))
    m1k = jnp.pad(m1, pad_msg, constant_values=1.0)
    m2k = jnp.pad(m2, pad_msg, constant_values=1.0)
    pk_l = jnp.pad(P_l.reshape(M, K, A * A),
                   ((0, 0), (0, Kp - K), (0, 0)), constant_values=1.0)
    pk_r = jnp.pad(P_r.reshape(M, K, A * A),
                   ((0, 0), (0, Kp - K), (0, 0)), constant_values=1.0)
    wk = jnp.pad(weights[None], ((0, 0), (0, Sp - S)))

    # grid order: M innermost so the message blocks stay resident
    grid = (Kp // tk, Sp // ts, M)
    out = pl.pallas_call(
        functools.partial(_kernel_ll, A=A),
        grid=grid,
        interpret=INTERPRET,
        in_specs=[
            pl.BlockSpec((tk, A, ts), lambda ik, js, m: (ik, 0, js),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, A, ts), lambda ik, js, m: (ik, 0, js),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, A * A), lambda ik, js, m: (m, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, A * A), lambda ik, js, m: (m, ik, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A), lambda ik, js, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda ik, js, m: (0, js),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tk), lambda ik, js, m: (0, ik),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, Kp), m1.dtype),
    )(m1k, m2k, pk_l, pk_r, pi[None], wk)
    return out[:, :K]


def _pair_ll_fwd(m1, m2, P_l, P_r, pi, weights):
    return (_pair_ll_forward(m1, m2, P_l, P_r, pi, weights),
            (m1, m2, P_l, P_r, pi, weights))


def _pair_ll_bwd(res, g):
    _, vjp = jax.vjp(_pair_ll_ref, *res)
    return vjp(g)


_pair_ll.defvjp(_pair_ll_fwd, _pair_ll_bwd)


# ---------------------------------------------------------------------
# pair_loglik: XLA forward + PALLAS BACKWARD.
#
# The forward multiply-add chain fuses into one streaming pass under
# XLA (measured faster than the forward Pallas kernel, see
# fused_pair_loglik STATUS).  Its XLA-derived BACKWARD, however, is a
# single mega reduce-fusion that re-reads the (M, CK, S) tensors ~55x
# (xprof round 2: 33.6 ms/rank at 143 GB/s for primate K=32 M=10 --
# the reverse pass cost 20x the forward).  _kernel_ll_bwd computes the
# exact cotangents in ONE streaming pass: grid is (site-tile,
# particle-tile) only, the M subsamples are unrolled INSIDE the program
# (the first two-kernel revision kept M in the grid and spent ~9 ms/rank
# on program dispatch + block flushes), and every output is write-once:
#
#   dm1, dm2            (tile-indexed, fully reduced over M in-register)
#   dP partials         per site-tile, summed in jnp afterwards
#   dweights partials   per particle-tile, summed afterwards
#   dpi                 via the identity dpi_b = sum_{m,k,a}
#                       dP_l[m,k,a,b] P_l[m,k,a,b] / pi_b (s-independent
#                       P factors out of the site sum), so it needs no
#                       kernel output at all.
#
# All arithmetic is exact f32 on the VPU (same precision rules as the
# forward).
# ---------------------------------------------------------------------


def _kernel_ll_bwd(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
                   g_ref, dm1_ref, dm2_ref, dpl_ref, dpr_ref,
                   *, A, M):
    from jax import lax
    from jax.experimental import pallas as pl

    js = pl.program_id(1)
    w = w_ref[:]                                        # (1, TS)
    tk, _, ts = m1_ref.shape
    dtype = w.dtype
    zero = jnp.zeros((tk, ts), dtype)

    @pl.when(js == 0)
    def _():
        dpl_ref[:] = jnp.zeros_like(dpl_ref)
        dpr_ref[:] = jnp.zeros_like(dpr_ref)

    # the M subsamples run as a fori_loop (a fully unrolled M x A^2 body
    # SIGKILLed the Mosaic compiler); dm accumulates in the carry, dP
    # rows store directly at their dynamic m index
    # coefficient columns are extracted ONCE per (m, a, b) and reused by
    # both the u/v recompute and the dm accumulation; a sublane-major
    # (M, A*A, Kp, 1) coefficient layout was tried instead and blew the
    # scoped-vmem budget 5x (Mosaic pads the trailing 1 to 128 lanes)
    def body(m, carry):
        dm1, dm2 = carry
        # ONE dynamic-index read per operand, then static column
        # slices (32 separate pl_ref[m, :, c] dynamic reads measured
        # slower)
        P_row_l = pl_ref[m]                     # (tk, A*A)
        P_row_r = pr_ref[m]
        pl_c = [P_row_l[:, c][:, None] for c in range(A * A)]
        pr_c = [P_row_r[:, c][:, None] for c in range(A * A)]
        u = []
        v = []
        site_lik = None
        for b in range(A):
            u_b = None
            v_b = None
            for a in range(A):
                tu = m1_ref[:, a, :] * pl_c[a * A + b]
                tv = m2_ref[:, a, :] * pr_c[a * A + b]
                u_b = tu if u_b is None else u_b + tu
                v_b = tv if v_b is None else v_b + tv
            u.append(u_b)
            v.append(v_b)
            term = (u_b * v_b) * pi_ref[0, b]
            site_lik = term if site_lik is None else site_lik + term

        g = g_ref[m, :][:, None]                        # (TK, 1)
        gsite = (g * w) / site_lik                      # (TK, TS)

        dm1 = list(dm1)
        dm2 = list(dm2)
        cols_l = [None] * (A * A)
        cols_r = [None] * (A * A)
        for b in range(A):
            du_b = gsite * (v[b] * pi_ref[0, b])
            dv_b = gsite * (u[b] * pi_ref[0, b])
            for a in range(A):
                dm1[a] = dm1[a] + du_b * pl_c[a * A + b]
                dm2[a] = dm2[a] + dv_b * pr_c[a * A + b]
                cols_l[a * A + b] = jnp.sum(
                    du_b * m1_ref[:, a, :], axis=-1
                )
                cols_r[a * A + b] = jnp.sum(
                    dv_b * m2_ref[:, a, :], axis=-1
                )
        dpl_ref[m] += jnp.stack(cols_l, axis=-1)        # (TK, A*A)
        dpr_ref[m] += jnp.stack(cols_r, axis=-1)
        return tuple(dm1), tuple(dm2)

    init = (
        tuple(zero for _ in range(A)),
        tuple(zero for _ in range(A)),
    )
    dm1, dm2 = lax.fori_loop(0, M, body, init)
    for a in range(A):
        dm1_ref[:, a, :] = dm1[a]
        dm2_ref[:, a, :] = dm2[a]


def _dw_ref(m1, m2, P_l, P_r, pi, g):
    """dll/dweights_s = sum_{m,k} g[m,k] log site_lik[m,k,s] (jnp;
    dead-code-eliminated whenever the weights cotangent is unused)."""
    A = pi.shape[0]
    site_lik = None
    for b in range(A):
        u_b = None
        v_b = None
        for a in range(A):
            tu = m1[None, :, a, :] * P_l[:, :, a, b, None]
            tv = m2[None, :, a, :] * P_r[:, :, a, b, None]
            u_b = tu if u_b is None else u_b + tu
            v_b = tv if v_b is None else v_b + tv
        term = (u_b * v_b) * pi[b]
        site_lik = term if site_lik is None else site_lik + term
    return jnp.sum(g[:, :, None] * jnp.log(site_lik), axis=(0, 1))


def _kernel_ll_bwd2(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
                    g_ref, dm1_ref, dm2_ref, t_ref, *, A, M):
    """v2 of the streaming pair-loglik backward (round 3).

    Replaces the per-(m, a, b) dP column reductions of _kernel_ll_bwd
    (2 A^2 cross-lane reduces per subsample) with the shared bilinear
    form

        T[a, a'] = sum_s gsite_m * m1[a] * m2[a']            (A^2 reduces)

    from which BOTH transition cotangents follow by tiny per-particle
    contractions done OUTSIDE the kernel (dP_l[a,b] = pi_b sum_a'
    T[a,a'] P_r[a',b]; dP_r[a',b] = pi_b sum_a T[a,a'] P_l[a,b]):
    half the reductions, and the dm accumulation reorganized through
    vbar/ubar so du/dv planes are never materialized.
    """
    from jax import lax
    from jax.experimental import pallas as pl

    js = pl.program_id(1)
    w = w_ref[:]                                        # (1, TS)
    tk, _, ts = m1_ref.shape
    dtype = w.dtype
    zero = jnp.zeros((tk, ts), dtype)

    @pl.when(js == 0)
    def _():
        t_ref[:] = jnp.zeros_like(t_ref)

    def body(m, carry):
        dm1, dm2 = carry
        P_row_l = pl_ref[m]                     # (tk, A*A)
        P_row_r = pr_ref[m]
        pl_c = [P_row_l[:, c][:, None] for c in range(A * A)]
        pr_c = [P_row_r[:, c][:, None] for c in range(A * A)]
        u = []
        pv = []       # pi_b * v_b
        pu = []       # pi_b * u_b
        site_lik = None
        for b in range(A):
            u_b = None
            v_b = None
            for a in range(A):
                tu = m1_ref[:, a, :] * pl_c[a * A + b]
                tv = m2_ref[:, a, :] * pr_c[a * A + b]
                u_b = tu if u_b is None else u_b + tu
                v_b = tv if v_b is None else v_b + tv
            u.append(u_b)
            pv_b = v_b * pi_ref[0, b]
            pv.append(pv_b)
            pu.append(u_b * pi_ref[0, b])
            term = u_b * pv_b
            site_lik = term if site_lik is None else site_lik + term

        g = g_ref[m, :][:, None]                        # (TK, 1)
        gsite = (g * w) / site_lik                      # (TK, TS)

        # T[a, a'] = sum_s gsite * m1[a] * m2[a']
        t_cols = [None] * (A * A)
        for a in range(A):
            gm1_a = gsite * m1_ref[:, a, :]
            for a2 in range(A):
                t_cols[a * A + a2] = jnp.sum(
                    gm1_a * m2_ref[:, a2, :], axis=-1
                )
        t_ref[m] += jnp.stack(t_cols, axis=-1)          # (TK, A*A)

        # dm1[a] = gsite * sum_b P_l[a,b] pi_b v_b (and mirrored)
        dm1 = list(dm1)
        dm2 = list(dm2)
        for a in range(A):
            vbar = None
            ubar = None
            for b in range(A):
                tvb = pl_c[a * A + b] * pv[b]
                tub = pr_c[a * A + b] * pu[b]
                vbar = tvb if vbar is None else vbar + tvb
                ubar = tub if ubar is None else ubar + tub
            dm1[a] = dm1[a] + gsite * vbar
            dm2[a] = dm2[a] + gsite * ubar
        return tuple(dm1), tuple(dm2)

    init = (
        tuple(zero for _ in range(A)),
        tuple(zero for _ in range(A)),
    )
    dm1, dm2 = lax.fori_loop(0, M, body, init)
    for a in range(A):
        dm1_ref[:, a, :] = dm1[a]
        dm2_ref[:, a, :] = dm2[a]


# tile-size overrides for tools/twist_bwd_tiles.py A/B sweeps; None =
# the defaults below
_BWD_TK = None
_BWD_TS = None
# M-axis chunk for the twist backward kernel (see _pair_ll_bwd_pallas):
# the kernel's P/T blocks are (M, tk, A*A), fine at the reference's
# M ~ 10 but vmem-fatal at paper-scale M = K
TWIST_BWD_M_CHUNK = int(_os.environ.get("PHYLO_TWIST_BWD_M_CHUNK", "64"))


def _pair_ll_bwd_pallas(m1, m2, P_l, P_r, pi, weights, g):
    """Exact cotangents of _pair_ll_ref in one streaming Pallas pass.

    m1, m2: (K, A, S); P_l, P_r: (M, K, A, A); pi: (A,); weights: (S,);
    g: (M, K) output cotangent.  Returns (dm1, dm2, dP_l, dP_r, dpi, dw).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, A, _ = P_l.shape
    if M > TWIST_BWD_M_CHUNK:
        # The kernel rides the WHOLE M axis in its (M, tk, A*A) blocks
        # -- sized for the reference's M ~ 10; at paper-scale M = K
        # (M=1024: 527 MB of vmem blocks, a compile-time OOM).  The
        # per-m contributions are independent (dm additive over m, dP
        # rows separable), so chunk M with lax.map and combine.  Padded
        # chunks carry g = 0, which zeroes every cotangent they touch
        # (P pads are benign positive constants).
        Mc = TWIST_BWD_M_CHUNK
        Mp = _round_up(M, Mc)
        P_l_c = jnp.concatenate(
            [P_l, jnp.ones((Mp - M, K, A, A), P_l.dtype)]
        ).reshape(Mp // Mc, Mc, K, A, A)
        P_r_c = jnp.concatenate(
            [P_r, jnp.ones((Mp - M, K, A, A), P_r.dtype)]
        ).reshape(Mp // Mc, Mc, K, A, A)
        g_c = jnp.concatenate(
            [g, jnp.zeros((Mp - M, K), g.dtype)]
        ).reshape(Mp // Mc, Mc, K)
        outs = lax.map(
            lambda args: _pair_ll_bwd_pallas(
                m1, m2, args[0], args[1], pi, weights, args[2]
            ),
            (P_l_c, P_r_c, g_c),
        )
        dm1 = jnp.sum(outs[0], axis=0)
        dm2 = jnp.sum(outs[1], axis=0)
        dpl = outs[2].reshape(Mp, K, A, A)[:M]
        dpr = outs[3].reshape(Mp, K, A, A)[:M]
        dpi = jnp.sum(outs[4], axis=0)
        dw = jnp.sum(outs[5], axis=0)
        return dm1, dm2, dpl, dpr, dpi, dw
    S = m1.shape[-1]
    dtype = m1.dtype
    tk_default = _BWD_TK or 128
    if K >= tk_default:
        tk = tk_default
        Kp = _round_up(K, tk)
    else:
        tk = Kp = _round_up(K, 8)
    # Site tile + padding chosen together by a measured cost model:
    # larger tiles amortize per-program overhead (tools/twist_bwd_tiles
    # sweep at M=10, CK=2112, S=1024: ts=256/512/1024 run 10.4/6.5/4.6
    # ms per call under the 64 MB scoped-vmem budget; tk=512 and
    # ts>1024 fail to compile), but padding S up to the tile multiple
    # costs weight-0 columns.  Minimizing padded-sites x per-site tile
    # cost picks e.g. ts=1024 for betacorona (3328 -> 4096: +23%
    # columns, -29% per site) and ts=256 for 256-site minibatches.
    if _BWD_TS is not None:
        ts = max(_BWD_TS, TS)
        Sp = _round_up(S, ts)
    else:
        _, ts, Sp = min(
            (Sp_c * c, cand, Sp_c)
            for cand, c in ((1024, 0.44), (512, 0.62), (256, 1.0),
                            (TS, 1.25))
            for Sp_c in (_round_up(S, cand),)
        )
    n_ik = Kp // tk
    n_js = Sp // ts

    pad_msg = ((0, Kp - K), (0, 0), (0, Sp - S))
    m1k = jnp.pad(m1, pad_msg, constant_values=1.0)
    m2k = jnp.pad(m2, pad_msg, constant_values=1.0)
    pk_l = jnp.pad(P_l.reshape(M, K, A * A),
                   ((0, 0), (0, Kp - K), (0, 0)), constant_values=1.0)
    pk_r = jnp.pad(P_r.reshape(M, K, A * A),
                   ((0, 0), (0, Kp - K), (0, 0)), constant_values=1.0)
    # padded sites get weight 0 AND cotangent 0 for padded particles,
    # so every padded contribution vanishes exactly
    wk = jnp.pad(weights[None], ((0, 0), (0, Sp - S)))
    gk = jnp.pad(g, ((0, 0), (0, Kp - K)))

    msg_spec = pl.BlockSpec((tk, A, ts), lambda ik, js: (ik, 0, js),
                            memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((M, tk, A * A), lambda ik, js: (0, ik, 0),
                          memory_space=pltpu.VMEM)
    common = dict(
        grid=(n_ik, n_js),
        interpret=INTERPRET,
        # the body keeps ~20 (tk, ts) scratch arrays live (u/v planes +
        # dm accumulators across the M fori_loop); the default 16 MB
        # scoped-vmem budget is too tight -- v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
        in_specs=[
            msg_spec, msg_spec, p_spec, p_spec,
            pl.BlockSpec((1, A), lambda ik, js: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda ik, js: (0, js),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, tk), lambda ik, js: (0, ik),
                         memory_space=pltpu.VMEM),
        ],
    )
    if TWIST_BWD_V2:
        dm1, dm2, t_out = pl.pallas_call(
            functools.partial(_kernel_ll_bwd2, A=A, M=M),
            out_specs=[msg_spec, msg_spec, p_spec],
            out_shape=[
                jax.ShapeDtypeStruct((Kp, A, Sp), dtype),
                jax.ShapeDtypeStruct((Kp, A, Sp), dtype),
                jax.ShapeDtypeStruct((M, Kp, A * A), dtype),
            ],
            **common,
        )(m1k, m2k, pk_l, pk_r, pi[None], wk, gk)
        # the tiny per-particle A^3 contractions run OUTSIDE the kernel
        # (exact f32 broadcast multiply-add, never dot_general):
        #   dP_l[a,b] = pi_b sum_a' T[a,a'] P_r[a',b]
        #   dP_r[a',b] = pi_b sum_a  T[a,a'] P_l[a,b]
        T = t_out[:, :K].reshape(M, K, A, A)
        dpl = pi * jnp.sum(
            T[..., :, :, None] * P_r[..., None, :, :], axis=-2
        )
        dpr = pi * jnp.sum(
            T[..., :, :, None] * P_l[..., :, None, :], axis=-3
        )
    else:
        dm1, dm2, dpl_out, dpr_out = pl.pallas_call(
            functools.partial(_kernel_ll_bwd, A=A, M=M),
            out_specs=[
                msg_spec, msg_spec,
                # accumulated over the (innermost, consecutive) js steps
                p_spec, p_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Kp, A, Sp), dtype),
                jax.ShapeDtypeStruct((Kp, A, Sp), dtype),
                jax.ShapeDtypeStruct((M, Kp, A * A), dtype),
                jax.ShapeDtypeStruct((M, Kp, A * A), dtype),
            ],
            **common,
        )(m1k, m2k, pk_l, pk_r, pi[None], wk, gk)
        dpl = dpl_out[:, :K].reshape(M, K, A, A)
        dpr = dpr_out[:, :K].reshape(M, K, A, A)
    # the site-weights cotangent (needed only if someone differentiates
    # the weights, which training never does) stays OUTSIDE the custom
    # call as plain jnp so XLA dead-code-eliminates it -- in-kernel it
    # forced a per-(m, tile) transcendental log on every backward
    dw = _dw_ref(m1, m2, P_l, P_r, pi, g)
    # dpi_b = sum_{m,k,a} dP_l[m,k,a,b] P_l[m,k,a,b] / pi_b: the
    # s-independent P factors out of dP's site sum, so no kernel output
    # is needed (softmax stationaries are strictly positive)
    dpi = jnp.sum(dpl * P_l, axis=(0, 1, 2)) / pi
    return dm1[:K, :, :S], dm2[:K, :, :S], dpl, dpr, dpi, dw



@jax.custom_vjp
def pair_loglik(m1, m2, P_l, P_r, pi, weights):
    """Data log-likelihoods of M candidate merges per particle, with the
    XLA-fused forward and the streaming Pallas BACKWARD.

    Same contract as fused_pair_loglik: m1, m2 (K, A, S) scaled child
    messages shared across M; P_l, P_r (M, K, A, A); pi (A,);
    weights (S,); returns (M, K).  This is the production twist op:
    forward stays the single XLA fusion (fastest measured), backward
    runs _kernel_ll_bwd on TPU (one streaming pass instead of
    XLA's ~55-pass reverse fusion) and falls back to
    the jnp VJP elsewhere.
    """
    return _pair_ll_ref(m1, m2, P_l, P_r, pi, weights)


def _pair_loglik_fwd(m1, m2, P_l, P_r, pi, weights):
    return (_pair_ll_ref(m1, m2, P_l, P_r, pi, weights),
            (m1, m2, P_l, P_r, pi, weights))


# env knob for A/B probes: 0 forces XLA's VJP of the reference impl
# even on TPU (tools/perf_probe.py twist)
import os as _os

TWIST_BWD_KERNEL = _os.environ.get("PHYLO_TWIST_BWD_KERNEL", "1") == "1"
# v2 T-matrix backward kernel (_kernel_ll_bwd2, half the cross-lane
# reduces).  Measured SLOWER than the round-2 kernel despite the
# fewer reduces (betacorona K=32 M=10 step 552 vs 513 ms,
# tools/twist_probe3.py round 3 -- the ubar/vbar dm reorganization
# adds more VPU work than the saved reductions), so default OFF;
# 1 re-enables it for A/B probes.
TWIST_BWD_V2 = _os.environ.get("PHYLO_TWIST_BWD_V2", "0") == "1"
# M-in-program forward kernel (_kernel_ll_fwd2) for the opt-in
# use_pallas_ll path; 0 keeps the round-2 (ik, js, M)-grid kernel
TWIST_FWD_V2 = _os.environ.get("PHYLO_TWIST_FWD_V2", "1") == "1"


def _pair_loglik_bwd(res, g):
    if TWIST_BWD_KERNEL and (jax.default_backend() == "tpu" or INTERPRET):
        return _pair_ll_bwd_pallas(*res, g)
    _, vjp = jax.vjp(_pair_ll_ref, *res)
    return vjp(g)


pair_loglik.defvjp(_pair_loglik_fwd, _pair_loglik_bwd)


# ---------------------------------------------------------------------
# Fused per-rank sweep kernel (VERDICT r2 item 2): child GATHER
# (per-particle scalar-prefetch DMA straight from the unified
# write-once buffer) -> transition application -> Hadamard merge ->
# rescale -> root-loglik reduction -> in-place SCATTER of the merged
# column back into the buffer via input/output aliasing.  One
# pallas_call replaces the rank's gather / merge-kernel /
# dynamic_update_slice chain, so HBM sees the two child messages once
# (DMA read) and the merged message once (aliased block write) --
# the separate gather materialization (read+write) and the
# update-slice copy disappear.  Replaces the hot path at reference
# vcsmc.py:180-188,231-245.
#
# NO gradient rule: only the manual whole-sweep VJP path (sweep_vjp)
# may call this (its custom_vjp intercepts AD before it ever reaches
# the kernel); the XLA-AD sweep keeps the unfused ops.
# ---------------------------------------------------------------------

TKF = int(_os.environ.get("PHYLO_FUSED_RANK_TK", "32"))
FUSED_RANK = _os.environ.get("PHYLO_FUSED_RANK", "1") == "1"
# byte cap on the (R, K, 2, G*A, Sp) child-message residuals the
# manual-VJP forward saves for the DMA-free backward; above it the
# backward re-gathers by DMA.  Interleaved A/B at primate/K=2048
# (round 3): batch-256 residuals (184 MB) win 15.3 vs 15.6 ms/step,
# full-S residuals (738 MB) LOSE 24.4 vs 22.2 — the extra
# write+read traffic overtakes the re-gather latency — so the default
# admits minibatch-sized residuals only.
SAVE_CHILDREN_CAP = int(
    _os.environ.get("PHYLO_SAVE_CHILDREN_CAP", str(2 ** 28))
)
# Above this many unrolled multiply-add terms (G*A*A) the plane-
# unrolled VPU contraction blows the Mosaic unroll budget; the rank
# kernels switch to the MXU ("wide") bodies -- per-particle
# lax.dot_general contractions at f32-exact precision -- covering
# GY94 codons (A=61 -> 64 padded) and protein models (A=20, dense or
# G-blocked).  GammaSites G=4 x A=4 sits exactly AT the cap and keeps
# the tuned unrolled body.
WIDE_UNROLL_CAP = 64
# element budget tk*planes*Sp for the wide tile (see _rank_tile)
WIDE_RANK_CAP = int(_os.environ.get("PHYLO_WIDE_RANK_CAP", str(256 * 1024)))
# matmul precision inside the wide kernels: 'highest' = exact-f32
# multi-pass emulation (the merge contraction feeds log-likelihood
# sums over thousands of sites; bf16 rounding biases them by O(10) --
# see felsenstein.merge_messages).
_WIDE_DOT_PRECISION = _os.environ.get("PHYLO_WIDE_DOT_PRECISION", "highest")


def wide_rank_kernel(G, A):
    """True when the (G, A) block structure takes the MXU kernel
    bodies instead of the unrolled-VPU ones (shared gate for the sweep
    and the manual-VJP reverse pass so tile sizes agree)."""
    return G * A * A > WIDE_UNROLL_CAP


def _kernel_alloc(o_ref):
    # intentionally empty: the output is an UNINITIALIZED allocation
    pass


def alloc_rank_buffer(K, R, GA, Sp, dtype):
    """Uninitialized (K, R, GA, Sp) HBM allocation for the write-once
    internal-message buffer of the fused rank path.

    The sweep writes each rank's whole column before any later rank
    reads it (children are always nodes created at earlier ranks, and
    `_dma_gather_children` copies exact slabs -- no masked reads), so
    the 300+ MB zero-fill jnp.zeros pays (~520 us at primate/K=2048
    full-S, ~ the HBM write roofline) buys nothing.  A no-op
    pallas_call just allocates: measured 1121 -> 738 us on a
    write-one-column microbench.  CPU/non-TPU falls back to zeros
    (the reference path masks with where(), which would propagate
    NaN garbage)."""
    import jax

    if jax.default_backend() != "tpu" or INTERPRET:
        return jnp.zeros((K, R, GA, Sp), dtype)
    from jax.experimental import pallas as pl

    return pl.pallas_call(
        _kernel_alloc,
        out_shape=jax.ShapeDtypeStruct((K, R, GA, Sp), dtype),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
    )()


def _rank_tile(Sp, planes=4, wide=False):
    """Particles per program for the fused rank kernels, shrunk for
    long sequences so the (tk, planes, Sp)-sized VMEM blocks (2 scratch
    + 2 cotangent outputs + live intermediates in the backward) stay
    under the 16 MB scoped-vmem limit (DS1 Sp=2048 OOMed at tk=32).
    `planes` is the state dimension of the message blocks (G*A for
    block-structured models); the budget is bytes-equivalent to the
    original A=4 tuning point tk*Sp <= 32*1024.

    wide=True is the MXU-contraction regime (G*A*A > WIDE_UNROLL_CAP,
    codon A=61 / protein A=20): its backward keeps ~15 live
    (tk, planes, Sp) f32 buffers (pipelined in/out blocks are double-
    buffered + u/v/wp intermediates), so the element budget doubles
    per buffer but the floor drops to 1 (a tk=2 block at GA=64
    Sp=1152 is already 0.6 MB)."""
    tk = TKF
    cap = WIDE_RANK_CAP if wide else 4 * 32 * 1024
    floor = 1 if wide else 8
    while tk > floor and tk * planes * Sp > cap:
        tk //= 2
    return tk


def _dma_gather_children(idx_ref, leaves_hbm, buf_hbm, m1_s, m2_s,
                         sems, k0, N, tk):
    """Per-particle child fetch: leaves (node < N, shared (N, A, Sp)
    array -- no K-fold replication) or internal messages
    (buf[row, node - N]).  Each DMA moves one contiguous (A, Sp) slab;
    both sources have identical dest shape, so the wait descriptor is
    source-independent."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    waits = []
    for k in range(tk):
        for j, dst in ((0, m1_s), (1, m2_s)):
            node = idx_ref[2 * j + 1, k0 + k]
            row = idx_ref[2 * j, k0 + k]
            sem = sems.at[j, k]
            leaf_cp = pltpu.make_async_copy(
                leaves_hbm.at[jnp.minimum(node, N - 1)], dst.at[k], sem
            )
            int_cp = pltpu.make_async_copy(
                buf_hbm.at[row, jnp.maximum(node - N, 0)], dst.at[k], sem
            )

            @pl.when(node < N)
            def _(cp=leaf_cp):
                cp.start()

            @pl.when(node >= N)
            def _(cp=int_cp):
                cp.start()

            waits.append(int_cp)   # same dest/size either way
    for cp in waits:
        cp.wait()


def _kernel_rank(idx_ref, outc_ref, leaves_hbm, buf_hbm, pl_ref, pr_ref,
                 pi_ref, w_ref, bufo_ref, rootll_ref, logscale_ref,
                 *rest, A, N, tk, G=1, save=False):
    """Block-structured transitions (GammaSites, G > 1) share this body:
    messages carry G*A planes, P slabs are (tk, G*A*A) laid out (g, a,
    b), and the contraction only mixes states WITHIN a block (rate
    categories never mix along a branch).  G=1 is the dense case.

    save=True appends two (tk, G*A, Sp) outputs holding the gathered
    children verbatim -- residuals for the DMA-free backward
    (_kernel_rank_bwd_saved)."""
    from jax.experimental import pallas as pl

    if save:
        m1o_ref, m2o_ref, m1_s, m2_s, sems = rest
    else:
        m1_s, m2_s, sems = rest
    ik = pl.program_id(0)
    _dma_gather_children(idx_ref, leaves_hbm, buf_hbm, m1_s, m2_s,
                         sems, ik * tk, N, tk)
    if save:
        m1o_ref[:] = m1_s[:]
        m2o_ref[:] = m2_s[:]

    weights = w_ref[:]                                  # (1, Sp)
    w_planes = []
    for g in range(G):
        for b in range(A):
            u_b = None
            v_b = None
            for a in range(A):
                c = (g * A + a) * A + b
                pl_ab = pl_ref[:, c][:, None]           # (TKF, 1)
                pr_ab = pr_ref[:, c][:, None]
                tu = m1_s[:, g * A + a, :] * pl_ab
                tv = m2_s[:, g * A + a, :] * pr_ab
                u_b = tu if u_b is None else u_b + tu
                v_b = tv if v_b is None else v_b + tv
            w_planes.append(u_b * v_b)

    GA = G * A
    scale = w_planes[0]
    for p in range(1, GA):
        scale = jnp.maximum(scale, w_planes[p])
    scale = jnp.maximum(scale, jnp.finfo(scale.dtype).tiny)

    site_lik = None
    for p in range(GA):
        bufo_ref[:, 0, p, :] = w_planes[p] / scale
        term = w_planes[p] * pi_ref[0, p]
        site_lik = term if site_lik is None else site_lik + term

    rootll_ref[:] = jnp.sum(
        jnp.log(site_lik) * weights, axis=-1, keepdims=True
    )
    logscale_ref[:] = jnp.sum(
        jnp.log(scale) * weights, axis=-1, keepdims=True
    )


def _dot_planes(P_k, m_k, G, A, dims):
    """Per-particle contraction of (block) transitions against a
    states-major message on the MXU: P_k (G, A, A) [(A, A) when G=1],
    m_k (G*A, Sp) -> (G*A, Sp), one lax.dot_general per block.

    dims=((0,), (0,)) contracts P's row index (out[b,s] = sum_a
    P[a,b] m[a,s], the forward/transposed apply); ((1,), (0,))
    contracts the column index (out[a,s] = sum_b P[a,b] m[b,s], the
    backward dm apply)."""
    rows = []
    for g in range(G):
        Pg = P_k[g] if G > 1 else P_k
        mg = m_k[g * A:(g + 1) * A, :]
        rows.append(lax.dot_general(
            Pg, mg, (dims, ((), ())),
            preferred_element_type=Pg.dtype,
            precision=_WIDE_DOT_PRECISION,
        ))
    return rows[0] if G == 1 else jnp.concatenate(rows, axis=0)


def _kernel_rank_wide(idx_ref, outc_ref, leaves_hbm, buf_hbm, pl_ref,
                      pr_ref, pi_ref, w_ref, bufo_ref, rootll_ref,
                      logscale_ref, *rest, A, N, tk, G=1, save=False):
    """MXU variant of _kernel_rank for wide alphabets (G*A*A >
    WIDE_UNROLL_CAP): the A-contraction rides per-particle
    lax.dot_general (exact-f32 multi-pass) instead of the unrolled VPU
    multiply-add chain, and the plane arithmetic runs on whole
    (tk, G*A, Sp) arrays.  P blocks arrive UNflattened ((tk, A, A) or
    (tk, G, A, A)) and pi as a (G*A, 1) column."""
    from jax.experimental import pallas as pl

    if save:
        m1o_ref, m2o_ref, m1_s, m2_s, sems = rest
    else:
        m1_s, m2_s, sems = rest
    ik = pl.program_id(0)
    _dma_gather_children(idx_ref, leaves_hbm, buf_hbm, m1_s, m2_s,
                         sems, ik * tk, N, tk)
    if save:
        m1o_ref[:] = m1_s[:]
        m2o_ref[:] = m2_s[:]

    dims = ((0,), (0,))
    u = jnp.stack([_dot_planes(pl_ref[k], m1_s[k], G, A, dims)
                   for k in range(tk)])
    v = jnp.stack([_dot_planes(pr_ref[k], m2_s[k], G, A, dims)
                   for k in range(tk)])
    w = u * v                                       # (tk, GA, Sp)
    raw = jnp.max(w, axis=1)                        # (tk, Sp)
    scale = jnp.maximum(raw, jnp.finfo(w.dtype).tiny)
    bufo_ref[:, 0] = w / scale[:, None, :]
    site = jnp.sum(w * pi_ref[:][None], axis=1)     # (tk, Sp)

    weights = w_ref[:]                              # (1, Sp)
    # rootll/logscale ride FULL-ARRAY (K, 1) blocks (the wide tile tk
    # can drop below the 8-sublane minimum, so (tk, 1) blocks are not
    # lowerable); each program writes its own sublane slice
    sl = pl.ds(ik * tk, tk)
    rootll_ref[sl, :] = jnp.sum(jnp.log(site) * weights, axis=-1,
                                keepdims=True)
    logscale_ref[sl, :] = jnp.sum(jnp.log(scale) * weights, axis=-1,
                                  keepdims=True)


def _rank_bwd_core_wide(m1_s, m2_s, pl_ref, pr_ref, pi_ref, w_ref,
                        gm_ref, gr_ref, gl_ref, dm1_ref, dm2_ref,
                        dpl_ref, dpr_ref, dpi_ref, dw_ref, *, A, G=1):
    """MXU variant of _rank_bwd_core (same cotangent math, incl. the
    reduce_max split-among-ties routing and the maximum(raw, tiny)
    half-split): dm via P-apply dots, dP via S-deep dots."""
    from jax.experimental import pallas as pl

    ik = pl.program_id(0)
    w = w_ref[:]                                    # (1, Sp)
    dtype = w.dtype
    tk = dm1_ref.shape[0]
    m1 = m1_s[:]
    m2 = m2_s[:]
    dims = ((0,), (0,))
    u = jnp.stack([_dot_planes(pl_ref[k], m1[k], G, A, dims)
                   for k in range(tk)])
    v = jnp.stack([_dot_planes(pr_ref[k], m2[k], G, A, dims)
                   for k in range(tk)])
    wp = u * v                                      # (tk, GA, Sp)
    pi_b = pi_ref[:][None]                          # (1, GA, 1)
    site = jnp.sum(wp * pi_b, axis=1)               # (tk, Sp)
    raw = jnp.max(wp, axis=1)
    tiny = jnp.finfo(dtype).tiny
    scale = jnp.maximum(raw, tiny)

    gm = gm_ref[:]                                  # (tk, GA, Sp)
    # gr/gl arrive as FULL-ARRAY (K, 1) blocks (see _kernel_rank_wide)
    sl = pl.ds(ik * tk, tk)
    gr = gr_ref[sl, :]                              # (tk, 1)
    gl = gl_ref[sl, :]
    dsite = (gr * w) / site                         # (tk, Sp)
    inv = 1.0 / scale
    dscale = (gl * w) * inv - jnp.sum(gm * wp, axis=1) * (inv * inv)
    draw = dscale * (
        (raw > tiny).astype(dtype) + 0.5 * (raw == tiny).astype(dtype)
    )
    eq = (wp == raw[:, None, :]).astype(dtype)
    neq = jnp.sum(eq, axis=1)                       # (tk, Sp)
    dwp = (gm * inv[:, None, :] + dsite[:, None, :] * pi_b
           + draw[:, None, :] * eq / neq[:, None, :])
    du = dwp * v
    dv = dwp * u
    dims_bwd = ((1,), (0,))
    dims_s = (((1,), (1,)), ((), ()))
    for k in range(tk):
        dm1_ref[k] = _dot_planes(pl_ref[k], du[k], G, A, dims_bwd)
        dm2_ref[k] = _dot_planes(pr_ref[k], dv[k], G, A, dims_bwd)
        for g in range(G):
            sl = slice(g * A, (g + 1) * A)
            dPl_kg = lax.dot_general(
                m1[k, sl], du[k, sl], dims_s,
                preferred_element_type=dtype,
                precision=_WIDE_DOT_PRECISION,
            )
            dPr_kg = lax.dot_general(
                m2[k, sl], dv[k, sl], dims_s,
                preferred_element_type=dtype,
                precision=_WIDE_DOT_PRECISION,
            )
            if G > 1:
                dpl_ref[k, g] = dPl_kg
                dpr_ref[k, g] = dPr_kg
            else:
                dpl_ref[k] = dPl_kg
                dpr_ref[k] = dPr_kg

    @pl.when(ik == 0)
    def _():
        dpi_ref[:] = jnp.zeros_like(dpi_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dpi_ref[0, :] += jnp.sum(dsite[:, None, :] * wp, axis=(0, 2))
    dw_ref[0, :] += jnp.sum(
        gr * jnp.log(site) + gl * jnp.log(scale), axis=0
    )


def blockdiag_dense(P):
    """(..., G, A, A) block transitions -> dense (..., G*A, G*A) block-
    diagonal matrices.  Zero off-block entries make the dense merge
    contraction EXACTLY equal to the blocked one in f32 (x + 0*m == x
    for finite messages), so the dense reference impls double as parity
    oracles for the blocked kernels."""
    G, A = P.shape[-3], P.shape[-1]
    out = jnp.zeros(P.shape[:-3] + (G * A, G * A), P.dtype)
    for g in range(G):
        out = out.at[..., g * A:(g + 1) * A, g * A:(g + 1) * A].set(
            P[..., g, :, :]
        )
    return out


def _fused_rank_ref(leaves, buf, idx, outc, P_l, P_r, pi, weights,
                    save_children=False):
    """jnp reference of the fused rank update (CPU fallback + parity
    oracle for interpret-mode CI).  Same child resolution as
    _node_lookup's non-unified branch."""
    if P_l.ndim == 4:                  # blocked (K, G, A, A)
        P_l, P_r = blockdiag_dense(P_l), blockdiag_dense(P_r)
    N = leaves.shape[0]
    R = buf.shape[1]
    ms = []
    for j in range(2):
        node = idx[2 * j + 1]
        row = idx[2 * j]
        is_leaf = node < N
        leaf_part = leaves[jnp.clip(node, 0, N - 1)]
        int_part = buf[row, jnp.clip(node - N, 0, R - 1)]
        ms.append(jnp.where(is_leaf[:, None, None], leaf_part, int_part))
    merged, rootll, logscale = _ref_impl(ms[0], ms[1], P_l, P_r, pi,
                                         weights)
    zero = jnp.zeros((), outc.dtype)
    buf = lax.dynamic_update_slice(
        buf, merged[:, None], (zero, outc[0], zero, zero)
    )
    if save_children:
        return buf, rootll, logscale, ms[0], ms[1]
    return buf, rootll, logscale


def fused_rank_update(leaves, buf, idx, outc, P_l, P_r, pi, weights,
                      save_children=False):
    """One full rank update of the sweep, in place: child gather +
    transition application + merge + rescale + root-loglik reduction +
    merged-column scatter in ONE pallas_call.

    leaves: (N, A, Sp) shared leaf messages (NOT replicated across
    particles); buf: (K, R, A, Sp) write-once internal-message buffer
    (node N+q in column q); idx: (4, K) int32 [row1, node1, row2,
    node2] per-particle child coordinates (node < N reads
    leaves[node], else buf[row, node-N]); outc: (1,) int32 destination
    column (the rank r); P_l, P_r: (K, A, A); pi: (A,); weights: (Sp,).

    Returns (buf', rootll_raw (K,), d_lsc (K,)) with buf' = buf except
    column outc[0] = rescaled merged messages.  The buffer is ALIASED
    (callers must treat `buf` as consumed).  Requires K % TKF == 0 and
    Sp % TS == 0; the written column never appears among the gathered
    children (write-once ordering).  NEVER differentiate through this:
    manual-VJP / eval paths only (no AD rule).

    v1 of this kernel gathered from the K-replicated unified buffer
    over a (K-tile, site-tile) grid: the (A, ts) strided DMAs (4 rows x
    2 KB) ran at ~400 us/rank and the replicated buffer build cost a
    1.9 ms concatenate per sweep (xprof, tools/fwd_trace.py).  v2
    fetches contiguous (A, Sp) slabs and drops the replication
    entirely.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu" and not INTERPRET:
        return _fused_rank_ref(leaves, buf, idx, outc, P_l, P_r, pi,
                               weights, save_children=save_children)

    K, R, GA, Sp = buf.shape
    N = leaves.shape[0]
    G = P_l.shape[1] if P_l.ndim == 4 else 1   # blocked: (K, G, A, A)
    A = GA // G
    wide = wide_rank_kernel(G, A)
    tk = _rank_tile(Sp, GA, wide=wide)
    grid = (K // tk,)
    dtype = buf.dtype

    if wide:
        # MXU bodies take P blocks unflattened and pi as a column
        p_block = (tk,) + P_l.shape[1:]
        p_spec = pl.BlockSpec(
            p_block, lambda ik, idx, outc: (ik,) + (0,) * (len(p_block) - 1),
            memory_space=pltpu.VMEM,
        )
        pi_spec = pl.BlockSpec((GA, 1), lambda ik, idx, outc: (0, 0),
                               memory_space=pltpu.VMEM)
        p_l_arg, p_r_arg, pi_arg = P_l, P_r, pi[:, None]
        kernel = _kernel_rank_wide
    else:
        p_spec = pl.BlockSpec((tk, G * A * A),
                              lambda ik, idx, outc: (ik, 0),
                              memory_space=pltpu.VMEM)
        pi_spec = pl.BlockSpec((1, GA), lambda ik, idx, outc: (0, 0),
                               memory_space=pltpu.VMEM)
        p_l_arg = P_l.reshape(K, G * A * A)
        p_r_arg = P_r.reshape(K, G * A * A)
        pi_arg = pi[None]
        kernel = _kernel_rank

    if wide:
        # full-array (K, 1) accumulator blocks: the wide tile tk can
        # drop below the 8-sublane block minimum, so each program
        # writes its own sublane slice of a resident (K, 1) buffer
        acc_spec = pl.BlockSpec((K, 1), lambda ik, idx, outc: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        acc_spec = pl.BlockSpec((tk, 1), lambda ik, idx, outc: (ik, 0),
                                memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec(
            (tk, 1, GA, Sp),
            lambda ik, idx, outc: (ik, outc[0], 0, 0),
            memory_space=pltpu.VMEM,
        ),
        acc_spec,
        acc_spec,
    ]
    out_shape = [
        jax.ShapeDtypeStruct(buf.shape, dtype),
        jax.ShapeDtypeStruct((K, 1), dtype),
        jax.ShapeDtypeStruct((K, 1), dtype),
    ]
    if save_children:
        out_specs += [
            pl.BlockSpec((tk, GA, Sp), lambda ik, idx, outc: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, GA, Sp), lambda ik, idx, outc: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((K, GA, Sp), dtype),
            jax.ShapeDtypeStruct((K, GA, Sp), dtype),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            p_spec,
            p_spec,
            pi_spec,
            pl.BlockSpec((1, Sp), lambda ik, idx, outc: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((tk, GA, Sp), dtype),
            pltpu.VMEM((tk, GA, Sp), dtype),
            pltpu.SemaphoreType.DMA((2, tk)),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(kernel, A=A, N=N, tk=tk, G=G,
                          save=save_children),
        grid_spec=grid_spec,
        interpret=INTERPRET,
        out_shape=out_shape,
        input_output_aliases={3: 0},   # buf (after 2 scalar args + leaves)
    )(idx, outc, leaves, buf, p_l_arg, p_r_arg, pi_arg, weights[None])
    buf_out, rootll, logscale = outs[:3]
    if save_children:
        return (buf_out, rootll[:, 0], logscale[:, 0], outs[3], outs[4])
    return buf_out, rootll[:, 0], logscale[:, 0]


def _kernel_rank_bwd(idx_ref, leaves_hbm, buf_hbm, pl_ref, pr_ref,
                     pi_ref, w_ref, gm_ref, gr_ref, gl_ref,
                     dm1_ref, dm2_ref, dpl_ref, dpr_ref, dpi_ref,
                     dw_ref, m1_s, m2_s, sems, *, A, N, tk, G=1):
    """Fused reverse of one rank: DMA child re-gather + merge backward
    (same cotangent math as _kernel_merge_bwd, incl. reduce_max's
    split-among-ties routing and the maximum(raw, tiny) half-split).
    G > 1: block-structured transitions (see _kernel_rank)."""
    from jax.experimental import pallas as pl

    ik = pl.program_id(0)
    _dma_gather_children(idx_ref, leaves_hbm, buf_hbm, m1_s, m2_s,
                         sems, ik * tk, N, tk)
    _rank_bwd_core(m1_s, m2_s, pl_ref, pr_ref, pi_ref, w_ref, gm_ref,
                   gr_ref, gl_ref, dm1_ref, dm2_ref, dpl_ref, dpr_ref,
                   dpi_ref, dw_ref, A=A, G=G)


def _kernel_rank_bwd_saved(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref,
                           w_ref, gm_ref, gr_ref, gl_ref, dm1_ref,
                           dm2_ref, dpl_ref, dpr_ref, dpi_ref, dw_ref,
                           *, A, G=1):
    """Reverse of one rank reading the forward's SAVED child messages
    as pipelined VMEM blocks instead of re-gathering by DMA.  The
    per-particle DMA re-gather measured 56% of the backward kernel at
    primate/batch-256 shapes (2*K small-slab copies per rank are
    latency-bound, ~9x off the HBM roofline); streaming the saved
    (K, G*A, Sp) residuals is sequential traffic the pipeline
    prefetches for free."""
    _rank_bwd_core(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
                   gm_ref, gr_ref, gl_ref, dm1_ref, dm2_ref, dpl_ref,
                   dpr_ref, dpi_ref, dw_ref, A=A, G=G)


def _kernel_rank_bwd_wide(idx_ref, leaves_hbm, buf_hbm, pl_ref, pr_ref,
                          pi_ref, w_ref, gm_ref, gr_ref, gl_ref,
                          dm1_ref, dm2_ref, dpl_ref, dpr_ref, dpi_ref,
                          dw_ref, m1_s, m2_s, sems, *, A, N, tk, G=1):
    """MXU twin of _kernel_rank_bwd (DMA child re-gather + wide core)."""
    from jax.experimental import pallas as pl

    ik = pl.program_id(0)
    _dma_gather_children(idx_ref, leaves_hbm, buf_hbm, m1_s, m2_s,
                         sems, ik * tk, N, tk)
    _rank_bwd_core_wide(m1_s, m2_s, pl_ref, pr_ref, pi_ref, w_ref,
                        gm_ref, gr_ref, gl_ref, dm1_ref, dm2_ref,
                        dpl_ref, dpr_ref, dpi_ref, dw_ref, A=A, G=G)


def _kernel_rank_bwd_saved_wide(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref,
                                w_ref, gm_ref, gr_ref, gl_ref, dm1_ref,
                                dm2_ref, dpl_ref, dpr_ref, dpi_ref,
                                dw_ref, *, A, G=1):
    """MXU twin of _kernel_rank_bwd_saved (streamed saved children)."""
    _rank_bwd_core_wide(m1_ref, m2_ref, pl_ref, pr_ref, pi_ref, w_ref,
                        gm_ref, gr_ref, gl_ref, dm1_ref, dm2_ref,
                        dpl_ref, dpr_ref, dpi_ref, dw_ref, A=A, G=G)


def _rank_bwd_core(m1_s, m2_s, pl_ref, pr_ref, pi_ref, w_ref, gm_ref,
                   gr_ref, gl_ref, dm1_ref, dm2_ref, dpl_ref, dpr_ref,
                   dpi_ref, dw_ref, *, A, G=1):
    """Shared merge-backward math of the two reverse rank kernels."""
    from jax.experimental import pallas as pl

    ik = pl.program_id(0)
    w = w_ref[:]                                        # (1, Sp)
    dtype = w.dtype
    GA = G * A

    pl_c = [pl_ref[:, c][:, None] for c in range(G * A * A)]
    pr_c = [pr_ref[:, c][:, None] for c in range(G * A * A)]

    u = []
    v = []
    wp = []
    site = None
    for g in range(G):
        for b in range(A):
            u_b = None
            v_b = None
            for a in range(A):
                c = (g * A + a) * A + b
                tu = m1_s[:, g * A + a, :] * pl_c[c]
                tv = m2_s[:, g * A + a, :] * pr_c[c]
                u_b = tu if u_b is None else u_b + tu
                v_b = tv if v_b is None else v_b + tv
            p = g * A + b
            u.append(u_b)
            v.append(v_b)
            wp.append(u_b * v_b)
            term = wp[p] * pi_ref[0, p]
            site = term if site is None else site + term

    raw = wp[0]
    for p in range(1, GA):
        raw = jnp.maximum(raw, wp[p])
    tiny = jnp.finfo(dtype).tiny
    scale = jnp.maximum(raw, tiny)

    gr = gr_ref[:]                                      # (TKF, 1)
    gl = gl_ref[:]
    dsite = (gr * w) / site                             # (TKF, Sp)
    dscale = (gl * w) / scale
    inv_scale = 1.0 / scale
    for p in range(GA):
        dscale = dscale - gm_ref[:, p, :] * (
            wp[p] * inv_scale * inv_scale
        )
    draw = dscale * (
        (raw > tiny).astype(dtype) + 0.5 * (raw == tiny).astype(dtype)
    )
    neq = None
    eqs = []
    for p in range(GA):
        eq = (wp[p] == raw).astype(dtype)
        eqs.append(eq)
        neq = eq if neq is None else neq + eq

    dm1 = [None] * GA
    dm2 = [None] * GA
    cols_l = [None] * (G * A * A)
    cols_r = [None] * (G * A * A)
    dpi = []
    for g in range(G):
        for b in range(A):
            p = g * A + b
            dwp_b = (
                gm_ref[:, p, :] * inv_scale
                + dsite * pi_ref[0, p]
                + draw * (eqs[p] / neq)
            )
            du_b = dwp_b * v[p]
            dv_b = dwp_b * u[p]
            for a in range(A):
                c = (g * A + a) * A + b
                t1 = du_b * pl_c[c]
                t2 = dv_b * pr_c[c]
                pa = g * A + a
                dm1[pa] = t1 if dm1[pa] is None else dm1[pa] + t1
                dm2[pa] = t2 if dm2[pa] is None else dm2[pa] + t2
                cols_l[c] = jnp.sum(du_b * m1_s[:, pa, :], axis=-1)
                cols_r[c] = jnp.sum(dv_b * m2_s[:, pa, :], axis=-1)
            dpi.append(jnp.sum(dsite * wp[p]))
    for p in range(GA):
        dm1_ref[:, p, :] = dm1[p]
        dm2_ref[:, p, :] = dm2[p]
    dpl_ref[:] = jnp.stack(cols_l, axis=-1)             # (TKF, G*A*A)
    dpr_ref[:] = jnp.stack(cols_r, axis=-1)

    # dpi / dw accumulate across the (sequential) particle grid into a
    # single VMEM-resident (8, .) block (row 0 carries the value; the
    # 8-row shape satisfies the TPU block tiling rule)
    @pl.when(ik == 0)
    def _():
        dpi_ref[:] = jnp.zeros_like(dpi_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dpi_ref[0, :] += jnp.stack(dpi)
    # site-weight cotangent: rootll = sum_s w_s log(site), logscale =
    # sum_s w_s log(scale) -> dw_s = sum_k gr_k log(site) + gl_k
    # log(scale)
    dw_ref[0, :] += jnp.sum(
        gr * jnp.log(site) + gl * jnp.log(scale), axis=0
    )


def _fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl, P_l, P_r, pi,
                        weights):
    """jnp reference for interpret-mode CI: jax.vjp of the forward
    child-resolution + _ref_impl chain."""
    N = leaves.shape[0]
    R = buf.shape[1]

    def fwd(m1, m2, P_l, P_r, pi, weights):
        if P_l.ndim == 4:              # blocked: assemble inside the
            P_l = blockdiag_dense(P_l)   # vjp so cotangents come back
            P_r = blockdiag_dense(P_r)   # in (K, G, A, A) layout
        return _ref_impl(m1, m2, P_l, P_r, pi, weights)

    ms = []
    for j in range(2):
        node = idx[2 * j + 1]
        row = idx[2 * j]
        is_leaf = node < N
        leaf_part = leaves[jnp.clip(node, 0, N - 1)]
        int_part = buf[row, jnp.clip(node - N, 0, R - 1)]
        ms.append(jnp.where(is_leaf[:, None, None], leaf_part, int_part))
    _, vjp = jax.vjp(fwd, ms[0], ms[1], P_l, P_r, pi, weights)
    dm1, dm2, dPl, dPr, dpi, dw = vjp((gm, gr, gl))
    return dm1, dm2, dPl, dPr, dpi[None], dw[None]


def fused_rank_bwd(leaves, buf, idx, gm, gr, gl, P_l, P_r, pi, weights):
    """Reverse of one rank's merge in ONE pallas_call: re-gathers both
    children by DMA (same idx contract as fused_rank_update) and runs
    the streaming merge backward.

    gm: (K, A, Sp) merged-message cotangent (the pending column);
    gr, gl: (K,) rootll_raw / d_lsc cotangents.  Returns (dm1, dm2
    (K, A, Sp), dPl, dPr (K, A, A), dpi_part (nprog, A), dw_part
    (nprog, Sp)); the caller scatter-adds dm into pending/dleaves and
    sums the partials over programs.  The XLA-AD equivalent chain
    (gather + select + scattered reduce/mul fusions) measured ~18 ms
    per step at primate/K=2048 (tools/vjp_trace.py round 3)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu" and not INTERPRET:
        return _fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl, P_l,
                                   P_r, pi, weights)

    K, R, GA, Sp = buf.shape
    N = leaves.shape[0]
    G = P_l.shape[1] if P_l.ndim == 4 else 1   # blocked: (K, G, A, A)
    A = GA // G
    wide = wide_rank_kernel(G, A)
    tk = _rank_tile(Sp, GA, wide=wide)
    nprog = K // tk
    dtype = buf.dtype

    if wide:
        p_block = (tk,) + P_l.shape[1:]
        p_spec = pl.BlockSpec(
            p_block, lambda ik, idx: (ik,) + (0,) * (len(p_block) - 1),
            memory_space=pltpu.VMEM,
        )
        pi_spec = pl.BlockSpec((GA, 1), lambda ik, idx: (0, 0),
                               memory_space=pltpu.VMEM)
        p_l_arg, p_r_arg, pi_arg = P_l, P_r, pi[:, None]
        dp_shape = (K,) + P_l.shape[1:]
        kernel = _kernel_rank_bwd_wide
    else:
        p_spec = pl.BlockSpec((tk, G * A * A), lambda ik, idx: (ik, 0),
                              memory_space=pltpu.VMEM)
        pi_spec = pl.BlockSpec((1, GA), lambda ik, idx: (0, 0),
                               memory_space=pltpu.VMEM)
        p_l_arg = P_l.reshape(K, G * A * A)
        p_r_arg = P_r.reshape(K, G * A * A)
        pi_arg = pi[None]
        dp_shape = (K, G * A * A)
        kernel = _kernel_rank_bwd
    dp_spec = pl.BlockSpec(
        (tk,) + dp_shape[1:],
        lambda ik, idx: (ik,) + (0,) * (len(dp_shape) - 1),
        memory_space=pltpu.VMEM,
    )
    if wide:
        # full-array (K, 1) gr/gl blocks (wide tk may be < 8 sublanes)
        g_spec = pl.BlockSpec((K, 1), lambda ik, idx: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        g_spec = pl.BlockSpec((tk, 1), lambda ik, idx: (ik, 0),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            p_spec,
            p_spec,
            pi_spec,
            pl.BlockSpec((1, Sp), lambda ik, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, GA, Sp), lambda ik, idx: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            g_spec,
            g_spec,
        ],
        out_specs=[
            pl.BlockSpec((tk, GA, Sp), lambda ik, idx: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, GA, Sp), lambda ik, idx: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            dp_spec,
            dp_spec,
            pl.BlockSpec((8, GA), lambda ik, idx: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Sp), lambda ik, idx: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tk, GA, Sp), dtype),
            pltpu.VMEM((tk, GA, Sp), dtype),
            pltpu.SemaphoreType.DMA((2, tk)),
        ],
    )
    dm1, dm2, dpl, dpr, dpi, dw = pl.pallas_call(
        functools.partial(kernel, A=A, N=N, tk=tk, G=G),
        grid_spec=grid_spec,
        interpret=INTERPRET,
        out_shape=[
            jax.ShapeDtypeStruct((K, GA, Sp), dtype),
            jax.ShapeDtypeStruct((K, GA, Sp), dtype),
            jax.ShapeDtypeStruct(dp_shape, dtype),
            jax.ShapeDtypeStruct(dp_shape, dtype),
            jax.ShapeDtypeStruct((8, GA), dtype),
            jax.ShapeDtypeStruct((8, Sp), dtype),
        ],
    )(idx, leaves, buf, p_l_arg, p_r_arg, pi_arg, weights[None], gm,
      gr[:, None], gl[:, None])
    dpl = dpl.reshape((K,) + P_l.shape[1:])
    dpr = dpr.reshape((K,) + P_r.shape[1:])
    return dm1, dm2, dpl, dpr, dpi[:1], dw[:1]


def _fused_rank_bwd_saved_ref(m1, m2, gm, gr, gl, P_l, P_r, pi,
                              weights):
    """jnp reference for interpret-mode CI / CPU fallback of the
    saved-children backward."""
    def fwd(m1, m2, P_l, P_r, pi, weights):
        if P_l.ndim == 4:
            P_l = blockdiag_dense(P_l)
            P_r = blockdiag_dense(P_r)
        return _ref_impl(m1, m2, P_l, P_r, pi, weights)

    _, vjp = jax.vjp(fwd, m1, m2, P_l, P_r, pi, weights)
    dm1, dm2, dPl, dPr, dpi, dw = vjp((gm, gr, gl))
    return dm1, dm2, dPl, dPr, dpi[None], dw[None]


def fused_rank_bwd_saved(m1, m2, gm, gr, gl, P_l, P_r, pi, weights):
    """DMA-free reverse of one rank's merge: consumes the child
    messages SAVED by the forward kernel (fused_rank_update with
    save_children=True) as streaming VMEM blocks.

    Same outputs as fused_rank_bwd.  The re-gather variant spends 56%
    of its time on 2*K per-particle slab DMAs (latency-bound at small
    site counts -- /tmp ablation, round 3); here the residuals arrive
    via the grid pipeline's sequential prefetch instead."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if jax.default_backend() != "tpu" and not INTERPRET:
        return _fused_rank_bwd_saved_ref(m1, m2, gm, gr, gl, P_l, P_r,
                                         pi, weights)

    K, GA, Sp = m1.shape
    G = P_l.shape[1] if P_l.ndim == 4 else 1   # blocked: (K, G, A, A)
    A = GA // G
    wide = wide_rank_kernel(G, A)
    tk = _rank_tile(Sp, GA, wide=wide)
    nprog = K // tk
    dtype = m1.dtype

    if wide:
        p_block = (tk,) + P_l.shape[1:]
        p_spec = pl.BlockSpec(
            p_block, lambda ik: (ik,) + (0,) * (len(p_block) - 1),
            memory_space=pltpu.VMEM,
        )
        pi_spec = pl.BlockSpec((GA, 1), lambda ik: (0, 0),
                               memory_space=pltpu.VMEM)
        p_l_arg, p_r_arg, pi_arg = P_l, P_r, pi[:, None]
        dp_shape = (K,) + P_l.shape[1:]
        kernel = _kernel_rank_bwd_saved_wide
    else:
        p_spec = pl.BlockSpec((tk, G * A * A), lambda ik: (ik, 0),
                              memory_space=pltpu.VMEM)
        pi_spec = pl.BlockSpec((1, GA), lambda ik: (0, 0),
                               memory_space=pltpu.VMEM)
        p_l_arg = P_l.reshape(K, G * A * A)
        p_r_arg = P_r.reshape(K, G * A * A)
        pi_arg = pi[None]
        dp_shape = (K, G * A * A)
        kernel = _kernel_rank_bwd_saved
    dp_spec = pl.BlockSpec(
        (tk,) + dp_shape[1:],
        lambda ik: (ik,) + (0,) * (len(dp_shape) - 1),
        memory_space=pltpu.VMEM,
    )
    if wide:
        g_spec = pl.BlockSpec((K, 1), lambda ik: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        g_spec = pl.BlockSpec((tk, 1), lambda ik: (ik, 0),
                              memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((tk, GA, Sp), lambda ik: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, GA, Sp), lambda ik: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            p_spec,
            p_spec,
            pi_spec,
            pl.BlockSpec((1, Sp), lambda ik: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, GA, Sp), lambda ik: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            g_spec,
            g_spec,
        ],
        out_specs=[
            pl.BlockSpec((tk, GA, Sp), lambda ik: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, GA, Sp), lambda ik: (ik, 0, 0),
                         memory_space=pltpu.VMEM),
            dp_spec,
            dp_spec,
            pl.BlockSpec((8, GA), lambda ik: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Sp), lambda ik: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    dm1, dm2, dpl, dpr, dpi, dw = pl.pallas_call(
        functools.partial(kernel, A=A, G=G),
        grid_spec=grid_spec,
        interpret=INTERPRET,
        out_shape=[
            jax.ShapeDtypeStruct((K, GA, Sp), dtype),
            jax.ShapeDtypeStruct((K, GA, Sp), dtype),
            jax.ShapeDtypeStruct(dp_shape, dtype),
            jax.ShapeDtypeStruct(dp_shape, dtype),
            jax.ShapeDtypeStruct((8, GA), dtype),
            jax.ShapeDtypeStruct((8, Sp), dtype),
        ],
    )(m1, m2, p_l_arg, p_r_arg, pi_arg, weights[None], gm,
      gr[:, None], gl[:, None])
    dpl = dpl.reshape((K,) + P_l.shape[1:])
    dpr = dpr.reshape((K,) + P_r.shape[1:])
    return dm1, dm2, dpl, dpr, dpi[:1], dw[:1]


# ---------------------------------------------------------------------
# shard_map wrappers: fused rank kernels on site-sharded meshes
# ---------------------------------------------------------------------
# pallas_call has no partitioning rule, so under a mesh the partitioner
# would run these kernels fully replicated (each device computing the
# whole batch).  On a mesh that shards ONLY the site axis the kernels
# are legal per shard -- every particle row is device-local, so the
# cross-particle DMA re-gathers never leave the shard, and the only
# cross-site quantities (rootll / d_lsc / dP / dpi site-sums) are
# additive -- one psum over 's'.  Particle-sharded meshes ('k' > 1)
# CANNOT run them (buf[row, ...] may point at another device's shard);
# the sweep keeps the jnp path there and lets the partitioner insert
# the gathers.  check_vma=False everywhere: these wrappers sit on
# no-AD paths (the manual whole-sweep VJP intercepts differentiation),
# so the vma machinery buys nothing and pallas_call has no vma rule.

def site_sharded_mesh(shardings):
    """The mesh when it shards only the site axis (every non-'s' axis
    has size 1); None otherwise."""
    if shardings is None:
        return None
    mesh = shardings.mesh
    shape = dict(mesh.shape)
    if shape.get("s", 1) <= 1:
        return None
    if any(v != 1 for k, v in shape.items() if k != "s"):
        return None
    return mesh


def shard_alloc_rank_buffer(mesh, K, R, GA, Sp, dtype):
    """alloc_rank_buffer with each device allocating its own site
    shard (avoids materializing + resharding a replicated buffer)."""
    from jax.sharding import PartitionSpec as P

    ns = mesh.shape["s"]
    return jax.shard_map(
        lambda: alloc_rank_buffer(K, R, GA, Sp // ns, dtype),
        mesh=mesh, in_specs=(),
        out_specs=P(None, None, None, "s"), check_vma=False,
    )()


def shard_fused_rank_update(mesh, save_children=False):
    """fused_rank_update over an 's'-only mesh: per-shard kernel +
    psum of the site-summed scalars.  Same contract; rootll/d_lsc come
    back replicated."""
    from jax.sharding import PartitionSpec as P

    def body(leaves, buf, idx, outc, P_l, P_r, pi, weights):
        outs = fused_rank_update(leaves, buf, idx, outc, P_l, P_r, pi,
                                 weights, save_children=save_children)
        buf_o, rootll, d_lsc = outs[:3]
        rootll = jax.lax.psum(rootll, "s")
        d_lsc = jax.lax.psum(d_lsc, "s")
        return (buf_o, rootll, d_lsc) + tuple(outs[3:])

    in_specs = (P(None, None, "s"), P(None, None, None, "s"),
                P(), P(), P(), P(), P(), P("s"))
    out_specs = (P(None, None, None, "s"), P(), P())
    if save_children:
        out_specs += (P(None, None, "s"), P(None, None, "s"))
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def shard_fused_rank_bwd(mesh, saved=False):
    """fused_rank_bwd / fused_rank_bwd_saved over an 's'-only mesh:
    per-shard kernel + psum of the site-summed cotangents (dPl, dPr,
    dpi); dm1/dm2/dw stay site-sharded."""
    from jax.sharding import PartitionSpec as P

    def body(*args):
        fn = fused_rank_bwd_saved if saved else fused_rank_bwd
        dm1, dm2, dpl, dpr, dpi, dw = fn(*args)
        dpl = jax.lax.psum(dpl, "s")
        dpr = jax.lax.psum(dpr, "s")
        dpi = jax.lax.psum(dpi, "s")
        return dm1, dm2, dpl, dpr, dpi, dw

    sm3 = P(None, None, "s")
    if saved:
        # (m1, m2, gm, gr, gl, P_l, P_r, pi, weights)
        in_specs = (sm3, sm3, sm3, P(), P(), P(), P(), P(), P("s"))
    else:
        # (leaves, buf, idx, gm, gr, gl, P_l, P_r, pi, weights)
        in_specs = (sm3, P(None, None, None, "s"), P(), sm3, P(), P(),
                    P(), P(), P(), P("s"))
    out_specs = (sm3, sm3, P(), P(), P(), P(None, "s"))
    return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


# ---------------------------------------------------------------------
# k-sharded child exchange (VERDICT r4 weak item 2 / ROADMAP r5 item 2)
# ---------------------------------------------------------------------
# On a particle-sharded mesh ('k' > 1) the per-rank child fetch
# buf[row, node] crosses shards: after resampling, a particle's
# ancestor row can live on any device, so the fused DMA rank kernels
# cannot run (their gathers are device-local) and GSPMD's generic
# lowering of the jnp gather all-gathers operands.  These helpers
# replace that with the STRUCTURED minimal exchange:
#
#   gather:  every (row, node) pair exists on exactly one 'k' shard,
#            so each shard contributes its locally-resolved slabs
#            (masked to zero elsewhere) and ONE psum_scatter over 'k'
#            delivers each shard exactly its own particles' children
#            -- the same data volume the single-device DMA gather
#            moves, as one fused collective on ICI.
#   scatter: the reverse pass's pending[row, col] += dm transposes to
#            ONE all_gather over 'k' + a local masked scatter-add.
#
# With children explicit, the per-shard Pallas MERGE kernel
# (fused_merge_loglik) becomes legal on k-meshes -- see
# shard_merge_loglik.  The whole-rank DMA kernels stay
# single-device / 's'-mesh only (documented in the module header).


def kshard_mesh(shardings):
    """The mesh when the particle axis is sharded ('k' > 1); None
    otherwise."""
    if shardings is None:
        return None
    mesh = shardings.mesh
    if dict(mesh.shape).get("k", 1) <= 1:
        return None
    return mesh


def _sspec(mesh):
    return "s" if dict(mesh.shape).get("s", 1) > 1 else None


def shard_gather_pair(mesh):
    """Pair child fetch buf[brow, col] on a 'k'-sharded buffer as one
    structured exchange (see section comment).

    Call with GLOBAL-shape args: buf (K, C, GA, Sp) sharded
    P('k', None, None, 's'), brow / col (K, 2) replicated int32.
    Returns (K, 2, GA, Sp) sharded like buf.  Values are bit-identical
    to buf[brow, col] (each pair resolved on exactly one shard; the
    psum adds zeros elsewhere).
    """
    from jax.sharding import PartitionSpec as P

    ss = _sspec(mesh)

    def body(buf, brow, col):
        K_loc, C = buf.shape[0], buf.shape[1]
        k0 = jax.lax.axis_index("k") * K_loc
        rloc = jnp.clip(brow - k0, 0, K_loc - 1)        # (K, 2)
        mine = (brow >= k0) & (brow < k0 + K_loc)
        contrib = jnp.where(
            mine[..., None, None],
            buf[rloc, jnp.clip(col, 0, C - 1)],
            0.0,
        )                                               # (K, 2, GA, Sp_s)
        return jax.lax.psum_scatter(
            contrib, "k", scatter_dimension=0, tiled=True
        )

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("k", None, None, ss), P(), P()),
        out_specs=P("k", None, None, ss),
        check_vma=False,
    )


def shard_scatter_pair_add(mesh):
    """Transpose of shard_gather_pair: pending[brow, col] += dm across
    'k' shards.  dm (K, 2, GA, Sp) arrives k-sharded; one all_gather
    over 'k' exposes every cotangent to the shard owning its target
    row, which applies a local masked scatter-add.  col >= C drops the
    update (same sentinel contract as .at[].add(mode='drop'))."""
    from jax.sharding import PartitionSpec as P

    ss = _sspec(mesh)

    def body(pending, brow, col, dm):
        K_loc, C = pending.shape[0], pending.shape[1]
        k0 = jax.lax.axis_index("k") * K_loc
        dm_all = jax.lax.all_gather(dm, "k", axis=0, tiled=True)
        mine = (brow >= k0) & (brow < k0 + K_loc)
        rloc = jnp.where(mine, brow - k0, K_loc)        # OOB row drops
        return pending.at[rloc, col].add(dm_all, mode="drop")

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("k", None, None, ss), P(), P(),
                  P("k", None, None, ss)),
        out_specs=P("k", None, None, ss),
        check_vma=False,
    )


def shard_merge_loglik(mesh):
    """fused_merge_loglik per ('k', 's') shard: with children made
    explicit by shard_gather_pair, every particle row is device-local,
    so the merge kernel is legal per shard; the site-summed scalars
    psum over 's'.  Differentiating through this shard_map runs the
    op's custom VJP per shard and psums the replicated-operand (pi,
    weights-free) cotangents in the transpose -- the XLA-AD k-mesh
    path keeps exact gradient semantics."""
    from jax.sharding import PartitionSpec as P

    ss = _sspec(mesh)

    def body(m1, m2, P_l, P_r, pi, w):
        merged, rootll, d_lsc = fused_merge_loglik(m1, m2, P_l, P_r,
                                                   pi, w)
        if ss is not None:
            rootll = jax.lax.psum(rootll, "s")
            d_lsc = jax.lax.psum(d_lsc, "s")
        return merged, rootll, d_lsc

    sm = P("k", None, ss)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(sm, sm, P("k"), P("k"), P(), P(ss)),
        out_specs=(sm, P("k"), P("k")),
        check_vma=False,
    )
