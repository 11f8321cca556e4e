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

import jax
import jax.numpy as jnp

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


def _bwd(residuals, cotangents):
    _, vjp = jax.vjp(_ref_impl, *residuals)
    return vjp(cotangents)


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

    STATUS: exactly correct on TPU, but measured SLOWER than the XLA
    multiply-add path when vmapped over the twist pair chunk (the
    batching rule adds an outer grid dimension, exploding the program
    count at small K/M tiles); the twist module therefore uses the jnp
    path.  See ROADMAP.md: the winning shape folds pairs x M x K into
    the particle-tile axis of a single pallas_call.
    """
    return _pair_ll(m1, m2, P_l, P_r, pi, weights)


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
