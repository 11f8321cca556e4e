"""Batched matrix exponentials of CTMC rate matrices on TPU.

The reference computes P = expm(Q * b) with `tf.linalg.expm` batched over
particles (reference vcsmc.py:180-188) and `scipy.linalg.expm` in the
NumPy oracle (csmc.py:304-305).  General-purpose expm (Pade + norm-dependent
scaling) is a poor fit for XLA: the squaring count is data dependent and the
Pade solve wastes work for tiny A x A generators.

Rate matrices admit a better scheme: **uniformization**.  Any generator Q
(nonnegative off-diagonal, rows summing to <= 0) can be written

    Q = mu (R - I),   mu >= max_i |Q_ii|,   R = Q/mu + I  (entrywise >= 0)

so

    expm(Q b) = exp(-mu b) * expm(mu b R).

Since R is nonnegative the Taylor series of expm(mu b R) has only positive
terms -- no cancellation -- and with static scaling-and-squaring
(x = mu b / 2^s) the whole computation is a fixed chain of batched A x A
matmuls + elementwise ops: exactly what the MXU/VPU want, fully
differentiable, and identical across the batch so XLA vectorizes it.

The reference's learned Q is row-normalized so that off-diagonal rows sum
to 1 and the diagonal is exactly -1 (vcsmc.py:138-148) -- i.e. mu = 1 --
but we compute mu from the data so textbook GTR matrices work too.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

# PHYLO_EXPM_KERNEL: "auto" (default) routes eligible f32 TPU calls
# through the VMEM-resident Pallas chain (models.expm_kernel) whose
# Frechet-adjoint backward is ~2.2x faster than XLA AD of the jnp
# chain (982 vs 2143 us at the primate/K=2048 presample shape).
# In-situ fwd+bwd train-step A/B on the real chip (identical losses,
# gradients equal to ~1e-7 rel): primate/K=2048 fullS 21.4 -> 20.5 ms,
# b256 15.9 -> 15.1; DS1/K=2048 b256 42.0 -> 40.1; VNCSMC primate
# K=32 M=10 31.2 -> 27.4; betacorona K=32 M=10 247.7 -> 233.4.
# "1" forces it, "0" disables.
_KERNEL_MODE = _os.environ.get("PHYLO_EXPM_KERNEL", "auto")

# matmul emulation for the wide-alphabet (A > 8) expm chain; see
# _matmul below
_WIDE_PRECISION = _os.environ.get("PHYLO_EXPM_WIDE_PRECISION",
                                  "highest")

# PHYLO_EXPM_POISSON: "auto" (default) routes wide-alphabet (A > 8)
# shared-Q f32 TPU calls through expm_poisson -- the Poisson-weighted
# power-table form whose batched work is ONE dense MXU matmul instead
# of the 23 batched A x A matmuls of the delta chain.  The chain at
# A=20 is lane-padded 20 -> 128 by XLA, so it runs ~13x off its own
# roofline and dominated the protein train step (165 of 198 ms,
# tools/protein_trace.py round 5).  "1" forces it everywhere the shape
# allows, "0" disables.
_POISSON_MODE = _os.environ.get("PHYLO_EXPM_POISSON", "auto")
# batch cap for the Pallas expm kernel (see expm_ctmc's gate comment)
_KERNEL_BATCH_CAP = int(
    _os.environ.get("PHYLO_EXPM_KERNEL_BATCH_CAP", str(2 ** 20))
)

# Sharded traces: pallas_call has no partitioning rule of its own, so
# under a mesh the Shardy partitioner runs the kernel fully REPLICATED
# (each device computes the whole batch) -- correct, and no slower than
# one chip, but no speedup either.  The sweep's presample instead wraps
# the transition call in shard_map over the 'k' axis
# (smc.sweep._presample_transitions) so each shard runs this kernel on
# its local batch; everywhere else replicated execution is acceptable
# (the round-3 sticky process-wide stand-down gate is gone).


def jc69_transition(b, A=4):
    """Closed-form JC69 transition matrices, P(b) = expm(Q b).

    The reference JC69 generator has off-diagonal 1/A and diagonal
    -(A-1)/A (vcsmc.py:126-129), i.e. Q = J/A - I with J the all-ones
    matrix.  J/A is idempotent, so

        P(b) = e^{-b} I + (1 - e^{-b}) J / A.

    b: (...,) branch lengths; returns (..., A, A).
    """
    b = jnp.asarray(b)
    dtype = jnp.result_type(b.dtype, jnp.float32)
    eb = jnp.exp(-b)[..., None, None]
    eye = jnp.eye(A, dtype=dtype)
    ones = jnp.ones((A, A), dtype=dtype) / A
    return eb * eye + (1.0 - eb) * ones


def expm_ctmc(Q, b, *, order=12, squarings=12):
    """expm(Q * b) for a shared rate matrix Q (A, A) and branch lengths b
    of any batch shape, via uniformized Taylor + static squaring in
    **delta form**.

    Instead of squaring P_t = expm(Q t) directly -- whose off-diagonal
    increments (~mu b / 2^s, often 1e-7) are absorbed when added to the
    unit diagonal in float32 -- we track D = expm(x R) - I and square via

        (I + D)^2 = I + (2 D + D @ D)

    which keeps tiny entries in their own floating-point scale.  The
    final result is assembled once:

        expm(Q b) = e^{-mu b} (I + D_final)

    b is clamped so mu*b <= 80 (entries of (I+D)^{2^s} reach e^{mu b});
    beyond that P is the stationary projector to ~1e-30 anyway.

    Returns (..., A, A); accurate to ~f32 eps * squarings for any b,
    validated against scipy in tests (float64 path to ~1e-10).
    """
    Q = jnp.asarray(Q)
    b = jnp.asarray(b)
    A = Q.shape[-1]
    dtype = jnp.result_type(Q.dtype, b.dtype)
    use_kernel = (
        _KERNEL_MODE == "1"
        or (_KERNEL_MODE == "auto"
            and jax.default_backend() == "tpu"
            and dtype == jnp.float32
            # the kernel unrolls A^2 entry vectors (Mosaic budget) and
            # pads the batch to a 512-lane tile.  Above the batch cap
            # its custom-VJP residuals -- which PIERCE jax.checkpoint
            # (remat never recomputes across a custom_vjp boundary) --
            # dominate memory: the paper-scale twist (M = K = 1024)
            # OOMed HBM on 70 GB of kernel residuals stacked over the
            # rank scan.  Huge batches take expm_poisson instead:
            # plain jnp, so checkpoint rematerializes it freely.
            and Q.ndim == 2 and A <= 8
            and 2048 <= b.size <= _KERNEL_BATCH_CAP)
    )
    if use_kernel:
        from phylo_tpu.models.expm_kernel import expm_ctmc_pallas

        return expm_ctmc_pallas(
            Q.astype(dtype), b.astype(dtype), order, squarings)
    use_poisson = Q.ndim == 2 and (
        _POISSON_MODE == "1"
        or (_POISSON_MODE == "auto"
            and jax.default_backend() == "tpu"
            and dtype == jnp.float32
            and (A > 8 or b.size > _KERNEL_BATCH_CAP))
    )
    if use_poisson:
        return expm_poisson(Q.astype(dtype), b.astype(dtype))
    Q = Q.astype(dtype)
    b = b.astype(dtype)

    mu = jnp.maximum(jnp.max(-jnp.diagonal(Q, axis1=-2, axis2=-1)), 1e-30)
    R = Q / mu + jnp.eye(A, dtype=dtype)

    b_eff = jnp.minimum(b, 80.0 / mu)
    x = (mu * b_eff) / (2.0 ** squarings)      # (...,)
    xs = x[..., None, None]
    xR = xs * R                                 # (..., A, A)

    # S = sum_{j=1..order} (xR)^j / j!  via Horner on the delta:
    # S_m = xR/m;  S_{j} = (xR/j) (I + S_{j+1})
    eye = jnp.eye(A, dtype=dtype)
    S = xR / order
    for j in range(order - 1, 0, -1):
        S = _matmul(xR / j, eye + S)
    D = S
    for _ in range(squarings):
        D = 2.0 * D + _matmul(D, D)

    return jnp.exp(-mu * b_eff)[..., None, None] * (eye + D)


def _stirling_residuals(n_max):
    """c_n = lgamma(n+1) - (n ln n - n + 0.5 ln(2 pi n)), n = 1..n_max,
    as float64 host constants (~1/(12n), tiny)."""
    import math

    import numpy as np

    n = np.arange(1, n_max + 1, dtype=np.float64)
    lg = np.array([math.lgamma(v + 1.0) for v in n])
    return lg - (n * np.log(n) - n + 0.5 * np.log(2.0 * np.pi * n))


def expm_poisson(Q, b, *, n_max=160, clamp=80.0):
    """expm(Q * b) for a SHARED rate matrix Q (A, A) and batched b via
    the Poisson-weighted power table:

        expm(Q b) = sum_n  pois(n; mu b) R^n,   R = Q/mu + I

    The R^n table (n_max+1 tiny A x A matmuls, batch-free) is computed
    once; every batched transition is then ONE dense (B, n_max+1) @
    (n_max+1, A^2) MXU contraction.  The delta chain (expm_ctmc) runs
    23 *batched* A x A matmuls instead, and at A=20 XLA lane-pads each
    20-wide matrix to 128 -- measured 165 of the 198 ms protein train
    step (tools/protein_trace.py, round 5).  Traffic here is one
    (B, A, A) write + a (B, n_max) weight array: ~70x less.

    Weights are computed in log space with a Stirling-residual
    rearrangement that is f32-stable at mu b up to the clamp (the
    naive -t + n log t - lgamma(n+1) cancels ~700-magnitude terms):

        log w_n = n (log1p(d_n) - d_n) - 0.5 log(2 pi n) - c_n,
        d_n = (t - n)/n,  c_n = Stirling residual (host f64 constant)

    whose error is eps * |t - n| <= ~5e-6 in the log.  All terms are
    nonnegative (no cancellation in the sum), so the result is exactly
    nonnegative like the chain.  n_max=160 puts the Poisson tail at
    t = clamp = 80 below 1e-13 (Chernoff).  b with mu b < 1e-6 take
    the first-order branch I + b Q (error O(t^2) ~ 1e-12; also keeps
    the series gradients finite at t -> 0).
    """
    import numpy as np

    Q = jnp.asarray(Q)
    b = jnp.asarray(b)
    A = Q.shape[-1]
    dtype = jnp.result_type(Q.dtype, b.dtype)
    Q = Q.astype(dtype)
    b = b.astype(dtype)

    mu = jnp.maximum(jnp.max(-jnp.diagonal(Q)), 1e-30)
    eye = jnp.eye(A, dtype=dtype)
    R = Q / mu + eye

    # power table: R^0 .. R^n_max, (n_max+1, A, A)
    pows = [eye]
    for _ in range(n_max):
        pows.append(_matmul(pows[-1], R))
    table = jnp.stack(pows).reshape(n_max + 1, A * A)

    t = mu * jnp.minimum(b, clamp / mu)            # (...,)
    t_safe = jnp.maximum(t, 1e-6)[..., None]       # (..., 1)
    n = jnp.arange(1, n_max + 1, dtype=dtype)
    c_n = jnp.asarray(_stirling_residuals(n_max), dtype)
    d = (t_safe - n) / n
    # log(t/n) as log1p(d) only where it is accurate AND safe: in f32,
    # d rounds to exactly -1 when t/n < eps (log1p -> -inf, VJP ->
    # 1/(1+d) = inf -> NaN gradients); far from d=0 the direct log has
    # no cancellation anyway.  Double-where keeps both branch
    # gradients finite.
    small = jnp.abs(d) < 0.5
    d_safe = jnp.where(small, d, 0.0)
    log_ratio = jnp.where(small, jnp.log1p(d_safe),
                          jnp.log(t_safe / n))
    log_w = (n * (log_ratio - d)
             - 0.5 * jnp.log(2.0 * np.pi * n) - c_n)
    log_w = jnp.concatenate([-t_safe, log_w], axis=-1)   # n = 0 column
    w = jnp.exp(log_w)                             # (..., n_max+1)
    P = jnp.einsum("...n,nx->...x", w, table,
                   precision="highest").reshape(b.shape + (A, A))
    # tiny-t branch: first-order expm, exact gradients at t -> 0
    lin = eye + b[..., None, None] * Q
    return jnp.where((t < 1e-6)[..., None, None], lin, P)


def expm_reversible(Q, pi, b, *, clip=True, chain_fallback=True,
                    gap_tol=1e-5):
    """expm(Q^T b) for a REVERSIBLE generator via the classical
    spectral method (the route every ML phylogenetics package takes
    for GTR-class models, and the big lever for wide alphabets).

    Reversibility (pi_i Q_ij == pi_j Q_ji) makes
    S = diag(sqrt(pi)) Q diag(1/sqrt(pi)) symmetric, so

        expm(Q b)^T = diag(d) U diag(e^{w b}) U^T diag(1/d),
        (w, U) = eigh(S),  d = sqrt(pi)

    -- ONE A x A eigendecomposition per parameter value, then each
    batched transition is a single matmul + elementwise exp, versus
    the 23-matmul uniformized chain (models/expm.py expm_ctmc): at
    A=61 the chain is ~51% of the codon train step (ROADMAP r5 item
    1).  Gradients flow through jax's eigh VJP, whose eigenVECTOR
    cotangents divide by eigenvalue gaps -- fine for the generically
    distinct spectra of real substitution matrices, but a learnable
    pi/kappa/omega can drive the spectrum toward degeneracy (exactly
    degenerate for uniform exchangeabilities, the JC69 limit).

    chain_fallback=True (default) guards that edge: the RELATIVE
    minimum eigengap is probed with eigvalsh -- eigenVALUE
    derivatives involve no gap division, so the probe itself is
    VJP-safe -- and a `lax.cond` routes collapsed spectra
    (gap < gap_tol * max|w|) through the uniformized/Poisson chain
    (expm_ctmc(Q.T, b): Q.T is Metzler, so the positive-series
    argument holds; the non-spectral GY94 path already uses it).
    Both branches are compiled; the spectral one runs whenever the
    decomposition is well-conditioned.

    clip=True zeroes the tiny negative entries spectral
    reconstruction can produce near 0 (exact expm is nonnegative);
    standard practice.

    Returns expm(Q^T b) of shape b.shape + (A, A) -- the MERGE
    orientation (`message @ P`), matching GTR.transition.
    """
    Q = jnp.asarray(Q)
    b = jnp.asarray(b)
    dtype = jnp.result_type(Q.dtype, b.dtype)
    Q = Q.astype(dtype)
    pi = jnp.asarray(pi, dtype)
    d = jnp.sqrt(jnp.maximum(pi, 1e-30))
    S = Q * (d[:, None] / d[None, :])
    S = (S + S.T) / 2          # exact symmetry for eigh

    def spectral(Q, pi, b, S):
        w, U = jnp.linalg.eigh(S)
        E = jnp.exp(w * b[..., None])                     # (..., A)
        left = (U * d[:, None]) * E[..., None, :]         # (..., A, A)
        right = (U / d[:, None]).T
        # PT[..., i, j] = sum_k d_i U_ik e^{w_k b} U_jk / d_j
        PT = jnp.einsum("...ik,kj->...ij", left, right,
                        precision="highest")
        if clip:
            PT = jnp.maximum(PT, 0.0)
        return PT

    if not chain_fallback:
        return spectral(Q, pi, b, S)

    from jax import lax

    w_probe = jnp.linalg.eigvalsh(S)
    scale = jnp.maximum(jnp.max(jnp.abs(w_probe)), 1e-30)
    gap = jnp.min(jnp.diff(w_probe)) / scale
    return lax.cond(
        gap < gap_tol,
        lambda: expm_ctmc(Q.T, b),
        lambda: spectral(Q, pi, b, S),
    )


def _matmul(a, b):
    # Explicit broadcast-multiply-add instead of dot_general: the A x A
    # factors are tiny (4-7 wide), and on TPU a dot_general either
    # rounds inputs to bfloat16 (whose epsilon ~8e-3 swallows the
    # I + (x/j) R increments of the scaled Taylor series) or, with
    # precision='highest', pays a 6-pass emulation that is ~50x slower
    # than these native-f32 VPU ops.
    #
    # Wide alphabets (protein A=20, codon A=61) invert the trade: the
    # broadcast form materializes an (..., A, A, A) intermediate
    # (227k floats per batch element at A=61), while the MXU einsum is
    # linear in A^2 memory -- switch over.  PHYLO_EXPM_WIDE_PRECISION
    # picks the emulation: 'highest' (6-pass, exact f32) or 'high'
    # (3-pass bf16x3, ~f32-accurate) -- A/B'd on chip, see ROADMAP.
    if a.shape[-1] > 8:
        return jnp.einsum("...ab,...bc->...ac", a, b,
                          precision=_WIDE_PRECISION)
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)
