"""Pallas TPU kernel for the uniformized-expm chain of `models.expm`.

The jnp chain (expm.expm_ctmc) is HBM-roofline-bound, not compute
bound: its 23 chained Taylor/squaring iterations each materialize
(B, A, A) arrays -- ~200 MB of traffic ~ 265 us per presample at
primate/K=2048 (xprof, round 3; a batch-last relayout measured WORSE,
see ROADMAP).  This kernel keeps the whole chain's state in VMEM as
A x A grids of (1, tb) lane vectors: traffic drops to reading the
scaled branch lengths once and writing P once.

Backward uses the Frechet-adjoint identity  L*(M, W) = L(M^T, W)
(Higham, "Functions of Matrices", thm. 10.x family): the cotangents of
the TRUE matrix exponential, not AD of the numerical scheme,

    b_bar = <P_bar, Q P>                    (clamp-masked)
    Q_bar = sum_i b_eff_i L((Q b_i)^T, P_bar_i)

with L evaluated by the SAME uniformized delta chain on the implicit
block matrix [[x R^T, P_bar / 2^s], [0, x R^T]], carried as a (T, F)
pair -- three A x A entry-products per iteration instead of one.

Replaces the role of tf.linalg.expm + its AD in the reference
(/root/reference/vcsmc.py:180-188).  Gradient caveat: in the clamp
region b > 80/mu (saturated branches, P ~ the stationary projector)
the Q_bar contribution through d(b_eff)/dQ is dropped; the jnp chain's
AD differentiates the clamp exactly, so CPU/x64 paths are unchanged.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp

INTERPRET = _os.environ.get("PHYLO_PALLAS_INTERPRET", "0") == "1"
TB = 512          # batch elements per program (B is padded up to this)


def _mm(a, b, A):
    """Entry-grid matmul: a, b are A x A nested lists of (1, tb)
    vectors; explicit multiply-add (exact f32 on the VPU)."""
    out = []
    for i in range(A):
        row = []
        for j in range(A):
            acc = a[i][0] * b[0][j]
            for m in range(1, A):
                acc = acc + a[i][m] * b[m][j]
            row.append(acc)
        out.append(row)
    return out


def _add_eye(S, A):
    return [[S[i][j] + (1.0 if i == j else 0.0) for j in range(A)]
            for i in range(A)]


def _expm_fwd_kernel(x_ref, s_ref, R_ref, out_ref, *, A, order,
                     squarings):
    """P = e^{-mu b} (I + D) for one (1, tb) slice of the batch; the
    entire Horner + squaring chain lives in VMEM registers."""
    x = x_ref[:]                              # (1, tb)
    xR = [[R_ref[i, j] * x for j in range(A)] for i in range(A)]

    S = [[xR[i][j] / order for j in range(A)] for i in range(A)]
    for j in range(order - 1, 0, -1):
        xRj = [[xR[i][m] / j for m in range(A)] for i in range(A)]
        S = _mm(xRj, _add_eye(S, A), A)
    D = S
    for _ in range(squarings):
        DD = _mm(D, D, A)
        D = [[2.0 * D[i][j] + DD[i][j] for j in range(A)]
             for i in range(A)]

    s = s_ref[:]                              # (1, tb) e^{-mu b_eff}
    rows = [s * (D[i][j] + (1.0 if i == j else 0.0))
            for i in range(A) for j in range(A)]
    out_ref[:] = jnp.concatenate(rows, axis=0)


def _expm_bwd_kernel(x_ref, w_ref, g_ref, R_ref, qp_ref, *, A, order,
                     squarings):
    """Per-program partial Q_bar via the block-pair Frechet chain.

    Carries (T, F) for the implicit [[T, F], [0, T]] block matrix with
    T = x R^T and F = P_bar / 2^s; the pair product is
    (T1 T2, T1 F2 + F1 T2).  w = b_eff * e^{-mu b_eff} folds the final
    scale and the outer b_eff weight into one vector."""
    x = x_ref[:]                              # (1, tb)
    inv = 1.0 / (2.0 ** squarings)
    # T-part reads R transposed: the chain runs at (Q b)^T
    xT = [[R_ref[j, i] * x for j in range(A)] for i in range(A)]
    g = g_ref[:]                              # (A*A, tb)
    E = [[g[i * A + j][None] * inv for j in range(A)]
         for i in range(A)]

    ST = [[xT[i][j] / order for j in range(A)] for i in range(A)]
    SF = [[E[i][j] / order for j in range(A)] for i in range(A)]
    for j in range(order - 1, 0, -1):
        xTj = [[xT[i][m] / j for m in range(A)] for i in range(A)]
        Ej = [[E[i][m] / j for m in range(A)] for i in range(A)]
        IT = _add_eye(ST, A)
        SF = [[a + b for a, b in zip(ra, rb)]
              for ra, rb in zip(_mm(xTj, SF, A), _mm(Ej, IT, A))]
        ST = _mm(xTj, IT, A)
    DT, DF = ST, SF
    for _ in range(squarings):
        TT = _mm(DT, DT, A)
        TF = _mm(DT, DF, A)
        FT = _mm(DF, DT, A)
        DF = [[2.0 * DF[i][j] + TF[i][j] + FT[i][j] for j in range(A)]
              for i in range(A)]
        DT = [[2.0 * DT[i][j] + TT[i][j] for j in range(A)]
              for i in range(A)]

    # emit the per-element weighted Frechet field; the (A*A,)-wide
    # final reduce runs in XLA (a 2.9 MB sum beats 16 cross-lane
    # in-kernel reduces per program, and (A*A, tb) is a legal tile)
    w = w_ref[:]                              # (1, tb)
    rows = [w * DF[i][j] for i in range(A) for j in range(A)]
    qp_ref[:] = jnp.concatenate(rows, axis=0)


def _pad(v, Bp):
    return jnp.pad(v, (0, Bp - v.shape[0]))


def _fwd_impl(Q, b_eff, mu, R, order, squarings):
    from jax.experimental import pallas as pl

    A = Q.shape[-1]
    B = b_eff.size
    Bp = -(-B // TB) * TB
    x = _pad((mu * b_eff).reshape(-1) / (2.0 ** squarings), Bp)
    scale = _pad(jnp.exp(-mu * b_eff).reshape(-1), Bp)

    out = pl.pallas_call(
        functools.partial(_expm_fwd_kernel, A=A, order=order,
                          squarings=squarings),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((A, A), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((A * A, TB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((A * A, Bp), x.dtype),
        interpret=INTERPRET,
    )(x[None], scale[None], R)
    P = jnp.moveaxis(out[:, :B], 0, 1).reshape(
        b_eff.shape + (A, A))
    return P


def _bwd_impl(Q, b_eff, mu, R, gbar, order, squarings):
    from jax.experimental import pallas as pl

    A = Q.shape[-1]
    B = b_eff.size
    Bp = -(-B // TB) * TB
    x = _pad((mu * b_eff).reshape(-1) / (2.0 ** squarings), Bp)
    w = _pad((b_eff * jnp.exp(-mu * b_eff)).reshape(-1), Bp)
    g = jnp.pad(jnp.moveaxis(gbar.reshape(-1, A, A), 0, -1)
                .reshape(A * A, B), ((0, 0), (0, Bp - B)))

    qparts = pl.pallas_call(
        functools.partial(_expm_bwd_kernel, A=A, order=order,
                          squarings=squarings),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((1, TB), lambda i: (0, i)),
            pl.BlockSpec((A * A, TB), lambda i: (0, i)),
            pl.BlockSpec((A, A), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((A * A, TB), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((A * A, Bp), x.dtype),
        interpret=INTERPRET,
    )(x[None], w[None], g, R)
    return jnp.sum(qparts, axis=1).reshape(A, A)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def expm_ctmc_pallas(Q, b, order=12, squarings=12):
    """Drop-in for expm.expm_ctmc on the TPU f32 path (same
    uniformized delta-form math, VMEM-resident)."""
    P, _ = _expm_fwd(Q, b, order, squarings)
    return P


def _prep(Q, b):
    A = Q.shape[-1]
    mu = jnp.maximum(
        jnp.max(-jnp.diagonal(Q, axis1=-2, axis2=-1)), 1e-30)
    R = Q / mu + jnp.eye(A, dtype=Q.dtype)
    b_eff = jnp.minimum(b, 80.0 / mu)
    return mu, R, b_eff


def _expm_fwd(Q, b, order, squarings):
    mu, R, b_eff = _prep(Q, b)
    P = _fwd_impl(Q, b_eff, mu, R, order, squarings)
    return P, (Q, b, P)


def _expm_bwd(order, squarings, res, gbar):
    Q, b, P = res
    A = Q.shape[-1]
    mu, R, b_eff = _prep(Q, b)
    # b_bar = <P_bar, Q P> = sum_{jk} P_bar[j,k] (QP)[j,k], zeroed in
    # the clamp region (d b_eff / d b = 0 there); broadcast
    # multiply-add, no dot_general (bf16 rounding)
    QP = jnp.sum(Q[:, :, None] * P[..., None, :, :], axis=-2)
    bbar = jnp.sum(gbar * QP, axis=(-2, -1))
    bbar = jnp.where(b <= 80.0 / mu, bbar, 0.0).astype(b.dtype)
    qbar = _bwd_impl(Q, b_eff, mu, R, gbar, order, squarings)
    return qbar.astype(Q.dtype), bbar


expm_ctmc_pallas.defvjp(_expm_fwd, _expm_bwd)
