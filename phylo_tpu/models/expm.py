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

import jax.numpy as jnp


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
    of any batch shape, via uniformized Taylor + static squaring.

    Returns (..., A, A).  Error is ~(x^{order+1}/(order+1)!) with
    x = mu*b/2^squarings; with the defaults this is far below f32 epsilon
    for b up to ~2000 with unit-rate generators.
    """
    Q = jnp.asarray(Q)
    b = jnp.asarray(b)
    A = Q.shape[-1]
    dtype = jnp.result_type(Q.dtype, b.dtype)
    Q = Q.astype(dtype)
    b = b.astype(dtype)

    mu = jnp.maximum(jnp.max(-jnp.diagonal(Q, axis1=-2, axis2=-1)), 1e-30)
    R = Q / mu + jnp.eye(A, dtype=dtype)

    # scaled jump count per batch element: x = mu * b / 2^s
    x = (mu * b) / (2.0 ** squarings)          # (...,)
    xs = x[..., None, None]

    # Horner evaluation of sum_{j<=order} (x R)^j / j!
    # T = I + xR/1 (I + xR/2 (I + ... ))
    T = jnp.eye(A, dtype=dtype) * jnp.ones_like(xs)
    for j in range(order, 0, -1):
        T = jnp.eye(A, dtype=dtype) + (xs / j) * _matmul(R, T)
    # fold in exp(-x): expm(Q t) at t = b/2^s
    P = jnp.exp(-x)[..., None, None] * T

    for _ in range(squarings):
        P = _matmul(P, P)
    return P


def _matmul(a, b):
    return jnp.matmul(a, b, preferred_element_type=a.dtype)
