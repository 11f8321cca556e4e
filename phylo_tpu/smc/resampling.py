"""Particle resampling strategies.

The reference uses multinomial resampling only (`tf.random.categorical`
over normalized log-weights, reference vcsmc.py:279-289).  We provide it
as the parity default plus the lower-variance systematic and stratified
schemes standard in the SMC literature, behind a strategy name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STRATEGIES = ("multinomial", "systematic", "stratified", "none")


def resample_indices(key, log_weights, strategy="multinomial"):
    """Ancestor indices (K,) for the given per-particle log weights.

    Multinomial keeps `jax.random.categorical` (the reference's
    distribution, vcsmc.py:285): its (K, K) Gumbel field looks
    expensive standalone (32 us vs 15 us for an inverse-CDF draw at
    K=2048) but pipelines better inside the rank scan -- switching to
    cumsum+searchsorted measured ~0.9 ms SLOWER per full sweep in situ.
    The lower-variance schemes invert the weight CDF with an unrolled
    binary search.
    """
    K = log_weights.shape[0]
    if strategy == "none":
        return jnp.arange(K)
    if strategy == "multinomial":
        log_norm = log_weights - jax.scipy.special.logsumexp(log_weights)
        return jax.random.categorical(key, log_norm, shape=(K,))
    log_norm = log_weights - jnp.max(log_weights)
    cdf = jnp.cumsum(jnp.exp(log_norm))
    cdf = cdf / cdf[-1]
    if strategy == "systematic":
        u = (jax.random.uniform(key, (), dtype=cdf.dtype) + jnp.arange(K)) / K
    elif strategy == "stratified":
        u = (jax.random.uniform(key, (K,), dtype=cdf.dtype) + jnp.arange(K)) / K
    else:
        raise ValueError(f"unknown resampling strategy {strategy!r}")
    idx = jnp.searchsorted(cdf, u, side="right", method="scan_unrolled")
    # side='right' can return K when a stratum's uniform rounds up to
    # exactly 1.0 in f32 (u = (u0 + K-1)/K with u0 -> 1); clamp so the
    # top particle, not an OOB index, is drawn
    return jnp.minimum(idx, K - 1).astype(jnp.int32)
