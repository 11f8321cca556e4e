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
    """Ancestor indices (K,) for the given per-particle log weights."""
    K = log_weights.shape[0]
    if strategy == "none":
        return jnp.arange(K)
    log_norm = log_weights - jax.scipy.special.logsumexp(log_weights)
    if strategy == "multinomial":
        return jax.random.categorical(key, log_norm, shape=(K,))
    # inverse-CDF schemes
    cdf = jnp.cumsum(jnp.exp(log_norm))
    cdf = cdf / cdf[-1]
    if strategy == "systematic":
        u = (jax.random.uniform(key, (), dtype=cdf.dtype) + jnp.arange(K)) / K
    elif strategy == "stratified":
        u = (jax.random.uniform(key, (K,), dtype=cdf.dtype) + jnp.arange(K)) / K
    else:
        raise ValueError(f"unknown resampling strategy {strategy!r}")
    return jnp.searchsorted(cdf, u, side="left").astype(jnp.int32)
