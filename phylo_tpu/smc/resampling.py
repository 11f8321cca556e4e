"""Particle resampling strategies.

The reference uses multinomial resampling only (`tf.random.categorical`
over normalized log-weights, reference vcsmc.py:279-289).  We provide it
as the parity default plus the lower-variance systematic and stratified
schemes standard in the SMC literature, behind a strategy name.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

STRATEGIES = ("multinomial", "systematic", "stratified", "none")

# A/B knob: draw multinomial via iid-uniform inverse CDF (O(K log K))
# instead of the (K, K) Gumbel field (O(K^2)).  Same distribution,
# different random stream.
MULTINOMIAL_CDF = _os.environ.get("PHYLO_MULTINOMIAL_CDF", "0") == "1"

# PHYLO_RESAMPLE_KERNEL: "auto" (default) draws the multinomial with
# the hardware-PRNG Pallas kernel (smc.resample_kernel) on unsharded
# TPU f32 sweeps at K >= 1024 -- same Gumbel-max distribution, the
# (K, K) field synthesized and reduced entirely in VMEM; "1" forces,
# "0" keeps jax.random.categorical.  Validated on chip
# (tools/resample_kernel_check.py: 512x2048 draws, chi2 1817 on 2047
# dof, inside the same multinomial band as jax.random.categorical) and
# the in-situ A/B WINS everywhere (tools/resample_ab.py, v5e: primate
# K=2048 fwd 5.26 -> 4.16 ms, b256 step 15.1 -> 13.3 ms, DS1 b256
# step 40.0 -> 37.6 ms) -- unlike the two earlier challengers that
# lost in situ (see resample_indices' docstring).
_KERNEL_MODE = _os.environ.get("PHYLO_RESAMPLE_KERNEL", "auto")


def resample_indices(key, log_weights, strategy="multinomial"):
    """Ancestor indices (K,) for the given per-particle log weights.

    Multinomial keeps `jax.random.categorical` (the reference's
    distribution, vcsmc.py:285): its (K, K) Gumbel field looks
    expensive standalone (32 us vs 15 us for an inverse-CDF draw at
    K=2048) but pipelines better inside the rank scan -- switching to
    cumsum+searchsorted measured ~0.9 ms SLOWER per full sweep in situ
    (round 2), re-confirmed in the fused-rank-kernel regime (round 3:
    7.9 vs 6.6 ms primate fwd sweep with PHYLO_MULTINOMIAL_CDF=1).
    The lower-variance schemes invert the weight CDF with an unrolled
    binary search.
    """
    K = log_weights.shape[0]
    if strategy == "none":
        return jnp.arange(K)
    if strategy == "multinomial":
        if MULTINOMIAL_CDF:
            log_norm = log_weights - jnp.max(log_weights)
            cdf = jnp.cumsum(jnp.exp(log_norm))
            u = cdf[-1] * jax.random.uniform(key, (K,), dtype=cdf.dtype)
            idx = jnp.searchsorted(cdf, u, side="right",
                                   method="scan_unrolled")
            return jnp.minimum(idx, K - 1).astype(jnp.int32)
        log_norm = log_weights - jax.scipy.special.logsumexp(log_weights)
        use_kernel = (
            _KERNEL_MODE == "1"
            or (_KERNEL_MODE == "auto"
                and jax.default_backend() == "tpu"
                and K >= 1024)
        )
        if use_kernel:
            # under a sharded trace the partitioner runs this kernel
            # replicated (deterministic per-seed, identical on every
            # shard) -- the (K,) operand/result make that free
            from phylo_tpu.smc.resample_kernel import (
                categorical_pallas,
            )

            return categorical_pallas(
                key, log_norm.astype(jnp.float32))
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
