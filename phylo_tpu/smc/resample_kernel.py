"""Pallas TPU kernel for multinomial resampling (Gumbel-max draw).

`jax.random.categorical` over K=2048 log-weights builds a (K, K)
Gumbel field with SOFTWARE threefry -- ~10 ops per word on the VPU for
4M words, plus the materialized field's HBM round trip.  This kernel
draws the same distribution with the TPU's HARDWARE PRNG entirely in
VMEM: each program seeds the on-core generator, synthesizes its (TR, K)
slice of the field, and reduces it to ancestor indices in-register.
Traffic drops to reading the (K,) logits and writing the (K,) indices.

Same multinomial distribution as the reference's tf.random.categorical
(/root/reference/vcsmc.py:279-289) and `smc.resampling`'s jax path --
Gumbel-max over iid uniforms -- but a DIFFERENT random stream, so
seeded trajectories differ draw-for-draw (still exchangeable).  Golden
parity paths inject decisions and never reach this kernel.

Indices are integers: no gradient flows through the draw (the sweep's
resampling VJP treats indices as constants, matching the reference),
so no custom VJP is needed.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp

INTERPRET = _os.environ.get("PHYLO_PALLAS_INTERPRET", "0") == "1"
TR = 256       # draws (rows) per program


def _kernel(seed_ref, logits_ref, out_ref, *, KL):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    # Mosaic accepts at most two seed words: mix the program id into
    # the first with a Weyl step so each program gets its own stream
    pltpu.prng_seed(
        seed_ref[0, 0] ^ (pl.program_id(0) * jnp.int32(-1640531527)),
        seed_ref[0, 1])
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((TR, KL)), jnp.uint32)
    # top 23 bits -> uniform strictly inside (0, 1): u = (n + 0.5)/2^23
    # (shift first so the value fits int32 -- Mosaic lowers int32->f32
    # but not uint32->f32)
    n = pltpu.bitcast(
        jax.lax.shift_right_logical(bits, jnp.uint32(9)),
        jnp.int32).astype(jnp.float32)
    u = (n + 0.5) * (1.0 / (1 << 23))
    g = -jnp.log(-jnp.log(u))
    scores = logits_ref[:] + g                         # (1,KL)+(TR,KL)
    m = jnp.max(scores, axis=1, keepdims=True)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (TR, KL), 1)
    idx = jnp.min(jnp.where(scores >= m, lanes, KL), axis=1)
    out_ref[:] = idx.astype(jnp.int32)[:, None]


def categorical_pallas(key, logits):
    """K iid draws from softmax(logits) -- drop-in for
    jax.random.categorical(key, logits, shape=(K,)) up to the stream.

    logits: (K,) float32.  Returns (K,) int32 in [0, K).
    """
    import jax.experimental.pallas as pl

    K = logits.shape[0]
    # ancestor indices are integers (no tangent) and the reference's
    # biased VSMC gradient treats them as constants, but under whole-
    # sweep XLA AD (e.g. large-K twist configs where the manual VJP
    # stands down) jax still JVP-traces this call -- and pallas_call
    # has no JVP rule (pl.program_id asserts outside a grid context).
    # stop_gradient makes the tangents symbolic zeros so AD skips the
    # kernel entirely; jax.random.categorical needs no such guard only
    # because its output is already integer-typed at the argmax.
    logits = jax.lax.stop_gradient(logits)
    KL = -(-K // 128) * 128                      # lane-pad categories
    Kp = -(-K // TR) * TR                        # row-pad draws
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    logits_p = jnp.pad(logits, (0, KL - K), constant_values=neg_inf)
    # fold the key into two 32-bit seed words (per-program streams add
    # program_id inside the kernel); keys may be typed (new-style) or
    # raw uint32 arrays (legacy PRNGKey)
    kd = (key if jnp.issubdtype(key.dtype, jnp.integer)
          else jax.random.key_data(key))
    kd = kd.reshape(-1)[:2]
    seed = jax.lax.bitcast_convert_type(
        kd.astype(jnp.uint32), jnp.int32).reshape(1, 2)

    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(_kernel, KL=KL),
        grid=(Kp // TR,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, KL), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TR, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Kp, 1), jnp.int32),
        interpret=INTERPRET,
    )(seed, logits_p[None])
    return out[:K, 0]
