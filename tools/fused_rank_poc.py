"""Proof-of-concept for the fused per-rank kernel mechanics:

1. scalar-prefetch indices driving per-particle manual DMA gather from
   an un-blocked (ANY) HBM buffer,
2. a dynamic (scalar-prefetch) output column via out-spec index_map,
3. input_output_aliases writing the merged column IN PLACE while the
   rest of the buffer is preserved.

Run on the real chip: python tools/fused_rank_poc.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TKF = 8
A = 4


def kernel(idx_ref, outc_ref, buf_hbm, pi_ref, bufo_ref, acc_ref,
           m1_s, m2_s, sems, *, ts):
    ik = pl.program_id(0)
    js = pl.program_id(1)
    k0 = ik * TKF

    copies = []
    for k in range(TKF):
        r1 = idx_ref[0, k0 + k]
        c1 = idx_ref[1, k0 + k]
        r2 = idx_ref[2, k0 + k]
        c2 = idx_ref[3, k0 + k]
        cp1 = pltpu.make_async_copy(
            buf_hbm.at[r1, c1, :, pl.ds(js * ts, ts)],
            m1_s.at[k], sems.at[0, k],
        )
        cp2 = pltpu.make_async_copy(
            buf_hbm.at[r2, c2, :, pl.ds(js * ts, ts)],
            m2_s.at[k], sems.at[1, k],
        )
        cp1.start()
        cp2.start()
        copies.append((cp1, cp2))
    for cp1, cp2 in copies:
        cp1.wait()
        cp2.wait()

    acc_part = None
    for b in range(A):
        prod = m1_s[:, b, :] * m2_s[:, b, :]
        bufo_ref[:, 0, b, :] = prod
        t = prod * pi_ref[0, b]
        acc_part = t if acc_part is None else acc_part + t

    @pl.when(js == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.sum(acc_part, axis=-1, keepdims=True)


def fused(buf, idx, outc, pi):
    K, C, A_, Sp = buf.shape
    ts = 128
    grid = (K // TKF, Sp // ts)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, A_), lambda ik, js, idx, outc: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (TKF, 1, A_, ts),
                lambda ik, js, idx, outc: (ik, outc[0], 0, js),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((TKF, 1), lambda ik, js, idx, outc: (ik, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TKF, A_, ts), buf.dtype),
            pltpu.VMEM((TKF, A_, ts), buf.dtype),
            pltpu.SemaphoreType.DMA((2, TKF)),
        ],
    )
    return pl.pallas_call(
        functools.partial(kernel, ts=ts),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(buf.shape, buf.dtype),
            jax.ShapeDtypeStruct((K, 1), buf.dtype),
        ],
        input_output_aliases={2: 0},   # buf (after 2 scalar args) -> bufo
    )(idx, outc, buf, pi)


def main():
    K, C, Sp = 16, 6, 256
    key = jax.random.PRNGKey(0)
    buf = jax.random.uniform(key, (K, C, A, Sp), jnp.float32) + 0.5
    rows1 = jax.random.randint(jax.random.PRNGKey(1), (K,), 0, K)
    cols1 = jax.random.randint(jax.random.PRNGKey(2), (K,), 0, 3)
    rows2 = jax.random.randint(jax.random.PRNGKey(3), (K,), 0, K)
    cols2 = jax.random.randint(jax.random.PRNGKey(4), (K,), 0, 3)
    idx = jnp.stack([rows1, cols1, rows2, cols2]).astype(jnp.int32)
    outc = jnp.array([4], jnp.int32)
    pi = jnp.array([[0.1, 0.2, 0.3, 0.4]], jnp.float32)

    buf_out, acc = jax.jit(fused)(buf, idx, outc, pi)

    # reference
    m1 = buf[rows1, cols1]                 # (K, A, Sp)
    m2 = buf[rows2, cols2]
    prod = m1 * m2
    ref_buf = np.asarray(buf).copy()
    ref_buf[:, 4] = np.asarray(prod)
    ref_acc = np.sum(np.asarray(prod) * np.asarray(pi[0])[None, :, None],
                     axis=(1, 2))
    np.testing.assert_allclose(np.asarray(buf_out), ref_buf, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc[:, 0]), ref_acc, rtol=1e-5)
    print("POC OK: gather + dynamic out col + in-place alias all correct")

    # donation check: does jit reuse the buffer?
    f2 = jax.jit(fused, donate_argnums=(0,))
    b2 = jnp.asarray(buf)
    out2, _ = f2(b2, idx, outc, pi)
    np.testing.assert_allclose(np.asarray(out2), ref_buf, rtol=1e-6)
    print("donated call OK")


if __name__ == "__main__":
    main()
