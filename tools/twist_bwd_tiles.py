"""Tile-size sweep for the twist backward kernel (_kernel_ll_bwd) at
the primate one-chunk shape (M=10, CK=2112, A=4, S=1024).

Usage: python tools/twist_bwd_tiles.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.pruning import kernels

M, CK, A, S = 10, 2112, 4, 1024
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
m1 = jax.random.uniform(ks[0], (CK, A, S), jnp.float32, 0.1, 1.0)
m2 = jax.random.uniform(ks[1], (CK, A, S), jnp.float32, 0.1, 1.0)
Pl = jax.random.uniform(ks[2], (M, CK, A, A), jnp.float32, 0.1, 1.0)
Pr = jax.random.uniform(ks[3], (M, CK, A, A), jnp.float32, 0.1, 1.0)
pi = jnp.full((A,), 0.25, jnp.float32)
w = jnp.ones((S,), jnp.float32)
g = jax.random.normal(ks[4], (M, CK), jnp.float32)


def time_fn(fn, iters=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


ref = None
for tk, ts in [(128, 512), (128, 1024), (256, 512), (512, 512),
               (256, 1024)]:
    kernels._BWD_TK = tk
    kernels._BWD_TS = ts

    fn = jax.jit(
        lambda: kernels._pair_ll_bwd_pallas(m1, m2, Pl, Pr, pi, w, g)[:4]
    )
    try:
        t = time_fn(fn)
    except Exception as e:
        print(f"tk={tk} ts={ts}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        continue
    out = fn()
    if ref is None:
        ref = out
        err = 0.0
    else:
        err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(ref, out))
    print(f"tk={tk} ts={ts}: {t*1e3:.2f} ms  (max diff vs first "
          f"{err:.2e})", flush=True)
