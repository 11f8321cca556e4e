"""Microbenchmark of the merge-op backward at sweep shapes.

Compares XLA's VJP of the reference impl vs the streaming Pallas
kernel (and tile variants) at (K=2048, A=4, Sp=1024) x 11 ranks.
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

K, A, Sp, R = 2048, 4, 1024, 11
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
m1 = jax.random.uniform(ks[0], (K, A, Sp), jnp.float32, 0.1, 1.0)
m2 = jax.random.uniform(ks[1], (K, A, Sp), jnp.float32, 0.1, 1.0)
Pl = jax.random.uniform(ks[2], (K, A, A), jnp.float32, 0.1, 1.0)
Pr = jax.random.uniform(ks[3], (K, A, A), jnp.float32, 0.1, 1.0)
pi = jnp.full((A,), 0.25, jnp.float32)
w = jnp.ones((Sp,), jnp.float32)
gm = jax.random.normal(ks[4], (K, A, Sp), jnp.float32)
gr = jax.random.normal(ks[5], (K,), jnp.float32)
gl = jax.random.normal(ks[6], (K,), jnp.float32)


def time_fn(fn, iters=30):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


# distinct inputs per rank so XLA cannot CSE the 11 calls into one
m1s = [m1 * (1.0 + r * 1e-6) for r in range(R)]
m2s = [m2 * (1.0 + r * 1e-6) for r in range(R)]
gms = [gm * (1.0 + r * 1e-6) for r in range(R)]


@jax.jit
def xla_chain():
    outs = []
    for r in range(R):
        _, vjp = jax.vjp(kernels._ref_impl, m1s[r], m2s[r], Pl, Pr, pi, w)
        outs.append(vjp((gms[r], gr, gl))[:4])
    return outs


@jax.jit
def pallas_chain():
    outs = []
    for r in range(R):
        outs.append(
            kernels._merge_bwd_pallas(
                m1s[r], m2s[r], Pl, Pr, pi, w, gms[r], gr, gl
            )[:4]
        )
    return outs


t = time_fn(xla_chain)
print(f"xla vjp chain x{R}: {t*1e3:.2f} ms ({t/R*1e3:.3f} ms/rank)")
t = time_fn(pallas_chain)
print(f"pallas bwd  x{R}: {t*1e3:.2f} ms ({t/R*1e3:.3f} ms/rank)")

# exactness
o1 = jax.jit(lambda: jax.vjp(kernels._ref_impl, m1, m2, Pl, Pr, pi, w)[1]((gm, gr, gl)))()
o2 = jax.jit(lambda: kernels._merge_bwd_pallas(m1, m2, Pl, Pr, pi, w, gm, gr, gl))()
import numpy as np
for a, b, name in zip(o1, o2, ["dm1", "dm2", "dPl", "dPr", "dpi", "dw"]):
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"  {name}: max abs diff {d:.3e}")
