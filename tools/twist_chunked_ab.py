"""A/B: chunked unrolled-rank twist mode vs the scanned enumeration at
betacorona scale (real TPU).

The scanned path pads every rank to the full C(N,2) chunk grid and
lax.cond-skips invalid chunks; the chunked unrolled mode
(TwistConfig.unroll_chunked_max_ranks) evaluates exactly
ceil(C(N-r,2)/C) statically-shaped chunks per rank with no cond and no
masking.  Trajectories differ (prefix vs lexicographic categorical
logit order), so compare times and check the ELBOs are same-scale.

Run on TPU: python tools/twist_chunked_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.dataio import load_dataset
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.smc.twist import TwistConfig


def time_fn(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def measure(ds_name, K, tw, tag):
    ds = load_dataset(ds_name)
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds.N, dtype=jnp.float32),
    }
    leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
    cfg = SweepConfig(K=K, twist=tw)

    t0 = time.time()
    fwd = jax.jit(
        lambda key, p: sample_phylogenies(key, leaves, model, p, cfg).elbo
    )
    e = float(fwd(jax.random.PRNGKey(0), params))
    print(f"{ds_name} K={K} [{tag}]: fwd compile+1 {time.time()-t0:.1f} s",
          flush=True)
    t = time_fn(fwd, jax.random.PRNGKey(0), params)
    print(f"{ds_name} K={K} [{tag}]: fwd {t*1e3:.2f} ms  elbo {e:.2f}",
          flush=True)

    def loss(p, key):
        return -sample_phylogenies(key, leaves, model, p, cfg).elbo

    t0 = time.time()
    step = jax.jit(jax.value_and_grad(loss))
    v, g = step(params, jax.random.PRNGKey(0))
    jax.block_until_ready(g)
    print(f"{ds_name} K={K} [{tag}]: step compile+1 {time.time()-t0:.1f} s",
          flush=True)
    t = time_fn(step, params, jax.random.PRNGKey(0))
    gsum = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    print(f"{ds_name} K={K} [{tag}]: fwd+bwd {t*1e3:.2f} ms  "
          f"loss {float(v):.2f} |g| {gsum:.3f}", flush=True)


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "scanned"):
        measure("betacorona1", 32, TwistConfig(M=10), "scanned")
    if only in (None, "chunked"):
        measure("betacorona1", 32,
                TwistConfig(M=10, unroll_chunked_max_ranks=24), "chunked")
