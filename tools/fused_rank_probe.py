"""A/B the fused per-rank kernel (gather+merge+scatter in one
pallas_call) at the headline configs.

PHYLO_FUSED_RANK=0 python tools/fused_rank_probe.py   # unfused manual
PHYLO_MANUAL=0 python tools/fused_rank_probe.py       # XLA AD baseline
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


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def measure(ds_name, K, manual):
    ds = load_dataset(ds_name)
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds.N, dtype=jnp.float32),
    }
    leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
    cfg = SweepConfig(K=K, manual_vjp=manual)

    fwd = jax.jit(
        lambda key, p: sample_phylogenies(key, leaves, model, p, cfg).elbo
    )
    t = time_fn(fwd, jax.random.PRNGKey(0), params)
    e = float(fwd(jax.random.PRNGKey(0), params))
    print(f"{ds_name} K={K} manual={manual}: fwd {t*1e3:.2f} ms "
          f"elbo {e:.2f}", flush=True)

    def loss(p, key):
        return -sample_phylogenies(key, leaves, model, p, cfg).elbo

    step = jax.jit(jax.value_and_grad(loss))
    t = time_fn(step, params, jax.random.PRNGKey(0))
    v, g = step(params, jax.random.PRNGKey(0))
    ok = all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
    print(f"{ds_name} K={K} manual={manual}: fwd+bwd {t*1e3:.2f} ms "
          f"grads_finite={ok}", flush=True)


if __name__ == "__main__":
    manual = os.environ.get("PHYLO_MANUAL", "1") == "1"
    fr = os.environ.get("PHYLO_FUSED_RANK", "1")
    tk = os.environ.get("PHYLO_FUSED_RANK_TK", "32")
    print(f"== manual={manual} FUSED_RANK={fr} TK={tk} ==", flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "primate"):
        measure("primate", 2048, manual)
    if only in (None, "ds1"):
        measure("DS1", 2048, manual)
