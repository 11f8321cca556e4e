"""In-situ A/B: PHYLO_RESAMPLE_KERNEL on/off at sweep level (real TPU).

Run under each env setting: PHYLO_RESAMPLE_KERNEL=0|auto python tools/resample_ab.py
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.dataio import load_dataset
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

MODE = os.environ.get("PHYLO_RESAMPLE_KERNEL", "auto")

def time_fn(fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out

ds = load_dataset("primate")
model = ReferenceQ(A=ds.A)
params = {"model": model.init_params(jnp.float32),
          "branches": init_branch_params(ds.N, dtype=jnp.float32)}
leaves = jnp.asarray(ds.genome, jnp.float32)
cfg = SweepConfig(K=2048)

# 1. forward-only full-S sweep
fwd = jax.jit(lambda key, p: sample_phylogenies(key, leaves, model, p, cfg).elbo)
t, e = time_fn(fwd, jax.random.PRNGKey(0), params, iters=30)
print(f"[{MODE}] primate_K2048 fwd fullS: {t*1e3:.2f} ms elbo {float(e):.2f}", flush=True)

# 2. fwd+bwd at batch 256
data = jnp.take(leaves, jnp.arange(256), axis=1)
def loss(p, key):
    return -sample_phylogenies(key, data, model, p, cfg).elbo
step = jax.jit(jax.value_and_grad(loss))
t, (v, g) = time_fn(step, params, jax.random.PRNGKey(0), iters=20)
gsum = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
print(f"[{MODE}] primate_K2048 b256 step: {t*1e3:.2f} ms loss {float(v):.4f} |g| {gsum:.4f}", flush=True)

# 3. DS1 b256 step
ds1 = load_dataset("hohna_data_1")
params1 = {"model": model.init_params(jnp.float32),
           "branches": init_branch_params(ds1.N, dtype=jnp.float32)}
l1 = jnp.take(jnp.asarray(ds1.genome, jnp.float32), jnp.arange(256), axis=1)
def loss1(p, key):
    return -sample_phylogenies(key, l1, model, p, cfg).elbo
step1 = jax.jit(jax.value_and_grad(loss1))
t, (v, g) = time_fn(step1, params1, jax.random.PRNGKey(0), iters=10)
print(f"[{MODE}] ds1_K2048 b256 step: {t*1e3:.2f} ms loss {float(v):.4f}", flush=True)
