"""Measure the presampled-expm + auto-chunk twist on the chip."""

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


for ds_name, K, tw_kwargs, tag in [
    ("primate", 32, {}, "presample+auto"),
    ("primate", 32, dict(presample_expm=False), "auto-chunk only"),
    ("primate", 256, {}, "presample+auto"),
    ("betacorona1", 32, {}, "presample+auto"),
]:
    ds = load_dataset(ds_name)
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds.N, dtype=jnp.float32),
    }
    leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
    cfg = SweepConfig(K=K, twist=TwistConfig(M=10, **tw_kwargs))

    fwd = jax.jit(
        lambda key, p: sample_phylogenies(
            key, leaves, model, p, cfg
        ).elbo
    )
    t = time_fn(fwd, jax.random.PRNGKey(0), params)
    print(f"{ds_name} K={K} [{tag}]: fwd {t*1e3:.2f} ms", flush=True)

    def loss(p, key):
        return -sample_phylogenies(key, leaves, model, p, cfg).elbo

    step = jax.jit(jax.value_and_grad(loss))
    t = time_fn(step, params, jax.random.PRNGKey(0))
    print(f"{ds_name} K={K} [{tag}]: fwd+bwd {t*1e3:.2f} ms", flush=True)
