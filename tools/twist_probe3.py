"""Round-3 twist A/B: prefix-skip chunking, backward kernel v2, and the
M-in-program Pallas forward kernel, measured at the VERDICT target
configs (betacorona K=32 M=10 step; VNCSMC primate sweep).

Knobs probed (env, read at import of pruning.kernels):
  PHYLO_TWIST_BWD_V2   -- v2 T-matrix backward kernel vs round-2 kernel
  PHYLO_TWIST_FWD_V2   -- M-in-program forward kernel (needs
                          TwistConfig.use_pallas_ll=True to engage)
Run each knob setting as a separate process:
  PHYLO_TWIST_BWD_V2=0 python tools/twist_probe3.py
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


def measure(ds_name, K, tw_kwargs, tag, fwd_only=False):
    ds = load_dataset(ds_name)
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds.N, dtype=jnp.float32),
    }
    leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
    mv = os.environ.get("PHYLO_MANUAL_VJP", "auto")
    mv = {"auto": "auto", "1": True, "0": False}[mv]
    cfg = SweepConfig(K=K, twist=TwistConfig(M=10, **tw_kwargs),
                      manual_vjp=mv)

    fwd = jax.jit(
        lambda key, p: sample_phylogenies(key, leaves, model, p, cfg).elbo
    )
    t = time_fn(fwd, jax.random.PRNGKey(0), params)
    e = float(fwd(jax.random.PRNGKey(0), params))
    print(f"{ds_name} K={K} [{tag}]: fwd {t*1e3:.2f} ms  elbo {e:.2f}",
          flush=True)
    if fwd_only:
        return

    def loss(p, key):
        return -sample_phylogenies(key, leaves, model, p, cfg).elbo

    step = jax.jit(jax.value_and_grad(loss))
    t = time_fn(step, params, jax.random.PRNGKey(0))
    print(f"{ds_name} K={K} [{tag}]: fwd+bwd {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    bwdk = os.environ.get("PHYLO_TWIST_BWD_KERNEL", "1")
    bwd = os.environ.get("PHYLO_TWIST_BWD_V2", "0")
    fwdk = os.environ.get("PHYLO_TWIST_FWD_V2", "1")
    mv = os.environ.get("PHYLO_MANUAL_VJP", "auto")
    print(f"== knobs: BWD_KERNEL={bwdk} BWD_V2={bwd} FWD_V2={fwdk} "
          f"MANUAL_VJP={mv} ==", flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else None
    if only in (None, "beta"):
        measure("betacorona1", 32, {}, "xla-fwd")
        measure("betacorona1", 32, dict(use_pallas_ll=True), "pallas-fwd")
    if only in (None, "primate"):
        measure("primate", 32, {}, "xla-fwd")
        measure("primate", 32, dict(use_pallas_ll=True), "pallas-fwd")
