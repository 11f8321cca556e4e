"""Round-5 probe: the small-K dispatch floor (VERDICT r4 weak item 5).

jc69_csmc_small (primates_small N=9 S=738 K=128, fwd-only sweep) sits
at 17.76x vs the torch CPU anchor -- the only BASELINE config under
the 50x target.  BASELINE.md attributes it to dispatch latency; this
probe decomposes that claim and measures the batched-throughput fix:

  1. the single-sweep latency (the BENCH row);
  2. the irreducible dispatch floor: an empty-ish jitted program;
  3. per-sweep time when B independent seeds run as ONE vmapped
     dispatch (the reference's own protocol runs >= 3 repeats per
     config, autorun.sh:3-12, and posterior workflows run dozens) --
     amortizing launch overhead exactly like train/replicas.py does
     for training.

Usage: python tools/smallk_probe.py
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
from phylo_tpu.models.substitution import JC69
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


def timed(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def main():
    print("devices:", jax.devices(), flush=True)
    ds = load_dataset("primate_data_wang")
    model = JC69(A=ds.A)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds.N, dtype=jnp.float32),
    }
    leaves = jnp.asarray(ds.genome, jnp.float32)
    cfg = SweepConfig(K=128)

    fn1 = jax.jit(lambda key, p: sample_phylogenies(
        key, leaves, model, p, cfg).elbo)
    t1, e = timed(fn1, jax.random.PRNGKey(0), params)
    print(f"single sweep: {t1 * 1e3:.3f} ms  elbo={float(e):.2f}")

    # dispatch floor: trivial program with a comparable host round-trip
    tiny = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
    t0, _ = timed(tiny, jnp.ones((128,), jnp.float32), iters=200)
    print(f"dispatch floor (trivial jit): {t0 * 1e3:.3f} ms")

    for B in (8, 32):
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        fnB = jax.jit(jax.vmap(
            lambda key: sample_phylogenies(
                key, leaves, model, params, cfg).elbo
        ))
        tB, eB = timed(fnB, keys, iters=20)
        print(f"vmapped B={B:3d}: {tB * 1e3:8.3f} ms total, "
              f"{tB / B * 1e3:.3f} ms/sweep, "
              f"elbo mean {float(jnp.mean(eB)):.2f}")


if __name__ == "__main__":
    main()
