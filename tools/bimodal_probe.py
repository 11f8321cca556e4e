"""Round-5 probe: root-cause the BIMODAL step timing (VERDICT r4 weak
item 4).

Observed: identical compiled programs (persistent cache on, same HLO)
measure 94-105 vs 235-374 ms across processes (codon, round 4), and
the jc69 single sweep measured 5.69 ms in the round-4 bench vs 0.99 ms
in a round-5 process.  Since the persistent compilation cache serves
both processes the same executable, compile/autotune nondeterminism
cannot explain it -- the cause must be runtime-environmental: axon
tunnel dispatch latency, device-side contention (shared chip), or
clock state.

This probe separates those within ONE process and across processes:

  * trivial     -- one fused elementwise jit (dispatch floor);
  * device_put  -- host->device transfer of 4 KB + sync (tunnel RTT);
  * jc69        -- the small fwd sweep (compute ~0.5 ms);
  * primate2048 -- the K=2048 b-256 train step (compute ~15 ms).

If the slow mode adds a CONSTANT per-dispatch overhead, trivial /
device_put inflate by the same absolute amount as the sweeps (tunnel
latency).  If the sweeps inflate PROPORTIONALLY while trivial stays
put, the device itself is slow (clock / co-tenant).  Mode switches
WITHIN a process implicate external contention; stable-per-process
modes implicate per-session state (relay stream, descriptor caching).

Usage: python tools/bimodal_probe.py [reps]   (run several times in
fresh processes; append outputs to one log for the across-process
view)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.dataio import load_dataset
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import JC69, ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


def series(fn, *args, reps=60):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    a = np.asarray(ts)
    return a


def stats(name, a):
    print(f"  {name:12s} min {np.min(a):8.3f}  p50 {np.median(a):8.3f}"
          f"  p90 {np.percentile(a, 90):8.3f}  max {np.max(a):8.3f} ms"
          f"  (n={a.size})", flush=True)


def main(reps=60):
    print(f"pid={os.getpid()} devices={jax.devices()}", flush=True)

    x = jnp.ones((128,), jnp.float32)
    trivial = jax.jit(lambda x: (x * 2.0 + 1.0).sum())

    host = np.ones((1024,), np.float32)

    def put(_):
        return jax.block_until_ready(jax.device_put(host)).sum()

    ds_j = load_dataset("primate_data_wang")
    jm = JC69(A=ds_j.A)
    jp = {"model": jm.init_params(jnp.float32),
          "branches": init_branch_params(ds_j.N, dtype=jnp.float32)}
    jl = jnp.asarray(ds_j.genome, jnp.float32)
    jc = jax.jit(lambda key: sample_phylogenies(
        key, jl, jm, jp, SweepConfig(K=128)).elbo)

    ds_p = load_dataset("primate")
    pm = ReferenceQ(A=ds_p.A)
    pp = {"model": pm.init_params(jnp.float32),
          "branches": init_branch_params(ds_p.N, dtype=jnp.float32)}
    plv = jnp.asarray(ds_p.genome[:, :256], jnp.float32)
    pcfg = SweepConfig(K=2048)

    def ploss(p, key):
        return -sample_phylogenies(key, plv, pm, p, pcfg).elbo

    pstep = jax.jit(jax.value_and_grad(ploss))

    # two interleaved passes so a mid-run mode switch shows up as
    # pass-1 vs pass-2 disagreement
    for ipass in (1, 2):
        print(f"pass {ipass}:", flush=True)
        stats("trivial", series(trivial, x, reps=reps * 3))
        stats("device_put", series(put, 0, reps=reps))
        stats("jc69", series(jc, jax.random.PRNGKey(0), reps=reps))
        stats("primate2048",
              series(pstep, pp, jax.random.PRNGKey(0), reps=20))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60)
