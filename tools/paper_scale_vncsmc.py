"""Round-5 on-chip demonstration: the reference's PAPER-SCALE VNCSMC
configs (VERDICT r4 missing item 1).

/root/reference/autorun.sh:3 sweeps `M=$np` with K in {1024, 2048}
commented as the paper-scale regime; every prior artifact in this repo
is K=32 M=10.  This runs primate VNCSMC train steps at M=K=1024 and
M=K=2048 (batch_size=256 sites, the active autorun config) and records
step time + the chunking policy that made each fit.

Memory math at M=K=1024, S_b=256: one pair-chunk materializes
(chunk, M*K, S, A) merged messages = chunk * 4.3 GB -- pair_chunk=1 is
mandatory and fits 16 GB HBM.  At M=K=2048 that is 17 GB and does NOT
fit; the fused pair-loglik kernel (TwistConfig.use_pallas_ll) reduces
(S, A) in-kernel so no (M*K, S, A) tensor ever exists -- the config
only runs on the kernel path (measured slower at small scale, round 2,
but it is the feasibility lever here).

Usage: python tools/paper_scale_vncsmc.py [1024|2048|all]
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
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.smc.twist import TwistConfig
from phylo_tpu.train.minibatch import site_batches


def run(K, M, batch=256, pair_chunk=1, use_pallas_ll=False, iters=2):
    ds = load_dataset("primate")
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds.N, dtype=jnp.float32),
    }
    leaves_b = jnp.asarray(ds.genome[:, :batch], jnp.float32)
    cfg = SweepConfig(
        K=K, data_grads=False,
        twist=TwistConfig(M=M, pair_chunk=pair_chunk,
                          use_pallas_ll=use_pallas_ll),
    )

    def loss(p, key):
        return -sample_phylogenies(key, leaves_b, model, p, cfg).elbo

    fn = jax.jit(jax.value_and_grad(loss))
    label = (f"K={K} M={M} b={batch} chunk={pair_chunk}"
             f"{' pallas_ll' if use_pallas_ll else ''}")
    t0 = time.time()
    v, g = fn(params, jax.random.PRNGKey(0))
    jax.block_until_ready(v)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        v, g = fn(params, jax.random.PRNGKey(0))
    jax.block_until_ready(v)
    step = (time.time() - t0) / iters
    finite = all(bool(np.all(np.isfinite(np.asarray(x))))
                 for x in jax.tree.leaves(g))
    print(f"  {label}: step {step:.2f}s (compile+first {compile_s:.0f}s)"
          f" elbo={-float(v):.2f} grads_finite={finite}", flush=True)
    return step, float(-v)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices(), flush=True)
    if which in ("1024", "all"):
        print("paper-scale VNCSMC primate M=K=1024:")
        run(1024, 1024)
    if which in ("2048", "all"):
        print("paper-scale VNCSMC primate M=K=2048 (fused pair-ll):")
        run(2048, 2048, use_pallas_ll=True)
