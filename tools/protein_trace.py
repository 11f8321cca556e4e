"""Xprof trace of the protein GammaSites G=4 K=256 train step (the
BENCH_DETAILS protein_gamma_step config) -- where do the ~200 ms go?

Usage (real TPU): python tools/protein_trace.py [K] [G]
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import GammaSites, ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

K = int(sys.argv[1]) if len(sys.argv) > 1 else 256
G = int(sys.argv[2]) if len(sys.argv) > 2 else 4

rngp = np.random.default_rng(7)
prot = np.eye(20)[rngp.integers(0, 20, (16, 500))]
model = GammaSites(ReferenceQ(A=20), G=G)
params = {
    "model": model.init_params(jnp.float32),
    "branches": init_branch_params(16, dtype=jnp.float32),
}
leaves = jnp.asarray(model.expand_leaves(prot), jnp.float32)
cfg = SweepConfig(K=K)


def loss(p, key):
    return -sample_phylogenies(key, leaves, model, p, cfg).elbo


step = jax.jit(jax.value_and_grad(loss))
out = step(params, jax.random.PRNGKey(0))
jax.block_until_ready(out)

t0 = time.time()
for _ in range(10):
    out = step(params, jax.random.PRNGKey(0))
jax.block_until_ready(out)
print(f"protein step: {(time.time() - t0) / 10 * 1e3:.2f} ms")

trace_dir = "/tmp/protein_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(5):
        out = step(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

xplane = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
try:
    from xprof.convert import raw_to_tool_data as rtd
except ImportError:
    from tensorboard_plugin_profile.convert import (  # noqa
        raw_to_tool_data as rtd,
    )
data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {})
payload = json.loads(data) if isinstance(data, (str, bytes)) else data
table = payload[0]
cols = [c["id"] for c in table["cols"]]
recs = []
for r in table["rows"]:
    vals = [c.get("v") if c else None for c in r["c"]]
    recs.append(dict(zip(cols, vals)))
recs = [r for r in recs if r.get("host_or_device") == "Device"]
recs.sort(key=lambda r: -(r.get("total_self_time") or 0))
print(f"{'self_us':>9} {'occ':>5}  {'bound':<8} op")
for r in recs[:25]:
    print(
        f"{r['total_self_time']:>9.1f} {r['occurrences']:>5}  "
        f"{str(r.get('bound_by') or ''):<8} {str(r['operation'])[:90]}"
    )
