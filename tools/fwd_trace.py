"""Xprof trace of the FORWARD sweep at the headline config; prints the
top device ops by self time (the per-rank dispatch chain VERDICT r2
item 2 targets).

Usage: python tools/fwd_trace.py [K] [batch] [trace_dir]
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.dataio import load_dataset
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

K = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
batch = int(sys.argv[2]) if len(sys.argv) > 2 else 0
trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fwd_trace"

ds = load_dataset("primate")
model = ReferenceQ(A=ds.A)
params = {
    "model": model.init_params(jnp.float32),
    "branches": init_branch_params(ds.N, dtype=jnp.float32),
}
leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
if batch:
    leaves = leaves[:, :batch]
mv = {"auto": "auto", "1": True, "0": False}[
    os.environ.get("PHYLO_MANUAL", "auto")]
cfg = SweepConfig(K=K, manual_vjp=mv)

fwd = jax.jit(
    lambda key, p: sample_phylogenies(key, leaves, model, p, cfg).elbo
)
out = fwd(jax.random.PRNGKey(0), params)
jax.block_until_ready(out)

import time
t0 = time.time()
for _ in range(10):
    out = fwd(jax.random.PRNGKey(0), params)
jax.block_until_ready(out)
print(f"fwd sweep: {(time.time() - t0) / 10 * 1e3:.2f} ms", flush=True)

os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(10):
        out = fwd(jax.random.PRNGKey(0), params)
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
tot = sum(r.get("total_self_time") or 0 for r in recs)
print(f"device self-time total: {tot:.0f} us over 10 iters")
print(f"{'self_us':>9} {'occ':>5}  op")
for r in recs[:35]:
    print(
        f"{r['total_self_time']:>9.1f} {r['occurrences']:>5}  "
        f"{str(r['type'])[:14]:<14} {str(r['operation'])[:90]}"
    )
