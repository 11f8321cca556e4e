"""Capture an xprof trace of the twist fwd+bwd and print the op
breakdown (framework_op_stats)."""

import glob
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

ds = load_dataset("primate")
model = ReferenceQ(A=ds.A)
params = {
    "model": model.init_params(jnp.float32),
    "branches": init_branch_params(ds.N, dtype=jnp.float32),
}
leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
cfg = SweepConfig(K=32, twist=TwistConfig(M=10))


def loss(p, key):
    return -sample_phylogenies(key, leaves, model, p, cfg).elbo


step = jax.jit(jax.value_and_grad(loss))
out = step(params, jax.random.PRNGKey(0))
jax.block_until_ready(out)

trace_dir = "/tmp/twist_trace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        out = step(params, jax.random.PRNGKey(0))
    jax.block_until_ready(out)

# summarize with the xprof converter
xplane = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xplane)
try:
    from xprof.convert import raw_to_tool_data as rtd
except ImportError:
    from tensorboard_plugin_profile.convert import (  # noqa
        raw_to_tool_data as rtd,
    )

import json

data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {})
rows = json.loads(data) if isinstance(data, (str, bytes)) else data
print(type(rows))
if isinstance(rows, list):
    # gviz table json?
    print(str(rows)[:2000])
else:
    print(str(rows)[:2000])
