"""Break down the bench-protocol VNCSMC epoch (train_epoch scan +
full-S eval) and xprof the batch-sized train step.

The headline BENCH_DETAILS `vncsmc_primate_epoch` measures
3 fused minibatch SGD steps (batch 256) + one full-S eval per epoch;
this probe times each component separately and prints the device
op-level self-time table for ONE batch-256 fwd+grad step so the
latency budget is attributable.

Usage: python tools/epoch_trace.py [dataset] [K] [M] [batch]
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.dataio import load_dataset
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.smc.twist import TwistConfig

ds = load_dataset(sys.argv[1] if len(sys.argv) > 1 else "primate")
K = int(sys.argv[2]) if len(sys.argv) > 2 else 32
M = int(sys.argv[3]) if len(sys.argv) > 3 else 10
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 256

N, S, A = ds.genome.shape
model = ReferenceQ(A=A)
params = {
    "model": model.init_params(jnp.float32),
    "branches": init_branch_params(N, dtype=jnp.float32),
}
leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
cfg = SweepConfig(K=K, data_grads=False,
                  twist=TwistConfig(M=M) if M > 0 else None)
tx = optax.sgd(0.001)
opt_state = tx.init(params)
n_batches = max(1, S // batch)


@jax.jit
def train_epoch(params, opt_state, key, batch_idx):
    def step(carry, idx):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        batch_leaves = jnp.take(leaves, idx, axis=1)

        def loss_fn(p):
            return -sample_phylogenies(sub, batch_leaves, model, p,
                                       cfg).elbo

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state, key), loss

    (params, opt_state, key), losses = lax.scan(
        step, (params, opt_state, key), batch_idx
    )
    return params, opt_state, key, losses


@jax.jit
def eval_elbo(params, key):
    return sample_phylogenies(key, leaves, model, params, cfg).elbo


# one-batch step standalone (for the trace)
@jax.jit
def one_step(params, opt_state, key, idx):
    batch_leaves = jnp.take(leaves, idx, axis=1)

    def loss_fn(p):
        return -sample_phylogenies(key, batch_leaves, model, p, cfg).elbo

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


rng = np.random.default_rng(0)
perm = rng.permutation(S)
batch_idx = jnp.asarray(perm[: n_batches * batch].reshape(n_batches, batch))
key = jax.random.PRNGKey(0)

# compile
out = train_epoch(params, opt_state, key, batch_idx)
jax.block_until_ready(out)
e = eval_elbo(params, key)
e.block_until_ready()
o1 = one_step(params, opt_state, key, batch_idx[0])
jax.block_until_ready(o1)


def timeit(fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    # block on a concrete leaf: jax.block_until_ready on the whole
    # tuple has been observed to return early under the axon plugin
    jax.tree.leaves(out)[-1].block_until_ready()
    return (time.perf_counter() - t0) / iters


t_epoch = timeit(train_epoch, params, opt_state, key, batch_idx)
t_eval = timeit(eval_elbo, params, key)
t_step = timeit(one_step, params, opt_state, key, batch_idx[0])
print(f"config: {ds.name if hasattr(ds, 'name') else 'ds'} N={N} S={S} "
      f"A={A} K={K} M={M} batch={batch} n_batches={n_batches}")
print(f"train_epoch ({n_batches} fused steps): {t_epoch*1e3:8.2f} ms"
      f"  ({t_epoch/n_batches*1e3:.2f} ms/step in-situ)")
print(f"eval (full-S fwd sweep):               {t_eval*1e3:8.2f} ms")
print(f"standalone 1-batch step (dispatch incl): {t_step*1e3:6.2f} ms")
print(f"epoch total (bench protocol):          "
      f"{(t_epoch + t_eval)*1e3:8.2f} ms")

if os.environ.get("TRACE", "1") == "1":
    trace_dir = "/tmp/epoch_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = train_epoch(params, opt_state, key, batch_idx)
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
    for row in table["rows"]:
        vals = [c.get("v") if c else None for c in row["c"]]
        recs.append(dict(zip(cols, vals)))
    recs = [r for r in recs if r.get("host_or_device") == "Device"]
    recs.sort(key=lambda r: -(r.get("total_self_time") or 0))
    tot = sum(r.get("total_self_time") or 0 for r in recs)
    print(f"\ndevice self-time total: {tot:.0f} us over 1 train_epoch "
          f"({n_batches} steps)")
    print(f"{'self_us':>9} {'occ':>5}  op")
    for r in recs[:40]:
        print(
            f"{r['total_self_time']:>9.1f} {r['occurrences']:>5}  "
            f"{str(r['type'])[:14]:<14} {str(r['operation'])[:86]}"
        )
