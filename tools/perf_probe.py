"""Round-2 perf probes on the real chip.

A/B measurements for the two ROADMAP perf levers:
1. twist kernel: jnp multiply-add vs fused_pair_loglik folded into the
   pair-chunk axis (VNCSMC betacorona fwd + primate epoch-ish step).
2. replicate_leaves True/False: fwd ELBO vs full train step at
   primate/K=2048 (the backward carries the message-buffer cotangent;
   the unified buffer doubles its column count).

Usage: python tools/perf_probe.py [twist|leaves|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from phylo_tpu.dataio import load_dataset
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.smc.twist import TwistConfig


def setup(ds_name, dtype=jnp.float32):
    ds = load_dataset(ds_name)
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(dtype),
        "branches": init_branch_params(ds.N, dtype=dtype),
    }
    leaves = jnp.asarray(ds.genome, dtype=dtype)
    return ds, model, params, leaves


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def probe_twist():
    for ds_name, K, M, chunk, iters in [
        ("betacorona1", 32, 10, 8, 5),
        ("primate", 32, 10, 8, 5),
        ("primate", 256, 10, 8, 3),
    ]:
        ds, model, params, leaves = setup(ds_name)
        for use_k in (False, True):
            cfg = SweepConfig(
                K=K,
                twist=TwistConfig(M=M, pair_chunk=chunk,
                                  use_pallas_ll=use_k),
            )
            fwd = jax.jit(
                lambda key, p: sample_phylogenies(
                    key, leaves, model, p, cfg
                ).elbo
            )
            t, e = time_fn(fwd, jax.random.PRNGKey(0), params,
                           iters=iters)
            print(f"twist {ds_name} K={K} M={M} kernel={use_k}: "
                  f"fwd {t*1e3:.2f} ms  elbo {float(e):.2f}", flush=True)

            def loss(p, key):
                return -sample_phylogenies(
                    key, leaves, model, p, cfg
                ).elbo

            step = jax.jit(jax.value_and_grad(loss))
            t, (v, g) = time_fn(step, params, jax.random.PRNGKey(0),
                                iters=iters)
            print(f"twist {ds_name} K={K} M={M} kernel={use_k}: "
                  f"fwd+bwd {t*1e3:.2f} ms", flush=True)


def probe_leaves():
    ds, model, params, leaves = setup("primate")
    for repl in (True, False):
        cfg = SweepConfig(K=2048, replicate_leaves=repl)
        fwd = jax.jit(
            lambda key, p: sample_phylogenies(
                key, leaves, model, p, cfg
            ).elbo
        )
        t, e = time_fn(fwd, jax.random.PRNGKey(0), params, iters=20)
        print(f"leaves repl={repl}: fwd {t*1e3:.2f} ms "
              f"elbo {float(e):.2f}", flush=True)

        def loss(p, key):
            return -sample_phylogenies(key, leaves, model, p, cfg).elbo

        step = jax.jit(jax.value_and_grad(loss))
        t, _ = time_fn(step, params, jax.random.PRNGKey(0), iters=20)
        print(f"leaves repl={repl}: fwd+bwd {t*1e3:.2f} ms", flush=True)

        # minibatch step (the headline epoch's inner op): S_b=256
        idx = jnp.arange(256)

        def loss_b(p, key):
            batch = jnp.take(leaves, idx, axis=1)
            return -sample_phylogenies(key, batch, model, p, cfg).elbo

        step_b = jax.jit(jax.value_and_grad(loss_b))
        t, _ = time_fn(step_b, params, jax.random.PRNGKey(0), iters=20)
        print(f"leaves repl={repl}: fwd+bwd batch256 {t*1e3:.2f} ms",
              flush=True)


def probe_manual_vjp():
    """Manual whole-sweep VJP (sweep_vjp) vs XLA AD at the headline
    config (primate, K=2048) -- full-batch and batch-256 train steps."""
    ds, model, params, leaves = setup("primate")
    for manual in (False, True):
        cfg = SweepConfig(K=2048, manual_vjp=manual)
        fwd = jax.jit(
            lambda key, p: sample_phylogenies(
                key, leaves, model, p, cfg
            ).elbo
        )
        t, e = time_fn(fwd, jax.random.PRNGKey(0), params, iters=20)
        print(f"manual={manual}: fwd {t*1e3:.2f} ms "
              f"elbo {float(e):.2f}", flush=True)

        def loss(p, key):
            return -sample_phylogenies(key, leaves, model, p, cfg).elbo

        step = jax.jit(jax.value_and_grad(loss))
        t, (v, g) = time_fn(step, params, jax.random.PRNGKey(0),
                            iters=20)
        gsum = sum(float(jnp.sum(jnp.abs(x)))
                   for x in jax.tree.leaves(g))
        print(f"manual={manual}: fwd+bwd {t*1e3:.2f} ms "
              f"loss {float(v):.4f} |g| {gsum:.4f}", flush=True)

        idx = jnp.arange(256)

        def loss_b(p, key):
            batch = jnp.take(leaves, idx, axis=1)
            return -sample_phylogenies(key, batch, model, p, cfg).elbo

        step_b = jax.jit(jax.value_and_grad(loss_b))
        t, _ = time_fn(step_b, params, jax.random.PRNGKey(0), iters=20)
        print(f"manual={manual}: fwd+bwd batch256 {t*1e3:.2f} ms",
              flush=True)


class _DenseOnly:
    """Hide a model's block structure (A/B probe: dense vs blocked)."""

    def __init__(self, model):
        self._m = model
        self.A = model.A

    def __getattr__(self, name):
        if name in ("transition_blocks", "blocks"):
            raise AttributeError(name)
        return getattr(self._m, name)


class _LegacyDense(_DenseOnly):
    """Round-1 GammaSites: dense (G A)^3 expm + dense merge."""

    def transition(self, params, b):
        from phylo_tpu.models.expm import expm_ctmc

        return expm_ctmc(self._m.Q(params), b)


def probe_gamma():
    """GammaSites G=4 on primate: legacy dense (G A)^3 expm, blocked
    expm + dense merge, and blocked expm + blocked merge."""
    from phylo_tpu.models.substitution import GammaSites

    ds = load_dataset("primate")
    for K in (512,):
        for arm in ("legacy", "dense_merge", "blocked"):
            model = GammaSites(ReferenceQ(A=ds.A), G=4)
            params = {
                "model": model.init_params(jnp.float32),
                "branches": init_branch_params(ds.N, dtype=jnp.float32),
            }
            leaves = jnp.asarray(model.expand_leaves(ds.genome),
                                 dtype=jnp.float32)
            if arm == "legacy":
                model = _LegacyDense(model)
            elif arm == "dense_merge":
                model = _DenseOnly(model)
            dense = arm
            cfg = SweepConfig(K=K, blocked_merge=(arm == "blocked"))
            fwd = jax.jit(
                lambda key, p: sample_phylogenies(
                    key, leaves, model, p, cfg
                ).elbo
            )
            t, e = time_fn(fwd, jax.random.PRNGKey(0), params, iters=10)
            print(f"gamma K={K} dense={dense}: fwd {t*1e3:.2f} ms "
                  f"elbo {float(e):.2f}", flush=True)

            def loss(p, key):
                return -sample_phylogenies(
                    key, leaves, model, p, cfg
                ).elbo

            step = jax.jit(jax.value_and_grad(loss))
            t, _ = time_fn(step, params, jax.random.PRNGKey(0), iters=10)
            print(f"gamma K={K} dense={dense}: fwd+bwd {t*1e3:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("twist", "all"):
        probe_twist()
    if which in ("leaves", "all"):
        probe_leaves()
    if which in ("manual", "all"):
        probe_manual_vjp()
    if which in ("gamma", "all"):
        probe_gamma()
