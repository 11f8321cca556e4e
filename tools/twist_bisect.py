"""Bisect the VNCSMC backward cost at primate K=32 M=10.

Variants:
  a. fwd only
  b. fwd+bwd, remat on (current default)
  c. fwd+bwd, remat off
  d. fwd+bwd with stop_gradient on the potentials (cuts the backward
     through the pair enumeration; weights/branches still differentiable)
  e. fwd+bwd with stop_gradient on the chosen-branch transitions
     (cuts the in-loop expm backward)
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
from phylo_tpu.smc import twist as twist_mod
from phylo_tpu.smc.twist import TwistConfig

ds = load_dataset("primate")
model = ReferenceQ(A=ds.A)
params = {
    "model": model.init_params(jnp.float32),
    "branches": init_branch_params(ds.N, dtype=jnp.float32),
}
leaves = jnp.asarray(ds.genome, dtype=jnp.float32)


def time_fn(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def run(tag, cfg, grad=True):
    if grad:
        def loss(p, key):
            return -sample_phylogenies(key, leaves, model, p, cfg).elbo

        fn = jax.jit(jax.value_and_grad(loss))
        t = time_fn(fn, params, jax.random.PRNGKey(0))
    else:
        fn = jax.jit(
            lambda key, p: sample_phylogenies(
                key, leaves, model, p, cfg
            ).elbo
        )
        t = time_fn(fn, jax.random.PRNGKey(0), params)
    print(f"{tag}: {t*1e3:.2f} ms", flush=True)


K = 32
run("a fwd remat=True",
    SweepConfig(K=K, twist=TwistConfig(M=10, use_pallas_ll=False)),
    grad=False)
run("b fwd+bwd remat=True",
    SweepConfig(K=K, twist=TwistConfig(M=10, use_pallas_ll=False)))
run("c fwd+bwd remat=False",
    SweepConfig(K=K, twist=TwistConfig(M=10, use_pallas_ll=False,
                                       remat=False)))

# d: stop-grad on potentials
_orig = twist_mod.twisted_extend


def sg_pots_extend(*args, **kw):
    p1, p2, b_l, b_r, q_pen = _orig(*args, **kw)
    return p1, p2, b_l, b_r, jax.lax.stop_gradient(q_pen)


twist_mod.twisted_extend = sg_pots_extend
import phylo_tpu.smc.sweep as sweep_mod
run("d fwd+bwd stopgrad(q_pen)",
    SweepConfig(K=K, twist=TwistConfig(M=10, use_pallas_ll=False)))
twist_mod.twisted_extend = _orig

# e: stop-grad on chosen branches (cuts expm bwd + branch terms)


def sg_branch_extend(*args, **kw):
    p1, p2, b_l, b_r, q_pen = _orig(*args, **kw)
    return (p1, p2, jax.lax.stop_gradient(b_l),
            jax.lax.stop_gradient(b_r), q_pen)


twist_mod.twisted_extend = sg_branch_extend
run("e fwd+bwd stopgrad(branches)",
    SweepConfig(K=K, twist=TwistConfig(M=10, use_pallas_ll=False)))
twist_mod.twisted_extend = _orig
