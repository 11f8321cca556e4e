"""Round-5 on-chip A/B: wide-alphabet (MXU) fused rank kernels.

VERDICT r4 item 1: codon (GY94 A=61) and protein (+Gamma, G=4 A=20)
merges previously ran the jnp einsum path with XLA AD; the new
_kernel_rank_wide / _rank_bwd_core_wide bodies route them through the
fused DMA rank kernels + manual whole-sweep VJP.  This probe measures
both paths IN ONE PROCESS (identical-HLO step timing is bimodal across
processes on this chip -- CLAUDE.md) and cross-checks values/grads:

  A (new default): SweepConfig(manual_vjp=True)  -> manual + wide MXU
  B (old path)   : SweepConfig(manual_vjp=False) -> XLA AD, jnp merge

The grad comparison doubles as the on-hardware precision validation of
the Mosaic dot_general at PHYLO_WIDE_DOT_PRECISION (default
'highest'): rel err ~1e-6 = exact-f32 passes; ~1e-2 = bf16 leaked in.

Usage: python tools/wide_kernel_ab.py [codon|protein|all]
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
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def ab(label, leaves, model, params, K, iters=10):
    key = jax.random.PRNGKey(0)

    def make(manual):
        cfg = SweepConfig(K=K, manual_vjp=manual)

        def loss(p, k):
            return -sample_phylogenies(k, leaves, model, p, cfg).elbo

        return jax.jit(jax.value_and_grad(loss))

    results = {}
    for name, manual in [("wide_mxu", True), ("xla_jnp", False)]:
        fn = make(manual)
        t, (v, g) = time_fn(fn, params, key, iters=iters)
        results[name] = (t, float(v), g)
        print(f"  {label} {name:9s}: {t * 1e3:8.2f} ms/step  "
              f"elbo={float(v):.4f}")
    ta, va, ga = results["wide_mxu"]
    tb, vb, gb = results["xla_jnp"]
    print(f"  {label} speedup: {tb / ta:.2f}x  (new {ta*1e3:.1f} ms "
          f"vs old {tb*1e3:.1f} ms)")
    print(f"  {label} |d_elbo| = {abs(va - vb):.3e} "
          f"(rel {abs(va - vb) / abs(vb):.3e})")
    worst = 0.0
    for (ka, a), (kb, b) in zip(
        jax.tree.leaves_with_path(ga), jax.tree.leaves_with_path(gb)
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.max(np.abs(b)) + 1e-30
        rel = np.max(np.abs(a - b)) / scale
        worst = max(worst, float(rel))
        print(f"    grad {jax.tree_util.keystr(ka):40s} rel_err "
              f"{rel:.3e}")
    print(f"  {label} worst grad rel err: {worst:.3e}")
    return results


def probe_codon(iters=10):
    from phylo_tpu.dataio.codons import (
        codon_dataset,
        empirical_codon_frequencies,
    )
    from phylo_tpu.models.codon import GY94

    ds_c = codon_dataset(load_dataset("betacorona1"))
    model = GY94(empirical_codon_frequencies(ds_c.genome))
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds_c.N, dtype=jnp.float32),
    }
    leaves = jnp.asarray(ds_c.genome, jnp.float32)
    print(f"codon GY94 betacorona1 {ds_c.N}x{ds_c.S} A=61 K=128")
    ab("codon", leaves, model, params, K=128, iters=iters)


def probe_protein(iters=5):
    from phylo_tpu.models.substitution import GammaSites, ReferenceQ

    rng = np.random.default_rng(7)
    prot = np.eye(20)[rng.integers(0, 20, (16, 500))]
    model = GammaSites(ReferenceQ(A=20), G=4)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(16, dtype=jnp.float32),
    }
    leaves = jnp.asarray(model.expand_leaves(prot), jnp.float32)
    print("protein GammaSites 16x500 A=20 G=4 K=256")
    ab("protein", leaves, model, params, K=256, iters=iters)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("codon", "all"):
        probe_codon()
    if which in ("protein", "all"):
        probe_protein()
