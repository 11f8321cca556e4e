"""Benchmark driver.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline config (BASELINE.md): one training epoch on primate.p at
K=2048 particles, site batch 256, learned-Q model -- the reference's
flagship commented sweep config (reference autorun.sh:3).  `value` is
the epoch wall-clock on this chip; `vs_baseline` is the speedup over the
reference-equivalent float64 CPU recursion (baselines/torch_reference.py),
measured once and cached in BASELINE_MEASURED.json.

Usage: python bench.py [--K 2048] [--batch 256] [--epochs 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")


# Single-chip peaks for the utilization figures (public v5e specs:
# 197 TFLOP/s bf16 on the MXU, 819 GB/s HBM).  The sweep's hot loops
# are explicit f32 VPU multiply-adds (tiny A x A contractions -- see
# CLAUDE.md on bf16 dot_general), so `mfu` vs the bf16 MXU peak is
# honest-but-tiny by construction and `hbm_frac` is the meaningful
# number: the workload is bandwidth-bound (ROADMAP item 3 xprof data:
# the expm presample alone sits at the HBM roofline).
PEAK_FLOPS = 197e12        # bf16 MXU, v5e
PEAK_HBM = 819e9           # bytes/s, v5e


def _pad128(S):
    return -(-S // 128) * 128


def roofline(N, S, A, K, *, steps_fwd=0, steps_bwd=0, R=None):
    """Analytic FLOP / HBM-byte counts for `steps_fwd` forward sweeps
    plus `steps_bwd` backward passes at (N, S, A, K).

    Per rank the merge reads two (K, A, Sp) children and writes one
    merged message (3 K A Sp words fwd); the manual-VJP backward
    re-gathers the children, reads the pending column and writes two
    child cotangents plus a scatter-add read/write (~7 K A Sp words).
    Merge compute is 2 A x A matvecs + hadamard + rescale + root
    reduction ~ (4A^2 + 8A) flops/site.  The expm presample moves
    (R, 2K, A, A) in and out of the VMEM-resident kernel (2 words per
    element fwd, 3 bwd) and burns ~2 (order + squarings) A^3 flops per
    element.  Everything else (resampling, bookkeeping) is O(K R)
    words -- negligible.
    """
    R = (N - 1) if R is None else R
    Sp = _pad128(S)
    w = 4                                     # f32 bytes
    merge_fwd_bytes = R * 3 * K * A * Sp * w
    merge_bwd_bytes = R * 7 * K * A * Sp * w
    merge_flops = R * K * Sp * (4 * A * A + 8 * A)
    expm_el = R * 2 * K * A * A
    expm_fwd_bytes = 2 * expm_el * w
    expm_bwd_bytes = 3 * expm_el * w
    expm_flops = R * 2 * K * 2 * 23 * A ** 3
    fb = steps_fwd + steps_bwd                # bwd re-runs the compute
    return {
        "flops": fb * (merge_flops + expm_flops)
                 + steps_bwd * merge_flops,   # bwd ~ 2x merge compute
        "hbm_bytes": steps_fwd * (merge_fwd_bytes + expm_fwd_bytes)
                     + steps_bwd * (merge_bwd_bytes + expm_bwd_bytes),
    }


def utilization(counts, seconds):
    """mfu / hbm_frac / bound from analytic counts + measured time."""
    fl = counts["flops"] / seconds
    bw = counts["hbm_bytes"] / seconds
    hbm_frac = bw / PEAK_HBM
    mfu = fl / PEAK_FLOPS
    return {
        "achieved_gflops_per_s": round(fl / 1e9, 1),
        "achieved_hbm_gb_per_s": round(bw / 1e9, 1),
        "mfu": round(mfu, 6),
        "hbm_frac": round(hbm_frac, 4),
        "bound": "hbm" if hbm_frac > 20 * mfu else "compute",
    }


def measure_baseline(genome, K, batch):
    """Reference-equivalent torch-CPU epoch seconds (cached)."""
    key = f"primate_K{K}_B{batch}"
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
        if key in cache:
            return cache[key]["epoch_seconds"]
    from baselines.torch_reference import TorchVCSMC

    m = TorchVCSMC(genome, K=K)
    t0 = time.time()
    elbo = m.epoch(batch_size=batch)
    dt = time.time() - t0
    import torch

    cache[key] = {
        "epoch_seconds": dt,
        "elbo": elbo,
        "threads": torch.get_num_threads(),
        "impl": "baselines/torch_reference.py float64 CPU "
                "(reference-equivalent recursion)",
    }
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=2)
    return dt


def measure_tpu(genome, K, batch, epochs, sweep_kwargs=None):
    import jax
    import jax.numpy as jnp
    import optax

    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import ReferenceQ
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

    N, S, A = genome.shape
    dtype = jnp.float32
    model = ReferenceQ(A=A)
    params = {
        "model": model.init_params(dtype),
        "branches": init_branch_params(N, dtype=dtype),
    }
    leaves = jax.device_put(jnp.asarray(genome, dtype=dtype))
    config = SweepConfig(K=K, data_grads=False, **(sweep_kwargs or {}))
    tx = optax.sgd(0.001)
    opt_state = tx.init(params)

    from jax import lax

    @jax.jit
    def train_epoch(params, opt_state, key, batch_idx):
        """All minibatch SGD steps of one epoch as a single jitted scan
        (one dispatch instead of n_batches host round-trips)."""

        def step(carry, idx):
            params, opt_state, key = carry
            key, sub = jax.random.split(key)
            batch_leaves = jnp.take(leaves, idx, axis=1)

            def loss_fn(p):
                return -sample_phylogenies(
                    sub, batch_leaves, model, p, config
                ).elbo

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    key), loss

        (params, opt_state, key), losses = lax.scan(
            step, (params, opt_state, key), batch_idx
        )
        return params, opt_state, key, losses

    @jax.jit
    def eval_elbo(params, key):
        return sample_phylogenies(
            key, leaves, model, params, config
        ).elbo

    rng = np.random.default_rng(0)
    n_batches = max(1, S // batch)
    key = jax.random.PRNGKey(0)

    def one_epoch(params, opt_state, key):
        perm = rng.permutation(S)
        batch_idx = jnp.asarray(
            perm[: n_batches * batch].reshape(n_batches, batch)
        )
        params, opt_state, key, _ = train_epoch(
            params, opt_state, key, batch_idx
        )
        key, sub = jax.random.split(key)
        elbo = eval_elbo(params, sub)
        return params, opt_state, key, elbo

    # warmup/compile: two epochs -- the first one right after compile
    # (or persistent-cache load) still carries stragglers worth several
    # ms that a single warmup leaves in the measured window
    for _ in range(2):
        params, opt_state, key, elbo = one_epoch(params, opt_state, key)
        elbo.block_until_ready()

    t0 = time.time()
    for _ in range(epochs):
        params, opt_state, key, elbo = one_epoch(params, opt_state, key)
    elbo.block_until_ready()
    per_epoch = (time.time() - t0) / epochs

    # particle x site pruning-update throughput: per epoch the sweep
    # runs (n_batches * batch + S) sites x K particles x (N-1) merges,
    # x3 for fwd+bwd on train steps
    sites_swept = n_batches * batch * 3 + S
    updates = sites_swept * K * (N - 1)
    return per_epoch, updates / per_epoch, float(elbo)


def measure_details():
    """Timings for every BASELINE.md config; written to
    BENCH_DETAILS.json.  Keeps the headline single-line contract of
    main() untouched."""
    import jax
    import jax.numpy as jnp

    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import GTR, JC69, ReferenceQ
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
    from phylo_tpu.smc.twist import TwistConfig
    from phylo_tpu.utils.profiling import timed

    out = {}
    anchors = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            anchors = json.load(f)

    def attach_baseline(label, anchor_key, field, tpu_seconds):
        """vs_baseline from a tools/baseline_anchor.py cache entry (the
        anchor measures the SAME quantity on the torch-f64 CPU
        recursion; see BASELINE_MEASURED.json provenance fields)."""
        if anchor_key in anchors:
            base = anchors[anchor_key][field]
            out[label]["cpu_baseline_seconds"] = base
            out[label]["vs_baseline"] = round(base / tpu_seconds, 2)

    def fwd_time(ds_name, model_cls, K, sweep_kwargs=None, iters=10,
                 label=None):
        ds = load_dataset(ds_name)
        model = model_cls(A=ds.A)
        params = {
            "model": model.init_params(jnp.float32),
            "branches": init_branch_params(ds.N, dtype=jnp.float32),
        }
        leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
        cfg = SweepConfig(K=K, **(sweep_kwargs or {}))

        fn = jax.jit(
            lambda key, p: sample_phylogenies(
                key, leaves, model, p, cfg
            ).elbo
        )
        t, e = timed(fn, jax.random.PRNGKey(0), params, iters=iters)
        out[label or f"{ds_name}_K{K}"] = {
            "config": f"{ds_name} N={ds.N} S={ds.S} K={K} "
                      f"{model_cls.__name__}"
                      + (f" twist M={cfg.twist.M}" if cfg.twist else ""),
            "fwd_sweep_ms": round(t * 1000, 3),
            "elbo": float(e),
        }
        if cfg.twist is None:   # formulas don't model the enumeration
            out[label or f"{ds_name}_K{K}"].update(utilization(
                roofline(ds.N, ds.S, ds.A, K, steps_fwd=1), t))

    # 1. JC69 CSMC, primates_small, K=128 (fixed params, fwd only)
    fwd_time("primate_data_wang", JC69, 128, label="jc69_csmc_small")
    attach_baseline("jc69_csmc_small", "primates_small_jc69_K128_fwd_sweep",
                    "sweep_seconds",
                    out["jc69_csmc_small"]["fwd_sweep_ms"] / 1000)
    # 1b. the same config as a 32-seed vmapped batch (the reference's
    #     own protocol repeats every config >= 3x, autorun.sh:3-12;
    #     posterior workflows run dozens): per-sweep THROUGHPUT
    #     amortizes the ~0.26 ms dispatch floor that dominates the
    #     single-sweep latency row (tools/smallk_probe.py round 5)
    ds_j = load_dataset("primate_data_wang")
    jmodel = JC69(A=ds_j.A)
    jparams = {
        "model": jmodel.init_params(jnp.float32),
        "branches": init_branch_params(ds_j.N, dtype=jnp.float32),
    }
    jleaves = jnp.asarray(ds_j.genome, dtype=jnp.float32)
    jcfg = SweepConfig(K=128)
    B_j = 32
    fn_j = jax.jit(jax.vmap(lambda key: sample_phylogenies(
        key, jleaves, jmodel, jparams, jcfg).elbo))
    t_j, e_j = timed(fn_j, jax.random.split(jax.random.PRNGKey(0), B_j),
                     iters=20)
    out["jc69_csmc_small_throughput"] = {
        "config": f"primate_data_wang N={ds_j.N} S={ds_j.S} K=128 JC69 "
                  f"fwd, {B_j}-seed vmapped batch (per-sweep)",
        "fwd_sweep_ms": round(t_j / B_j * 1000, 3),
        "elbo": float(jnp.mean(e_j)),
    }
    attach_baseline("jc69_csmc_small_throughput",
                    "primates_small_jc69_K128_fwd_sweep",
                    "sweep_seconds", t_j / B_j)
    # 2. VCSMC primate (headline epoch measured by main())
    fwd_time("primate_data", ReferenceQ, 2048, label="vcsmc_primate")
    # 3a. the reference's learned-Q mode + batched expm on fish
    fwd_time("fish_data", ReferenceQ, 2048, label="learned_q_fish")
    # 3b. textbook GTR (exchangeabilities x stationary) on fish -- the
    #     BASELINE.json config #3 model family, trained end-to-end via
    #     `--model=gtr` (tests/test_train.py::test_train_gtr_model)
    fwd_time("fish_data", GTR, 2048, label="gtr_fish")
    # 3c. fish learned-Q EPOCH at the headline protocol (K=2048,
    #     batch 256) so config #3 carries a measured CPU speedup too
    if "fish_K2048_B256" in anchors:
        ds_f = load_dataset("fish_data")
        per_epoch_f, _, elbo_f = measure_tpu(ds_f.genome, 2048, 256, 3)
        out["fish_epoch"] = {
            "config": "fish_data N=12 S=1047 K=2048 batch=256 "
                      "learned-Q epoch",
            "epoch_seconds": round(per_epoch_f, 4),
            "elbo": elbo_f,
        }
        attach_baseline("fish_epoch", "fish_K2048_B256",
                        "epoch_seconds", per_epoch_f)
    # 4. VNCSMC on betacoronavirus (coronavirus.p is not shipped in the
    #    reference repo), reference autorun scale K=32 M=10
    fwd_time(
        "betacorona1", ReferenceQ, 32,
        sweep_kwargs=dict(twist=TwistConfig(M=10)),
        iters=3, label="vncsmc_betacorona",
    )
    # 4b. full VNCSMC training step (fwd+grad) on betacorona -- was an
    #     instant 143 GB OOM before the round-2 twist backward rework
    def step_time(ds_name, K, sweep_kwargs, iters, label):
        ds = load_dataset(ds_name)
        model = ReferenceQ(A=ds.A)
        params = {
            "model": model.init_params(jnp.float32),
            "branches": init_branch_params(ds.N, dtype=jnp.float32),
        }
        leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
        cfg = SweepConfig(K=K, data_grads=False,
                          **(sweep_kwargs or {}))

        def loss(p, key):
            return -sample_phylogenies(key, leaves, model, p, cfg).elbo

        fn = jax.jit(jax.value_and_grad(loss))
        t, (v, _) = timed(fn, params, jax.random.PRNGKey(0), iters=iters)
        out[label] = {
            "config": f"{ds_name} K={K} full-S fwd+grad",
            "train_step_ms": round(t * 1000, 3),
            "elbo": -float(v),
        }
        if cfg.twist is None:
            out[label].update(utilization(
                roofline(ds.N, ds.S, ds.A, K,
                         steps_fwd=1, steps_bwd=1), t))

    step_time("betacorona1", 32, dict(twist=TwistConfig(M=10)), 3,
              "vncsmc_betacorona_step")
    attach_baseline("vncsmc_betacorona_step",
                    "betacorona_vncsmc_K32_M10_fullS_step",
                    "step_seconds",
                    out["vncsmc_betacorona_step"]["train_step_ms"] / 1000)
    # 5. Hohna DS1 at K=2048 (site sharding validated on the virtual
    #    mesh; single chip here); the full-S train step exercises the
    #    manual whole-sweep VJP (auto-enabled at this scale)
    fwd_time("hohna_data_1", ReferenceQ, 2048, iters=5, label="ds1_2048")
    step_time("hohna_data_1", 2048, None, 3, "ds1_2048_step")
    attach_baseline("ds1_2048_step", "ds1_K2048_fullS_step",
                    "step_seconds",
                    out["ds1_2048_step"]["train_step_ms"] / 1000)

    # 5b. GammaSites G=4 (a capability the reference lacks): blocked
    #     product-space train step through the blocked fused rank
    #     kernels + manual VJP (round-3 defaults)
    from phylo_tpu.models.substitution import GammaSites

    ds_g = load_dataset("primate")
    gmodel = GammaSites(ReferenceQ(A=ds_g.A), G=4)
    gparams = {
        "model": gmodel.init_params(jnp.float32),
        "branches": init_branch_params(ds_g.N, dtype=jnp.float32),
    }
    gleaves = jnp.asarray(gmodel.expand_leaves(ds_g.genome), jnp.float32)
    gcfg = SweepConfig(K=512)

    def gloss(p, key):
        return -sample_phylogenies(key, gleaves, gmodel, p, gcfg).elbo

    gfn = jax.jit(jax.value_and_grad(gloss))
    t, (v, _) = timed(gfn, gparams, jax.random.PRNGKey(0), iters=10)
    out["gamma_primate_step"] = {
        "config": "primate_data GammaSites G=4 K=512 full-S fwd+grad "
                  "(blocked fused rank kernels + manual VJP)",
        "train_step_ms": round(t * 1000, 3),
        "elbo": -float(v),
    }
    attach_baseline("gamma_primate_step", "gamma_primate_K512_fullS_step",
                    "step_seconds", t)

    # 5c. untimed-regime anchors (VERDICT r3 item 3).  DS4's R = 40
    #     exceeds the 32-rank unroll cap, so this is the SCANNED fused
    #     path none of the other rows measure; spikeGP is the A=7
    #     alphabet the reference ships.
    fwd_time("hohna_data_4", ReferenceQ, 2048, iters=5, label="ds4_2048")
    step_time("hohna_data_4", 2048, None, 3, "ds4_2048_step")
    attach_baseline("ds4_2048_step", "ds4_K2048_fullS_step",
                    "step_seconds",
                    out["ds4_2048_step"]["train_step_ms"] / 1000)
    fwd_time("spike_data", ReferenceQ, 2048, iters=5, label="spike_a7")
    step_time("spike_data", 2048, None, 3, "spike_a7_step")
    attach_baseline("spike_a7_step", "spike_K2048_fullS_step",
                    "step_seconds",
                    out["spike_a7_step"]["train_step_ms"] / 1000)
    # 5c'. Hohna DS2/DS3 (autorun.sh:7-10 completeness, VERDICT r4
    #      missing item 2): same protocol as DS1/DS4
    step_time("hohna_data_2", 2048, None, 3, "ds2_2048_step")
    attach_baseline("ds2_2048_step", "ds2_K2048_fullS_step",
                    "step_seconds",
                    out["ds2_2048_step"]["train_step_ms"] / 1000)
    step_time("hohna_data_3", 2048, None, 3, "ds3_2048_step")
    attach_baseline("ds3_2048_step", "ds3_K2048_fullS_step",
                    "step_seconds",
                    out["ds3_2048_step"]["train_step_ms"] / 1000)

    # 5d. protein + Gamma (A = 20, G = 4 -> A' = 80 product space):
    #     since round 5 this rides the wide MXU rank kernels + manual
    #     VJP + Poisson power-table expm (221.9 -> ~40 ms).  The
    #     reference is DNA-only; the CPU anchor is the blocked torch
    #     recursion (baselines TorchBlockVCSMC).
    rngp = np.random.default_rng(7)
    prot = np.eye(20)[rngp.integers(0, 20, (16, 500))]
    pmodel = GammaSites(ReferenceQ(A=20), G=4)
    pparams = {
        "model": pmodel.init_params(jnp.float32),
        "branches": init_branch_params(16, dtype=jnp.float32),
    }
    pleaves = jnp.asarray(pmodel.expand_leaves(prot), jnp.float32)
    pcfg = SweepConfig(K=256)

    def ploss(p, key):
        return -sample_phylogenies(key, pleaves, pmodel, p, pcfg).elbo

    pfn = jax.jit(jax.value_and_grad(ploss))
    t, (v, _) = timed(pfn, pparams, jax.random.PRNGKey(0), iters=5)
    out["protein_gamma_step"] = {
        "config": "simulated protein 16x500 A=20 GammaSites G=4 K=256 "
                  "full-S fwd+grad (wide MXU rank kernels + manual VJP "
                  "+ Poisson expm)",
        "train_step_ms": round(t * 1000, 3),
        "elbo": -float(v),
    }
    attach_baseline("protein_gamma_step", "protein_gamma_K256_fullS_step",
                    "step_seconds", t)

    # 5e. codon GY94 (A = 61 sense codons, spectral transitions) on
    #     betacorona re-encoded: another reference-absent family row
    from phylo_tpu.dataio.codons import (
        codon_dataset,
        empirical_codon_frequencies,
    )
    from phylo_tpu.models.codon import GY94

    ds_c = codon_dataset(load_dataset("betacorona1"))
    cmodel = GY94(empirical_codon_frequencies(ds_c.genome))
    cparams = {
        "model": cmodel.init_params(jnp.float32),
        "branches": init_branch_params(ds_c.N, dtype=jnp.float32),
    }
    cleaves = jnp.asarray(ds_c.genome, jnp.float32)
    ccfg = SweepConfig(K=128)

    def closs(p, key):
        return -sample_phylogenies(key, cleaves, cmodel, p, ccfg).elbo

    cfn = jax.jit(jax.value_and_grad(closs))
    t, (v, _) = timed(cfn, cparams, jax.random.PRNGKey(0), iters=10)
    out["codon_gy94_step"] = {
        "config": "betacorona1 codons 17x1086 A=61 GY94(spectral) "
                  "K=128 full-S fwd+grad (wide MXU rank kernels + "
                  "manual VJP)",
        "train_step_ms": round(t * 1000, 3),
        "elbo": -float(v),
    }
    attach_baseline("codon_gy94_step", "codon_gy94_K128_fullS_step",
                    "step_seconds", t)

    # 6. VNCSMC epoch on primate at the reference's ACTIVE sweep config
    #    (autorun.sh:3-12: nested=true, K=32, M=10, batch 256), compared
    #    to the reference-equivalent torch CPU nested recursion
    ds = load_dataset("primate")
    per_epoch, _, elbo = measure_tpu(
        ds.genome, 32, 256, 3,
        sweep_kwargs=dict(twist=TwistConfig(M=10)),
    )
    baseline = _twist_baseline(ds.genome, 32, 10, 256)
    out["vncsmc_primate_epoch"] = {
        "config": "primate_data VNCSMC K=32 M=10 batch=256 "
                  "(reference autorun.sh active config)",
        "epoch_seconds": round(per_epoch, 4),
        "elbo": elbo,
        "cpu_baseline_epoch_seconds": round(baseline, 2),
        "vs_baseline": round(baseline / per_epoch, 2),
    }

    with open(os.path.join(REPO, "BENCH_DETAILS.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


def _twist_baseline(genome, K, M, batch):
    key = f"primate_vncsmc_K{K}_M{M}_B{batch}"
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
        if key in cache:
            return cache[key]["epoch_seconds"]
    from baselines.torch_reference import TorchVNCSMC

    m = TorchVNCSMC(genome, K=K, M=M)
    t0 = time.time()
    elbo = m.epoch(batch_size=batch)
    dt = time.time() - t0
    cache[key] = {
        "epoch_seconds": dt, "elbo": elbo,
        "impl": "baselines/torch_reference.py TorchVNCSMC float64 CPU",
    }
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=2)
    return dt


def _dispatch_floor_ms(reps=30):
    """Median wall-clock of a trivial jitted op + sync: ~0.03 ms on a
    healthy tunnel, ~20-50 ms in the degraded per-dispatch state."""
    import time as _time

    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
    x = jnp.ones((128,), jnp.float32)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(reps):
        t0 = _time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append((_time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    # persistent compile cache: the sweep's first XLA compile costs
    # minutes on the tunneled chip; cached reruns start in seconds
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(REPO, ".jax_cache")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--K", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--details", action="store_true",
                    help="also time every BASELINE.md config into "
                    "BENCH_DETAILS.json")
    args = ap.parse_args()

    # A wedged TPU tunnel makes jax.devices() HANG rather than error;
    # fail fast with a diagnostic instead of hanging the caller
    # (same probe as __graft_entry__._probe_device_count).
    import threading

    probe = []
    t = threading.Thread(
        target=lambda: probe.append(len(__import__("jax").devices())),
        daemon=True,
    )
    t.start()
    t.join(180.0)
    if not probe:
        print("bench.py: backend init did not complete within 180s "
              "(TPU tunnel down?) -- aborting", file=sys.stderr)
        sys.exit(1)

    # Tunnel-health gate (round 5, tools/bimodal_probe.py finding):
    # the historical "bimodal step timing" is a PER-DISPATCH round-trip
    # the axon tunnel adds in a degraded state -- a trivial jitted op
    # then costs ~23 ms instead of ~0.03 ms, inflating every row by a
    # constant absolute overhead.  Probe the dispatch floor; wait for a
    # healthy tunnel (up to ~10 min) and RECORD the floor so degraded
    # numbers are never mistaken for regressions.
    dispatch_floor_ms = _dispatch_floor_ms()
    waited = 0
    while dispatch_floor_ms > 2.0 and waited < 600:
        print(f"# bench.py: dispatch floor {dispatch_floor_ms:.2f} ms "
              "(degraded tunnel) -- waiting 60s", file=sys.stderr)
        time.sleep(60)
        waited += 60
        dispatch_floor_ms = _dispatch_floor_ms()
    print(f"# dispatch_floor_ms={dispatch_floor_ms:.3f}",
          file=sys.stderr)

    if args.details:
        details = measure_details()
        for k, v in details.items():
            print(f"# {k}: {v}",
                  file=sys.stderr)

    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("primate")

    per_epoch, updates_per_s, elbo = measure_tpu(
        ds.genome, args.K, args.batch, args.epochs
    )
    if args.skip_baseline:
        baseline = None
    else:
        baseline = measure_baseline(ds.genome, args.K, args.batch)

    # absolute-hardware utilization for the measured epoch: n_batches
    # train steps (fwd+bwd at `batch` sites) + one full-S eval sweep
    N, S, A = ds.genome.shape
    n_batches = max(1, S // args.batch)
    c_train = roofline(N, args.batch, A, args.K,
                       steps_fwd=n_batches, steps_bwd=n_batches)
    c_eval = roofline(N, S, A, args.K, steps_fwd=1)
    counts = {k: c_train[k] + c_eval[k] for k in c_train}
    util = utilization(counts, per_epoch)

    out = {
        "metric": (
            f"primate.p VCSMC epoch wall-clock (K={args.K}, "
            f"batch={args.batch}, learned-Q, fwd+bwd+SGD)"
        ),
        "value": round(per_epoch, 4),
        "unit": "s/epoch",
        "vs_baseline": (
            round(baseline / per_epoch, 2) if baseline else None
        ),
        "dispatch_floor_ms": round(dispatch_floor_ms, 3),
        **util,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
