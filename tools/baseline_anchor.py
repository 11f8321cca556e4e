"""CPU-baseline anchors for the non-primate BASELINE.md configs.

VERDICT r2 item 3: BASELINE_MEASURED.json anchored only the two primate
configs, so the ">= 50x" claim was demonstrated on primate alone.  This
tool measures the reference-equivalent float64 torch recursion
(baselines/torch_reference.py) on:

  * Hohna DS1 (27 x 1949), K=2048 -- the BASELINE.json scale config;
  * betacorona1 (17 x 3260), VNCSMC K=32 M=10 -- the reference's
    actually-active algorithm at its largest shipped alignment.

Both are anchored as FULL-S fwd+grad step seconds, the quantity
BENCH_DETAILS.json records for the TPU side (ds1_2048_step /
vncsmc_betacorona_step).  A full-S torch step at these shapes holds
tens of GB of autograd state, so each is measured at a site minibatch
and extrapolated linearly in S -- valid because every op in the
recursion (pruning messages, root reductions, potentials) is linear in
the site count; the branch/topology bookkeeping that is NOT
site-proportional is sub-1% at these shapes.  The extrapolation basis
and the measured points are recorded in the cache entry.

Usage: python tools/baseline_anchor.py [ds1|betacorona|fish|all]
(hours-scale on the 1-vCPU box; run in the background).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")


def _update_cache(key, entry):
    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    cache[key] = entry
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=2)
    print(f"{key}: {json.dumps(entry)}", flush=True)


def _step_seconds(model, S_batch, iters=2):
    """Wall-clock of one fwd+grad SGD step on an S_batch site slice."""
    import numpy as np
    import torch

    rng = np.random.default_rng(0)
    opt = torch.optim.SGD(model.params(), lr=0.001)
    times = []
    for i in range(iters):
        idx = torch.asarray(rng.permutation(model.S)[:S_batch].copy())
        t0 = time.time()
        opt.zero_grad()
        loss = -model.sweep(idx)
        loss.backward()
        opt.step()
        times.append(time.time() - t0)
    return min(times)


def anchor_ds1():
    from baselines.torch_reference import TorchVCSMC

    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("hohna_data_1")
    S_batch = 256
    m = TorchVCSMC(ds.genome, K=2048)
    t = _step_seconds(m, S_batch)
    full = t * ds.S / S_batch
    _update_cache("ds1_K2048_fullS_step", {
        "step_seconds": round(full, 2),
        "measured_batch_sites": S_batch,
        "measured_step_seconds": round(t, 2),
        "extrapolation": f"linear in S ({S_batch} -> {ds.S} sites); "
                         "every recursion op is site-linear",
        "impl": "baselines/torch_reference.py TorchVCSMC float64 CPU "
                "fwd+grad (reference-equivalent recursion)",
    })


def anchor_betacorona():
    from baselines.torch_reference import TorchVNCSMC

    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("betacorona1")
    S_batch = 256
    m = TorchVNCSMC(ds.genome, K=32, M=10)
    t = _step_seconds(m, S_batch)
    full = t * ds.S / S_batch
    _update_cache("betacorona_vncsmc_K32_M10_fullS_step", {
        "step_seconds": round(full, 2),
        "measured_batch_sites": S_batch,
        "measured_step_seconds": round(t, 2),
        "extrapolation": f"linear in S ({S_batch} -> {ds.S} sites); "
                         "every recursion op is site-linear",
        "impl": "baselines/torch_reference.py TorchVNCSMC float64 CPU "
                "fwd+grad (reference-equivalent nested recursion)",
    })


def anchor_fish():
    """fish.p learned-Q epoch at the headline scale (config #3): same
    protocol as the primate headline (K=2048, batch 256)."""
    from baselines.torch_reference import TorchVCSMC

    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("fish_data")
    m = TorchVCSMC(ds.genome, K=2048)
    t0 = time.time()
    elbo = m.epoch(batch_size=256)
    dt = time.time() - t0
    _update_cache("fish_K2048_B256", {
        "epoch_seconds": round(dt, 2),
        "elbo": elbo,
        "impl": "baselines/torch_reference.py float64 CPU "
                "(reference-equivalent recursion)",
    })


def anchor_jc69_small():
    """primates_small JC69 forward sweep at K=128 (config #1): the
    BENCH_DETAILS jc69_csmc_small entry is a fwd-only sweep, so the
    anchor is a fwd-only (no_grad) full-S sweep."""
    import torch

    from baselines.torch_reference import TorchVCSMC

    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("primate_data_wang")
    m = TorchVCSMC(ds.genome, K=128)
    times = []
    for _ in range(3):
        t0 = time.time()
        with torch.no_grad():
            m.sweep()
        times.append(time.time() - t0)
    _update_cache("primates_small_jc69_K128_fwd_sweep", {
        "sweep_seconds": round(min(times), 3),
        "impl": "baselines/torch_reference.py float64 CPU fwd-only "
                "full-S sweep (torch learned-Q recursion at JC69 scale)",
    })


def _anchor_slope(key, make_model, ds, impl, points=(128, 512),
                  cached_256=None):
    """De-extrapolate (VERDICT r3 item 5): measure the torch step at
    several site counts, fit t = a + b*S by least squares, and record
    the fitted full-S value alongside every measured point.  The slope
    replaces the single-point linear scaling; the intercept captures
    the site-independent bookkeeping the old extrapolation ignored."""
    import numpy as np

    m = make_model()
    pts = {}
    if cached_256 is not None:
        pts[256] = cached_256
    for S_batch in points:
        pts[S_batch] = _step_seconds(m, S_batch)
        print(f"{key}: S={S_batch} -> {pts[S_batch]:.2f}s", flush=True)
    xs = np.array(sorted(pts))
    ys = np.array([pts[x] for x in xs])
    b_fit, a_fit = np.polyfit(xs, ys, 1)
    full = a_fit + b_fit * ds.S
    _update_cache(key, {
        "step_seconds": round(float(full), 2),
        "measured_points": {str(int(x)): round(float(pts[x]), 2)
                            for x in xs},
        "fit": f"t = {a_fit:.2f} + {b_fit:.4f}*S (least squares over "
               f"{len(xs)} site counts), evaluated at S={ds.S}",
        "impl": impl,
    })


def anchor_slopes():
    """Multi-point site-count fits for the two previously extrapolated
    anchors (run AFTER ds1/betacorona so the 256 point is cached)."""
    from baselines.torch_reference import TorchVCSMC, TorchVNCSMC

    from phylo_tpu.dataio import load_dataset

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    ds1 = load_dataset("hohna_data_1")
    c = cache.get("ds1_K2048_fullS_step", {})
    _anchor_slope(
        "ds1_K2048_fullS_step", lambda: TorchVCSMC(ds1.genome, K=2048),
        ds1, "baselines/torch_reference.py TorchVCSMC float64 CPU "
             "fwd+grad (reference-equivalent recursion)",
        cached_256=c.get("measured_step_seconds"))
    dsb = load_dataset("betacorona1")
    c = cache.get("betacorona_vncsmc_K32_M10_fullS_step", {})
    _anchor_slope(
        "betacorona_vncsmc_K32_M10_fullS_step",
        lambda: TorchVNCSMC(dsb.genome, K=32, M=10),
        dsb, "baselines/torch_reference.py TorchVNCSMC float64 CPU "
             "fwd+grad (reference-equivalent nested recursion)",
        cached_256=c.get("measured_step_seconds"))


def anchor_ds4():
    """Hohna DS4 (41 x 1137): the scanned-fused-path regime (R = 40
    exceeds the 32-rank unroll cap).  Slope-fitted like anchor_slopes."""
    from baselines.torch_reference import TorchVCSMC

    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("hohna_data_4")
    _anchor_slope(
        "ds4_K2048_fullS_step", lambda: TorchVCSMC(ds.genome, K=2048),
        ds, "baselines/torch_reference.py TorchVCSMC float64 CPU "
            "fwd+grad (reference-equivalent recursion)",
        points=(128, 256))


def anchor_spike():
    """spikeGP (22 x 1541, A=7): the wide-alphabet regime."""
    from baselines.torch_reference import TorchVCSMC

    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("spike_data")
    _anchor_slope(
        "spike_K2048_fullS_step", lambda: TorchVCSMC(ds.genome, K=2048),
        ds, "baselines/torch_reference.py TorchVCSMC float64 CPU "
            "fwd+grad (reference-equivalent recursion, A=7)",
        points=(128, 256))




def anchor_gamma_primate():
    """GammaSites G=4 K=512 primate (gamma_primate_step): blocked
    discrete-Gamma torch recursion, slope-fitted in S."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from baselines.torch_reference import TorchBlockVCSMC

    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.models.substitution import discrete_gamma_rates

    ds = load_dataset("primate")
    rates = [float(x) for x in discrete_gamma_rates(1.0, 4)]
    _anchor_slope(
        "gamma_primate_K512_fullS_step",
        lambda: TorchBlockVCSMC(ds.genome, K=512, rates=rates),
        ds, "baselines/torch_reference.py TorchBlockVCSMC float64 CPU "
            "fwd+grad (blocked discrete-Gamma G=4, fixed unit-mean "
            "rates)",
        points=(128, 256))


def anchor_protein_gamma():
    """Simulated protein 16x500 A=20 GammaSites G=4 K=256
    (protein_gamma_step): same rng/shape as the bench row."""
    import numpy as np

    import jax
    jax.config.update("jax_platforms", "cpu")
    from baselines.torch_reference import TorchBlockVCSMC

    from phylo_tpu.models.substitution import discrete_gamma_rates

    rngp = np.random.default_rng(7)
    prot = np.eye(20)[rngp.integers(0, 20, (16, 500))]
    rates = [float(x) for x in discrete_gamma_rates(1.0, 4)]

    class _DS:
        S = 500

    _anchor_slope(
        "protein_gamma_K256_fullS_step",
        lambda: TorchBlockVCSMC(prot, K=256, rates=rates),
        _DS, "baselines/torch_reference.py TorchBlockVCSMC float64 CPU "
             "fwd+grad (A=20 blocked discrete-Gamma G=4, same rng(7) "
             "simulated alignment as the bench row)",
        points=(125, 250))


def anchor_codon():
    """betacorona1 codons 17x1086 A=61 GY94 K=128 (codon_gy94_step):
    learnable kappa/omega, batched (K, 61, 61) float64 matrix_exp."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from baselines.torch_reference import TorchGY94VCSMC

    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.dataio.codons import (
        codon_dataset,
        empirical_codon_frequencies,
    )
    from phylo_tpu.models.codon import _structure_masks

    ds = codon_dataset(load_dataset("betacorona1"))
    freqs = empirical_codon_frequencies(ds.genome)
    masks = _structure_masks()
    _anchor_slope(
        "codon_gy94_K128_fullS_step",
        lambda: TorchGY94VCSMC(ds.genome, K=128, frequencies=freqs,
                               masks=masks),
        ds, "baselines/torch_reference.py TorchGY94VCSMC float64 CPU "
            "fwd+grad (GY94 61-codon, empirical F61, batched "
            "matrix_exp)",
        points=(128, 256))




def anchor_ds23():
    """Hohna DS2 (29 x 2520) and DS3 (36 x 1812) at K=2048: the two
    autorun.sh datasets (lines 7-10) without bench rows (VERDICT r4
    missing item 2).  Slope-fitted like the other Hohna anchors."""
    from baselines.torch_reference import TorchVCSMC

    from phylo_tpu.dataio import load_dataset

    for name, key in (("hohna_data_2", "ds2_K2048_fullS_step"),
                      ("hohna_data_3", "ds3_K2048_fullS_step")):
        ds = load_dataset(name)
        _anchor_slope(
            key, lambda ds=ds: TorchVCSMC(ds.genome, K=2048),
            ds, "baselines/torch_reference.py TorchVCSMC float64 CPU "
                "fwd+grad (reference-equivalent recursion)",
            points=(128, 256))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("jc69", "all"):
        anchor_jc69_small()
    if which in ("gamma", "all"):
        anchor_gamma_primate()
    if which in ("protein", "all"):
        anchor_protein_gamma()
    if which in ("codon", "all"):
        anchor_codon()
    if which in ("ds23", "all"):
        anchor_ds23()
    if which in ("fish", "all"):
        anchor_fish()
    if which in ("ds1", "all"):
        anchor_ds1()
    if which in ("betacorona", "all"):
        anchor_betacorona()
    if which in ("slopes",):
        anchor_slopes()
    if which in ("ds4",):
        anchor_ds4()
    if which in ("spike",):
        anchor_spike()
