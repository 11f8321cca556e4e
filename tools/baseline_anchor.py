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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("jc69", "all"):
        anchor_jc69_small()
    if which in ("fish", "all"):
        anchor_fish()
    if which in ("ds1", "all"):
        anchor_ds1()
    if which in ("betacorona", "all"):
        anchor_betacorona()
