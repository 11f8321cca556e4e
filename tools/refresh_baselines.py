"""Fresh re-measurement of EVERY cached CPU baseline on an idle box.

Round 4 found the round-2/3 cached torch baselines inflated: fresh DS1
site-count points (128 -> 22.4s, 512 -> 187.0s) are wildly inconsistent
with the cached 256-site point (218.9s), and fresh betacorona
128 -> 10.5s vs its cached 256 at 197s -- the old sessions measured
under concurrent load.  Inflated baselines overstate our speedups, so
this tool re-measures all of them in one idle session:

  * primate / VNCSMC-primate epoch + jc69 sweep + fish epoch
    (the bench.py / BENCH_DETAILS anchors), and
  * fresh 256-site points for the ds1 / betacorona slope fits,
    refitted against this session's 128/512 points.

Run ALONE (no pytest, no TPU jobs): python tools/refresh_baselines.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")


def main():
    import numpy as np

    import bench
    from tools import baseline_anchor as ba
    from baselines.torch_reference import TorchVCSMC, TorchVNCSMC
    from phylo_tpu.dataio import load_dataset

    with open(CACHE) as f:
        cache = json.load(f)

    # 1. drop + re-measure the epoch/sweep anchors
    for key in ("primate_K2048_B256", "primate_vncsmc_K32_M10_B256"):
        cache.pop(key, None)
    with open(CACHE, "w") as f:
        json.dump(cache, f, indent=2)

    ds = load_dataset("primate")
    t = bench.measure_baseline(ds.genome, 2048, 256)
    print(f"primate epoch: {t:.2f}s", flush=True)
    t = bench._twist_baseline(ds.genome, 32, 10, 256)
    print(f"primate VNCSMC epoch: {t:.2f}s", flush=True)
    ba.anchor_jc69_small()
    ba.anchor_fish()

    # 2. fresh 256-site points for the slope fits; refit with this
    # round's fresh 128/512 points
    for key, make in (
        ("ds1_K2048_fullS_step",
         lambda: TorchVCSMC(load_dataset("hohna_data_1").genome, K=2048)),
        ("betacorona_vncsmc_K32_M10_fullS_step",
         lambda: TorchVNCSMC(load_dataset("betacorona1").genome,
                             K=32, M=10)),
    ):
        with open(CACHE) as f:
            cache = json.load(f)
        entry = cache.get(key, {})
        pts = {int(k): v for k, v in
               entry.get("measured_points", {}).items()}
        m = make()
        pts[256] = ba._step_seconds(m, 256)
        print(f"{key}: fresh S=256 -> {pts[256]:.2f}s", flush=True)
        xs = np.array(sorted(pts))
        ys = np.array([pts[x] for x in xs])
        b_fit, a_fit = np.polyfit(xs, ys, 1)
        S_full = (1949 if key.startswith("ds1") else 3260)
        full = a_fit + b_fit * S_full
        entry.update({
            "step_seconds": round(float(full), 2),
            "measured_points": {str(int(x)): round(float(pts[x]), 2)
                                for x in xs},
            "fit": f"t = {a_fit:.2f} + {b_fit:.4f}*S (least squares, "
                   f"all points from one idle round-4 session), "
                   f"evaluated at S={S_full}",
        })
        cache[key] = entry
        with open(CACHE, "w") as f:
            json.dump(cache, f, indent=2)
        print(f"{key}: {json.dumps(entry['fit'])} -> {full:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
