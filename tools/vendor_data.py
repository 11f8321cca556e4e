"""Vendor the benchmark alignments into a repo-local data/ directory.

The repo ships no alignment blobs; loaders search $PHYLO_TPU_DATA, then
<repo>/data, then the reference checkout (phylo_tpu/dataio/datasets.py).
Run this once to make a checkout self-contained:

    python tools/vendor_data.py [--source /root/reference/data] \
        [--dest <repo>/data]

Copies only the files the dataset registry actually reads (pickles +
the Hohna zip), not the raw archive blobs.
"""

from __future__ import annotations

import argparse
import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# everything load_dataset() can open (dataio/datasets.py registry)
WANTED = [
    "primate.p",
    "primates_small.p",
    "fish.p",
    "hohna_dataset_pickle.zip",
    os.path.join("betacoronavirus", "betacorona1.p"),
    os.path.join("betacoronavirus", "betacorona2.p"),
    os.path.join("betacoronavirus", "spikeGP.p"),
]


def vendor(source, dest):
    copied, missing = [], []
    for rel in WANTED:
        src = os.path.join(source, rel)
        if not os.path.exists(src):
            missing.append(rel)
            continue
        dst = os.path.join(dest, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy2(src, dst)
        copied.append(rel)
    return copied, missing


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", default="/root/reference/data")
    p.add_argument("--dest", default=os.path.join(REPO, "data"))
    args = p.parse_args(argv)
    copied, missing = vendor(args.source, args.dest)
    for rel in copied:
        print(f"vendored {rel}")
    for rel in missing:
        print(f"MISSING in source (skipped): {rel}")
    print(f"{len(copied)} files -> {args.dest}")
    return copied, missing


if __name__ == "__main__":
    main()
