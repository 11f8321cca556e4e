"""Train VCSMC on the primate alignment (the reference's README flow:
`python runner.py --dataset=primate_data ...`).

Run:  python examples/train_primate.py [--epochs 20] [--K 256]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

from phylo_tpu.dataio import load_dataset
from phylo_tpu.train import TrainConfig, train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--K", type=int, default=256)
    ap.add_argument("--nested", action="store_true")
    args = ap.parse_args()

    ds = load_dataset("primate")
    cfg = TrainConfig(
        n_particles=args.K,
        batch_size=256,
        learning_rate=0.001,
        num_epoch=args.epochs,
        optimizer="Adam",
        nested=args.nested,
        results_dir="./results",
    )
    res = train(ds, cfg)
    print(f"best ELBO {max(res.history['elbo']):.3f}; "
          f"artifacts in {res.save_dir}")
    print("best tree:", res.history["newick_best"][-1][:120], "...")


if __name__ == "__main__":
    main()
