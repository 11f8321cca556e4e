"""Non-variational CSMC demo (the reference's `python csmc.py` flow):
sample phylogenies under fixed parameters, aggregate topology posterior
probabilities, and draw the best genealogy.

Run:  python examples/csmc_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.smc.csmc import CSMC
from phylo_tpu.viz.plots import draw_tree

GENOMES = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC"]


def main():
    ds = dataset_from_strings(GENOMES)
    csmc = CSMC({"taxa": ds.taxa, "genome": ds.genome}, seed=0)
    out = csmc.sample_phylogenies(K=8, resampling=False)

    print("normalization constant estimate:", out["norm"])
    print("topology posterior:")
    for prob, k in out["tree_probabilities"][:5]:
        print(f"  {prob:.3f}  (particle {k})")

    best_prob, best_k = out["tree_probabilities"][0]
    draw_tree(ds.taxa, out["genealogy"][best_k], prob=best_prob,
              path="best_genealogy.png")
    print("wrote best_genealogy.png")


if __name__ == "__main__":
    main()
