"""Simulation study: generate data on a known tree, infer it back.

The standard end-to-end validation loop for a phylogenetic inference
stack, built from pieces the reference does not have:

1. simulate_on_tree evolves sequences along a known topology,
2. VCSMC training infers trees from the simulated alignment,
3. the posterior is summarized by a majority-rule consensus tree, and
4. Robinson-Foulds distances + a fixed-topology ML branch refit
   quantify how well the truth was recovered.

Run:  python examples/simulation_study.py [--S 600] [--K 128] [--epochs 5]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp
import numpy as np

TRUTH = ("(((A:0.09,B:0.12):0.1,(C:0.07,D:0.2):0.15):0.08,"
         "((E:0.1,F:0.05):0.2,(G:0.12,H:0.09):0.1):0.07);")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=600)
    ap.add_argument("--K", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from phylo_tpu.dataio.simulate import simulate_on_tree
    from phylo_tpu.models.substitution import JC69
    from phylo_tpu.pruning.fixed_tree import (
        optimize_branch_lengths,
        parse_newick,
    )
    from phylo_tpu.train import TrainConfig, train
    from phylo_tpu.viz.trees import (
        decode_genealogy,
        majority_consensus,
        robinson_foulds,
        to_newick,
    )

    gen_model = JC69(A=4)
    gen_params = {"model": gen_model.init_params(jnp.float64)}
    taxa, truth = parse_newick(TRUTH)
    ds = simulate_on_tree(truth, gen_model, gen_params, S=args.S,
                          seed=args.seed, taxa=taxa)
    print(f"simulated {ds}")

    cfg = TrainConfig(
        n_particles=args.K, batch_size=args.S, num_epoch=args.epochs,
        learning_rate=0.01, optimizer="Adam", jcmodel=True,
        seed=args.seed, save_artifacts=False,
    )
    res = train(ds, cfg)
    print(f"ELBO {res.history['elbo'][0]:.2f} -> "
          f"{res.history['elbo'][-1]:.2f}")

    genealogy = decode_genealogy(
        np.asarray(res.history["ancestors"][-1]),
        np.asarray(res.history["merged_nodes"][-1]),
    )
    lw = np.asarray(res.history["log_weights"][-1])[-1]
    consensus, supports = majority_consensus(ds.taxa, genealogy, lw)
    print("consensus:", consensus)

    rf = [robinson_foulds(ds.taxa, g, truth, normalized=True)
          for g in genealogy]
    print(f"RF to truth over particles: best {min(rf):.2f} "
          f"mean {np.mean(rf):.2f}")

    # ML branch lengths on the TRUE topology under the fitted model
    b, ll = optimize_branch_lengths(
        jnp.asarray(ds.genome), gen_model, gen_params, truth, steps=200,
    )
    err = np.abs(np.asarray(b) - np.asarray(truth["branches"]))
    print(f"true-topology ML refit: ll {float(ll):.2f}, "
          f"max |b_hat - b_true| = {err.max():.3f}")
    print("refit tree:", to_newick(
        taxa, dict(truth, branches=np.asarray(b))
    ))


if __name__ == "__main__":
    main()
