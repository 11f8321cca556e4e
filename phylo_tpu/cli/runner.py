"""Experiment driver CLI.

Mirrors the reference flag surface (reference runner.py:12-58: dataset,
n_particles, batch_size, learning_rate, num_epoch, optimizer,
branch_prior, M, nested, jcmodel, memory_optimization) and fixes its
packaging bugs: dataset selection is a registry lookup instead of
``exec(args.dataset + ' = True')`` (runner.py:81), the non-nested path
imports the real implementation (runner.py:200 imports the missing
``vcsmc_jet``), and there is no silently-on ginkgo default
(runner.py:77).

Progress reporting is PER-EPOCH only (ELBO, log_lik_R, wall time, and
-- behind ``log_every`` -- the learned Q/stationary/rates, matching
the reference's per-epoch dump at vcsmc.py:565-575).  The reference's
per-STEP tqdm bars (vcsmc.py:529-532) have no analogue here by
design: each epoch's minibatch SGD steps run as ONE fused device-side
``lax.scan`` (train/trainer.py), so there is no host-visible per-step
boundary to report.

Usage:
    python -m phylo_tpu.cli.runner --dataset=primate_data \
        --n_particles=128 --num_epoch=100 --batch_size=256
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Variational Combinatorial Sequential Monte Carlo "
        "(TPU-native)"
    )
    # -- reference flag surface (runner.py:12-58) --
    p.add_argument("--dataset", default="primate_data",
                   help="benchmark dataset to use")
    p.add_argument("--n_particles", type=int, default=10,
                   help="number of SMC samples")
    p.add_argument("--batch_size", type=int, default=256,
                   help="number of sites on genome per batch")
    p.add_argument("--learning_rate", type=float, default=0.001)
    p.add_argument("--num_epoch", type=int, default=100)
    p.add_argument("--optimizer", default="GradientDescentOptimizer",
                   help="GradientDescentOptimizer|Adam|sgd|adam")
    p.add_argument("--branch_prior", type=float, default=float(np.log(10)),
                   help="hyperparameter for branch length initialization")
    p.add_argument("--M", type=int, default=10,
                   help="number of subparticles for look-ahead twisting")
    p.add_argument("--nested", type=_boolish, default=False,
                   help="use VNCSMC twisted proposals")
    p.add_argument("--jcmodel", type=_boolish, default=False,
                   help="fixed JC69 substitution model")
    p.add_argument("--model", default=None,
                   help="substitution model spec: jc69|reference|gtr|"
                   "hky|<paml.dat>, with optional +gN/+i/+rN/+f "
                   "modifiers (e.g. gtr+g4+i, lg.dat+f); overrides "
                   "--jcmodel (default: reference learned-Q, or jc69 "
                   "when --jcmodel=true)")
    p.add_argument("--codons", type=_boolish, default=False,
                   help="re-encode the DNA alignment as 61 sense "
                   "codons (dataio.codons) and default the model to "
                   "GY94 with empirical F61 frequencies")
    p.add_argument("--gamma_categories", type=int, default=0,
                   help="discrete-Gamma rate heterogeneity across "
                   "sites with this many categories (learnable alpha); "
                   "0 = off")
    p.add_argument("--paml_dat", default=None,
                   help="empirical amino-acid model from a PAML .dat "
                   "file (LG/WAG/JTT...); overrides --model")
    p.add_argument("--plus_f", type=_boolish, default=False,
                   help="+F: learn stationary frequencies (initialized "
                   "at the --paml_dat file's values)")
    p.add_argument("--invariant_sites", type=_boolish, default=False,
                   help="+I proportion of invariant sites (learnable "
                   "p_inv); combines with --gamma_categories (+G+I)")
    p.add_argument("--free_rates", type=_boolish, default=False,
                   help="+R FreeRates model: --gamma_categories fully "
                   "learnable rate/weight categories (instead of "
                   "Gamma-constrained rates)")
    p.add_argument("--memory_optimization", default="on",
                   help="accepted for reference compatibility; XLA manages "
                   "memory (the reference toggles TF grappler rewriting)")
    # -- TPU-native extras --
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "float64", "bfloat16"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resampling", default="multinomial",
                   choices=["multinomial", "systematic", "stratified",
                            "none"])
    p.add_argument("--ess_threshold", type=float, default=None,
                   help="adaptive resampling: resample only when ESS/K "
                   "drops below this fraction (default: every rank, as "
                   "the reference)")
    p.add_argument("--carried_weights", type=_boolish, default=False,
                   help="carried-accumulated-weights SMC estimator "
                   "(valid log Z under skipped resampling); default is "
                   "the reference per-rank convention")
    p.add_argument("--results_dir", default="./results")
    p.add_argument("--no_artifacts", action="store_true")
    p.add_argument("--checkpoint_every", type=int, default=0)
    p.add_argument("--resume_from", default=None)
    p.add_argument("--mesh", default=None,
                   help="comma-separated mesh shape for site sharding, "
                   "e.g. '4' shards sites over 4 devices")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: jax.distributed coordinator "
                   "address host:port (or set JAX_COORDINATOR_ADDRESS)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-host: total process count")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-host: this process's index")
    p.add_argument("--reference_compat", type=_boolish, default=True,
                   help="reproduce reference weight-recursion quirks")
    p.add_argument("--fixed_partition", type=_boolish, default=False,
                   help="reference-style fixed site partition per run")
    p.add_argument("--log_params", type=_boolish, default=False,
                   help="dump learned Q / stationary / branch rates on "
                        "each logged epoch (reference vcsmc.py:565-575 "
                        "console fidelity)")
    return p.parse_args(argv)


def _boolish(x):
    return str(x).lower() == "true"


def main(argv=None):
    args = parse_args(argv)

    if args.coordinator or args.num_processes or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        from phylo_tpu.parallel import (
            initialize_distributed,
            process_summary,
        )

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        print(process_summary())

    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.getcwd(), ".jax_cache")),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.train import TrainConfig, train

    ds = load_dataset(args.dataset)
    if args.codons:
        from phylo_tpu.dataio.codons import codon_dataset

        ds = codon_dataset(ds)
        if args.model is None:
            args.model = "gy94"
    print(f"Dataset: {ds.name}  N={ds.N} taxa, S={ds.S} sites, "
          f"A={ds.A} states")

    mesh_shape = None
    if args.mesh:
        mesh_shape = tuple(int(x) for x in args.mesh.split(","))

    config = TrainConfig(
        n_particles=args.n_particles,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        num_epoch=args.num_epoch,
        optimizer=args.optimizer,
        branch_prior=args.branch_prior,
        M=args.M,
        nested=args.nested,
        jcmodel=args.jcmodel,
        substitution_model=args.model,
        gamma_categories=args.gamma_categories,
        invariant_sites=args.invariant_sites,
        free_rates=args.free_rates,
        paml_dat=args.paml_dat,
        plus_f=args.plus_f,
        resampling=args.resampling,
        ess_threshold=args.ess_threshold,
        carried_weights=args.carried_weights,
        dtype=args.dtype,
        seed=args.seed,
        q_raw_subtraction=args.reference_compat,
        right_multiplier_bug=args.reference_compat,
        resample_branch_history=not args.reference_compat,
        fixed_partition=args.fixed_partition,
        log_params=args.log_params,
        results_dir=args.results_dir,
        save_artifacts=not args.no_artifacts,
        checkpoint_every=args.checkpoint_every,
        resume_from=args.resume_from,
        mesh_shape=mesh_shape,
    )
    res = train(ds, config)
    print(f"Done. Final ELBO {res.elbo:.3f}"
          + (f"; artifacts in {res.save_dir}" if res.save_dir else ""))
    return res


if __name__ == "__main__":
    main()
