"""Variational training loop: Optax ascent on the log Z_SMC ELBO.

The reference builds a TF1 graph once and runs Session minibatch steps +
a full-data eval per epoch (reference vcsmc.py:466-591).  Here the whole
sweep+gradient is one jitted function; site minibatches are gathered
inside jit from device-resident data (the reference re-feeds the full
K x N x S_b x A float64 array host->device every step, vcsmc.py:532-534).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phylo_tpu.models.branches import branch_rates, init_branch_params
from phylo_tpu.models.substitution import get_model
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.train.minibatch import site_batches


@dataclass
class TrainConfig:
    """Training configuration; field names mirror the reference CLI
    (reference runner.py:12-58) with TPU-native extras."""

    n_particles: int = 128
    batch_size: int = 256            # sites per SGD step
    learning_rate: float = 0.001
    num_epoch: int = 100
    optimizer: str = "GradientDescentOptimizer"   # or 'Adam' / 'sgd' / 'adam'
    branch_prior: float = float(np.log(10.0))
    M: int = 10                      # twisting subparticles (nested=True)
    nested: bool = False
    jcmodel: bool = False
    # substitution model name (models.substitution.get_model); None
    # keeps the reference selection: jc69 when jcmodel else the
    # reference's learned-Q parameterization.  'gtr' trains textbook
    # GTR (exchangeabilities x stationary), 'hky' HKY85.
    substitution_model: Optional[str] = None
    # empirical amino-acid model from a PAML .dat file (LG/WAG/JTT...):
    # overrides substitution_model; plus_f makes the stationary
    # frequencies learnable (+F), initialized at the file's values.
    paml_dat: Optional[str] = None
    plus_f: bool = False
    # discrete-Gamma rate heterogeneity across sites (Yang 1994): wrap
    # the substitution model in GammaSites with this many categories
    # (learnable alpha).  0/1 = off (the reference has none).
    gamma_categories: int = 0
    # proportion of invariant sites (+I, learnable p_inv): combines
    # with gamma_categories (+G+I) or stands alone (+I).
    invariant_sites: bool = False
    # FreeRates (+R) across-site model: gamma_categories fully
    # learnable (rates AND weights) categories instead of
    # Gamma-constrained rates.  Mutually exclusive with
    # invariant_sites (FreeRates can learn a near-zero category).
    free_rates: bool = False
    resampling: str = "multinomial"
    dtype: str = "float32"
    seed: int = 0
    # reference-compat quirks (see SweepConfig)
    q_raw_subtraction: bool = True
    resample_branch_history: bool = False
    right_multiplier_bug: bool = True
    # batching behavior: fresh random batches per epoch (default) or the
    # reference's fixed partition
    fixed_partition: bool = False
    # adaptive resampling + estimator (see SweepConfig)
    ess_threshold: Optional[float] = None
    carried_weights: bool = False
    # artifacts
    results_dir: Optional[str] = None
    save_artifacts: bool = True
    collect_trees: bool = True
    # full all-K per-epoch jump-chain history in results.p (reference
    # jump_chain_evolution, vcsmc.py:324,424-425,622-642); decoded
    # host-side per epoch only when artifacts are being saved
    collect_jump_chains: bool = True
    checkpoint_every: int = 0        # epochs; 0 = disabled
    # stable checkpoint directory; None = <save_dir>/ckpt (timestamped,
    # so NOT findable across restarts -- set this for elastic runs)
    checkpoint_dir: Optional[str] = None
    # path to resume from, or "auto" = latest checkpoint in
    # checkpoint_dir (fresh run when none exist yet)
    resume_from: Optional[str] = None
    # sharding: name of a mesh axis layout, None = single device
    mesh_shape: Optional[tuple] = None
    log_every: int = 1
    # also dump the learned Q matrix / stationary probs / branch-rate
    # params on each logged epoch, like the reference's per-epoch
    # parameter report (vcsmc.py:565-575).  Off by default: the fused-
    # epoch scan gives one concise line per epoch; flip on for the
    # reference's console fidelity.
    log_params: bool = False
    # run all of an epoch's minibatch SGD steps as ONE jitted lax.scan
    # (single dispatch) instead of one jit call per step; per-step PRNG
    # keys and math are identical (fold_in(epoch_key, 1+i) either way)
    fused_epoch: bool = True
    # fault-injection harness for elastic/recovery testing:
    # "sigkill:E" hard-kills the process (uncatchable, simulates
    # preemption/power loss) and "raise:E" raises RuntimeError, at the
    # start of epoch E.  Only fires when the run reached E by training
    # (start_epoch < E), so a resumed run sails past the fault point.
    fault_injection: Optional[str] = None


@dataclass
class TrainState:
    params: dict
    opt_state: object
    epoch: int = 0


@dataclass
class TrainResult:
    params: dict
    history: dict = field(repr=False)
    save_dir: Optional[str] = None
    elbo: float = float("nan")


def _optimizer(config):
    name = config.optimizer.lower()
    if name in ("adam",):
        return optax.adam(config.learning_rate)
    if name in ("gradientdescentoptimizer", "sgd", "gradient_descent"):
        return optax.sgd(config.learning_rate)
    raise KeyError(f"unknown optimizer {config.optimizer!r}")


def _sweep_config(config, ds_N):
    twist = None
    if config.nested:
        from phylo_tpu.smc.twist import TwistConfig

        twist = TwistConfig(M=config.M)
    return SweepConfig(
        K=config.n_particles,
        resampling=config.resampling,
        q_raw_subtraction=config.q_raw_subtraction,
        resample_branch_history=config.resample_branch_history,
        right_multiplier_bug=config.right_multiplier_bug,
        twist=twist,
        ess_threshold=config.ess_threshold,
        carried_weights=config.carried_weights,
        # the trainer only differentiates params -- skip the manual
        # twist reverse pass's dleaves/dw accumulation (a full
        # log-site-likelihood re-enumeration per rank otherwise kept
        # alive by the scan carry)
        data_grads=False,
    )


def _resolve_codon_frequencies(model, dataset):
    """GY94 resolved from the model registry carries uniform codon
    frequencies; replace them with empirical F61 counts from the
    alignment (the standard default) and validate the alphabet."""
    from phylo_tpu.models.codon import GY94

    base = getattr(model, "base", model)
    if not isinstance(base, GY94):
        return model
    if dataset.A != GY94.A:
        raise ValueError(
            f"GY94 needs a codon-encoded dataset (A={GY94.A}); this "
            f"dataset has A={dataset.A} -- pass --codons (or "
            "dataio.codons.codon_dataset)"
        )
    from phylo_tpu.dataio.codons import empirical_codon_frequencies

    freqs = empirical_codon_frequencies(dataset.genome)
    new_base = GY94(freqs, plus_f=base.plus_f, normalize=base.normalize,
                    spectral=base.spectral)
    if base is model:
        return new_base
    import copy

    wrapped = copy.copy(model)
    wrapped.base = new_base
    return wrapped


def init_params(dataset, config):
    dtype = jnp.dtype(config.dtype)
    if config.paml_dat:
        from phylo_tpu.models.empirical import EmpiricalProtein

        model = EmpiricalProtein.from_paml(
            config.paml_dat, plus_f=config.plus_f
        )
        if model.A != dataset.A:
            raise ValueError(
                f"empirical protein model has A={model.A} states but "
                f"the dataset has A={dataset.A}"
            )
    else:
        name = config.substitution_model or (
            "jc69" if config.jcmodel else "reference"
        )
        model = get_model(name, A=dataset.A)
        model = _resolve_codon_frequencies(model, dataset)
    if hasattr(model, "expand_leaves") and (
            config.gamma_categories or config.invariant_sites
            or config.free_rates):
        raise ValueError(
            "substitution_model spec already includes a rate mixture "
            "(+g/+i/+r); drop the gamma_categories/invariant_sites/"
            "free_rates flags"
        )
    if config.free_rates:
        from phylo_tpu.models.substitution import FreeRates

        if config.invariant_sites:
            raise ValueError(
                "free_rates and invariant_sites are mutually exclusive "
                "(FreeRates can learn a near-zero-rate category)"
            )
        model = FreeRates(model, G=max(config.gamma_categories, 2))
    elif (config.gamma_categories and config.gamma_categories > 1) \
            or config.invariant_sites:
        from phylo_tpu.models.substitution import GammaSites

        model = GammaSites(
            model, G=max(config.gamma_categories, 1),
            invariant=config.invariant_sites,
        )
    params = {
        "model": model.init_params(dtype),
        "branches": init_branch_params(
            dataset.N, branch_prior=config.branch_prior, dtype=dtype
        ),
    }
    return model, params


def train(dataset, config: TrainConfig):
    """Train on a PhyloDataset; returns TrainResult."""
    dtype = jnp.dtype(config.dtype)
    model, params = init_params(dataset, config)
    sweep_cfg = _sweep_config(config, dataset.N)
    tx = _optimizer(config)

    genome = dataset.genome
    if hasattr(model, "expand_leaves"):
        genome = model.expand_leaves(genome)   # GammaSites: A -> G*A
    leaves = jnp.asarray(genome, dtype=dtype)
    S = dataset.S

    shardings = None
    eval_weights = None
    if config.mesh_shape:
        from phylo_tpu.parallel import make_mesh, pad_sites, sweep_sharding

        mesh = make_mesh(tuple(config.mesh_shape))
        shardings = sweep_sharding(mesh)
        padded, w = pad_sites(genome, shardings.site_multiple())
        leaves = jax.device_put(
            jnp.asarray(padded, dtype=dtype), shardings.leaves
        )
        eval_weights = jax.device_put(
            jnp.asarray(w, dtype=dtype), shardings.sites
        )

    opt_state = tx.init(params)
    start_epoch = 0
    restored_history = None
    resume_from = config.resume_from
    if resume_from == "auto":
        # elastic restart: pick up the latest checkpoint in the stable
        # checkpoint_dir; a fresh run (no checkpoints yet) starts clean
        from phylo_tpu.train.checkpoint import latest_checkpoint

        if not config.checkpoint_dir:
            raise ValueError("resume_from='auto' needs checkpoint_dir")
        resume_from = latest_checkpoint(config.checkpoint_dir)
    if resume_from:
        from phylo_tpu.train.checkpoint import restore_checkpoint

        params, opt_state, start_epoch, restored_history = (
            restore_checkpoint(resume_from, params, opt_state)
        )

    def _sgd_step(params, opt_state, key, site_idx):
        batch = jnp.take(leaves, site_idx, axis=1)

        def loss_fn(p):
            return -sample_phylogenies(
                key, batch, model, p, sweep_cfg, shardings=shardings
            ).elbo

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    train_step = jax.jit(_sgd_step)

    @jax.jit
    def train_epoch(params, opt_state, epoch_key, batch_idx):
        """One epoch's minibatch steps as a single scan -- one host
        dispatch per epoch instead of one per step."""

        def step_fn(carry, xs):
            params, opt_state = carry
            i, idx = xs
            params, opt_state, loss = _sgd_step(
                params, opt_state,
                jax.random.fold_in(epoch_key, 1 + i), idx,
            )
            return (params, opt_state), loss

        n = batch_idx.shape[0]
        (params, opt_state), losses = jax.lax.scan(
            step_fn, (params, opt_state),
            (jnp.arange(n), batch_idx),
        )
        return params, opt_state, losses

    @jax.jit
    def eval_step(params, key):
        return sample_phylogenies(
            key, leaves, model, params, sweep_cfg, shardings=shardings,
            site_weights=eval_weights,
        )

    # Per-epoch folded PRNG streams: every key is a pure function of
    # (seed, epoch, step), so a run resumed from the epoch-e checkpoint
    # replays epochs e.. bit-identically to the uninterrupted run --
    # the contract the elastic supervisor and the fault-injection test
    # rely on (the reference is unseeded and irreproducible,
    # SURVEY.md section 5).
    base_key = jax.random.PRNGKey(config.seed)

    # initial full-data ELBO, as the reference reports before training
    # (reference vcsmc.py:496-500)
    initial_elbo = None
    if config.log_every:
        initial_elbo = float(
            eval_step(params, jax.random.fold_in(base_key, 2**31 - 1)).elbo
        )
        print(f"Initial evaluation of ELBO: {initial_elbo:.3f}")

    save_dir = None
    if config.save_artifacts:
        from phylo_tpu.train.results import make_save_dir, write_run_params

        save_dir = make_save_dir(config, dataset)
        write_run_params(save_dir, config, dataset)

    history = {
        "elbo": [], "Qmatrices": [], "stationary": [],
        "left_branches": [], "right_branches": [],
        "log_weights": [], "log_lik": [], "log_lik_R": [],
        "rates_l": [], "rates_r": [], "epoch_seconds": [],
        "newick_best": [], "jump_chain_evolution": [],
        "ancestors": [], "merged_nodes": [],
    }
    if restored_history is not None:
        # keep pre-resume epochs so results.p indices match epoch numbers
        for k, v in restored_history.items():
            if k in history:
                history[k] = list(v)

    fixed_batches = None
    if config.fixed_partition:
        fixed_batches = [
            np.asarray(b)
            for b in site_batches(
                np.random.default_rng(config.seed), S,
                config.batch_size, drop_last=True,
            )
        ]

    n_ranks = dataset.N - 1
    for epoch in range(start_epoch, config.num_epoch):
        if config.fault_injection:
            kind, at = config.fault_injection.split(":")
            if epoch == int(at) and start_epoch < int(at):
                if kind == "sigkill":
                    import signal

                    os.kill(os.getpid(), signal.SIGKILL)
                elif kind == "raise":
                    raise RuntimeError(
                        f"injected fault at epoch {epoch}"
                    )
                else:
                    raise ValueError(
                        f"unknown fault kind {kind!r}"
                    )
        t0 = time.time()
        epoch_key = jax.random.fold_in(base_key, epoch)
        if fixed_batches is not None:
            batches = fixed_batches
        else:
            batches = list(
                site_batches(
                    np.random.default_rng((config.seed, epoch)), S,
                    config.batch_size, drop_last=True,
                )
            )
        if config.fused_epoch and batches:
            params, opt_state, _ = train_epoch(
                params, opt_state, epoch_key,
                jnp.asarray(np.stack(batches)),
            )
        else:
            for i, site_idx in enumerate(batches):
                params, opt_state, loss = train_step(
                    params, opt_state,
                    jax.random.fold_in(epoch_key, 1 + i),
                    jnp.asarray(site_idx),
                )

        res = eval_step(params, jax.random.fold_in(epoch_key, 0))
        elbo = float(res.elbo)
        dt = time.time() - t0

        history["elbo"].append(elbo)
        history["Qmatrices"].append(np.asarray(model.Q(params["model"])))
        history["stationary"].append(
            np.asarray(model.stationary(params["model"]))
        )
        history["left_branches"].append(np.asarray(res.left_branches))
        history["right_branches"].append(np.asarray(res.right_branches))
        history["log_weights"].append(np.asarray(res.log_weights))
        history["log_lik"].append(np.asarray(res.log_likelihood))
        history["log_lik_R"].append(np.asarray(res.log_likelihood_R))
        rl, rr = branch_rates(params["branches"])
        history["rates_l"].append(np.asarray(rl))
        history["rates_r"].append(np.asarray(rr))
        history["epoch_seconds"].append(dt)
        # int merge records: tiny, and they let results.p consumers
        # reconstruct every particle's tree (cli.trees posterior summary)
        history["ancestors"].append(np.asarray(res.ancestors))
        history["merged_nodes"].append(np.asarray(res.merged_nodes))

        if config.collect_trees:
            from phylo_tpu.viz.trees import decode_genealogy, to_newick

            best_k = int(np.argmax(np.asarray(res.log_weights)[-1]))
            gen = decode_genealogy(
                np.asarray(res.ancestors),
                np.asarray(res.merged_nodes),
                np.asarray(res.left_branches),
                np.asarray(res.right_branches),
            )
            history["newick_best"].append(to_newick(dataset.taxa,
                                                    gen[best_k]))
        if config.collect_jump_chains and save_dir:
            from phylo_tpu.viz.trees import jump_chain_evolution

            history["jump_chain_evolution"].append(
                jump_chain_evolution(
                    dataset.taxa,
                    np.asarray(res.ancestors),
                    np.asarray(res.merged_nodes),
                )
            )

        if config.log_every and (epoch % config.log_every == 0):
            print(
                f"epoch {epoch + 1}/{config.num_epoch}  ELBO {elbo:.3f}  "
                f"log_lik_R max {float(np.max(history['log_lik_R'][-1])):.3f}"
                f"  {dt:.2f}s"
            )
            if config.log_params:
                # the reference dumps the learned substitution model +
                # branch-rate params every epoch (vcsmc.py:565-575)
                with np.printoptions(precision=4, suppress=True):
                    print("Q matrix:\n"
                          f"{history['Qmatrices'][-1]}")
                    print(f"stationary: {history['stationary'][-1]}")
                    print(f"branch rates L: {np.asarray(rl)}")
                    print(f"branch rates R: {np.asarray(rr)}")

        ckpt_dir = config.checkpoint_dir or (
            os.path.join(save_dir, "ckpt") if save_dir else None
        )
        if (
            config.checkpoint_every
            and ckpt_dir
            and (epoch + 1) % config.checkpoint_every == 0
        ):
            from phylo_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(
                ckpt_dir, params, opt_state, epoch + 1, history=history,
            )

    if save_dir:
        from phylo_tpu.train.results import save_results

        save_results(save_dir, config, dataset, history)

    final_elbo = history["elbo"][-1] if history["elbo"] else float("nan")
    return TrainResult(
        params=params, history=history, save_dir=save_dir, elbo=final_elbo
    )
