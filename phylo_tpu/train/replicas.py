"""Seed-parallel replica training: N independent VCSMC runs as ONE
vmapped computation.

The reference's autorun.sh repeats each configuration three times by
launching separate processes (reference autorun.sh:3-12).  On TPU the
replicas vectorize: parameters, optimizer states, and PRNG keys gain a
leading replica axis and every train step runs all replicas in one
fused program -- the per-replica tensors are small, so R replicas cost
far less than R sequential runs.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phylo_tpu.smc.sweep import sample_phylogenies
from phylo_tpu.train.trainer import _optimizer, _sweep_config, init_params


def train_replicas(dataset, config, n_replicas):
    """Train `n_replicas` independent runs (distinct seeds) of `config`
    simultaneously.  Returns dict with per-replica ELBO histories and
    final params (stacked on axis 0)."""
    dtype = jnp.dtype(config.dtype)
    model, params0 = init_params(dataset, config)
    sweep_cfg = _sweep_config(config, dataset.N)
    tx = _optimizer(config)

    leaves = jnp.asarray(dataset.genome, dtype=dtype)
    S = dataset.S

    params = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_replicas,) + x.shape),
        params0,
    )
    opt_state = jax.vmap(tx.init)(params)
    keys = jax.vmap(jax.random.PRNGKey)(
        jnp.arange(config.seed, config.seed + n_replicas)
    )

    def one_train(params, opt_state, key, site_idx):
        batch = jnp.take(leaves, site_idx, axis=1)

        def loss_fn(p):
            return -sample_phylogenies(
                key, batch, model, p, sweep_cfg
            ).elbo

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    train_step = jax.jit(jax.vmap(one_train, in_axes=(0, 0, 0, 0)))

    def one_eval(params, key):
        return sample_phylogenies(
            key, leaves, model, params, sweep_cfg
        ).elbo

    eval_step = jax.jit(jax.vmap(one_eval))

    rng = np.random.default_rng(config.seed)
    history = {"elbo": [], "epoch_seconds": []}
    bs = min(config.batch_size, S)
    n_steps = max(1, S // bs)
    for epoch in range(config.num_epoch):
        t0 = time.time()
        # one independent permutation per replica per epoch, sliced into
        # consecutive batch_size chunks -- matching the single-run
        # trainer's epoch semantics (each replica visits each kept site
        # exactly once per epoch; fresh prefixes per step would revisit
        # some sites and skip others)
        perms = np.stack([rng.permutation(S) for _ in range(n_replicas)])
        for step in range(n_steps):
            idx = jnp.asarray(perms[:, step * bs: (step + 1) * bs])
            keys, subs = _split_all(keys)
            params, opt_state, loss = train_step(
                params, opt_state, subs, idx
            )
        keys, subs = _split_all(keys)
        elbos = eval_step(params, subs)
        history["elbo"].append(np.asarray(elbos))
        history["epoch_seconds"].append(time.time() - t0)
        if config.log_every and epoch % config.log_every == 0:
            e = np.asarray(elbos)
            print(
                f"epoch {epoch + 1}: ELBO mean {e.mean():.3f} "
                f"min {e.min():.3f} max {e.max():.3f}"
            )
    history["elbo"] = np.stack(history["elbo"])       # (epochs, R)
    return {"params": params, "history": history}


def _split_all(keys):
    out = jax.vmap(lambda k: tuple(jax.random.split(k)))(keys)
    return out[0], out[1]
