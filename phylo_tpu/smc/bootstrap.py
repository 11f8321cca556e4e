"""Felsenstein nonparametric bootstrap over sites, driven by the SMC
sweep.

Classic phylogenetic uncertainty quantification the reference does not
have (its runner only trains on the full alignment;
reference runner.py:151-176): resample the S alignment columns with
replacement, re-infer on each pseudo-replicate, and report how often
each clade recurs.  On this framework a site resample is FREE at the
sweep level -- multinomial column counts ARE per-site weights, so every
replicate runs the SAME jitted sweep with a different `site_weights`
vector (one compile for the whole bootstrap; no data movement, no
re-tracing, and the sweep stays static-shaped for the TPU).

Support estimator: within each replicate the final particle cloud is a
weighted posterior sample, so a clade's replicate support is its
normalized particle mass, and the bootstrap support is the mean over
replicates:

    support(c) = (1/B) sum_r sum_k w_rk * [c in tree_rk]

With K=1-style argmax behavior (classic single-tree bootstrap), pass
``map_tree=True`` to count only each replicate's highest-weight
particle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp


@dataclass
class BootstrapResult:
    supports: dict          # {frozenset(taxa): support in [0, 1]}
    consensus: str          # majority-rule consensus Newick (supports
                            # as internal-node labels)
    elbos: np.ndarray       # (B,) per-replicate ELBO estimates
    counts: np.ndarray      # (B, S) resampled column counts


def bootstrap_supports(key, leaves, model, params, config, *,
                       n_replicates=20, taxa=None, threshold=0.5,
                       map_tree=False, base_weights=None):
    """Bootstrap clade supports for SMC phylogenetic inference.

    key: PRNG key (drives both the column resampling and the sweeps).
    leaves/model/params/config: as `sample_phylogenies`.
    n_replicates: number of bootstrap pseudo-replicates B.
    taxa: leaf names (defaults to S0..S{N-1}).
    threshold: majority-rule consensus threshold in [0.5, 1).
    map_tree: count only the highest-weight particle per replicate
        (classic one-tree-per-replicate bootstrap) instead of the
        weighted particle cloud.
    base_weights: optional (S,) nonnegative weights biasing the column
        resampling (default uniform); counts are drawn from
        Multinomial(S, base_weights / sum).

    Returns a BootstrapResult.
    """
    from phylo_tpu.smc.sweep import sample_phylogenies
    from phylo_tpu.viz.trees import (
        _clade_sets,
        consensus_from_supports,
        decode_genealogy,
    )

    leaves = jnp.asarray(leaves)
    N, S = leaves.shape[0], leaves.shape[1]
    if taxa is None:
        taxa = [f"S{i}" for i in range(N)]
    if len(taxa) != N:
        raise ValueError(f"{len(taxa)} taxa for {N} leaves")

    key, count_key = jax.random.split(key)
    p = (np.full((S,), 1.0 / S) if base_weights is None
         else np.asarray(base_weights, np.float64))
    p = p / p.sum()
    # host-side multinomial (data prep, off the hot path), seeded from
    # the jax key for reproducibility (legacy uint32 or typed key)
    key_words = (np.asarray(count_key)
                 if jnp.issubdtype(count_key.dtype, jnp.integer)
                 else np.asarray(jax.random.key_data(count_key)))
    rng = np.random.default_rng(key_words.flatten().tolist())
    counts = rng.multinomial(S, p, size=n_replicates)   # (B, S)

    @jax.jit
    def sweep(k, site_weights):
        res = sample_phylogenies(k, leaves, model, params, config,
                                 site_weights=site_weights)
        return (res.elbo, res.log_weights[-1], res.ancestors,
                res.merged_nodes)

    support = {}
    elbos = np.zeros((n_replicates,))
    keys = jax.random.split(key, n_replicates)
    for r in range(n_replicates):
        sw = jnp.asarray(counts[r], dtype=leaves.dtype)
        elbo, log_w, ancestors, merged = sweep(keys[r], sw)
        elbos[r] = float(elbo)
        genealogy = decode_genealogy(ancestors, merged)
        log_w = np.asarray(log_w, np.float64)
        if map_tree:
            w = np.zeros_like(log_w)
            w[int(log_w.argmax())] = 1.0
        else:
            w = np.exp(log_w - log_w.max())
            w = w / w.sum()
        for k, rec in enumerate(genealogy):
            if w[k] == 0.0:
                continue
            for clade, _ in set(_clade_sets(taxa, rec)):
                support[clade] = support.get(clade, 0.0) + w[k]

    support = {c: s / n_replicates for c, s in support.items()}
    newick, kept = consensus_from_supports(taxa, support,
                                           threshold=threshold)
    return BootstrapResult(supports=support, consensus=newick,
                           elbos=elbos, counts=counts)
