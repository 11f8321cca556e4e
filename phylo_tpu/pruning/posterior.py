"""Forest-level prior/correction terms.

These operate on per-position leaf-count records with an active-root mask,
replacing the reference's shrinking (K, N-r) tensors
(reference vcsmc.py:243,247-252) with static (K, N) shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from phylo_tpu.utils.math import topology_log_prior


def forest_log_prior(leaf_counts, active_mask):
    """Sum of per-root topology log-priors over active roots.

    leaf_counts: (..., N) int; active_mask: (..., N) bool.
    Matches reference vcsmc.py:243 with masking instead of shrinking.
    """
    per_root = topology_log_prior(leaf_counts)
    return jnp.sum(jnp.where(active_mask, per_root, 0.0), axis=-1)


def overcounting_correction(leaf_counts, active_mask):
    """v_minus = sum over active roots of (c - 1{c == 1}).

    Wang et al.'s correction for the number of jump-chain paths reaching
    the same forest (reference vcsmc.py:247-252).
    """
    term = leaf_counts - (leaf_counts == 1).astype(leaf_counts.dtype)
    return jnp.sum(jnp.where(active_mask, term, 0), axis=-1)
