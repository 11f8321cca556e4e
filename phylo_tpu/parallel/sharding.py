"""Sharding specs for the SMC sweep (GSPMD).

Strategy (SURVEY.md sections 2.2/5): shard the site axis; optionally
shard particles.  Everything is expressed as sharding constraints on the
sweep's inputs and big carried buffers -- XLA's SPMD partitioner then
propagates the layout through the scan and inserts the collectives
(psum of per-site log-likelihood partial sums over ICI; gathers across
'k' only if particles are sharded).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class SweepSharding:
    """NamedShardings for the sweep's distributed tensors.

    leaves:  (N, S, A)          -> S on 's'
    core:    (K, N-1, S, A)     -> K on 'k' (if present), S on 's'
    particles: (K, ...) vectors -> K on 'k' (if present)
    """

    leaves: NamedSharding       # public (N, S, A) input
    leaves_sm: NamedSharding    # internal states-major (N, A, S)
    core: NamedSharding         # internal (K, N-1, A, S) message buffer
    particles: NamedSharding
    sites: NamedSharding
    replicated: NamedSharding
    mesh: Mesh

    def site_multiple(self):
        """Sites must be padded to a multiple of the 's' axis size."""
        names = self.mesh.axis_names
        return self.mesh.shape["s"] if "s" in names else 1


def sweep_sharding(mesh: Mesh) -> SweepSharding:
    names = mesh.axis_names
    k_ax = "k" if "k" in names else None
    s_ax = "s" if "s" in names else None
    return SweepSharding(
        leaves=NamedSharding(mesh, P(None, s_ax, None)),
        leaves_sm=NamedSharding(mesh, P(None, None, s_ax)),
        core=NamedSharding(mesh, P(k_ax, None, None, s_ax)),
        particles=NamedSharding(mesh, P(k_ax)),
        sites=NamedSharding(mesh, P(s_ax)),
        replicated=NamedSharding(mesh, P()),
        mesh=mesh,
    )


def pad_sites(leaves, multiple, site_weights=None):
    """Pad the site axis of (N, S, A) leaves to a multiple of the mesh's
    's' size with all-ones (missing-data) columns, returning
    (padded_leaves, site_weights) where padding sites carry weight 0 so
    they contribute nothing to any log-likelihood reduction."""
    import numpy as _np

    N, S, A = leaves.shape
    pad = (-S) % multiple
    if site_weights is None:
        site_weights = _np.ones(S)
    if pad == 0:
        return leaves, _np.asarray(site_weights)
    pad_block = _np.ones((N, pad, A), dtype=_np.asarray(leaves).dtype)
    padded = _np.concatenate([_np.asarray(leaves), pad_block], axis=1)
    w = _np.concatenate([_np.asarray(site_weights), _np.zeros(pad)])
    return padded, w


def shard_leaves(leaves, shardings: Optional[SweepSharding]):
    if shardings is None:
        return leaves
    return jax.device_put(leaves, shardings.leaves)
