"""Host-side genealogy decoding: integer merge records -> named trees.

The reference carries *string* jump-chain tensors through its TF
while_loop (reference vcsmc.py:311-313,424-425), which cannot exist inside
XLA.  The TPU sweep instead records, per rank, the resampling ancestor
indices and the two coalesced node ids (SweepResult.ancestors /
merged_nodes); this module reconstructs, on the host:

* per-particle merge-name chains ("Homo_sapiens+Pan" style, the
  reference's jump chain entries),
* Newick strings with branch lengths,
* tree posterior probabilities by grouping identical topologies
  (reference csmc.py:335-349).

Node id convention: ids < N are leaves (taxa order); id N + q is the
internal node created at rank q.  Because particles are resampled, node
N + q of the particle that survives to the end is the one created by its
*ancestor* at rank q -- the lineage is resolved by walking the ancestor
indices backwards (standard SMC genealogy tracing).
"""

from __future__ import annotations

import numpy as np


def _lineage(ancestors, k):
    """Per-rank particle index of final particle k's lineage.

    ancestors: (R, K) ancestor indices applied at the START of each rank
    (identity at rank 0).  Returns array j of length R with j[R-1] = k and
    j[r-1] = ancestors[r, j[r]].
    """
    R = ancestors.shape[0]
    j = np.zeros(R, dtype=int)
    j[R - 1] = k
    for r in range(R - 1, 0, -1):
        j[r - 1] = ancestors[r, j[r]]
    return j


def decode_genealogy(ancestors, merged_nodes, left_branches=None,
                     right_branches=None):
    """Resolve per-particle lineages.

    Returns a list (length K) of dicts with:
      'lineage'  (R,) per-rank particle row of this particle's ancestry
      'merges'   (R, 2) node ids coalesced per rank along the lineage
      'branches' (R, 2) branch lengths per rank (if provided)
    """
    ancestors = np.asarray(ancestors)
    merged_nodes = np.asarray(merged_nodes)
    R, K = ancestors.shape
    out = []
    for k in range(K):
        j = _lineage(ancestors, k)
        merges = merged_nodes[np.arange(R), j]
        rec = {"lineage": j, "merges": merges}
        if left_branches is not None:
            lb = np.asarray(left_branches)[np.arange(R), j]
            rb = np.asarray(right_branches)[np.arange(R), j]
            rec["branches"] = np.stack([lb, rb], axis=1)
        out.append(rec)
    return out


def _node_namer(taxa, merges):
    N = len(taxa)

    cache = {}

    def name(n):
        n = int(n)
        if n < N:
            return taxa[n]
        if n in cache:
            return cache[n]
        c1, c2 = merges[n - N]
        s = name(c1) + "+" + name(c2)
        cache[n] = s
        return s

    return name


def merge_name_chains(taxa, genealogy):
    """Per-particle list of merged-clade names per rank, the analogue of
    the reference's jump chain strings (vcsmc.py:311)."""
    out = []
    for rec in genealogy:
        name = _node_namer(taxa, rec["merges"])
        out.append(
            [name(len(taxa) + r) for r in range(rec["merges"].shape[0])]
        )
    return out


def to_newick(taxa, record):
    """Newick string (with branch lengths when available) for one decoded
    particle record."""
    N = len(taxa)
    merges = record["merges"]
    branches = record.get("branches")

    def nwk(n):
        n = int(n)
        if n < N:
            return taxa[n]
        q = n - N
        c1, c2 = merges[q]
        if branches is not None:
            b1, b2 = branches[q]
            return f"({nwk(c1)}:{b1:.6g},{nwk(c2)}:{b2:.6g})"
        return f"({nwk(c1)},{nwk(c2)})"

    root = N + merges.shape[0] - 1
    return nwk(root) + ";"


def _topology_key(taxa, record):
    """Canonical frozenset-of-clades key identifying an unrooted-labeled
    topology (reference csmc.py:335-343 groups particles by their vertex
    dict key sets)."""
    N = len(taxa)
    merges = record["merges"]

    sets = {}

    def clade(n):
        n = int(n)
        if n < N:
            return frozenset([taxa[n]])
        if n in sets:
            return sets[n]
        c1, c2 = merges[n - N]
        s = clade(c1) | clade(c2)
        sets[n] = s
        return s

    keys = []
    for q in range(merges.shape[0]):
        keys.append(clade(N + q))
    return frozenset(keys)


def tree_probabilities(taxa, genealogy, log_weights_last):
    """Aggregate final-rank particle weights by identical topology.

    Mirrors reference csmc.py:335-349 but in log space: returns a list of
    (probability, representative particle index) sorted descending, where
    probability is the normalized sum of final weights over particles
    sharing the topology.
    """
    log_w = np.asarray(log_weights_last, dtype=np.float64)
    w = np.exp(log_w - log_w.max())
    groups = {}
    for k, rec in enumerate(genealogy):
        key = _topology_key(taxa, rec)
        groups.setdefault(key, []).append(k)
    total = w.sum()
    out = [
        (float(w[idxs].sum() / total), idxs[0])
        for idxs in groups.values()
    ]
    out.sort(reverse=True)
    return out
