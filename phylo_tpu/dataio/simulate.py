"""Simulate sequence evolution ALONG A TREE under a substitution model.

The reference's only generator is iid uniform noise with no tree signal
(`simulateDNA`, reference runner.py:100-104 — kept as
`datasets.simulate_dna`).  This module draws root states from the
stationary distribution and evolves them down a given topology through
the model's transition matrices — the standard generative counterpart
of the pruning likelihood, enabling parameter-recovery validation
(simulate on a known tree, check the inferred branch lengths /
likelihood behave; tests/test_simulate.py).

Trees use the same merge-record convention as the sweep and
`pruning.fixed_tree.parse_newick`.
"""

from __future__ import annotations

import numpy as np


def simulate_on_tree(record, model, params, S, *, seed=0, taxa=None,
                     name=None):
    """Evolve S iid sites down the tree in `record`.

    record: {'merges': (R, 2) node ids (leaves 0..N-1, internal N+q in
        postorder), 'branches': (R, 2) child edge lengths} — from
        parse_newick or a decoded sweep particle.
    model/params: substitution model; transitions P(b) = expm(Q b) and
        root states ~ stationary(params).
    Returns a PhyloDataset with one-hot (N, S, A) genomes.

    The recursion runs root -> leaves: the root's state is stationary,
    and each child's state follows the parent's COLUMN of the model's
    merge-oriented transition matrix, Categorical(M(b)[:, parent_state])
    (M[a, b] = P(child a | parent b); models/substitution.py module
    docstring).  Per-edge matrices come from the model's own
    `transition` (so JC69 closed form, uniformized expm, GammaSites
    product space etc. are all exercised exactly as the likelihood sees
    them), which keeps simulation and pruning likelihood consistent:
    exactly for reversible models (JC69/GTR/HKY/GammaSites -- see
    tests/test_orientation.py's enumeration checks), and up to the
    per-column renormalization for ReferenceQ/FixedQ, whose raw
    expm(Qb) columns are not distributions (the reference's score is
    unnormalized over leaf patterns; its stationary vector is a free
    parameter unrelated to Q).
    """
    from phylo_tpu.dataio.datasets import PhyloDataset

    merges = np.asarray(record["merges"])
    branches = np.asarray(record["branches"], dtype=np.float64)
    R = merges.shape[0]
    N = R + 1
    A = model.A
    rng = np.random.default_rng(seed)

    pi = np.asarray(model.stationary(params["model"]), np.float64)
    pi = pi / pi.sum()
    # (R, 2, A, A) merge-oriented matrices in one batched call;
    # transpose so rows index the PARENT state (generative orientation)
    P = np.asarray(
        model.transition(params["model"], branches), np.float64
    )
    P = np.swapaxes(P, -1, -2)
    # guard tiny negative / unnormalized rows from f32 expm
    P = np.clip(P, 0.0, None)
    P = P / P.sum(axis=-1, keepdims=True)

    states = {}
    root = N + R - 1
    states[root] = rng.choice(A, size=S, p=pi)
    # children resolve in reverse postorder (parents before children)
    for q in range(R - 1, -1, -1):
        parent = states[N + q]
        for side in (0, 1):
            child = int(merges[q, side])
            # vectorized per-site categorical via inverse-CDF on the
            # parent state's row
            rows = P[q, side][parent]              # (S, A)
            u = rng.random(S)
            states[child] = (rows.cumsum(axis=1) < u[:, None]).sum(
                axis=1
            ).clip(0, A - 1)

    genome = np.zeros((N, S, A), dtype=np.float64)
    for n in range(N):
        genome[n, np.arange(S), states[n]] = 1.0
    if taxa is None:
        taxa = [f"S{i}" for i in range(N)]
    return PhyloDataset(
        name=name or f"simulated_tree_{N}x{S}",
        taxa=list(taxa),
        genome=genome,
    )
