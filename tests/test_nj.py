"""Neighbor-joining (search/nj.py): exact recovery on additive
distances, JC correction, pairwise-deletion p-distances, and the
NJ -> likelihood pipeline."""

import numpy as np
import pytest

from phylo_tpu.pruning.fixed_tree import parse_newick
from phylo_tpu.search.nj import (
    jc_distance_matrix,
    neighbor_joining,
    p_distance_matrix,
)
from phylo_tpu.viz.trees import robinson_foulds

NWK = ("((S0:0.12,S1:0.3):0.15,((S2:0.08,S3:0.25):0.1,"
       "(S4:0.2,S5:0.05):0.18):0.07);")
TAXA = [f"S{i}" for i in range(6)]


def path_distances(record, N):
    """Leaf-to-leaf path-length matrix of a merge record."""
    merges = np.asarray(record["merges"])
    branches = np.asarray(record["branches"], np.float64)
    parent = {}
    for q in range(merges.shape[0]):
        for c in range(2):
            parent[int(merges[q, c])] = (N + q, branches[q, c])

    def ancestors(v):
        out = {v: 0.0}
        d = 0.0
        while v in parent:
            v, b = parent[v][0], parent[v][1]
            d += b
            out[v] = d
        return out

    anc = [ancestors(i) for i in range(N)]
    D = np.zeros((N, N))
    for i in range(N):
        for j in range(i + 1, N):
            shared = set(anc[i]) & set(anc[j])
            D[i, j] = D[j, i] = min(
                anc[i][v] + anc[j][v] for v in shared
            )
    return D


def test_nj_exact_on_additive_distances():
    """On an exactly additive (tree-metric) matrix NJ reproduces the
    generating tree: same unrooted topology, same path distances."""
    _, rec = parse_newick(NWK, taxa=TAXA)
    D = path_distances(rec, 6)
    out = neighbor_joining(D)
    assert robinson_foulds(TAXA, rec, out, rooted=False) == 0
    np.testing.assert_allclose(path_distances(out, 6), D, atol=1e-12)


def test_nj_shapes_and_validation():
    rec = neighbor_joining([[0.0, 1.0], [1.0, 0.0]])
    assert rec["merges"].shape == (1, 2)
    np.testing.assert_allclose(rec["branches"], [[0.5, 0.5]])
    with pytest.raises(ValueError, match="symmetric"):
        neighbor_joining([[0.0, 1.0], [2.0, 0.0]])
    with pytest.raises(ValueError, match="square"):
        neighbor_joining(np.zeros((3, 2)))


def test_p_distance_pairwise_deletion():
    """Gap (all-ones) and ambiguous rows are excluded pairwise."""
    # 3 taxa x 4 sites x A=2; taxon 2's site 0 is a gap
    g = np.zeros((3, 4, 2))
    states = [[0, 0, 1, 1], [0, 1, 1, 0], [1, 1, 1, 0]]
    for n in range(3):
        for s in range(4):
            g[n, s, states[n][s]] = 1.0
    g[2, 0] = [1.0, 1.0]
    D = p_distance_matrix(g)
    assert D[0, 1] == pytest.approx(2.0 / 4.0)   # all 4 sites compared
    assert D[0, 2] == pytest.approx(2.0 / 3.0)   # gap site 0 excluded
    assert D[1, 2] == pytest.approx(0.0)


def test_jc_correction_and_saturation():
    # p = 0 -> d = 0; saturation p >= (A-1)/A -> capped
    g = np.zeros((2, 4, 4))
    for s in range(4):
        g[0, s, s % 4] = 1.0
        g[1, s, s % 4] = 1.0
    D = jc_distance_matrix(g)
    assert D[0, 1] == 0.0
    g[1] = np.roll(g[1], 1, axis=-1)    # all sites differ: p = 1
    D = jc_distance_matrix(g, max_distance=7.0)
    assert D[0, 1] == pytest.approx(7.0)


def test_nj_topology_recovery_from_simulated_data():
    """alignment -> JC distances -> NJ recovers the generating
    topology, and the NJ tree plugs straight into the fixed-tree
    likelihood."""
    import jax.numpy as jnp

    from phylo_tpu.dataio.simulate import simulate_on_tree
    from phylo_tpu.models.substitution import JC69
    from phylo_tpu.pruning.fixed_tree import tree_log_likelihood

    model = JC69(A=4)
    params = {"model": {}}
    _, rec = parse_newick(NWK, taxa=TAXA)
    ds = simulate_on_tree(rec, model, params, S=4000, seed=3, taxa=TAXA)
    D = jc_distance_matrix(ds.genome)
    out = neighbor_joining(D)
    assert robinson_foulds(TAXA, rec, out, rooted=False) == 0
    ll = tree_log_likelihood(
        jnp.asarray(ds.genome, jnp.float64), model, params, out
    )
    assert np.isfinite(float(ll))
