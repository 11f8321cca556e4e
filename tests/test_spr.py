"""SPR tree search: move set, counts, batch scoring, hill climbing."""

import numpy as np

import jax.numpy as jnp

from phylo_tpu.models.substitution import JC69
from phylo_tpu.pruning.fixed_tree import parse_newick, tree_log_likelihood
from phylo_tpu.search import (
    nni_neighbors,
    nni_search,
    spr_neighborhood_size,
    spr_neighbors,
    spr_search,
    tree_log_likelihoods_batch,
)
from phylo_tpu.viz.trees import _topology_key, robinson_foulds


def _random_record(rng, N):
    active = list(range(N))
    merges, branches = [], []
    for r in range(N - 1):
        i, j = sorted(rng.choice(len(active), size=2, replace=False))
        u, v = active[i], active[j]
        merges.append((u, v))
        branches.append(rng.exponential(0.2, size=2))
        active = [x for x in active if x != u and x != v] + [N + r]
    return {"merges": np.asarray(merges, np.int32),
            "branches": np.asarray(branches)}


def _full_params(model, N, dtype=jnp.float64):
    from phylo_tpu.models.branches import init_branch_params

    return {"model": model.init_params(dtype),
            "branches": init_branch_params(N, dtype=dtype)}


def _subtree_size_sum(record, N):
    """sum over non-root nodes c of |subtree(c)| (node count)."""
    merges = np.asarray(record["merges"])
    size = {v: 1 for v in range(N)}
    for q in range(merges.shape[0]):
        size[N + q] = 1 + size[int(merges[q, 0])] + size[int(merges[q, 1])]
    root = N + merges.shape[0] - 1
    return sum(s for v, s in size.items() if v != root)


def test_spr_neighbors_count_and_validity():
    rng = np.random.default_rng(2)
    for N in (4, 6, 8):
        rec = _random_record(rng, N)
        taxa = [f"T{i}" for i in range(N)]
        nbrs = spr_neighbors(rec, N)
        # exact topology-dependent count, inside the padding bound
        want = (2 * N - 2) * (2 * N - 3) - _subtree_size_sum(rec, N)
        assert len(nbrs) == want
        assert len(nbrs) <= spr_neighborhood_size(N)
        for nb in nbrs:
            assert nb["merges"].shape == (N - 1, 2)
            flat = list(nb["merges"].flatten())
            for v in range(N):
                assert flat.count(v) == 1       # every leaf merged once
            # branch lengths all positive (split/sum conventions)
            assert np.all(np.asarray(nb["branches"]) > 0)
            # the single identity-recreating regraft is excluded
            assert robinson_foulds(taxa, rec, nb) > 0


def test_nni_moves_are_spr_moves():
    rng = np.random.default_rng(3)
    for N in (5, 7):
        rec = _random_record(rng, N)
        taxa = [f"T{i}" for i in range(N)]
        spr_keys = {_topology_key(taxa, nb) for nb in spr_neighbors(rec, N)}
        for nb in nni_neighbors(rec, N):
            assert _topology_key(taxa, nb) in spr_keys


def test_spr_batch_scores_match_fixed_tree_scoring():
    rng = np.random.default_rng(4)
    N, S = 6, 30
    leaves = jnp.asarray(np.eye(4)[rng.integers(0, 4, (N, S))],
                         jnp.float64)
    m = JC69(A=4)
    params = _full_params(m, N)
    nbrs = spr_neighbors(_random_record(rng, N), N)
    records = [nbrs[i] for i in
               rng.choice(len(nbrs), size=5, replace=False)]
    got = np.asarray(tree_log_likelihoods_batch(leaves, m, params,
                                                records))
    want = [float(tree_log_likelihood(leaves, m, params, r))
            for r in records]
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_spr_search_recovers_true_topology():
    from phylo_tpu.dataio.simulate import simulate_on_tree

    true_nwk = ("(((A:0.08,B:0.08):0.12,(C:0.08,D:0.08):0.12):0.10,"
                "(E:0.08,F:0.08):0.22);")
    taxa, true_rec = parse_newick(true_nwk)
    m = JC69(A=4)
    ds = simulate_on_tree(true_rec, m, {"model": {}}, 400, seed=11,
                          taxa=taxa)
    leaves = jnp.asarray(ds.genome, jnp.float64)
    params = _full_params(m, ds.N)

    # the same maximally wrong caterpillar start as the NNI test
    start_nwk = ("(((((A:0.2,F:0.2):0.2,C:0.2):0.2,E:0.2):0.2,"
                 "B:0.2):0.2,D:0.2);")
    _, start_rec = parse_newick(start_nwk, taxa=taxa)
    start_ll = float(tree_log_likelihood(leaves, m, params, start_rec))

    res = spr_search(leaves, m, params, start_rec, max_iters=20,
                     branch_opt_steps=10, learning_rate=0.1)
    assert res.log_likelihood > start_ll + 10.0
    assert robinson_foulds(taxa, res.record, true_rec, rooted=False) == 0
    h = np.asarray(res.history)
    assert np.all(np.diff(h) >= -1e-6)

    # SPR's move set contains NNI's: from the same start it must end
    # at least as high (same refit budget)
    nni_res = nni_search(leaves, m, params, start_rec, max_iters=20,
                         branch_opt_steps=10, learning_rate=0.1)
    assert res.log_likelihood >= nni_res.log_likelihood - 1e-6


def test_spr_search_chunked_matches_unchunked():
    """max_particles chunking is a pure batching change: identical
    search trajectory and result (per-particle refits are
    column-independent, so chunk composition cannot affect scores)."""
    from phylo_tpu.dataio.simulate import simulate_on_tree

    true_nwk = ("(((A:0.08,B:0.08):0.12,(C:0.08,D:0.08):0.12):0.10,"
                "(E:0.08,F:0.08):0.22);")
    taxa, true_rec = parse_newick(true_nwk)
    m = JC69(A=4)
    ds = simulate_on_tree(true_rec, m, {"model": {}}, 200, seed=13,
                          taxa=taxa)
    leaves = jnp.asarray(ds.genome, jnp.float64)
    params = _full_params(m, ds.N)
    start_nwk = ("(((((A:0.2,F:0.2):0.2,C:0.2):0.2,E:0.2):0.2,"
                 "B:0.2):0.2,D:0.2);")
    _, start_rec = parse_newick(start_nwk, taxa=taxa)

    full = spr_search(leaves, m, params, start_rec, max_iters=6,
                      branch_opt_steps=5, learning_rate=0.1)
    # N=6: neighborhood bound is 80; chunk at 17 -> ~5 chunks/iter
    chunked = spr_search(leaves, m, params, start_rec, max_iters=6,
                         branch_opt_steps=5, learning_rate=0.1,
                         max_particles=17)
    assert chunked.iterations == full.iterations
    np.testing.assert_allclose(chunked.log_likelihood,
                               full.log_likelihood, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(chunked.history),
                               np.asarray(full.history), rtol=1e-10)
    assert robinson_foulds(taxa, chunked.record, full.record) == 0
