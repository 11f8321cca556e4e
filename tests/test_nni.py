"""NNI tree search: decision conversion, move set, hill climbing."""

import numpy as np

import jax.numpy as jnp

from phylo_tpu.models.substitution import GTR, JC69
from phylo_tpu.pruning.fixed_tree import parse_newick, tree_log_likelihood
from phylo_tpu.search import (
    nni_neighbors,
    nni_search,
    tree_log_likelihoods_batch,
)
from phylo_tpu.viz.trees import robinson_foulds


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


def test_batch_scores_match_fixed_tree_scoring():
    rng = np.random.default_rng(0)
    N, S = 6, 30
    leaves = jnp.asarray(np.eye(4)[rng.integers(0, 4, (N, S))],
                         jnp.float64)
    records = [_random_record(rng, N) for _ in range(5)]
    for model in (JC69(A=4), GTR(A=4)):
        params = _full_params(model, N)
        got = np.asarray(tree_log_likelihoods_batch(
            leaves, model, params, records
        ))
        want = [float(tree_log_likelihood(leaves, model, params, r))
                for r in records]
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_nni_neighbors_count_and_shape():
    rng = np.random.default_rng(1)
    for N in (4, 6, 9):
        rec = _random_record(rng, N)
        taxa = [f"T{i}" for i in range(N)]
        nbrs = nni_neighbors(rec, N)
        assert len(nbrs) == 2 * (N - 2)
        for nb in nbrs:
            assert nb["merges"].shape == (N - 1, 2)
            # a valid tree: every leaf appears exactly once as a child,
            # every internal node except the root exactly once
            flat = list(nb["merges"].flatten())
            for v in range(N):
                assert flat.count(v) == 1
            # an NNI move changes the topology
            assert robinson_foulds(taxa, rec, nb) > 0
        # neighbor sets contain no duplicate topologies for a random
        # binary tree resolved enough to avoid symmetric collisions
        keys = set()
        for nb in nbrs:
            from phylo_tpu.viz.trees import _topology_key

            keys.add(_topology_key(taxa, nb))
        assert len(keys) == len(nbrs)


def test_nni_search_recovers_true_topology():
    from phylo_tpu.dataio.simulate import simulate_on_tree

    true_nwk = ("(((A:0.08,B:0.08):0.12,(C:0.08,D:0.08):0.12):0.10,"
                "(E:0.08,F:0.08):0.22);")
    taxa, true_rec = parse_newick(true_nwk)
    m = JC69(A=4)
    ds = simulate_on_tree(true_rec, m, {"model": {}}, 400, seed=11,
                          taxa=taxa)
    leaves = jnp.asarray(ds.genome, jnp.float64)
    params = _full_params(m, ds.N)

    # start from a maximally wrong caterpillar
    start_nwk = ("(((((A:0.2,F:0.2):0.2,C:0.2):0.2,E:0.2):0.2,"
                 "B:0.2):0.2,D:0.2);")
    _, start_rec = parse_newick(start_nwk, taxa=taxa)
    start_ll = float(tree_log_likelihood(leaves, m, params, start_rec))

    res = nni_search(leaves, m, params, start_rec, max_iters=20,
                     branch_opt_steps=10, learning_rate=0.1)
    assert res.log_likelihood > start_ll + 10.0
    # under a reversible model the likelihood identifies the tree only
    # up to root placement: compare UNROOTED topologies
    assert robinson_foulds(taxa, res.record, true_rec, rooted=False) == 0
    # history is monotone nondecreasing up to tolerance
    h = np.asarray(res.history)
    assert np.all(np.diff(h) >= -1e-6)


def test_unrooted_rf_identifies_rerooted_trees():
    # the same unrooted topology rooted two ways: rooted RF > 0 but
    # unrooted RF == 0
    taxa1, r1 = parse_newick(
        "(((A:1,B:1):1,(C:1,D:1):1):1,(E:1,F:1):1);"
    )
    _, r2 = parse_newick(
        "((((A:1,B:1):1,(E:1,F:1):1):1,C:1):1,D:1);", taxa=taxa1
    )
    assert robinson_foulds(taxa1, r1, r2) > 0
    assert robinson_foulds(taxa1, r1, r2, rooted=False) == 0
    # and a genuinely different unrooted topology stays distant
    _, r3 = parse_newick(
        "(((A:1,C:1):1,(B:1,D:1):1):1,(E:1,F:1):1);", taxa=taxa1
    )
    assert robinson_foulds(taxa1, r1, r3, rooted=False) > 0
