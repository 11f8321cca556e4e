"""Marginal ancestral reconstruction vs brute-force enumeration."""

import numpy as np

import jax
import jax.numpy as jnp

from phylo_tpu.models.substitution import GTR, GammaSites, JC69
from phylo_tpu.pruning.ancestral import (
    ancestral_marginals,
    collapse_categories,
    decode_states,
)
from phylo_tpu.pruning.fixed_tree import parse_newick, tree_log_likelihood

NEWICK = "((A:0.12,B:0.3):0.07,(C:0.21,D:0.05):0.14);"


def _skewed_gtr(seed=3):
    m = GTR(A=4)
    key = jax.random.PRNGKey(seed)
    p = m.init_params(jnp.float64)
    p = jax.tree.map(
        lambda x: x + 0.5 * jax.random.normal(key, x.shape, x.dtype), p
    )
    return m, {"model": p}


def _enum_marginals(merges, M, pi, leaf_codes):
    """Brute force over ALL node states: weight = pi(root) *
    prod_edges M[child_state, parent_state] * prod_leaves code[leaf,
    state] (M in merge orientation).  Returns (V, A) marginals for one
    site plus the pattern likelihood."""
    R = merges.shape[0]
    N = R + 1
    V = N + R
    A = pi.shape[0]
    post = np.zeros((V, A))
    total = 0.0
    for states in np.ndindex(*([A] * V)):
        w = pi[states[V - 1]]
        for i in range(N):
            w *= leaf_codes[i][states[i]]
        for q in range(R):
            for side in (0, 1):
                c = int(merges[q, side])
                w *= M[q, side][states[c], states[N + q]]
        total += w
        for v in range(V):
            post[v, states[v]] += w
    return post / total, total


def test_marginals_match_enumeration_gtr():
    m, params = _skewed_gtr()
    taxa, rec = parse_newick(NEWICK)
    M = np.asarray(m.transition(params["model"],
                                jnp.asarray(rec["branches"])))
    pi = np.asarray(m.stationary(params["model"]))

    # site 0: distinct unambiguous states; site 1: leaf B is a gap row
    # (all-ones) and C an R = {A, G} purine code
    leaves = np.zeros((4, 2, 4))
    leaves[np.arange(4), 0, [0, 1, 2, 3]] = 1.0
    leaves[0, 1, 2] = 1.0
    leaves[1, 1, :] = 1.0
    leaves[2, 1, 0] = leaves[2, 1, 2] = 1.0
    leaves[3, 1, 1] = 1.0

    post, ll = ancestral_marginals(jnp.asarray(leaves), m, params, rec)
    post = np.asarray(post)

    want_ll = 0.0
    for s in range(2):
        want, lik = _enum_marginals(rec["merges"], M, pi,
                                    [leaves[i, s] for i in range(4)])
        np.testing.assert_allclose(post[:, s, :], want, atol=1e-10)
        want_ll += np.log(lik)
    np.testing.assert_allclose(float(ll), want_ll, rtol=1e-9)
    # and the up pass IS tree_log_likelihood
    np.testing.assert_allclose(
        float(ll),
        float(tree_log_likelihood(jnp.asarray(leaves), m, params, rec)),
        rtol=1e-12,
    )


def test_unambiguous_leaves_stay_onehot_and_rows_normalize():
    m = JC69(A=4)
    params = {"model": {}}
    taxa, rec = parse_newick(NEWICK)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 4, size=(4, 6))
    leaves = np.eye(4)[states]
    post, _ = ancestral_marginals(jnp.asarray(leaves), m, params, rec)
    post = np.asarray(post)
    np.testing.assert_allclose(post.sum(axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(post[:4], leaves, atol=1e-12)


def test_decode_states_and_deep_tree_stability():
    # a 64-leaf caterpillar in float32 exercises the per-site rescaling
    N = 64
    nwk = "A0:0.1"
    for i in range(1, N):
        nwk = f"({nwk},A{i}:0.1):0.1"
    taxa, rec = parse_newick(nwk + ";")
    m = JC69(A=4)
    rng = np.random.default_rng(1)
    leaves = np.eye(4, dtype=np.float32)[rng.integers(0, 4, (N, 5))]
    post, ll = ancestral_marginals(jnp.asarray(leaves), m,
                                   {"model": {}}, rec)
    assert np.isfinite(float(ll))
    assert np.isfinite(np.asarray(post)).all()
    seqs = decode_states(post)
    assert len(seqs) == 2 * N - 1 and len(seqs[0]) == 5
    assert set("".join(seqs)) <= set("ACGT")


def test_collapse_categories_consistency():
    base, bparams = _skewed_gtr(seed=9)
    m = GammaSites(base, G=3)
    p = m.init_params(jnp.float64)
    p["base"] = bparams["model"]
    p["log_alpha"] = jnp.float64(np.log(0.5))
    params = {"model": p}
    taxa, rec = parse_newick(NEWICK)
    rng = np.random.default_rng(2)
    leaves = np.eye(4)[rng.integers(0, 4, (4, 7))]
    post, ll = ancestral_marginals(
        jnp.asarray(m.expand_leaves(leaves)), m, params, rec
    )
    base_post, cat_post = collapse_categories(post, m.G)
    np.testing.assert_allclose(np.asarray(base_post).sum(-1), 1.0,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(cat_post).sum(-1), 1.0,
                               atol=1e-10)
    # the rate category is a tree-wide hidden variable: every node's
    # category posterior is the same distribution
    cp = np.asarray(cat_post)
    np.testing.assert_allclose(
        cp, np.broadcast_to(cp[-1], cp.shape), atol=1e-8
    )
    # leaf base marginals recover the observed states
    np.testing.assert_allclose(np.asarray(base_post)[:4], leaves,
                               atol=1e-10)
