"""Transition-matrix orientation: the pruning likelihood must be the
TEXTBOOK likelihood for the generative (reversible) models, and the
simulator must sample from exactly the law the likelihood scores.

The merge contracts `merged(b) = sum_a msg(a) M[a, b]` (the reference's
`data @ P`, vcsmc.py:180-188), so `model.transition` returns
merge-oriented matrices M[child, parent] = P(child | parent) -- the
transpose of the row-stochastic expm(Qb) for GTR/HKY (see the
substitution.py module docstring).  Before that fix, GTR/HKY with
non-uniform pi scored a non-standard quantity: the enumeration test
here caught a ~1-nat discrepancy on a single site.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phylo_tpu.models.substitution import GTR, HKY, GammaSites
from phylo_tpu.pruning.fixed_tree import parse_newick, tree_log_likelihood


def _skewed_gtr(seed=3):
    m = GTR(A=4)
    key = jax.random.PRNGKey(seed)
    p = m.init_params(jnp.float64)
    p = jax.tree.map(
        lambda x: x + 0.5 * jax.random.normal(key, x.shape, x.dtype), p
    )
    return m, {"model": p}


def _enum_textbook(merges, P_gen, pi, leaf_states):
    """Brute-force likelihood of one site: root ~ pi, every edge evolves
    parent -> child through the ROW-stochastic P_gen[q, side]."""
    R = merges.shape[0]
    N = R + 1
    A = pi.shape[0]
    total = 0.0
    for states in np.ndindex(*([A] * R)):
        st = {i: leaf_states[i] for i in range(N)}
        for q in range(R):
            st[N + q] = states[q]
        pr = pi[st[N + R - 1]]
        for q in range(R):
            for side in (0, 1):
                pr *= P_gen[q, side][st[N + q], st[int(merges[q, side])]]
        total += pr
    return total


@pytest.mark.parametrize("model_name", ["gtr", "hky", "gamma"])
def test_likelihood_matches_textbook_enumeration(model_name):
    # 4 taxa, one site per distinct leaf pattern; non-uniform pi makes
    # expm(Qb) asymmetric, so any orientation slip shifts the answer
    taxa, rec = parse_newick("((A:0.12,B:0.3):0.07,(C:0.21,D:0.05):0.14);")
    if model_name == "gtr":
        m, params = _skewed_gtr()
    elif model_name == "hky":
        m = HKY(A=4)
        p = m.init_params(jnp.float64)
        p["log_kappa"] = jnp.float64(np.log(3.0))
        p["y_station"] = jnp.asarray([0.7, -0.2, 0.1, -0.6], jnp.float64)
        params = {"model": p}
    else:
        base, bparams = _skewed_gtr()
        m = GammaSites(base, G=3)
        p = m.init_params(jnp.float64)
        p["base"] = bparams["model"]
        p["log_alpha"] = jnp.float64(np.log(0.7))
        params = {"model": p}

    A = m.A
    branches = jnp.asarray(rec["branches"])
    M = np.asarray(m.transition(params["model"], branches))  # (R, 2, A, A)
    # generative orientation: rows index the parent state
    P_gen = np.swapaxes(M, -1, -2)
    np.testing.assert_allclose(P_gen.sum(axis=-1), 1.0, atol=1e-8)
    pi = np.asarray(m.stationary(params["model"]))

    base_A = 4
    patterns = [(0, 1, 2, 3), (0, 0, 0, 0), (2, 2, 1, 3)]
    for pat in patterns:
        leaves = np.zeros((4, 1, base_A))
        leaves[np.arange(4), 0, list(pat)] = 1.0
        if model_name == "gamma":
            lv = m.expand_leaves(leaves)
        else:
            lv = leaves
        ll = float(tree_log_likelihood(
            jnp.asarray(lv), m, params, rec
        ))
        if model_name == "gamma":
            # product-space leaves repeat the pattern per category; the
            # enumeration runs over the expanded A = G*4 state space
            # with expanded leaf "states" replaced by the multi-hot
            # rows -- easier: enumerate per category and average
            base_P = np.asarray(m.transition_blocks(
                params["model"], branches
            ))                                     # (R, 2, G, 4, 4)
            liks = []
            for g in range(m.G):
                Pg = np.swapaxes(base_P[..., g, :, :], -1, -2)
                liks.append(_enum_textbook(
                    rec["merges"], Pg,
                    np.asarray(base.stationary(params["model"]["base"])),
                    list(pat),
                ))
            want = float(np.mean(liks))
        else:
            want = _enum_textbook(rec["merges"], P_gen, pi, list(pat))
        np.testing.assert_allclose(ll, np.log(want), rtol=1e-9)


def test_leaf_pattern_probabilities_normalize():
    # sum over every possible leaf pattern of exp(ll) == 1: the pruning
    # score of a reversible model is a proper generative distribution
    m, params = _skewed_gtr(seed=11)
    taxa, rec = parse_newick("((A:0.4,B:0.15):0.2,C:0.3);")
    A = 4
    configs = list(np.ndindex(A, A, A))
    leaves = np.zeros((3, len(configs), A))
    for s, cfg in enumerate(configs):
        leaves[np.arange(3), s, list(cfg)] = 1.0

    # per-site log-likelihoods: score each pattern as its own tree
    lv = jnp.asarray(leaves)
    lls = []
    fn = jax.jit(lambda x: tree_log_likelihood(x, m, params, rec))
    for s in range(len(configs)):
        lls.append(float(fn(lv[:, s:s + 1, :])))
    total = np.exp(np.asarray(lls)).sum()
    np.testing.assert_allclose(total, 1.0, rtol=1e-8)


def test_simulator_samples_the_scored_law():
    # empirical two-leaf pattern frequencies ~ exp(per-pattern ll)
    from phylo_tpu.dataio.simulate import simulate_on_tree

    m, params = _skewed_gtr(seed=5)
    taxa, rec = parse_newick("(A:0.3,B:0.6);")
    S = 40000
    ds = simulate_on_tree(rec, m, params, S, seed=7)
    counts = np.zeros((4, 4))
    sa = np.argmax(ds.genome[0], axis=-1)
    sb = np.argmax(ds.genome[1], axis=-1)
    np.add.at(counts, (sa, sb), 1.0)

    fn = jax.jit(lambda x: tree_log_likelihood(x, m, params, rec))
    for a in range(4):
        for b in range(4):
            lv = np.zeros((2, 1, 4))
            lv[0, 0, a] = 1.0
            lv[1, 0, b] = 1.0
            p = float(np.exp(fn(jnp.asarray(lv))))
            se = np.sqrt(p * (1 - p) / S)
            assert abs(counts[a, b] / S - p) < 5 * se + 1e-4, (
                a, b, counts[a, b] / S, p
            )
