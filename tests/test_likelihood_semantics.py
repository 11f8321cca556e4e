"""Semantic invariants tying the sweep's outputs to independent
computations: the de-biased log likelihood equals a from-scratch
Felsenstein pruning evaluation of the decoded tree, and ELBO gradients
match finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.viz.trees import decode_genealogy
from tests.test_sweep_parity import make_decisions

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC",
           "ACTTCGACTG", "TCTTCGACGG"]


def independent_tree_loglik(leaves, Q, pi, record):
    """From-scratch Felsenstein pruning over one decoded particle's tree
    (no shared code with the sweep)."""
    N = leaves.shape[0]
    merges = record["merges"]
    branches = record["branches"]
    msgs = {n: leaves[n] for n in range(N)}
    for q in range(merges.shape[0]):
        c1, c2 = (int(x) for x in merges[q])
        b1, b2 = branches[q]
        P1 = scipy.linalg.expm(Q * b1)
        P2 = scipy.linalg.expm(Q * b2)
        msgs[N + q] = (msgs[c1] @ P1) * (msgs[c2] @ P2)
    root = N + merges.shape[0] - 1
    return float(np.log(msgs[root] @ pi).sum())


def test_log_likelihood_R_equals_independent_pruning():
    ds = dataset_from_strings(STRINGS)
    N, K = ds.N, 5
    model = ReferenceQ(A=4)
    rng = np.random.default_rng(7)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    rates = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    dec = make_decisions(rng, N, K, rates, rates)
    res = sample_phylogenies(
        jax.random.PRNGKey(0), jnp.asarray(ds.genome), model, params,
        SweepConfig(K=K), decisions=dec,
    )
    gen = decode_genealogy(
        np.asarray(res.ancestors), np.asarray(res.merged_nodes),
        np.asarray(res.left_branches), np.asarray(res.right_branches),
    )
    Q = np.asarray(model.Q(params["model"]))
    pi = np.asarray(model.stationary(params["model"]))
    for k in range(K):
        want = independent_tree_loglik(ds.genome, Q, pi, gen[k])
        got = float(res.log_likelihood_R[k])
        np.testing.assert_allclose(got, want, rtol=1e-8)


def test_elbo_gradient_matches_finite_differences():
    ds = dataset_from_strings(STRINGS[:4])
    N, K = 4, 4
    model = ReferenceQ(A=4)
    rng = np.random.default_rng(1)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    rates = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    dec = make_decisions(rng, N, K, rates, rates)
    # NOTE: with injected decisions the branch samples are CONSTANTS, so
    # this checks the density/likelihood gradient paths (the reference's
    # biased estimator treats sampled indices the same way)
    leaves = jnp.asarray(ds.genome)

    def elbo(params):
        return sample_phylogenies(
            jax.random.PRNGKey(0), leaves, model, params,
            SweepConfig(K=K), decisions=dec,
        ).elbo

    g = jax.grad(elbo)(params)
    eps = 1e-6
    for path, idx in [
        (("branches", "log_rates_l"), 1),
        (("branches", "log_rates_r"), 2),
        (("model", "y_q"), (0, 1)),
        (("model", "y_station"), 3),
    ]:
        p_plus = jax.tree.map(lambda x: x, params)
        p_minus = jax.tree.map(lambda x: x, params)
        arr = params[path[0]][path[1]]
        p_plus[path[0]] = dict(p_plus[path[0]])
        p_minus[path[0]] = dict(p_minus[path[0]])
        p_plus[path[0]][path[1]] = arr.at[idx].add(eps)
        p_minus[path[0]][path[1]] = arr.at[idx].add(-eps)
        fd = (elbo(p_plus) - elbo(p_minus)) / (2 * eps)
        got = g[path[0]][path[1]][idx]
        np.testing.assert_allclose(
            float(got), float(fd), rtol=2e-4,
            err_msg=f"{path}[{idx}]",
        )
