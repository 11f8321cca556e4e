"""Generative/inferential consistency: data simulated ALONG a tree
must be recoverable by the likelihood machinery built on the same
model — the standard self-check the reference cannot run (its only
generator is iid noise)."""

import jax.numpy as jnp
import numpy as np

from phylo_tpu.dataio.simulate import simulate_on_tree
from phylo_tpu.models.substitution import JC69
from phylo_tpu.pruning.fixed_tree import (
    optimize_branch_lengths,
    parse_newick,
    tree_log_likelihood,
)

NWK = ("((S0:0.12,S1:0.3):0.15,((S2:0.08,S3:0.25):0.1,"
       "(S4:0.2,S5:0.05):0.18):0.07);")


def test_two_taxon_distance_recovery():
    """ML branch length on a 2-taxon tree estimates the JC69 distance.

    Under the reference's JC69 generator (off-diag 1/A, diag -(A-1)/A,
    vcsmc.py:125-130 — NOT the unit-expected-rate textbook scaling),
    expm gives P_ii = 1/4 + 3/4 e^{-d}, so the expected mismatch
    fraction for total path length d is p = 3/4 (1 - exp(-d))."""
    model = JC69(A=4)
    params = {"model": model.init_params(jnp.float64)}
    _, rec = parse_newick("(A:0.15,B:0.15);")
    ds = simulate_on_tree(rec, model, params, S=20000, seed=1,
                          taxa=["A", "B"])
    x = np.argmax(ds.genome[0], axis=-1)
    y = np.argmax(ds.genome[1], axis=-1)
    p_hat = float((x != y).mean())
    d_hat = -np.log(1 - 4.0 * p_hat / 3.0)
    # total simulated path length is 0.3
    assert abs(d_hat - 0.3) < 0.02

    # the ML fit recovers the same total length (only the sum of the
    # two root edges is identified for a 2-leaf tree)
    leaves = jnp.asarray(ds.genome, jnp.float64)
    b, ll = optimize_branch_lengths(leaves, model, params, rec,
                                    steps=300, learning_rate=0.05)
    total = float(b.sum())
    assert abs(total - d_hat) < 0.01


def test_true_tree_beats_perturbed_lengths():
    model = JC69(A=4)
    params = {"model": model.init_params(jnp.float64)}
    _, rec = parse_newick(NWK)
    ds = simulate_on_tree(rec, model, params, S=5000, seed=2)
    leaves = jnp.asarray(ds.genome, jnp.float64)
    ll_true = float(tree_log_likelihood(leaves, model, params, rec))
    # doubling every branch length must fit the data worse
    worse = dict(rec, branches=np.asarray(rec["branches"]) * 2.0)
    ll_worse = float(tree_log_likelihood(leaves, model, params, worse))
    assert ll_true > ll_worse
    # ML refit from a mis-specified start lands near the truth
    b, ll_fit = optimize_branch_lengths(
        leaves, model, params, rec, steps=250,
        init=np.full_like(np.asarray(rec["branches"]), 0.4),
    )
    assert ll_fit >= ll_true - 3.0
    np.testing.assert_allclose(np.asarray(b),
                               np.asarray(rec["branches"]),
                               atol=0.08)


def test_stationary_composition():
    """Simulated base composition follows the model's stationary
    distribution (JC69: uniform) at the root and the leaves."""
    model = JC69(A=4)
    params = {"model": model.init_params(jnp.float64)}
    _, rec = parse_newick(NWK)
    ds = simulate_on_tree(rec, model, params, S=8000, seed=3)
    freqs = ds.genome.sum(axis=(0, 1)) / (ds.N * ds.S)
    np.testing.assert_allclose(freqs, 0.25, atol=0.02)
