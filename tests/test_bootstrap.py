"""Felsenstein bootstrap over sites on the SMC sweep."""

import numpy as np

import jax
import jax.numpy as jnp

from phylo_tpu.dataio.simulate import simulate_on_tree
from phylo_tpu.models.substitution import JC69
from phylo_tpu.pruning.fixed_tree import parse_newick
from phylo_tpu.smc.bootstrap import bootstrap_supports
from phylo_tpu.smc.sweep import SweepConfig


def _signal_dataset(S=160):
    # well-separated 4-taxon tree: cherries (A,B) and (C,D) carry
    # strong signal at these branch lengths
    taxa, rec = parse_newick(
        "((A:0.06,B:0.06):0.30,(C:0.06,D:0.06):0.30);"
    )
    m = JC69(A=4)
    params = {"model": {}}
    ds = simulate_on_tree(rec, m, params, S, seed=4, taxa=taxa)
    return taxa, ds


def test_bootstrap_recovers_true_clades():
    taxa, ds = _signal_dataset()
    m = JC69(A=4)
    params = {
        "model": {},
        "branches": __import__(
            "phylo_tpu.models.branches", fromlist=["init_branch_params"]
        ).init_branch_params(ds.N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(ds.genome, jnp.float64)
    res = bootstrap_supports(
        jax.random.PRNGKey(0), leaves, m, params, SweepConfig(K=16),
        n_replicates=8, taxa=taxa,
    )
    assert res.counts.shape == (8, ds.S)
    np.testing.assert_array_equal(res.counts.sum(axis=1), ds.S)
    assert np.isfinite(res.elbos).all()
    for c, s in res.supports.items():
        assert 0.0 <= s <= 1.0 + 1e-12, (c, s)
    ab = res.supports.get(frozenset({"A", "B"}), 0.0)
    cd = res.supports.get(frozenset({"C", "D"}), 0.0)
    assert ab > 0.7 and cd > 0.7, (ab, cd)
    # consensus tree contains both cherries with their support labels
    assert "(A,B)" in res.consensus or "(B,A)" in res.consensus
    assert res.consensus.endswith(";")


def test_bootstrap_reproducible_and_map_mode():
    taxa, ds = _signal_dataset(S=80)
    m = JC69(A=4)
    from phylo_tpu.models.branches import init_branch_params

    params = {"model": {},
              "branches": init_branch_params(ds.N, dtype=jnp.float64)}
    leaves = jnp.asarray(ds.genome, jnp.float64)
    kw = dict(n_replicates=4, taxa=taxa)
    r1 = bootstrap_supports(jax.random.PRNGKey(7), leaves, m, params,
                            SweepConfig(K=8), **kw)
    r2 = bootstrap_supports(jax.random.PRNGKey(7), leaves, m, params,
                            SweepConfig(K=8), **kw)
    assert r1.supports == r2.supports
    np.testing.assert_array_equal(r1.counts, r2.counts)

    r3 = bootstrap_supports(jax.random.PRNGKey(7), leaves, m, params,
                            SweepConfig(K=8), map_tree=True, **kw)
    # MAP mode counts one tree per replicate: every support is a
    # multiple of 1/B
    for s in r3.supports.values():
        np.testing.assert_allclose(s * 4, round(s * 4), atol=1e-9)
