"""Fixed-tree scoring (pruning.fixed_tree): Newick round-trip, parity
with an independent scipy-expm pruning oracle and with the sweep's
decoded-tree likelihood, branch-length gradients, and the ML
branch-length fit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import JC69, ReferenceQ
from phylo_tpu.pruning.fixed_tree import (
    optimize_branch_lengths,
    parse_newick,
    tree_log_likelihood,
)
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.viz.trees import decode_genealogy, to_newick

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC",
           "ACTTCGACTG", "TCTTCGACGG"]
NWK = ("((S0:0.11,S1:0.07):0.3,((S2:0.05,S3:0.21):0.09,"
       "(S4:0.4,S5:0.02):0.13):0.06);")


def _setup(dtype=jnp.float64):
    ds = dataset_from_strings(STRINGS)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(dtype),
        "branches": init_branch_params(ds.N, dtype=dtype),
    }
    return ds, model, params


def _oracle(leaves, Q, pi, merges, branches):
    N = leaves.shape[0]
    msgs = {n: leaves[n] for n in range(N)}
    for q in range(merges.shape[0]):
        c1, c2 = (int(x) for x in merges[q])
        P1 = scipy.linalg.expm(Q * branches[q, 0])
        P2 = scipy.linalg.expm(Q * branches[q, 1])
        msgs[N + q] = (msgs[c1] @ P1) * (msgs[c2] @ P2)
    return float(np.log(msgs[N + merges.shape[0] - 1] @ pi).sum())


def test_parse_newick_structure():
    taxa, rec = parse_newick(NWK)
    assert taxa == [f"S{i}" for i in range(6)]
    assert rec["merges"].shape == (5, 2)
    assert rec["branches"].shape == (5, 2)
    # postorder: first merge is (S0, S1) with its edge lengths
    np.testing.assert_array_equal(rec["merges"][0], [0, 1])
    np.testing.assert_allclose(rec["branches"][0], [0.11, 0.07])
    # root children are the two top clades, last row
    root_kids = set(rec["merges"][-1].tolist())
    assert all(k >= 6 for k in root_kids)


def test_parse_newick_taxa_reorder_and_quotes():
    taxa, rec = parse_newick("(('b x':0.1,a:0.2):0.3,(c:0.1,d:0.4):0.2);",
                             taxa=["a", "b x", "c", "d"])
    assert taxa == ["a", "b x", "c", "d"]
    np.testing.assert_array_equal(rec["merges"][0], [1, 0])
    # no lengths at all -> record without 'branches'
    _, rec2 = parse_newick("((a,b),(c,d));")
    assert "branches" not in rec2


def test_parse_newick_whitespace_and_multiline():
    taxa, rec = parse_newick(
        "( (S0:0.1, S1:0.2):0.3,\n  (S2:0.1,\n   S3:0.4):0.2\n);"
    )
    assert taxa == ["S0", "S1", "S2", "S3"]
    np.testing.assert_allclose(rec["branches"][0], [0.1, 0.2])
    # quoted labels keep their internal spaces
    t2, _ = parse_newick("('a b':1, c:1);")
    assert t2 == ["a b", "c"]


def test_parse_newick_negative_lengths():
    nwk = "((S0:-0.05,S1:0.1):0.1,(S2:0.1,S3:0.1):0.1);"
    with pytest.raises(ValueError, match="negative branch length"):
        parse_newick(nwk)
    _, rec = parse_newick(nwk, clamp_negative=True)
    assert rec["branches"][0, 0] == 0.0
    np.testing.assert_allclose(rec["branches"][0, 1], 0.1)


def test_parse_newick_deep_caterpillar():
    N = 600
    nwk = "L0"
    for i in range(1, N):
        nwk = f"({nwk}:0.1,L{i}:0.1)"
    taxa, rec = parse_newick(nwk + ";")
    assert len(taxa) == N and rec["merges"].shape == (N - 1, 2)


def test_optimize_branch_lengths_zero_init_moves():
    ds, model, params = _setup()
    _, rec = parse_newick(NWK, clamp_negative=True)
    b0 = np.asarray(rec["branches"]).copy()
    b0[1, 0] = 0.0                      # a clamped NJ-style zero edge
    leaves = jnp.asarray(ds.genome)
    b, ll = optimize_branch_lengths(leaves, model, params, rec,
                                    steps=60, init=b0)
    assert np.isfinite(float(ll))
    assert float(b[1, 0]) > 0.0         # not frozen at log(0)


def test_parse_newick_errors():
    with pytest.raises(ValueError, match="BINARY"):
        parse_newick("(a:1,b:1,c:1);")
    with pytest.raises(ValueError, match="duplicate"):
        parse_newick("((a:1,a:1):1,b:1);")
    with pytest.raises(ValueError, match="not in taxa"):
        parse_newick("(a:1,b:1);", taxa=["a", "c"])
    with pytest.raises(ValueError, match="missing taxa"):
        parse_newick("(a:1,b:1);", taxa=["a", "b", "c"])
    with pytest.raises(ValueError, match="some edges"):
        parse_newick("((a:1,b):1,(c:1,d:1));")


def test_newick_roundtrip_with_sweep_record():
    ds, model, params = _setup()
    res = sample_phylogenies(
        jax.random.PRNGKey(3), jnp.asarray(ds.genome), model, params,
        SweepConfig(K=4),
    )
    gen = decode_genealogy(
        np.asarray(res.ancestors), np.asarray(res.merged_nodes),
        np.asarray(res.left_branches), np.asarray(res.right_branches),
    )
    from phylo_tpu.viz.trees import _topology_key

    leaves = jnp.asarray(ds.genome)
    for rec in gen:
        nwk = to_newick(ds.taxa, rec)
        taxa2, rec2 = parse_newick(nwk, taxa=list(ds.taxa))
        # internal-node numbering differs (sweep rank order vs parser
        # postorder); the TREE must be identical: same canonical
        # topology and same likelihood (invariant to relabeling)
        assert _topology_key(ds.taxa, rec2) == _topology_key(ds.taxa, rec)
        ll1 = float(tree_log_likelihood(leaves, model, params, rec))
        ll2 = float(tree_log_likelihood(leaves, model, params, rec2))
        np.testing.assert_allclose(ll2, ll1, rtol=1e-5)


def test_tree_log_likelihood_matches_oracle():
    ds, model, params = _setup()
    taxa, rec = parse_newick(NWK)
    leaves = jnp.asarray(ds.genome)
    got = float(tree_log_likelihood(leaves, model, params, rec))
    Q = np.asarray(model.Q(params["model"]))
    pi = np.asarray(model.stationary(params["model"]))
    want = _oracle(ds.genome, Q, pi, rec["merges"], rec["branches"])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_tree_log_likelihood_matches_sweep_decoded_tree():
    """Scoring a decoded SMC particle's tree must reproduce the sweep's
    de-biased log_likelihood_R for that particle."""
    ds, model, params = _setup()
    res = sample_phylogenies(
        jax.random.PRNGKey(11), jnp.asarray(ds.genome), model, params,
        SweepConfig(K=5),
    )
    gen = decode_genealogy(
        np.asarray(res.ancestors), np.asarray(res.merged_nodes),
        np.asarray(res.left_branches), np.asarray(res.right_branches),
    )
    leaves = jnp.asarray(ds.genome)
    for k in range(5):
        got = float(tree_log_likelihood(leaves, model, params, gen[k]))
        np.testing.assert_allclose(
            got, float(res.log_likelihood_R[k]), rtol=1e-8
        )


def test_tree_log_likelihood_branch_gradients():
    ds, model, params = _setup()
    _, rec = parse_newick(NWK)
    leaves = jnp.asarray(ds.genome)

    def ll(b):
        return tree_log_likelihood(leaves, model, params, rec, branches=b)

    b0 = jnp.asarray(rec["branches"])
    g = jax.grad(ll)(b0)
    assert np.isfinite(np.asarray(g)).all()
    eps = 1e-6
    fd = (ll(b0.at[2, 1].add(eps)) - ll(b0.at[2, 1].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(g[2, 1]), float(fd), rtol=1e-5)


def test_f32_rescaled_matches_f64_at_hohna_scale():
    """The per-site rescaling keeps float32 exact-enough at DS1 scale
    (27 taxa x 1949 sites): fixed-tree log-likelihood in f32 matches
    f64 to ~1e-6 relative."""
    ds = load_dataset_or_skip("hohna_data_1")
    # a random binary coalescence over the 27 taxa, built directly as a
    # merge record (node ids: leaves 0..N-1, internal N+q)
    rng = np.random.default_rng(0)
    active = list(range(ds.N))
    merges, branches = [], []
    for q in range(ds.N - 1):
        i, j = sorted(rng.choice(len(active), 2, replace=False))
        merges.append((active[i], active[j]))
        branches.append(rng.uniform(0.02, 0.5, 2))
        active = [n for k, n in enumerate(active) if k not in (i, j)]
        active.append(ds.N + q)
    rec = {"merges": np.asarray(merges, np.int32),
           "branches": np.asarray(branches)}
    model = ReferenceQ(A=ds.A)
    lls = {}
    for dtype in (jnp.float64, jnp.float32):
        params = {"model": model.init_params(dtype)}
        leaves = jnp.asarray(ds.genome, dtype=dtype)
        lls[dtype] = float(
            tree_log_likelihood(leaves, model, params, rec)
        )
    np.testing.assert_allclose(lls[jnp.float32], lls[jnp.float64],
                               rtol=2e-6)


def load_dataset_or_skip(name):
    from phylo_tpu.dataio import load_dataset

    try:
        return load_dataset(name)
    except FileNotFoundError:  # pragma: no cover - vendored-data envs
        pytest.skip(f"dataset {name} unavailable")


def test_optimize_branch_lengths_improves_and_beats_start():
    ds, model, params = _setup()
    _, rec = parse_newick(NWK)
    leaves = jnp.asarray(ds.genome)
    ll0 = float(tree_log_likelihood(leaves, model, params, rec))
    b, ll = optimize_branch_lengths(leaves, model, params, rec, steps=100)
    assert float(ll) > ll0
    assert (np.asarray(b) > 0).all()
    # JC69 sanity: same API works with the closed-form model
    m2 = JC69(A=4)
    p2 = {"model": m2.init_params(jnp.float64),
          "branches": init_branch_params(ds.N, dtype=jnp.float64)}
    _, ll2 = optimize_branch_lengths(leaves, m2, p2, rec, steps=50)
    assert np.isfinite(float(ll2))
