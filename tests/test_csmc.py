import numpy as np

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.substitution import FixedQ
from phylo_tpu.smc.csmc import CSMC, DEFAULT_Q4

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC"]


def test_csmc_runs_and_aggregates():
    ds = dataset_from_strings(STRINGS)
    csmc = CSMC(ds.__dict__ | {"genome": ds.genome}, seed=1)
    out = csmc.sample_phylogenies(K=8, resampling=False)
    assert out["log_weights"].shape == (8, 3)
    # rank-0 weights are the trivial 1s (log 0)
    np.testing.assert_allclose(out["log_weights"][:, 0], 0.0)
    probs = out["tree_probabilities"]
    total = sum(p for p, _ in probs)
    np.testing.assert_allclose(total, 1.0, rtol=1e-9)
    assert np.isfinite(out["norm"]) and out["norm"] > 0


def test_csmc_with_resampling():
    ds = dataset_from_strings(STRINGS)
    csmc = CSMC({"taxa": ds.taxa, "genome": ds.genome}, seed=2)
    out = csmc.sample_phylogenies(K=6, resampling=True)
    assert np.isfinite(out["log_weights"][:, 1:]).all()


def test_csmc_rejects_mismatched_q():
    ds = dataset_from_strings(STRINGS)
    import pytest

    with pytest.raises(ValueError, match="A=4"):
        CSMC({"taxa": ds.taxa, "genome": ds.genome}, Q=np.eye(6))


def test_fixedq_model_matches_csmc_constants():
    m = FixedQ(DEFAULT_Q4)
    q = np.asarray(m.Q({}))
    np.testing.assert_allclose(q, DEFAULT_Q4)
    np.testing.assert_allclose(np.asarray(m.stationary({})), 0.25)
    # transition at the oracle's fixed branch length matches scipy
    import jax.numpy as jnp
    import scipy.linalg

    P = np.asarray(m.transition({}, jnp.float64(2.0)))
    np.testing.assert_allclose(
        P, scipy.linalg.expm(DEFAULT_Q4 * 2.0), atol=1e-10
    )


def test_csmc_showing_draws_max_prob_tree(tmp_path):
    ds = dataset_from_strings(STRINGS)
    csmc = CSMC({"taxa": ds.taxa, "genome": ds.genome}, seed=3)
    path = str(tmp_path / "tree.png")
    out = csmc.sample_phylogenies(K=6, showing=True, save_path=path)
    import os

    assert os.path.exists(path)
    g = out["graph"]
    # the drawn graph is the max-probability particle's full tree:
    # N-1 internal nodes + N leaves
    assert g.number_of_nodes() == 2 * ds.N - 1
    assert out["max_prob_tree_png"] == path


def test_csmc_cli(tmp_path):
    from phylo_tpu.cli.csmc import main

    out = main([
        "--dataset=load_strings", "--n_particles=4",
        "--showing=true", f"--save_path={tmp_path}/t.png",
    ])
    import os

    assert os.path.exists(f"{tmp_path}/t.png")
    assert np.isfinite(out["norm"])
