"""Model selection (models/selection.py): canonical parameter counts,
joint model+branch optimization, and criterion-based ranking on data
with a known generating model."""

import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.dataio.simulate import simulate_on_tree
from phylo_tpu.models.selection import (
    ModelFit,
    n_free_parameters,
    select_model,
)
from phylo_tpu.models.substitution import HKY, get_model
from phylo_tpu.pruning.fixed_tree import optimize_tree, parse_newick

NWK = ("((S0:0.12,S1:0.3):0.15,((S2:0.08,S3:0.25):0.1,"
       "(S4:0.2,S5:0.05):0.18):0.07);")
TAXA = [f"S{i}" for i in range(6)]


@pytest.mark.parametrize("spec,k", [
    ("jc69", 0),
    ("hky", 4),
    ("gtr", 8),
    ("reference", 11),       # 4*2 off-diagonal + 3 stationary
    ("jc69+i", 1),
    ("jc69+g4", 1),
    ("gtr+g4", 9),
    ("gtr+g4+i", 10),
    ("jc69+r3", 4),          # 2 free weights + 3 rates - 1 constraint
])
def test_n_free_parameters(spec, k):
    assert n_free_parameters(get_model(spec, A=4)) == k


def _hky_data(S=800, seed=11):
    """Simulate under HKY with kappa=4 and skewed stationary probs."""
    model = HKY()
    params = {"model": {
        "log_kappa": jnp.asarray(np.log(4.0)),
        "y_station": jnp.asarray(np.log([0.4, 0.3, 0.2, 0.1])),
    }}
    _, rec = parse_newick(NWK, taxa=TAXA)
    ds = simulate_on_tree(rec, model, params, S=S, seed=seed, taxa=TAXA)
    return ds, rec, model, params


def test_optimize_tree_fits_model_and_branches():
    """Joint fit recovers kappa ~ 4 and beats the init likelihood."""
    ds, rec, model, _ = _hky_data()
    leaves = jnp.asarray(ds.genome, jnp.float64)
    from phylo_tpu.pruning.fixed_tree import tree_log_likelihood

    params0 = {"model": model.init_params(jnp.float64)}
    ll0 = float(tree_log_likelihood(leaves, model, params0, rec))
    params, branches, ll = optimize_tree(
        leaves, model, params0, rec, steps=250
    )
    assert float(ll) > ll0
    kappa = float(jnp.exp(params["model"]["log_kappa"]))
    assert 2.5 < kappa < 6.5
    assert branches.shape == (5, 2)
    assert np.all(np.asarray(branches) > 0)


def test_select_model_prefers_generating_family():
    """HKY-generated data: hky beats jc69 on every criterion, and the
    full pipeline (record=None -> NJ topology) runs end-to-end."""
    ds, _, _, _ = _hky_data()
    fits = select_model(
        ds.genome, candidates=["jc69", "hky"], criterion="bic",
        steps=250, dtype=jnp.float64,
    )
    assert isinstance(fits[0], ModelFit)
    assert fits[0].spec == "hky"
    by = {f.spec: f for f in fits}
    assert by["hky"].log_likelihood > by["jc69"].log_likelihood
    assert by["hky"].aic < by["jc69"].aic
    assert by["hky"].aicc < by["jc69"].aicc
    # counts flow into the criteria: same branches, different k_model
    assert by["hky"].k_model == 4 and by["jc69"].k_model == 0
    assert by["hky"].k_branches == by["jc69"].k_branches == 10


def test_select_model_criterion_validation():
    with pytest.raises(ValueError, match="criterion"):
        select_model(np.zeros((3, 4, 4)), criterion="lrt")
    with pytest.raises(ValueError, match="no default candidate"):
        select_model(np.zeros((3, 4, 20)), criterion="bic")


def test_cli_model_select(tmp_path, capsys):
    from phylo_tpu.cli.model_select import main

    out = tmp_path / "best.nwk"
    best = main([
        "--dataset=load_strings", "--candidates=jc69,jc69+g4",
        "--steps=40", f"--out={out}",
    ])
    assert best in ("jc69", "jc69+g4")
    text = capsys.readouterr().out
    assert "ranking by BIC" in text and "best model:" in text
    # the written tree parses back against the dataset taxa
    from phylo_tpu.dataio import load_dataset

    ds = load_dataset("load_strings")
    _, rec = parse_newick(out.read_text(), taxa=list(ds.taxa))
    assert rec["merges"].shape == (ds.N - 1, 2)
