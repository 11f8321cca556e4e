import json
import os
import pickle

import numpy as np

from phylo_tpu.cli.runner import main, parse_args


def test_parse_args_reference_surface():
    args = parse_args([
        "--dataset=primate_data", "--n_particles=64", "--batch_size=128",
        "--learning_rate=0.01", "--num_epoch=5", "--optimizer=Adam",
        "--M=4", "--nested=true", "--jcmodel=false",
        "--memory_optimization=off",
    ])
    assert args.n_particles == 64
    assert args.nested is True and args.jcmodel is False
    assert args.optimizer == "Adam"


def test_parse_args_defaults_match_reference():
    # reference runner.py:12-58 defaults
    args = parse_args([])
    assert args.dataset == "primate_data"
    assert args.n_particles == 10
    assert args.batch_size == 256
    assert args.learning_rate == 0.001
    assert args.num_epoch == 100
    assert args.optimizer == "GradientDescentOptimizer"
    assert abs(args.branch_prior - np.log(10)) < 1e-12
    assert args.M == 10


def test_cli_end_to_end_tiny(tmp_path):
    res = main([
        "--dataset=load_strings", "--n_particles=6", "--num_epoch=2",
        "--batch_size=5", "--optimizer=Adam", "--dtype=float64",
        f"--results_dir={tmp_path}",
    ])
    assert np.isfinite(res.elbo)
    assert os.path.isdir(res.save_dir)
    with open(os.path.join(res.save_dir, "metrics.json")) as f:
        metrics = json.load(f)
    assert len(metrics["elbo"]) == 2
    with open(os.path.join(res.save_dir, "results.p"), "rb") as f:
        r = pickle.load(f)
    assert r["nTaxa"] == 4


def test_cli_nested_tiny(tmp_path):
    res = main([
        "--dataset=load_strings", "--n_particles=4", "--num_epoch=1",
        "--batch_size=10", "--nested=true", "--M=2", "--dtype=float64",
        f"--results_dir={tmp_path}", "--no_artifacts",
    ])
    assert np.isfinite(res.elbo)


def test_cli_score_tree(tmp_path):
    from phylo_tpu.cli.score_tree import main as score_main

    nwk = "((S0:0.1,S1:0.1):0.1,(S2:0.1,S3:0.1):0.1);"
    out = str(tmp_path / "fit.nwk")
    # fixed lengths, jc69
    ll = score_main(["--dataset=load_strings", f"--newick={nwk}",
                     "--model=jc69"])
    assert np.isfinite(ll)
    # no lengths in the tree -> branch optimization implied; refit ll
    # must beat the fixed-length score of the same topology
    ll2 = score_main(["--dataset=load_strings",
                      "--newick=((S0,S1),(S2,S3));",
                      "--model=jc69", "--steps=80", f"--out={out}"])
    assert ll2 > ll
    # the written tree re-scores to the same value
    ll3 = score_main(["--dataset=load_strings", f"--newick={out}",
                      "--model=jc69"])
    np.testing.assert_allclose(ll3, ll2, rtol=1e-6)


def test_cli_score_tree_ancestral(tmp_path):
    from phylo_tpu.cli.score_tree import main as score_main

    nwk = "((S0:0.1,S1:0.1):0.1,(S2:0.1,S3:0.1):0.1);"
    npz = str(tmp_path / "anc.npz")
    fasta = str(tmp_path / "anc.fasta")
    score_main(["--dataset=load_strings", f"--newick={nwk}",
                "--model=jc69", f"--ancestral={npz}"])
    data = np.load(npz)
    V, S, A = data["post"].shape
    assert V == 7 and A == 4
    np.testing.assert_allclose(data["post"].sum(-1), 1.0, atol=1e-9)
    assert list(data["names"][-1:]) == ["root"]

    score_main(["--dataset=load_strings", f"--newick={nwk}",
                "--model=jc69", f"--ancestral={fasta}"])
    text = open(fasta).read()
    assert text.count(">") == 7 and ">root" in text


def test_cli_score_tree_nni(tmp_path):
    from phylo_tpu.cli.score_tree import main as score_main

    out = str(tmp_path / "ml.nwk")
    # mis-grouped start: NNI should not do worse than scoring it as-is
    nwk = "((S0:0.1,S2:0.1):0.1,(S1:0.1,S3:0.1):0.1);"
    ll_fixed = score_main(["--dataset=load_strings", f"--newick={nwk}",
                           "--model=jc69"])
    ll_nni = score_main(["--dataset=load_strings", f"--newick={nwk}",
                         "--model=jc69", "--nni", "--nni_iters=5",
                         "--nni_branch_steps=10", f"--out={out}"])
    assert ll_nni >= ll_fixed - 1e-6
    assert open(out).read().strip().endswith(";")


def test_cli_score_tree_spr(tmp_path):
    from phylo_tpu.cli.score_tree import main as score_main

    out = str(tmp_path / "ml_spr.nwk")
    nwk = "((S0:0.1,S2:0.1):0.1,(S1:0.1,S3:0.1):0.1);"
    ll_fixed = score_main(["--dataset=load_strings", f"--newick={nwk}",
                           "--model=jc69"])
    ll_spr = score_main(["--dataset=load_strings", f"--newick={nwk}",
                         "--model=jc69", "--spr", "--nni_iters=5",
                         "--nni_branch_steps=10", f"--out={out}"])
    assert ll_spr >= ll_fixed - 1e-6
    assert open(out).read().strip().endswith(";")


def test_cli_bootstrap(tmp_path):
    from phylo_tpu.cli.bootstrap import main as boot_main

    out = str(tmp_path / "consensus.nwk")
    res = boot_main(["--dataset=load_strings", "--n_particles=8",
                     "--n_replicates=3", "--dtype=float64",
                     f"--out={out}"])
    assert res.counts.shape[0] == 3
    text = open(out).read().strip()
    assert text.endswith(";") and "S0" in text


def test_cli_score_tree_from_run(tmp_path):
    from phylo_tpu.cli.score_tree import main as score_main

    res = main([
        "--dataset=load_strings", "--n_particles=4", "--num_epoch=1",
        "--batch_size=10", "--dtype=float64",
        f"--results_dir={tmp_path}",
    ])
    ll = score_main(["--dataset=load_strings",
                     "--newick=((S0:0.1,S1:0.1):0.1,(S2:0.1,S3:0.1):0.1);",
                     f"--run={res.save_dir}"])
    assert np.isfinite(ll)


def test_cli_score_tree_from_gamma_run(tmp_path):
    """Gamma runs save the product-space Q' (G*A x G*A); scoring tiles
    the leaf codes across categories (exact Gamma-mixture likelihood)."""
    from phylo_tpu.cli.score_tree import main as score_main

    res = main([
        "--dataset=load_strings", "--n_particles=4", "--num_epoch=1",
        "--batch_size=10", "--dtype=float64", "--gamma_categories=2",
        f"--results_dir={tmp_path}",
    ])
    npz = str(tmp_path / "anc_gamma.npz")
    ll = score_main(["--dataset=load_strings",
                     "--newick=((S0:0.1,S1:0.1):0.1,(S2:0.1,S3:0.1):0.1);",
                     f"--run={res.save_dir}", f"--ancestral={npz}"])
    assert np.isfinite(ll)
    data = np.load(npz)
    assert data["post"].shape[-1] == 8          # product space G*A
    assert data["base_post"].shape[-1] == 4     # collapsed states
    assert data["rate_category_post"].shape[-1] == 2
    np.testing.assert_allclose(data["base_post"].sum(-1), 1.0, atol=1e-8)
