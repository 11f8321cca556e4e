import os

import numpy as np
import pytest

from phylo_tpu.dataio import dataset_from_strings, simulate_dna
from phylo_tpu.train import TrainConfig, train
from phylo_tpu.train.minibatch import site_batches

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC"]


def small_config(tmp_path, **kw):
    base = dict(
        n_particles=8,
        batch_size=5,
        learning_rate=0.01,
        num_epoch=3,
        optimizer="Adam",
        dtype="float64",
        results_dir=str(tmp_path),
        log_every=0,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_site_batches_partition(rng):
    idx = list(site_batches(rng, 10, 3))
    assert all(len(b) == 3 for b in idx)
    assert len(idx) == 3
    flat = np.concatenate(idx)
    assert len(set(flat.tolist())) == 9  # disjoint
    # keep-last mode covers all sites
    idx = list(site_batches(rng, 10, 3, drop_last=False))
    assert sorted(np.concatenate(idx).tolist()) == list(range(10))


def test_train_improves_elbo(tmp_path):
    ds = dataset_from_strings(STRINGS)
    res = train(ds, small_config(tmp_path, num_epoch=8, batch_size=10))
    elbos = res.history["elbo"]
    assert np.isfinite(elbos).all()
    # stochastic, but 8 Adam epochs on 4 taxa must improve on average
    assert np.mean(elbos[-3:]) > np.mean(elbos[:2]) - 1.0


def test_train_jc_model(tmp_path):
    ds = dataset_from_strings(STRINGS)
    res = train(ds, small_config(tmp_path, jcmodel=True, num_epoch=2))
    assert np.isfinite(res.elbo)
    # JC has no model params to train
    assert res.params["model"] == {}


def test_artifacts_written(tmp_path):
    ds = dataset_from_strings(STRINGS)
    res = train(ds, small_config(tmp_path, num_epoch=2))
    assert res.save_dir and os.path.isdir(res.save_dir)
    files = set(os.listdir(res.save_dir))
    assert {"run_parameters.txt", "results.p", "metrics.json"} <= files
    import pickle

    with open(os.path.join(res.save_dir, "results.p"), "rb") as f:
        r = pickle.load(f)
    assert r["nParticles"] == 8 and r["nTaxa"] == 4
    assert len(r["cost"]) == 2
    assert r["best_jump_chain"] and r["best_jump_chain"].endswith(";")


def test_checkpoint_resume(tmp_path):
    ds = simulate_dna(4, 12, seed=1)
    cfg = small_config(tmp_path, num_epoch=2, checkpoint_every=1,
                       collect_trees=False)
    res = train(ds, cfg)
    ckpt_dir = os.path.join(res.save_dir, "ckpt")
    assert os.path.isdir(ckpt_dir)

    from phylo_tpu.train.checkpoint import latest_checkpoint

    latest = latest_checkpoint(ckpt_dir)
    assert latest and latest.endswith("epoch_2")

    cfg2 = small_config(tmp_path, num_epoch=3, resume_from=ckpt_dir,
                        collect_trees=False)
    res2 = train(ds, cfg2)
    # resumed at epoch 2, trains one more
    assert len(res2.history["elbo"]) == 1


def test_fixed_partition_mode(tmp_path):
    ds = dataset_from_strings(STRINGS)
    res = train(ds, small_config(tmp_path, fixed_partition=True,
                                 num_epoch=2))
    assert np.isfinite(res.elbo)


def test_unknown_optimizer_raises(tmp_path):
    ds = dataset_from_strings(STRINGS)
    with pytest.raises(KeyError, match="unknown optimizer"):
        train(ds, small_config(tmp_path, optimizer="rmsprop"))
