"""Failure detection / elastic recovery (SURVEY.md section 5).

The reference loses everything when a run dies.  These tests pin the
framework's recovery contract:

* a SIGKILL mid-training (injected via TrainConfig.fault_injection,
  simulating preemption/power loss) costs at most the epochs since the
  last checkpoint, and a rerun with resume_from="auto" completes and
  reproduces the uninterrupted run BIT-IDENTICALLY (per-epoch folded
  PRNG streams + atomic Orbax checkpoints);
* the in-process `train_elastic` supervisor retries transient
  exceptions and converges to the same result.
"""

import pickle
import subprocess
import sys

import numpy as np
import pytest

WORKER = "tests/_elastic_worker.py"
EPOCHS = 5


def _run_worker(ckpt_dir, out, num_epoch, fault=None, check=True):
    cmd = [sys.executable, WORKER, str(ckpt_dir), str(out),
           str(num_epoch)]
    if fault:
        cmd.append(fault)
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=600)
    if check and proc.returncode != 0:
        raise AssertionError(
            f"worker rc={proc.returncode}\n{proc.stdout}\n{proc.stderr}"
        )
    return proc


def test_sigkill_resume_reproduces_uninterrupted_run(tmp_path):
    # uninterrupted reference run
    ref_out = tmp_path / "ref.p"
    _run_worker(tmp_path / "ckpt_ref", ref_out, EPOCHS)

    # crashed run: SIGKILL at the start of epoch 3 (after the epoch-3
    # checkpoint from epoch index 2 landed)
    crash_ckpt = tmp_path / "ckpt_crash"
    crash_out = tmp_path / "crash.p"
    proc = _run_worker(crash_ckpt, crash_out, EPOCHS,
                       fault="sigkill:3", check=False)
    assert proc.returncode == -9, (proc.returncode, proc.stderr)
    assert not crash_out.exists()
    # the atomic checkpoints survived the kill
    assert (crash_ckpt / "epoch_3").exists()

    # elastic restart: same command, resume_from='auto' picks up the
    # latest checkpoint and completes
    _run_worker(crash_ckpt, crash_out, EPOCHS, fault="sigkill:3")

    with open(ref_out, "rb") as f:
        ref = pickle.load(f)
    with open(crash_out, "rb") as f:
        res = pickle.load(f)

    # bit-identical: same per-epoch ELBO trajectory (incl. pre-crash
    # epochs restored from the checkpointed history) and same params
    assert res["elbo"] == ref["elbo"], (res["elbo"], ref["elbo"])
    import jax

    for a, b in zip(jax.tree.leaves(ref["params"]),
                    jax.tree.leaves(res["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_elastic_retries_transient_failures(tmp_path, monkeypatch):
    import jax

    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.train.elastic import train_elastic
    from phylo_tpu.train.trainer import TrainConfig, train

    ds = load_dataset("load_strings")

    def cfg(**kw):
        base = dict(
            n_particles=4, batch_size=5, num_epoch=3,
            learning_rate=0.05, optimizer="adam", dtype="float64",
            seed=3, save_artifacts=False, collect_trees=False,
            collect_jump_chains=False, log_every=0,
            checkpoint_every=1, checkpoint_dir=str(tmp_path / "ck"),
        )
        base.update(kw)
        return TrainConfig(**base)

    failures = []
    result = train_elastic(
        ds, cfg(fault_injection="raise:2"),
        max_restarts=2, on_failure=lambda a, e: failures.append(str(e)),
    )
    assert len(failures) == 1 and "injected fault" in failures[0]
    assert len(result.history["elbo"]) == 3

    # same trajectory as a clean run
    clean = train(ds, cfg(checkpoint_dir=str(tmp_path / "ck_clean")))
    assert result.history["elbo"] == clean.history["elbo"]


def test_train_elastic_requires_stable_checkpoints(tmp_path):
    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.train.elastic import train_elastic
    from phylo_tpu.train.trainer import TrainConfig

    with pytest.raises(ValueError, match="checkpoint"):
        train_elastic(load_dataset("load_strings"),
                      TrainConfig(num_epoch=1))


def test_train_elastic_honors_explicit_resume_from(tmp_path):
    """An explicit resume_from (warm start) must not be silently
    replaced with 'auto' on the first attempt."""
    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.train.elastic import train_elastic
    from phylo_tpu.train.trainer import TrainConfig

    cfg = TrainConfig(
        n_particles=4, batch_size=5, num_epoch=1, log_every=0,
        save_artifacts=False, collect_trees=False,
        collect_jump_chains=False, checkpoint_every=1,
        checkpoint_dir=str(tmp_path / "ck"),
        resume_from=str(tmp_path / "does_not_exist"),
    )
    with pytest.raises(FileNotFoundError):
        train_elastic(load_dataset("load_strings"), cfg, max_restarts=0)
