"""Checkpoint / resume via Orbax.

The reference has no checkpointing at all -- a dead run loses everything
except the end-of-run pickle (SURVEY.md section 5).  Here params +
optimizer state + epoch are saved per checkpoint directory and restored
by path; the training history is pickled next to the Orbax payload so a
resumed run's results.p covers pre-resume epochs too.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path, params, opt_state, epoch, history=None):
    path = os.path.abspath(str(path))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": params,
        "opt_state": opt_state,
        "epoch": np.asarray(epoch),
    }
    ckptr.save(os.path.join(path, f"epoch_{epoch}"), payload, force=True)
    ckptr.wait_until_finished()
    if history is not None:
        # ragged per-epoch lists -> plain pickle, not an Orbax pytree
        with open(os.path.join(path, f"epoch_{epoch}.history.p"),
                  "wb") as f:
            pickle.dump(history, f)
    return os.path.join(path, f"epoch_{epoch}")


def latest_checkpoint(path):
    path = os.path.abspath(str(path))
    if not os.path.isdir(path):
        return None
    epochs = []
    for d in os.listdir(path):
        if d.startswith("epoch_") and d[6:].isdigit():
            epochs.append(int(d[6:]))
    if not epochs:
        return None
    return os.path.join(path, f"epoch_{max(epochs)}")


def restore_checkpoint(path, params_like, opt_state_like):
    """Restore (params, opt_state, epoch, history) from a checkpoint
    directory or its parent (picks the latest epoch).  history is None
    for checkpoints written without one."""
    path = os.path.abspath(str(path))
    if os.path.basename(path).startswith("epoch_") is False:
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = latest
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": params_like,
        "opt_state": opt_state_like,
        "epoch": np.asarray(0),
    }
    restored = ckptr.restore(path, target)
    history = None
    hist_path = path + ".history.p"
    if os.path.exists(hist_path):
        with open(hist_path, "rb") as f:
            history = pickle.load(f)
    return (
        restored["params"],
        restored["opt_state"],
        int(restored["epoch"]),
        history,
    )
