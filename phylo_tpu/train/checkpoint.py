"""Checkpoint / resume via Orbax.

The reference has no checkpointing at all -- a dead run loses everything
except the end-of-run pickle (SURVEY.md section 5).  Here params +
optimizer state + epoch are saved per checkpoint directory and restored
by path.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path, params, opt_state, epoch):
    path = os.path.abspath(str(path))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": params,
        "opt_state": opt_state,
        "epoch": np.asarray(epoch),
    }
    ckptr.save(os.path.join(path, f"epoch_{epoch}"), payload, force=True)
    ckptr.wait_until_finished()
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
    """Restore (params, opt_state, epoch) from a checkpoint directory or
    its parent (picks the latest epoch)."""
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
    return (
        restored["params"],
        restored["opt_state"],
        int(restored["epoch"]),
    )
