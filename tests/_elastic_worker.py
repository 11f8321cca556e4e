"""Worker process for tests/test_elastic.py (not a test module).

Trains on the tiny built-in strings dataset with checkpointing into a
stable directory, optionally dying via the trainer's fault-injection
harness, then dumps (elbo history, final params) to a pickle.

Argv: ckpt_dir out_pickle num_epoch [fault_injection]
"""

import os
import pickle
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

ckpt_dir, out_pickle, num_epoch = sys.argv[1], sys.argv[2], int(sys.argv[3])
fault = sys.argv[4] if len(sys.argv) > 4 else None

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from phylo_tpu.dataio import load_dataset  # noqa: E402
from phylo_tpu.train.trainer import TrainConfig, train  # noqa: E402

config = TrainConfig(
    n_particles=6,
    batch_size=5,
    num_epoch=num_epoch,
    learning_rate=0.05,
    optimizer="adam",
    dtype="float64",
    seed=7,
    save_artifacts=False,
    collect_trees=False,
    collect_jump_chains=False,
    log_every=0,
    checkpoint_every=1,
    checkpoint_dir=ckpt_dir,
    resume_from="auto",
    fault_injection=fault,
)
result = train(load_dataset("load_strings"), config)

with open(out_pickle, "wb") as f:
    pickle.dump(
        {
            "elbo": result.history["elbo"],
            "params": jax.tree.map(np.asarray, result.params),
        },
        f,
    )
print("worker done")
