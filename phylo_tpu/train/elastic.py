"""Elastic training: automatic resume-from-checkpoint on failure.

The reference has no failure story at all -- a dead run loses
everything except the end-of-run pickle (SURVEY.md section 5).  Here
two mechanisms compose:

1. **Crash-consistent checkpoints** (train.checkpoint): Orbax writes
   atomically (tmp dir + rename), so a process killed mid-save leaves
   either the previous or the new checkpoint, never a torn one.
2. **Deterministic per-epoch PRNG streams** (trainer.train): every key
   is a pure function of (seed, epoch, step), so a run resumed from the
   epoch-e checkpoint replays epochs e.. bit-identically to the
   uninterrupted run (asserted by tests/test_elastic.py, including
   under a SIGKILL mid-training).

`train_elastic` is the in-process supervisor on top: it retries
`train` after transient failures (device resets, preemption-style
exceptions), resuming from the latest checkpoint each time.  Process
death (SIGKILL / machine loss) is covered by re-running the same
command -- `resume_from="auto"` finds the latest checkpoint in the
stable `checkpoint_dir`.
"""

from __future__ import annotations

import dataclasses
import time


def train_elastic(dataset, config, max_restarts=3, retry_delay_s=0.0,
                  on_failure=None):
    """Run `trainer.train` with automatic resume on failure.

    config must set `checkpoint_every` > 0 and a stable
    `checkpoint_dir` (the timestamped per-run default cannot be found
    again after a restart).  Returns the TrainResult of the successful
    attempt; re-raises the last failure after `max_restarts` retries.

    on_failure: optional callback (attempt:int, exc:Exception) -> None,
    e.g. for alerting; exceptions it raises abort the supervisor.
    """
    from phylo_tpu.train.trainer import train

    if not config.checkpoint_every or not config.checkpoint_dir:
        raise ValueError(
            "train_elastic needs checkpoint_every > 0 and a stable "
            "checkpoint_dir"
        )
    # first attempt honors an explicit resume_from (e.g. warm-starting
    # from another run's checkpoint); retries always pick up the latest
    # checkpoint in this run's stable checkpoint_dir
    cfg = (config if config.resume_from
           else dataclasses.replace(config, resume_from="auto"))
    retry_cfg = dataclasses.replace(config, resume_from="auto")
    last_exc = None
    for attempt in range(max_restarts + 1):
        try:
            return train(dataset, cfg if attempt == 0 else retry_cfg)
        except KeyboardInterrupt:
            raise
        except Exception as exc:  # noqa: BLE001 -- supervisor boundary
            last_exc = exc
            if on_failure is not None:
                on_failure(attempt, exc)
            if attempt < max_restarts:
                print(
                    f"train_elastic: attempt {attempt + 1} failed "
                    f"({type(exc).__name__}: {exc}); resuming from "
                    f"latest checkpoint in {cfg.checkpoint_dir}"
                )
                if retry_delay_s:
                    time.sleep(retry_delay_s)
    raise last_exc
