"""Profiling and timing helpers.

The reference's only instrumentation is per-epoch datetime deltas
(reference vcsmc.py:530,590-591).  Here: a jax.profiler trace context
for TensorBoard-compatible device traces, and a block timer that
synchronizes device work before reading the clock.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(logdir):
    """Capture an XLA device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class BlockTimer:
    """Wall-clock timer that blocks on device completion.

    Usage:
        with BlockTimer("epoch") as t: ...
        print(t.seconds)
    """

    def __init__(self, name="", sync=None):
        self.name = name
        self.sync = sync  # optional array/pytree to block_until_ready
        self.seconds = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync is not None:
            jax.block_until_ready(self.sync)
        self.seconds = time.perf_counter() - self.t0
        return False


def timed(fn, *args, warmup=1, iters=3, **kwargs):
    """Compile + time a jitted callable; returns (seconds_per_call,
    last_output)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out
