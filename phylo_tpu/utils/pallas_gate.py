"""Sticky per-process gate for Pallas auto-dispatch under GSPMD.

pallas_call has no GSPMD partitioning rule, so kernels that auto-engage
inside traced sweeps (models.expm_kernel, smc.resample_kernel) must
stand down once any mesh-sharded sweep has been traced in this process:
XLA would otherwise have to replicate their operands across the mesh,
or fail to partition.  smc.sweep flips the flag at trace time on its
first sharded trace; single-chip processes (bench, trainer without a
mesh) never do.  Explicit env "1" overrides in each kernel's own gate.
"""

from __future__ import annotations

_SHARDED_TRACE_SEEN = False


def notify_sharded_trace():
    """Record that a GSPMD-sharded sweep has been traced."""
    global _SHARDED_TRACE_SEEN
    _SHARDED_TRACE_SEEN = True


def sharded_trace_seen():
    return _SHARDED_TRACE_SEEN
