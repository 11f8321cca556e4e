"""Multi-host (multi-process) initialization over DCN.

The reference has no distribution layer whatsoever -- its only device
hints are commented-out ``tf.device('/gpu:0')`` lines (reference
vcsmc.py:155,196).  This module is the framework's SURVEY section 2.2
commitment: `jax.distributed` process initialization so a mesh can span
hosts (TPU slices over DCN, or multi-process CPU in tests), with GSPMD
inserting the cross-host collectives exactly as in the single-host case.

Usage (one call per process, before any other JAX operation touches
devices):

    from phylo_tpu.parallel import initialize_distributed
    initialize_distributed(coordinator_address="host0:1234",
                           num_processes=8, process_id=this_process)

or fully env-driven (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID, and on Cloud TPU pods simply no arguments at all --
jax.distributed autodetects).  After initialization, ``jax.devices()``
is the GLOBAL device list and ``make_mesh`` builds meshes spanning all
hosts; sharded arrays are created with ``host_local_to_global`` /
``jax.device_put`` on replicated host data.

Validated by tests/test_distributed.py: two CPU processes x two local
devices each run the site-sharded sweep over a 4-device global mesh and
reproduce the single-process ELBO to 1e-10.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Initialize jax.distributed for this process.

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
    / JAX_PROCESS_ID environment variables; with none given and no env
    set, this is a no-op returning False (single-process mode) unless
    running on a TPU pod where jax.distributed can autodetect.

    Returns True when distributed mode was initialized.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID") is not None:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_summary() -> str:
    """One-line description of this process's slice of the platform."""
    return (
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"{len(jax.local_devices())} local / "
        f"{len(jax.devices())} global {jax.default_backend()} devices"
    )
