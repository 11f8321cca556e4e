"""Device mesh construction.

The reference has no distribution layer at all (SURVEY.md section 2.2:
single process, commented-out `tf.device` hints).  Here the scaling axes
are:

* ``'s'`` -- sites.  Per-site log-likelihood contributions are additive
  and every pruning kernel is elementwise in S, so the S axis shards
  cleanly; XLA inserts one psum per forest-posterior reduction over ICI.
  This is the framework's long-alignment story (Hohna DS1 at S=1949,
  betacorona at S=3260, and beyond).
* ``'k'`` -- particles.  Optional; resampling induces all-to-all index
  gathers across 'k', which XLA lowers to collectives.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape=None, axis_names=("k", "s"), devices=None):
    """Build a Mesh over the available devices.

    shape: tuple matching axis_names; None uses all devices on the last
    ('s') axis.  A 1-element shape maps to a pure site mesh ('s',).
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if len(shape) == 1:
        axis_names = (axis_names[-1],)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(shape)
    return Mesh(arr, axis_names)
