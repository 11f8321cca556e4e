"""Topology proposals over the compacted root positions.

At rank r there are n = N - r active roots sitting in positions
0..n-1 of every particle's position arrays (the compacted-padded layout
replacing the reference's physically shrinking core).  The uniform
proposal samples an unordered pair of positions without replacement via
the Gumbel-top-2 trick, exactly the mechanism of the reference
(vcsmc.py:291-316) but masked to the active prefix instead of sized to a
shrinking tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def uniform_pair(key, K, N, n_active, dtype=jnp.float32):
    """Sample (p1, p2) position pairs uniformly without replacement among
    positions < n_active, independently per particle.

    Returns p1, p2 each (K,) int32, with p1 the arg-max gumbel (the
    reference's `particle1`, vcsmc.py:304-309).
    """
    z = jax.random.gumbel(key, (K, N), dtype=dtype)
    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)
    z = jnp.where(jnp.arange(N)[None, :] < n_active, z, neg_inf)
    _, idx = lax.top_k(z, 2)
    return idx[:, 0].astype(jnp.int32), idx[:, 1].astype(jnp.int32)
