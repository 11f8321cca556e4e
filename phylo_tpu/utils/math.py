"""Closed-form combinatorial primitives.

The reference computes log double factorials with a TF `while_loop`
(reference vcsmc.py:30-57) and n-choose-r with `reduce_prod` over ranges
(vcsmc.py:23-27).  On TPU we want closed forms: a `lgamma` identity for the
double factorial (no data-dependent loop) and the trivial n(n-1)/2 for
pairs.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def log_double_factorial_odd(n):
    """log(n!!) for odd, positive ``n`` (elementwise).

    For odd n = 2k - 1 (k >= 1):

        (2k-1)!! = (2k)! / (2^k k!)
        log((2k-1)!!) = lgamma(2k+1) - k log 2 - lgamma(k+1)

    The reference only ever evaluates double factorials at odd arguments:
    2*max(leaves, 2) - 3 (vcsmc.py:199,227,243) and 2N - 3 (vcsmc.py:266).
    """
    n = jnp.asarray(n)
    nf = n.astype(jnp.result_type(float))
    k = (nf + 1.0) / 2.0
    return lax.lgamma(2.0 * k + 1.0) - k * jnp.log(2.0) - lax.lgamma(k + 1.0)


def topology_log_prior(leaf_counts):
    """Per-root topology log prior  -log((2*max(c,2) - 3)!!)  (elementwise).

    Matches reference vcsmc.py:199/227/243: the number of rooted binary
    topologies on c leaves is (2c-3)!! for c >= 2; singleton roots are
    clamped to c=2 so their prior is log(1!!) = 0.
    """
    c = jnp.maximum(leaf_counts, 2)
    return -log_double_factorial_odd(2 * c - 3)


def n_choose_2(n):
    """C(n, 2) as a float (reference `ncr(n, 2)`, vcsmc.py:23-27)."""
    nf = jnp.asarray(n).astype(jnp.result_type(float))
    return nf * (nf - 1.0) / 2.0
