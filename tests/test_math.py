import jax.numpy as jnp
import numpy as np

from phylo_tpu.utils.math import (
    log_double_factorial_odd,
    n_choose_2,
    topology_log_prior,
)


def _df(n):
    out = 1
    while n >= 2:
        out *= n
        n -= 2
    return out


def test_log_double_factorial_matches_direct():
    ns = np.arange(1, 41, 2)
    got = np.asarray(log_double_factorial_odd(jnp.asarray(ns)))
    want = np.log([float(_df(int(n))) for n in ns])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_topology_log_prior_clamps_singletons():
    # c=1 and c=2 both give (2*2-3)!! = 1!! = 1 -> log prior 0
    got = np.asarray(topology_log_prior(jnp.asarray([1, 2, 3, 5])))
    want = -np.log([1.0, 1.0, 3.0, 105.0])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_n_choose_2():
    np.testing.assert_allclose(
        np.asarray(n_choose_2(jnp.asarray([2, 3, 12]))), [1.0, 3.0, 66.0]
    )
