"""Exponential branch-length variational family.

The reference learns per-rank Exponential proposal rates, parameterized as
rate = exp(variable) with variable initialized to `branch_prior`
(reference vcsmc.py:119-120; runner.py default branch_prior = log 10).
Sampling uses the reparameterized exponential (b = standard_exp / rate) so
pathwise gradients flow to the rates, matching tfp's reparameterized
Exponential.sample (vcsmc.py:353-356).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def init_branch_params(n_taxa, branch_prior=float(np.log(10.0)),
                       dtype=jnp.float32):
    """Per-rank log-rates for left and right branches ((N-1,) each)."""
    n_ranks = n_taxa - 1
    return {
        "log_rates_l": jnp.full((n_ranks,), branch_prior, dtype=dtype),
        "log_rates_r": jnp.full((n_ranks,), branch_prior, dtype=dtype),
    }


def branch_rates(params):
    return jnp.exp(params["log_rates_l"]), jnp.exp(params["log_rates_r"])


def sample_branches(key, rate, shape):
    """Reparameterized Exponential(rate) samples of `shape`."""
    return jax.random.exponential(key, shape, dtype=rate.dtype) / rate


def exponential_logpdf(b, rate):
    """log Exponential(b; rate) = log(rate) - rate * b (elementwise)."""
    return jnp.log(rate) - rate * b
