"""Felsenstein pruning primitives: message merge + root log-likelihood.

The reference's hot kernel is `broadcast_conditional_likelihood_K`
(reference vcsmc.py:180-188): P_l = expm(Q b_l), P_r = expm(Q b_r) per
particle, message = (l_data @ P_l) * (r_data @ P_r) over a K x S x A batch,
followed by `compute_forest_posterior` (vcsmc.py:231-245) which dots
stationary probabilities and reduces log over sites and roots.

TPU-first differences:

* transitions come from the closed-form / uniformized expm
  (phylo_tpu.models.expm) instead of general Pade expm;
* messages are **rescaled per site** (divide by the per-site max, carry the
  log of the scale) so float32 never underflows at Hohna-scale trees --
  the reference needs float64 for this (vcsmc.py:414-422);
* the merge is einsum-based so XLA fuses expm tail + matmuls + Hadamard in
  one kernel; an optional Pallas kernel covers the fused merge+reduce path.
"""

from __future__ import annotations

import jax.numpy as jnp


def merge_messages(l_msg, r_msg, P_l, P_r, *, rescale=True,
                   site_weights=None):
    """Combine two child messages through their branch transitions.

    l_msg, r_msg: (..., S, A) partial likelihoods (possibly scaled).
    P_l, P_r:     (..., A, A) transition matrices.
    site_weights: optional (S,) per-site weights (0 masks a padded site
        out of the accumulated log scale).

    Returns (msg, log_scale_total):
      msg             (..., S, A) merged message, per-site rescaled if
                      requested;
      log_scale_total (...,) (weighted) sum over sites of log per-site
                      scale factors (zeros when rescale=False).
    """
    # full-f32 contraction: TPU default matmul precision is bfloat16,
    # which costs ~0.4% per site likelihood and biases multi-thousand-
    # site log-likelihood sums by O(10)
    lp = jnp.einsum("...sa,...ab->...sb", l_msg, P_l,
                    precision="highest")
    rp = jnp.einsum("...sa,...ab->...sb", r_msg, P_r,
                    precision="highest")
    msg = lp * rp
    if not rescale:
        return msg, jnp.zeros(msg.shape[:-2], dtype=msg.dtype)
    scale = jnp.max(msg, axis=-1, keepdims=True)
    scale = jnp.maximum(scale, jnp.finfo(msg.dtype).tiny)
    msg = msg / scale
    log_scale = jnp.log(scale[..., 0])
    if site_weights is not None:
        log_scale = log_scale * site_weights
    log_scale_total = jnp.sum(log_scale, axis=-1)
    return msg, log_scale_total


def root_log_likelihood(msg, stationary, log_scale_total=None,
                        site_weights=None):
    """Data log-likelihood of a root message:
    sum_s [w_s] log(sum_a pi_a msg_{s,a}) (+ accumulated log scales).

    Matches the stationary-dot + log-sum of the reference's tree/forest
    posteriors (vcsmc.py:197-198,225-226,240-242); site_weights masks
    padded site columns (sharding) or reweights minibatched sites.
    """
    site_lik = jnp.einsum("...sa,a->...s", msg, stationary,
                          precision="highest")
    log_site = jnp.log(site_lik)
    if site_weights is not None:
        log_site = log_site * site_weights
    ll = jnp.sum(log_site, axis=-1)
    if log_scale_total is not None:
        ll = ll + log_scale_total
    return ll


# ---------------------------------------------------------------------
# States-major (..., A, S) variants -- the sweep's internal layout.
# Sites ride the fastest-varying axis so TPU vector lanes see contiguous
# site runs and the Pallas kernel consumes buffers without transposes.
# ---------------------------------------------------------------------

def merge_messages_sm(l_msg, r_msg, P_l, P_r, *, rescale=True,
                      site_weights=None):
    """States-major merge: l_msg/r_msg (..., A, S), P (..., A, A) ->
    (msg (..., A, S), log_scale_total (...,))."""
    lp = jnp.einsum("...as,...ab->...bs", l_msg, P_l,
                    precision="highest")
    rp = jnp.einsum("...as,...ab->...bs", r_msg, P_r,
                    precision="highest")
    msg = lp * rp
    if not rescale:
        return msg, jnp.zeros(msg.shape[:-2], dtype=msg.dtype)
    scale = jnp.max(msg, axis=-2, keepdims=True)
    scale = jnp.maximum(scale, jnp.finfo(msg.dtype).tiny)
    msg = msg / scale
    log_scale = jnp.log(scale[..., 0, :])
    if site_weights is not None:
        log_scale = log_scale * site_weights
    return msg, jnp.sum(log_scale, axis=-1)


def root_log_likelihood_sm(msg, stationary, log_scale_total=None,
                           site_weights=None):
    """States-major root log-likelihood: msg (..., A, S) -> (...,)."""
    site_lik = jnp.einsum("...as,a->...s", msg, stationary,
                          precision="highest")
    log_site = jnp.log(site_lik)
    if site_weights is not None:
        log_site = log_site * site_weights
    ll = jnp.sum(log_site, axis=-1)
    if log_scale_total is not None:
        ll = ll + log_scale_total
    return ll
