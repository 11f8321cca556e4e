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

import os as _os

import jax

# measured on v5e (GammaSites G=4 K=512 primate, blocked XLA-AD
# fwd+bwd): dense 72.2 ms vs unrolled 87.7 -- the unrolled reverse's
# G x fewer flops lose to its A^2 re-reads of the operands, so the
# dense-assembled VJP is the default.  Under the manual whole-sweep
# VJP (the at-scale auto path) neither runs: the blocked fused rank
# kernel computes the merge backward in-kernel (45.7 ms total).
_BLOCKED_BWD = _os.environ.get("PHYLO_BLOCKED_BWD", "dense")


@jax.custom_vjp
def _contract_blocked(m, P):
    """(..., G, A, S) x (..., G, A, A) -> (..., G, A, S): per-block
    states-major contraction of a block-diagonal transition.

    Forward: explicit f32 multiply-adds, Python-unrolled over the tiny
    A axis (VPU-exact, no bf16 rounding, no (..., G, A, A, S)
    intermediate) -- G x fewer flops than the dense (G A)^2 form,
    measured 13.6 -> 11.1 ms/sweep at GammaSites G=4 K=512.

    Backward: XLA's AD of the unrolled chain re-reads the operands per
    term (fwd+bwd blew up 36 -> 68 ms), so the VJP is written as two
    block-batched S-deep einsums that land on the MXU."""
    cols = []
    A = P.shape[-1]
    for b in range(A):
        acc = None
        for a in range(A):
            t = m[..., :, a, :] * P[..., :, a, b, None]
            acc = t if acc is None else acc + t
        cols.append(acc)                        # (..., G, S)
    return jnp.stack(cols, axis=-2)             # (..., G, A, S)


def _contract_blocked_fwd(m, P):
    return _contract_blocked(m, P), (m, P)


def _contract_blocked_bwd(res, du):
    # Variant knob (PHYLO_BLOCKED_BWD, A/B'd by tools/perf_probe.py
    # gamma; v5e measurements in the module-level comment):
    #   dense (default) -- backward through the DENSE assembled form;
    #     the off-diagonal blocks of dP_dense are simply discarded
    #     (they never influence the output).
    #   unrolled -- the forward's own pattern run in reverse: dm as
    #     A^2 Python-unrolled multiply-adds against P^T, dP as A^2
    #     fused multiply-reduce site sums.  G x fewer flops but loses
    #     on v5e to the extra operand re-reads; kept for A/B.
    m, P = res
    if _BLOCKED_BWD == "unrolled":
        A = P.shape[-1]
        rows = []
        for a in range(A):
            acc = None
            for b in range(A):
                t = du[..., :, b, :] * P[..., :, a, b, None]
                acc = t if acc is None else acc + t
            rows.append(acc)                    # (..., G, S)
        dm = jnp.stack(rows, axis=-2)           # (..., G, A, S)
        dP = jnp.stack(
            [jnp.stack(
                [jnp.sum(m[..., :, a, :] * du[..., :, b, :], axis=-1)
                 for b in range(A)], axis=-1)
             for a in range(A)], axis=-2)       # (..., G, A, A)
        return dm, dP
    G, A = P.shape[-3], P.shape[-1]
    lead = m.shape[:-3]
    S = m.shape[-1]
    eye = jnp.eye(G, dtype=P.dtype)
    Pd = (P[..., :, :, None, :] * eye[:, None, :, None]).reshape(
        *lead, G * A, G * A)
    md = m.reshape(*lead, G * A, S)
    dud = du.reshape(*lead, G * A, S)
    dm = jnp.einsum("...bs,...ab->...as", dud, Pd,
                    precision="highest").reshape(*lead, G, A, S)
    dPd = jnp.einsum("...as,...bs->...ab", md, dud,
                     precision="highest")
    blocks = dPd.reshape(*lead, G, A, G, A)
    dP = jnp.moveaxis(
        jnp.diagonal(blocks, axis1=-4, axis2=-2), -1, -3
    )                                           # (..., G, A, A)
    return dm, dP


_contract_blocked.defvjp(_contract_blocked_fwd, _contract_blocked_bwd)


def _contract_blocked_sm(msg, P, G, A):
    """States-major contraction with a BLOCK-DIAGONAL transition given
    in block form: msg (..., G*A, S), P (..., G, A, A) ->
    (..., G*A, S).  Used by product-space models (GammaSites) whose
    categories never mix along a branch; see `_contract_blocked`."""
    lead = msg.shape[:-2]
    S = msg.shape[-1]
    out = _contract_blocked(msg.reshape(*lead, G, A, S), P)
    return out.reshape(*lead, G * A, S)


def merge_messages_sm(l_msg, r_msg, P_l, P_r, *, rescale=True,
                      site_weights=None, blocks=None):
    """States-major merge: l_msg/r_msg (..., A, S), P (..., A, A) ->
    (msg (..., A, S), log_scale_total (...,)).

    blocks: optional (G, A_base) block structure; P_l/P_r are then the
    per-block transitions (..., G, A_base, A_base) of a block-diagonal
    generator (see `_contract_blocked_sm`)."""
    if blocks is not None:
        G, A = blocks
        lp = _contract_blocked_sm(l_msg, P_l, G, A)
        rp = _contract_blocked_sm(r_msg, P_r, G, A)
    else:
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
