"""VNCSMC look-ahead twisting as one batched masked pair enumeration.

The reference computes twisting potentials with DOUBLY-NESTED sequential
`tf.while_loop`s over candidate pairs (reference vncsmc.py:324-416): for
each of the C(n,2) pairs it tiles data to an M*K batch, samples branch
lengths, runs the pruning kernel, and appends a potentials row --
O(C(n,2)) sequential kernel launches per rank.

TPU-first redesign: the pair set is a STATIC upper-triangular table over
all N positions; pairs whose second position falls outside the active
prefix are masked to -inf before normalization.  All pairs x M
subparticles x K particles evaluate as one batched computation (chunked
over the pair axis with `lax.map(..., batch_size=...)` to bound memory),
so a rank costs a handful of fused kernels regardless of N.

Potential (reference vncsmc.py:341-374):

    pot(pair, m, k) = log P(merged | b_l, b_r) - log P(left)
                      - log P(right) + [topology-prior deltas]

computed directly on the *scaled* messages: the per-node scale totals
cancel exactly in the difference, so no log-scale bookkeeping is needed.

Flat layout matches the reference: index = pair * M + m, so the chosen
pair is idx // M and the subsample is idx % M (vncsmc.py:298-301).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from phylo_tpu.utils.math import topology_log_prior


@dataclass(frozen=True)
class TwistConfig:
    """M: subparticle branch samples per candidate pair
    (reference runner.py:42-45); pair_chunk: pairs evaluated per
    lax.map batch (memory knob for the (chunk, M, K, S, A) intermediate).
    """

    M: int = 10
    pair_chunk: int = 8


def upper_tri_pairs(N):
    """Static (P, 2) int32 table of position pairs i < j over N slots,
    lexicographic -- the enumeration order of the reference's nested
    loops (vncsmc.py:324-339)."""
    return np.asarray(
        [(i, j) for i in range(N) for j in range(i + 1, N)],
        dtype=np.int32,
    )


def twisted_extend(key, config, model, params, stationary, leaves,
                   slot, leaf_counts, row_of_node, internal_msgs,
                   internal_logscale, r, n_active, rate_l, rate_r, dec,
                   site_weights=None, root_ll=None):
    """Twisted proposal for one rank.

    Returns (p1, p2, b_l, b_r, q_pen) where q_pen is the log proposal
    probability of the chosen (pair, subsample) under the normalized
    potentials (subtracted from the log weight, vncsmc.py:489-491).
    """
    from phylo_tpu.smc.sweep import _node_lookup

    twist = config.twist
    M = twist.M
    N, A, S = leaves.shape    # sweep-internal states-major layout
    K = config.K
    dtype = leaves.dtype

    pairs = jnp.asarray(upper_tri_pairs(N))           # (P, 2) static
    P = pairs.shape[0]
    valid = pairs[:, 1] < n_active                     # (P,)

    k_pool_l, k_pool_r, k_choice = jax.random.split(key, 3)
    if dec and "twist_pool_l" in dec:
        pool_l = dec["twist_pool_l"].astype(dtype)
        pool_r = dec["twist_pool_r"].astype(dtype)
    else:
        pool_l = (
            jax.random.exponential(k_pool_l, (P, M, K), dtype=dtype)
            / rate_l
        )
        pool_r = (
            jax.random.exponential(k_pool_r, (P, M, K), dtype=dtype)
            / rate_r
        )

    # Chunk the pair axis for memory, processing each chunk as ONE flat
    # (chunk*K)-particle batch through the fused look-ahead kernel (no
    # vmap -- vmapping pallas_call explodes the program count).  The
    # left/right posteriors come FREE from the carried per-root tables:
    # ll_scaled(pos) = root_ll(pos) - node_logscale(node at pos), so no
    # per-pair site reductions are needed for them at all (the reference
    # recomputes both on tiled M*K batches, vncsmc.py:363-365).
    C = min(twist.pair_chunk, P)
    P_pad = -(-P // C) * C
    pad_p = P_pad - P
    pairs_pad = jnp.concatenate(
        [pairs, jnp.zeros((pad_p, 2), jnp.int32)]
    ).reshape(P_pad // C, C, 2)
    pool_l_pad = jnp.concatenate(
        [pool_l, jnp.ones((pad_p, M, K), dtype)]
    ).reshape(P_pad // C, C, M, K)
    pool_r_pad = jnp.concatenate(
        [pool_r, jnp.ones((pad_p, M, K), dtype)]
    ).reshape(P_pad // C, C, M, K)

    root_ll_tbl = root_ll

    def chunk_potentials(xs):
        pc, bl, br = xs          # (C, 2), (C, M, K), (C, M, K)
        pos = pc.T               # (2, C)
        nodes = jnp.take(slot, pos.reshape(-1), axis=1)  # (K, 2C)
        msgs, lscs = _node_lookup(
            leaves, internal_msgs, internal_logscale, row_of_node,
            nodes, unified=config.replicate_leaves,
        )                        # (K, 2C, A, S), (K, 2C)
        msgs = msgs.reshape(K, 2, C, A, S)
        lscs = lscs.reshape(K, 2, C)
        m_l = jnp.transpose(msgs[:, 0], (1, 0, 2, 3)).reshape(
            C * K, A, S)
        m_r = jnp.transpose(msgs[:, 1], (1, 0, 2, 3)).reshape(
            C * K, A, S)

        P_lr = model.transition(
            params["model"], jnp.concatenate([bl, br])
        ).astype(dtype)          # (2C, M, K, A, A)
        P_l = jnp.transpose(P_lr[:C], (1, 0, 2, 3, 4)).reshape(
            M, C * K, A, A)
        P_r = jnp.transpose(P_lr[C:], (1, 0, 2, 3, 4)).reshape(
            M, C * K, A, A)
        # merge log-liks over the flat (C K) batch; explicit multiply-
        # adds stay in one XLA fusion (a Pallas variant measured slower
        # at these tile sizes -- see pruning.kernels.fused_pair_loglik)
        site_lik = None
        for b in range(A):
            u_b = None
            v_b = None
            for a in range(A):
                tu = m_l[None, :, a, :] * P_l[:, :, a, b, None]
                tv = m_r[None, :, a, :] * P_r[:, :, a, b, None]
                u_b = tu if u_b is None else u_b + tu
                v_b = tv if v_b is None else v_b + tv
            term = (u_b * v_b) * stationary[b]
            site_lik = term if site_lik is None else site_lik + term
        log_site = jnp.log(site_lik)                    # (M, C*K, S)
        if site_weights is not None:
            log_site = log_site * site_weights
        ll_m = jnp.sum(log_site, axis=-1).reshape(M, C, K)

        # scaled-message posteriors of the children, from carried state
        rll = jnp.take(root_ll_tbl, pos.reshape(-1), axis=1)  # (K, 2C)
        rll = rll.reshape(K, 2, C) - lscs
        cts = jnp.take(leaf_counts, pos.reshape(-1), axis=1)
        cts = cts.reshape(K, 2, C)
        c1, c2 = cts[:, 0], cts[:, 1]                    # (K, C)
        d_prior = (
            topology_log_prior(c1 + c2)
            - topology_log_prior(c1)
            - topology_log_prior(c2)
        ).astype(dtype)                                  # (K, C)
        pot = (
            ll_m
            - rll[:, 0].T[None]
            - rll[:, 1].T[None]
            + d_prior.T[None]
        )                                                # (M, C, K)
        return jnp.transpose(pot, (1, 0, 2))             # (C, M, K)

    pots = lax.map(
        chunk_potentials, (pairs_pad, pool_l_pad, pool_r_pad)
    ).reshape(P_pad, M, K)[:P]                           # (P, M, K)

    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)
    pots = jnp.where(valid[:, None, None], pots, neg_inf)
    flat = jnp.transpose(pots, (2, 0, 1)).reshape(K, P * M)
    flat = flat - jax.scipy.special.logsumexp(flat, axis=1, keepdims=True)

    if dec and "twist_choice" in dec:
        idx = dec["twist_choice"]
    else:
        idx = jax.random.categorical(k_choice, flat, axis=1)
    q_pen = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]

    pair_idx = idx // M
    m_idx = idx % M
    p1 = pairs[pair_idx, 0]
    p2 = pairs[pair_idx, 1]
    ks = jnp.arange(K)
    b_l = pool_l[pair_idx, m_idx, ks]
    b_r = pool_r[pair_idx, m_idx, ks]
    return p1, p2, b_l, b_r, q_pen
