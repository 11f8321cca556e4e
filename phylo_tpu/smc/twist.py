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
from typing import Optional

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

    use_pallas_ll: evaluate the look-ahead merge log-likelihoods with the
    fused Pallas kernel (pruning.kernels.fused_pair_loglik), folding the
    pair chunk into the kernel's particle-tile axis (ONE pallas_call per
    chunk, no vmap).  TPU backends only; CPU keeps the jnp path.
    DEFAULT OFF: measured on v5e (round 2, tools/perf_probe.py) the
    kernel loses to the single XLA fusion of explicit multiply-adds at
    every probed scale -- betacorona K=32 M=10 fwd 316 ms vs 94 ms,
    primate K=32 31 ms vs 21 ms, primate K=256 185 ms vs 129 ms: the
    (pairs x M) program grid re-fetches message tiles that XLA keeps
    pipelined in one fusion.  Kept for future tile-shape work.
    """

    M: int = 10
    # pairs per lax.map batch; None auto-sizes from v5e measurements
    # (tools/perf_probe.py round 2): when the WHOLE enumeration fits in
    # ~3x chunk_budget_mb, one chunk wins (primate S=1024: 20.0 ms vs
    # 21.4 at chunk=8); beyond that, ~chunk_budget_mb chunks win and
    # larger ones lose (betacorona S=3328: 94 ms at chunk=8 vs 141 at
    # chunk=30).  The remat backward bounds live memory to ~one chunk
    # either way.
    pair_chunk: Optional[int] = None
    chunk_budget_mb: int = 32
    use_pallas_ll: bool = False
    # rematerialize each pair chunk's potential computation under
    # reverse-mode AD: without it, AD stacks the (M, chunk*K, S)
    # intermediates for EVERY rank x chunk (143 GB at betacorona
    # K=32 M=10 -- an instant OOM); with it the backward recomputes a
    # chunk at a time.  The recompute is a handful of VPU multiply-adds,
    # far cheaper than the HBM traffic it saves.
    remat: bool = True
    # hoist the expm of the ENTIRE (ranks x pairs x M x K x 2) branch
    # pool into one batched call before the scan -- the same
    # state-independence trick the non-twisted path uses for its branch
    # proposals.  Measured NEUTRAL on the backward once the Pallas
    # backward kernel landed (the in-loop expm was not the reverse-pass
    # bottleneck after all) and a small forward regression (25 vs 20 ms
    # at primate K=32), so default OFF; kept as an option for models
    # whose transition() is genuinely expensive.  Falls back to in-loop
    # expm when the pool transitions would exceed presample_budget_mb.
    presample_expm: bool = False
    presample_budget_mb: int = 1024

    def resolve_chunk(self, P, M, K, S, itemsize):
        C = self.pair_chunk
        if C is None:
            per_pair = max(1, M * K * S * itemsize)
            C_mem = max(
                1, int((self.chunk_budget_mb * 2**20) // per_pair)
            )
            if P < 24:
                # tiny pair tables: chunking overhead dominates any
                # prefix-skipping gain -- one chunk when memory allows
                if P * per_pair <= 3 * self.chunk_budget_mb * 2**20:
                    return P
                C = C_mem
            else:
                # aim for ~8 chunks even when memory would allow one:
                # prefix-order chunk skipping (twisted_extend) then
                # executes only ceil(C(n_active,2)/C) chunks per rank,
                # ~2.4x fewer chunk bodies across a sweep (measured
                # round 3; the old fits-in-3x-budget single-chunk rule
                # predates skipping)
                C = min(C_mem, max(1, -(-P // 8)))
            # prefer a divisor of P just above the budget target: an
            # evenly-split pair axis avoids a padded tail chunk
            # (betacorona P=136: C=8 measured 94 ms fwd vs 146 ms at
            # the non-divisor C=7)
            for cand in range(C, min(2 * C, P) + 1):
                if P % cand == 0:
                    return cand
        return max(1, min(C, P))


def upper_tri_pairs(N):
    """Static (P, 2) int32 table of position pairs i < j over N slots,
    lexicographic -- the enumeration order of the reference's nested
    loops (vncsmc.py:324-339)."""
    return np.asarray(
        [(i, j) for i in range(N) for j in range(i + 1, N)],
        dtype=np.int32,
    )


def _prefix_order(N):
    """Static permutation of the lexicographic pair table such that the
    pairs valid at any active-prefix size n (those with j < n) occupy
    the FIRST C(n, 2) slots: sort by (j, i).  Returns (order, inverse)
    int32 arrays -- order[s] = lex index of the s-th sorted pair,
    inverse[lex] = sorted position.

    This is what lets the chunked enumeration SKIP chunks wholesale at
    late ranks (lax.cond on chunk_start < C(n_active, 2)) instead of
    computing all C(N, 2) pairs every rank and masking: across a sweep
    that saves ~sum_r C(N,2) - C(N-r,2) ~ 2.5-2.7x of the twist compute
    (both directions -- cond's VJP only evaluates the taken branch).
    """
    pairs = upper_tri_pairs(N)
    order = np.lexsort((pairs[:, 0], pairs[:, 1])).astype(np.int32)
    inverse = np.argsort(order).astype(np.int32)
    return order, inverse


def precompute_twist_xs(key, config, model, params, rates_l, rates_r,
                        N, dtype, decisions=None):
    """Pre-scan twist randomness + transitions, as lax.scan xs arrays
    (leading axis = rank).

    Branch pools are state-independent exponential draws, so the WHOLE
    (R, P, M, K) left/right pool -- and, within presample_budget_mb, the
    expm of every pool entry -- is generated in one batched call before
    the scan.  The reference (and a per-rank port) instead pays a
    sequential expm chain inside every rank x pair iteration
    (vncsmc.py:350-356); under reverse-mode AD that in-loop chain of
    ~24 tiny sequential steps per chunk dominated the twist backward
    (440 ms vs 21 ms forward at primate K=32, tools/twist_bisect.py).
    """
    twist = config.twist
    M, K = twist.M, config.K
    R = N - 1
    P = len(upper_tri_pairs(N))
    if decisions is not None and "twist_pool_l" in decisions:
        pool_l = decisions["twist_pool_l"].astype(dtype)   # (R, P, M, K)
        pool_r = decisions["twist_pool_r"].astype(dtype)
    else:
        kl, kr = jax.random.split(jax.random.fold_in(key, 0x7717))
        pool_l = (
            jax.random.exponential(kl, (R, P, M, K), dtype=dtype)
            / rates_l[:, None, None, None].astype(dtype)
        )
        pool_r = (
            jax.random.exponential(kr, (R, P, M, K), dtype=dtype)
            / rates_r[:, None, None, None].astype(dtype)
        )
    out = dict(twist_pool_l=pool_l, twist_pool_r=pool_r)
    A = model.A
    size = 2 * R * P * M * K * A * A * jnp.dtype(dtype).itemsize
    if twist.presample_expm and size <= twist.presample_budget_mb * 2**20:
        P_all = model.transition(
            params["model"], jnp.stack([pool_l, pool_r])
        ).astype(dtype)                        # (2, R, P, M, K, A, A)
        out.update(twist_P_l=P_all[0], twist_P_r=P_all[1])
    return out


def twisted_extend(key, config, model, params, stationary, leaves,
                   slot, leaf_counts, row_of_node, internal_msgs,
                   internal_logscale, r, n_active, rate_l, rate_r, dec,
                   site_weights=None, root_ll=None):
    """Twisted proposal for one rank.

    Returns (p1, p2, b_l, b_r, P_l, P_r, q_pen): the chosen pair
    positions, branch lengths, their transition matrices (None when the
    pool expm was not presampled -- the sweep then computes them), and
    the log proposal probability of the chosen (pair, subsample) under
    the normalized potentials (subtracted from the log weight,
    vncsmc.py:489-491).

    dec carries this rank's slice of the precomputed xs
    (precompute_twist_xs): twist_pool_l/r (P, M, K) always, and
    twist_P_l/r (P, M, K, A, A) when presampled.
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

    pool_l = dec["twist_pool_l"].astype(dtype)         # (P, M, K)
    pool_r = dec["twist_pool_r"].astype(dtype)
    have_P = "twist_P_l" in dec

    # Enumerate in PREFIX order (valid pairs first -- see _prefix_order)
    # so whole chunks can be skipped at late ranks; the external pair
    # indexing (pools, potentials, the categorical's flat index) stays
    # lexicographic for reference parity.
    order_np, inverse_np = _prefix_order(N)
    order = jnp.asarray(order_np)
    n_valid = (n_active * (n_active - 1)) // 2          # traced

    # Chunk the pair axis for memory, processing each chunk as ONE flat
    # (chunk*K)-particle batch.  The left/right posteriors come FREE
    # from the carried per-root tables:
    # ll_scaled(pos) = root_ll(pos) - node_logscale(node at pos), so no
    # per-pair site reductions are needed for them at all (the reference
    # recomputes both on tiled M*K batches, vncsmc.py:363-365).
    C = twist.resolve_chunk(P, M, K, S, jnp.dtype(dtype).itemsize)
    P_pad = -(-P // C) * C
    pad_p = P_pad - P
    n_chunks = P_pad // C
    pairs_pad = jnp.concatenate(
        [pairs[order], jnp.zeros((pad_p, 2), jnp.int32)]
    ).reshape(n_chunks, C, 2)
    pool_l_pad = jnp.concatenate(
        [pool_l[order], jnp.ones((pad_p, M, K), dtype)]
    ).reshape(n_chunks, C, M, K)
    pool_r_pad = jnp.concatenate(
        [pool_r[order], jnp.ones((pad_p, M, K), dtype)]
    ).reshape(n_chunks, C, M, K)
    xs_chunks = (pairs_pad, pool_l_pad, pool_r_pad)
    if have_P:
        pool_P_l = dec["twist_P_l"].astype(dtype)      # (P, M, K, A, A)
        pool_P_r = dec["twist_P_r"].astype(dtype)
        pad_P = jnp.ones((pad_p, M, K, A, A), dtype)
        xs_chunks = xs_chunks + (
            jnp.concatenate([pool_P_l[order], pad_P]).reshape(
                n_chunks, C, M, K, A, A),
            jnp.concatenate([pool_P_r[order], pad_P]).reshape(
                n_chunks, C, M, K, A, A),
        )

    root_ll_tbl = root_ll

    def chunk_potentials(xs):
        if have_P:
            pc, bl, br, cP_l, cP_r = xs
        else:
            pc, bl, br = xs      # (C, 2), (C, M, K), (C, M, K)
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

        if have_P:
            P_l = jnp.transpose(cP_l, (1, 0, 2, 3, 4)).reshape(
                M, C * K, A, A)
            P_r = jnp.transpose(cP_r, (1, 0, 2, 3, 4)).reshape(
                M, C * K, A, A)
        else:
            P_lr = model.transition(
                params["model"], jnp.concatenate([bl, br])
            ).astype(dtype)      # (2C, M, K, A, A)
            P_l = jnp.transpose(P_lr[:C], (1, 0, 2, 3, 4)).reshape(
                M, C * K, A, A)
            P_r = jnp.transpose(P_lr[C:], (1, 0, 2, 3, 4)).reshape(
                M, C * K, A, A)
        # merge log-liks over the flat (C K) batch
        w_vec = (site_weights if site_weights is not None
                 else jnp.ones((S,), dtype))
        if twist.use_pallas_ll and jax.default_backend() == "tpu":
            # all-Pallas variant: forward kernel too (measured slower
            # than the XLA forward fusion; kept for tile experiments)
            from phylo_tpu.pruning.kernels import fused_pair_loglik

            ll_m = fused_pair_loglik(
                m_l, m_r, P_l, P_r, stationary, w_vec
            ).reshape(M, C, K)
        else:
            # XLA-fused forward + streaming Pallas backward (the
            # XLA-derived reverse pass re-read the (M, CK, S) tensors
            # ~55x; see pruning.kernels.pair_loglik)
            from phylo_tpu.pruning.kernels import pair_loglik

            ll_m = pair_loglik(
                m_l, m_r, P_l, P_r, stationary, w_vec
            ).reshape(M, C, K)

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

    chunk_fn = (jax.checkpoint(chunk_potentials) if twist.remat
                else chunk_potentials)
    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)
    if n_chunks == 1:
        pots_s = chunk_fn(jax.tree.map(lambda x: x[0], xs_chunks))[:P]
    else:
        # chunks whose first (prefix-ordered) pair is already past the
        # valid count contain no valid pairs at this rank: skip the
        # whole chunk (forward AND backward -- cond only evaluates the
        # taken branch; every skipped entry is -inf-masked anyway)
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * C

        def guarded(xs):
            start, rest = xs[0], xs[1:]
            return lax.cond(
                start < n_valid,
                lambda: chunk_fn(rest),
                lambda: jnp.full((C, M, K), neg_inf, dtype=dtype),
            )

        pots_s = lax.map(
            guarded, (starts,) + xs_chunks
        ).reshape(P_pad, M, K)[:P]                       # (P, M, K)
    # back to lexicographic pair indexing for the flat categorical
    pots = pots_s[jnp.asarray(inverse_np)]

    pots = jnp.where(valid[:, None, None], pots, neg_inf)
    flat = jnp.transpose(pots, (2, 0, 1)).reshape(K, P * M)
    flat = flat - jax.scipy.special.logsumexp(flat, axis=1, keepdims=True)

    if dec and "twist_choice" in dec:
        idx = dec["twist_choice"]
    else:
        idx = jax.random.categorical(key, flat, axis=1)
    q_pen = jnp.take_along_axis(flat, idx[:, None], axis=1)[:, 0]

    pair_idx = idx // M
    m_idx = idx % M
    p1 = pairs[pair_idx, 0]
    p2 = pairs[pair_idx, 1]
    ks = jnp.arange(K)
    b_l = pool_l[pair_idx, m_idx, ks]
    b_r = pool_r[pair_idx, m_idx, ks]
    if have_P:
        P_l_chosen = pool_P_l[pair_idx, m_idx, ks]
        P_r_chosen = pool_P_r[pair_idx, m_idx, ks]
    else:
        P_l_chosen = P_r_chosen = None
    return p1, p2, b_l, b_r, P_l_chosen, P_r_chosen, q_pen
