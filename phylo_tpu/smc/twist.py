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
    # Unroll the rank loop into straight-line code with STATICALLY
    # truncated pair tables whenever R = N-1 <= unroll_max_ranks and
    # the largest single-rank enumeration fits unroll_budget_mb.
    # Inside a lax.scan every rank must evaluate all C(N,2) pairs and
    # mask the invalid ones (static shapes), wasting sum_r C(N,2) vs
    # sum_r C(N-r,2) ~ 2.5x of the enumeration compute FORWARD AND
    # BACKWARD; chunked whole-chunk skipping recovers the compute but
    # pays ~1.5 ms/chunk of dispatch latency per rank (xprof round 3),
    # which dominates exactly at the reference's active small-N configs
    # (autorun.sh: primate K=32 M=10).  With a Python-unrolled loop,
    # rank r enumerates exactly C(n_active, 2) prefix-ordered pairs --
    # no masking, no chunking, no cond.  Applies when decisions=None
    # and shardings=None (golden-parity injection and GSPMD runs keep
    # the scanned path), and only with pair_chunk unset -- an explicit
    # chunk size is a request for the chunked scan enumeration.
    unroll_max_ranks: int = 12
    unroll_budget_mb: int = 256
    # CHUNKED unrolled-rank mode: unroll the rank loop even when the
    # per-rank enumeration exceeds unroll_budget_mb, chunking each
    # rank's truncated pair table with a STATIC chunk count of
    # ceil(C(N-r, 2) / C) -- no masking, no per-chunk lax.cond (the
    # scanned path pays one cond per chunk slot and pads every rank to
    # the full C(N, 2) chunk grid).  This extends the static-truncation
    # win to compute-bound configs like betacorona (N=17, 580 MB
    # enumeration).  0 disables (default until the in-situ TPU A/B
    # lands -- tools/twist_chunked_ab.py); raise to e.g. 24 to enable
    # for R = N-1 <= that cap.  Applies under the same conditions as the
    # plain unrolled mode (decisions/shardings None, pair_chunk unset).
    unroll_chunked_max_ranks: int = 0

    def unrolled(self, N, M, K, S, itemsize):
        if self.pair_chunk is not None:
            return False
        P = (N * (N - 1)) // 2
        if (N - 1 <= self.unroll_max_ranks
                and P * M * K * S * itemsize
                <= self.unroll_budget_mb * 2**20):
            return True
        return N - 1 <= self.unroll_chunked_max_ranks

    def static_chunks(self, Pv, M, K, S, itemsize):
        """Chunking decision for one unrolled rank's truncated
        enumeration (Pv = C(n_active, 2) pairs): returns (C, n_chunks),
        with n_chunks=1 meaning evaluate the rank as a single batch.
        Reuses the measured resolve_chunk cost model."""
        if Pv * M * K * S * itemsize <= self.unroll_budget_mb * 2**20:
            return Pv, 1
        C = self.resolve_chunk(Pv, M, K, S, itemsize)
        return C, -(-Pv // C)

    def resolve_chunk(self, P, M, K, S, itemsize):
        C = self.pair_chunk
        if C is None:
            per_pair = max(1, M * K * S * itemsize)
            C_mem = max(
                1, int((self.chunk_budget_mb * 2**20) // per_pair)
            )
            # one chunk whenever the WHOLE enumeration fits in ~3x the
            # budget: below that the per-chunk dispatch overhead
            # dominates (xprof at primate K=32 M=10 batch-256: ~31
            # sequential chunk bodies/step, each paying ~1.5 ms in
            # small reduces + kernel launches = 80 ms for ~5 ms of
            # compute), and prefix-skipping only saves COMPUTE, which
            # is free there.  Chunk-count tuning matters only in the
            # compute-bound regime (betacorona, 580 MB enumeration);
            # at 86 MB (primate full-S) chunked+skipping already wins
            # the backward (90.6 vs 98.1 ms), hence the 2x threshold.
            if P * per_pair <= 2 * self.chunk_budget_mb * 2**20:
                return P
            if P < 24:
                C = C_mem
            else:
                # aim for ~8 chunks even when memory would allow one:
                # prefix-order chunk skipping (twisted_extend) then
                # executes only ceil(C(n_active,2)/C) chunks per rank,
                # ~2.4x fewer chunk bodies across a sweep (measured
                # round 3 at betacorona scale)
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


def _pool_draws(key, R, P, M, K, dtype):
    """Unit-rate exponential pool draws, (R, P, M, K) x2 -- split out of
    `precompute_twist_xs` so the manual whole-sweep VJP (sweep_vjp) can
    regenerate the forward's exact draws in its backward pass instead
    of checkpointing them."""
    kl, kr = jax.random.split(jax.random.fold_in(key, 0x7717))
    return (
        jax.random.exponential(kl, (R, P, M, K), dtype=dtype),
        jax.random.exponential(kr, (R, P, M, K), dtype=dtype),
    )


def precompute_twist_xs(key, config, model, params, rates_l, rates_r,
                        N, dtype, decisions=None, skip_expm=False,
                        prefix_ordered=False):
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
        draws_l, draws_r = _pool_draws(key, R, P, M, K, dtype)
        pool_l = draws_l / rates_l[:, None, None, None].astype(dtype)
        pool_r = draws_r / rates_r[:, None, None, None].astype(dtype)
    if prefix_ordered:
        # unrolled-rank mode: reorder the pair axis ONCE here (host-side
        # constant permutation) so each rank's truncated table is a free
        # leading slice pool[:Pv] instead of a per-rank device gather
        order = jnp.asarray(_prefix_order(N)[0])
        pool_l = pool_l[:, order]
        pool_r = pool_r[:, order]
    out = dict(twist_pool_l=pool_l, twist_pool_r=pool_r)
    A = model.A
    size = 2 * R * P * M * K * A * A * jnp.dtype(dtype).itemsize
    if (twist.presample_expm and not skip_expm
            and size <= twist.presample_budget_mb * 2**20):
        P_all = model.transition(
            params["model"], jnp.stack([pool_l, pool_r])
        ).astype(dtype)                        # (2, R, P, M, K, A, A)
        out.update(twist_P_l=P_all[0], twist_P_r=P_all[1])
    return out


def _pot_terms(pairs, slot, leaf_counts, row_of_node, internal_logscale,
               root_ll, N, dtype):
    """Non-message potential terms for ALL pairs, (K, P):

        -ll(left) - ll(right) + [prior(merged) - prior(l) - prior(r)]

    where ll(pos) = root_ll(pos) - node_logscale(pos) is the scaled-
    message child posterior read straight off the carried per-root
    tables (the reference recomputes both on tiled M*K batches,
    vncsmc.py:363-365).  Pure table lookups -- shared by the normal
    forward and the scalar-replay (injected) mode of the manual VJP.
    """
    from phylo_tpu.smc.sweep import _take_positions

    P = pairs.shape[0]
    R = row_of_node.shape[1]
    pos_flat = jnp.broadcast_to(
        pairs.T.reshape(-1)[None], (slot.shape[0], 2 * P)
    )                                                    # (K, 2P): [i..., j...]
    nodes = _take_positions(slot, pos_flat)              # (K, 2P)
    is_leaf = nodes < N
    q = jnp.clip(nodes - N, 0, R - 1)
    rows = _take_positions(row_of_node, q)
    lsc = jnp.where(is_leaf, 0.0, internal_logscale[rows, q])
    rll = _take_positions(root_ll, pos_flat) - lsc       # (K, 2P)
    cts = _take_positions(leaf_counts, pos_flat)
    c1, c2 = cts[:, :P], cts[:, P:]
    d_prior = (
        topology_log_prior(c1 + c2)
        - topology_log_prior(c1)
        - topology_log_prior(c2)
    ).astype(dtype)                                      # (K, P)
    return d_prior - rll[:, :P] - rll[:, P:]


def twisted_extend(key, config, model, params, stationary, leaves,
                   slot, leaf_counts, row_of_node, internal_msgs,
                   internal_logscale, r, n_active, rate_l, rate_r, dec,
                   site_weights=None, root_ll=None):
    """Twisted proposal for one rank.

    Returns (p1, p2, b_l, b_r, P_l, P_r, q_pen, ll_lex, idx): the
    chosen pair positions, branch lengths, their transition matrices
    (None when the pool expm was not presampled -- the sweep then
    computes them), the log proposal probability of the chosen
    (pair, subsample) under the normalized potentials (subtracted from
    the log weight, vncsmc.py:489-491), plus the raw (P, M, K) merge
    log-likelihoods and the flat choice index (residuals for the
    manual whole-sweep VJP).

    dec carries this rank's slice of the precomputed xs
    (precompute_twist_xs): twist_pool_l/r (P, M, K) always, and
    twist_P_l/r (P, M, K, A, A) when presampled.  With
    "inj_twist_llm"/"inj_twist_choice" present (scalar replay of the
    manual VJP) all message work is bypassed.

    When `n_active` is a Python int (unrolled-rank mode, see
    TwistConfig.unroll_max_ranks) the enumeration uses a statically
    TRUNCATED prefix-ordered pair table -- exactly C(n_active, 2)
    pairs, no masking, no chunking -- and `dec`'s pools arrive
    prefix-ordered (precompute_twist_xs(prefix_ordered=True)).
    """
    if isinstance(n_active, int):
        return _twisted_extend_static(
            key, config, model, params, stationary, leaves, slot,
            leaf_counts, row_of_node, internal_msgs, internal_logscale,
            r, n_active, rate_l, rate_r, dec,
            site_weights=site_weights, root_ll=root_ll,
        )
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

    if dec and "inj_twist_llm" in dec:
        # scalar replay (manual whole-sweep VJP, sweep_vjp): the
        # pair-merge data log-likelihoods are injected verbatim from
        # the forward run -- no message work at all here; their
        # cotangents are produced by the hand-written twist reverse
        # pass (sweep_vjp._twist_messages_bwd).  The non-message
        # potential terms below are recomputed from the replay-carried
        # tables, keeping rll/prior gradient flow in the replay.
        ll_lex = dec["inj_twist_llm"].astype(dtype)
        pool_P_l = pool_P_r = None
        have_P = False
    else:
        ll_lex, pool_P_l, pool_P_r = _twist_ll_lex(
            config, model, params, stationary, leaves, slot,
            row_of_node, internal_msgs, internal_logscale, dec,
            pairs, pool_l, pool_r, n_active, site_weights,
        )

    # non-message terms of the potential -- child posterior corrections
    # and topology-prior deltas from the carried tables, assembled ONCE
    # over all P pairs outside the chunked/remat'd message work
    terms = _pot_terms(
        pairs, slot, leaf_counts, row_of_node, internal_logscale,
        root_ll, N, dtype,
    )                                                    # (K, P)
    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)
    pots = ll_lex + terms.T[:, None, :]                  # (P, M, K)

    pots = jnp.where(valid[:, None, None], pots, neg_inf)
    flat = jnp.transpose(pots, (2, 0, 1)).reshape(K, P * M)
    flat = flat - jax.scipy.special.logsumexp(flat, axis=1, keepdims=True)

    if dec and "inj_twist_choice" in dec:
        idx = dec["inj_twist_choice"]
    elif dec and "twist_choice" in dec:
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
    return p1, p2, b_l, b_r, P_l_chosen, P_r_chosen, q_pen, ll_lex, idx


def _twisted_extend_static(key, config, model, params, stationary,
                           leaves, slot, leaf_counts, row_of_node,
                           internal_msgs, internal_logscale, r, n_active,
                           rate_l, rate_r, dec, site_weights=None,
                           root_ll=None):
    """Twisted proposal for one rank with a STATIC active-root count.

    Unrolled-rank mode (TwistConfig.unroll_max_ranks): the pair table is
    the first C(n_active, 2) entries of the prefix-ordered enumeration
    -- every pair valid by construction -- so the whole rank is one
    un-masked batch and the sweep pays no wasted compute at late ranks
    (a lax.scan body must evaluate all C(N, 2) pairs every rank).
    Ranks whose enumeration exceeds unroll_budget_mb split into a
    STATIC chunk count (TwistConfig.static_chunks /
    unroll_chunked_max_ranks) -- still no masking or lax.cond.  Pools in `dec` are prefix-ordered; the flat choice index is
    in PREFIX-flat convention (pair_prefix * M + m) and is only ever
    consumed by code on this same path (the scalar replay and the
    manual twist reverse pass), so reference parity is unaffected: the
    proposal distribution over (pair, subsample) is identical
    (reference vncsmc.py:295-322 enumerates lexicographically, but the
    categorical is order-invariant).
    """
    twist = config.twist
    M = twist.M
    N, A, S = leaves.shape
    K = config.K
    dtype = leaves.dtype

    order_np, _ = _prefix_order(N)
    Pv = (n_active * (n_active - 1)) // 2
    pairs = jnp.asarray(upper_tri_pairs(N)[order_np[:Pv]])   # (Pv, 2)

    pool_l = dec["twist_pool_l"][:Pv].astype(dtype)          # (Pv, M, K)
    pool_r = dec["twist_pool_r"][:Pv].astype(dtype)
    have_P = "twist_P_l" in dec

    if dec and "inj_twist_llm" in dec:
        ll = dec["inj_twist_llm"].astype(dtype)              # (Pv, M, K)
        pool_P_l = pool_P_r = None
        have_P = False
    else:
        if have_P:
            pool_P_l = dec["twist_P_l"][:Pv].astype(dtype)
            pool_P_r = dec["twist_P_r"][:Pv].astype(dtype)
        # Over-budget ranks split into a STATIC count of
        # ceil(Pv / C) chunks (TwistConfig.unroll_chunked_max_ranks):
        # unlike the scanned path there is no per-chunk lax.cond, no
        # full-C(N,2) chunk grid, and only the last chunk's tail is
        # padded (sliced off below, so no masking either).
        C, n_c = twist.static_chunks(
            Pv, M, K, S, jnp.dtype(dtype).itemsize
        )
        chunk_fn = _make_chunk_ll(
            config, model, params, stationary, leaves, slot,
            row_of_node, internal_msgs, internal_logscale,
            site_weights, C, have_P,
        )
        if twist.remat:
            chunk_fn = jax.checkpoint(chunk_fn)
        xs = (pairs, pool_l, pool_r)
        if have_P:
            xs = xs + (pool_P_l, pool_P_r)
        if n_c == 1:
            ll = chunk_fn(xs)                                # (Pv, M, K)
        else:
            pad = n_c * C - Pv

            def padc(x):
                # pad pairs with (0, 0) and pools with ones: finite
                # garbage values on positions that exist, sliced off
                # below (never -inf/NaN, which could poison gradients)
                fill = 0 if x.dtype == jnp.int32 else 1.0
                tail = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
                return jnp.concatenate([x, tail]).reshape(
                    (n_c, C) + x.shape[1:]
                )

            ll = lax.map(chunk_fn, jax.tree.map(padc, xs)).reshape(
                n_c * C, M, K
            )[:Pv]

    terms = _pot_terms(
        pairs, slot, leaf_counts, row_of_node, internal_logscale,
        root_ll, N, dtype,
    )                                                        # (K, Pv)
    pots = ll + terms.T[:, None, :]                          # (Pv, M, K)
    flat = jnp.transpose(pots, (2, 0, 1)).reshape(K, Pv * M)
    flat = flat - jax.scipy.special.logsumexp(flat, axis=1, keepdims=True)

    if dec and "inj_twist_choice" in dec:
        idx = dec["inj_twist_choice"]
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
    return p1, p2, b_l, b_r, P_l_chosen, P_r_chosen, q_pen, ll, idx


def _make_chunk_ll(config, model, params, stationary, leaves, slot,
                   row_of_node, internal_msgs, internal_logscale,
                   site_weights, C, have_P):
    """Build the one-chunk pair-merge log-likelihood evaluator shared
    by the scanned enumeration (_twist_ll_lex) and the chunked
    unrolled-rank mode (_twisted_extend_static): xs -> (C, M, K).

    xs is (pairs (C, 2), pool_l (C, M, K), pool_r (C, M, K))
    [+ (P_l, P_r) (C, M, K, A, A) when the pool expm was presampled].

    Flat batch layout is K-major (k * C + c): the gathered
    (K, 2C, A, S) message block reshapes into the kernel's flat
    particle axis for FREE, where a C-major layout paid two (C K A S)
    physical transposes per chunk, forward and backward (xprof round
    3).  Only the small (C, M, K, A, A) transition tensors get
    transposed.
    """
    from phylo_tpu.smc.sweep import _node_lookup

    twist = config.twist
    M, K = twist.M, config.K
    N, A, S = leaves.shape
    dtype = leaves.dtype

    def chunk_potentials(xs):
        if have_P:
            pc, bl, br, cP_l, cP_r = xs
        else:
            pc, bl, br = xs      # (C, 2), (C, M, K), (C, M, K)
        pos = pc.T               # (2, C)
        nodes = jnp.take(slot, pos.reshape(-1), axis=1)  # (K, 2C)
        msgs, _ = _node_lookup(
            leaves, internal_msgs, internal_logscale, row_of_node,
            nodes, unified=config.replicate_leaves,
        )                        # (K, 2C, A, S)
        m_l = msgs[:, :C].reshape(K * C, A, S)
        m_r = msgs[:, C:].reshape(K * C, A, S)

        if have_P:
            P_l = jnp.transpose(cP_l, (1, 2, 0, 3, 4)).reshape(
                M, K * C, A, A)
            P_r = jnp.transpose(cP_r, (1, 2, 0, 3, 4)).reshape(
                M, K * C, A, A)
        else:
            P_lr = model.transition(
                params["model"], jnp.concatenate([bl, br])
            ).astype(dtype)      # (2C, M, K, A, A)
            P_l = jnp.transpose(P_lr[:C], (1, 2, 0, 3, 4)).reshape(
                M, K * C, A, A)
            P_r = jnp.transpose(P_lr[C:], (1, 2, 0, 3, 4)).reshape(
                M, K * C, A, A)
        # merge log-liks over the flat (K C) batch
        w_vec = (site_weights if site_weights is not None
                 else jnp.ones((S,), dtype))
        if twist.use_pallas_ll and jax.default_backend() == "tpu":
            # all-Pallas variant: forward kernel too (measured slower
            # than the XLA forward fusion; kept for tile experiments)
            from phylo_tpu.pruning.kernels import fused_pair_loglik

            ll_m = fused_pair_loglik(
                m_l, m_r, P_l, P_r, stationary, w_vec
            ).reshape(M, K, C)
        else:
            # XLA-fused forward + streaming Pallas backward (the
            # XLA-derived reverse pass re-read the (M, CK, S) tensors
            # ~55x; see pruning.kernels.pair_loglik)
            from phylo_tpu.pruning.kernels import pair_loglik

            ll_m = pair_loglik(
                m_l, m_r, P_l, P_r, stationary, w_vec
            ).reshape(M, K, C)

        return jnp.transpose(ll_m, (2, 0, 1))            # (C, M, K)

    return chunk_potentials


def _twist_ll_lex(config, model, params, stationary, leaves, slot,
                  row_of_node, internal_msgs, internal_logscale, dec,
                  pairs, pool_l, pool_r, n_active, site_weights):
    """Chunked pair-merge data log-likelihood enumeration, (P, M, K) in
    LEXICOGRAPHIC pair order.  Returns (ll_lex, pool_P_l, pool_P_r);
    the pools are the presampled transition tensors when available
    (None otherwise)."""
    twist = config.twist
    M = twist.M
    N, A, S = leaves.shape
    K = config.K
    dtype = leaves.dtype
    P = pairs.shape[0]
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

    chunk_potentials = _make_chunk_ll(
        config, model, params, stationary, leaves, slot, row_of_node,
        internal_msgs, internal_logscale, site_weights, C, have_P,
    )
    chunk_fn = (jax.checkpoint(chunk_potentials) if twist.remat
                else chunk_potentials)
    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)
    if n_chunks == 1:
        ll_s = chunk_fn(jax.tree.map(lambda x: x[0], xs_chunks))[:P]
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

        ll_s = lax.map(
            guarded, (starts,) + xs_chunks
        ).reshape(P_pad, M, K)[:P]                       # (P, M, K)
    # back to lexicographic pair indexing for the flat categorical
    ll_lex = ll_s[jnp.asarray(inverse_np)]
    return (ll_lex, pool_P_l if have_P else None,
            pool_P_r if have_P else None)
