"""The combinatorial SMC sweep as a single static-shape `lax.scan`.

This is the TPU-native re-design of the reference's rank-update
`tf.while_loop` (reference vcsmc.py:332-451).  Where the reference carries
a physically shrinking core K x (N-r) x S x A and growing (r, K) weight
tensors with shape_invariants, we carry fixed shapes for all N-1 ranks:

* ``internal_msgs`` (K, N-1, S, A): **write-once** message buffer.  Rank r
  writes the merged message of every particle into column r and never
  touches it again.
* ``row_of_node`` (K, N-1): ancestry indirection.  After resampling,
  particle k's internal node q lives at ``internal_msgs[row_of_node[k, q],
  q]`` -- so resampling permutes **index tables only**, never the O(K S A)
  message payload.  The reference instead gathers the entire core every
  rank (vcsmc.py:286).
* position arrays ``slot`` / ``leaf_counts`` / ``root_ll`` (K, N): the
  compacted forest.  At rank r positions 0..N-r-1 are active; a merge
  removes the two coalesced positions (stable masked argsort) and appends
  the new root, mirroring the ordering semantics of the reference's
  gather/concat update (vcsmc.py:361-373) with static shapes.
* per-root data log-likelihoods are maintained **incrementally** -- only
  the merged root's likelihood is computed per rank, so a sweep costs
  O(N K S A) instead of the reference's O(N^2 K S A) full-forest
  recomputation (vcsmc.py:231-245).

Numerics: messages are per-site rescaled (Felsenstein rescaling) with log
scale totals carried per node, so float32 is safe at thousands of sites;
the reference requires float64 end-to-end.

Reference-compatibility quirks are reproduced behind config flags so the
golden parity tests against the NumPy oracle can match the reference
recursion exactly; see ``SweepConfig``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

from phylo_tpu.models.branches import branch_rates
from phylo_tpu.pruning.felsenstein import (
    merge_messages_sm,
    root_log_likelihood_sm,
)
from phylo_tpu.pruning.posterior import (
    forest_log_prior,
    overcounting_correction,
)
from phylo_tpu.smc.proposals import uniform_pair
from phylo_tpu.smc.resampling import resample_indices
from phylo_tpu.utils.math import log_double_factorial_odd, n_choose_2


@dataclass(frozen=True)
class SweepConfig:
    """Static configuration of a sweep (hashable; safe as a jit static).

    Attributes
    ----------
    K: particle count.
    resampling: 'multinomial' (reference), 'systematic', 'stratified',
        'none'.
    q_raw_subtraction: reproduce the reference quirk of subtracting the
        *probability* 1/C(n,2) from the log-weight rather than its log
        (vcsmc.py:298,392).  Default True for parity; False applies the
        mathematically intended -log q.
    resample_branch_history: the reference does NOT re-gather the per-
        particle branch-length history when resampling, so the cumulative
        branch prior mixes lineages (vcsmc.py:318-325 gathers core/record/
        jump chain but not left_branches/right_branches).  Default False
        (= reference behavior); True gathers the history like the rest of
        the state.
    right_multiplier_bug: reference get_log_likelihood uses the *left*
        rates for the right-branch multiplier (vcsmc.py:262).  Default
        True for parity.
    rescale: per-site Felsenstein rescaling of messages.
    twist: optional TwistConfig enabling VNCSMC look-ahead proposals.
    use_pallas: fuse the merge + root-log-likelihood hot op into the
        Pallas TPU kernel (pruning.kernels); falls back to the jnp path
        on non-TPU backends and when rescale=False.
    replicate_leaves: store leaf messages inside the node-message buffer
        (replicated across K) so child lookups are ONE gather instead of
        leaf-gather + internal-gather + select.  Costs K*N*A*S extra HBM
        (e.g. ~0.8 GB at primate/K=2048); disable for memory-tight
        configs.
    ess_threshold: adaptive resampling -- resample at a rank only when
        the normalized effective sample size ESS/K drops below this
        fraction (standard SMC practice; the reference resamples
        unconditionally every rank, vcsmc.py:340-344).  None (default)
        = reference behavior.
    carried_weights: use the standard carried-accumulated-weights SMC
        estimator instead of the reference's per-rank convention.
        Accumulated log-weights are carried across ranks that skip
        resampling; the ESS gate and the ancestor draw act on the
        ACCUMULATED weights, and log Z_SMC is a sum over resampling
        segments of logsumexp(accumulated log w) - log K (reset after
        each resample).  With unconditional multinomial resampling this
        reduces exactly to the reference estimator; with
        resampling='none' it yields the valid K-particle importance-
        sampling estimator logsumexp(sum_r log w_r) - log K.  The
        reference convention (default False) keeps every rank's
        incremental weight with equal-weight averaging, which is only a
        valid log Z estimator when resampling happens at every rank.
    remat: rematerialize the rank step under reverse-mode AD
        (jax.checkpoint).  NOTE: usually HARMFUL here -- checkpointing a
        scan step saves its full carry (including the O(K N A S) message
        buffer) every rank, whereas the default AD path's residuals are
        only the per-rank gathered tensors (the buffer reaches backward
        through gather/update-slice VJPs that need indices only).  Keep
        False unless per-rank residuals, not the buffer, dominate.
    """

    K: int
    resampling: str = "multinomial"
    q_raw_subtraction: bool = True
    resample_branch_history: bool = False
    right_multiplier_bug: bool = True
    rescale: bool = True
    twist: Optional[Any] = None
    use_pallas: bool = True
    remat: bool = False
    replicate_leaves: bool = True
    ess_threshold: Optional[float] = None
    carried_weights: bool = False
    # lax.scan unroll factor for the rank loop; 0 = fully unroll (the
    # whole sweep becomes straight-line code -- XLA can then alias the
    # message buffer and its cotangent in place instead of copying scan
    # carries every iteration); None = auto: fully unroll on the
    # fused-rank-kernel path for R <= 32, else keep the scan.  A/B
    # round 3: primate K=2048 fwd 6.4 -> 5.7 ms, batch-256 manual step
    # 15.4 -> 14.8, GammaSites G=4 K=512 step 17.1 -> 16.7; DS1 (R=26)
    # fwd 21.5 -> 17.2 and manual full-S step 88.9 -> 77.1 -- and the
    # unrolled DS1 step COMPILES 14x faster (52 vs 712 s: XLA's scan
    # handling, not the straight-line length, dominates compile).  The
    # R cap keeps compile bounded for many-taxa datasets; explicit
    # unroll=1 restores the scan.
    unroll: Optional[int] = None
    # manual whole-sweep VJP (smc.sweep_vjp): the reverse pass
    # re-gathers children from the final write-once message buffer and
    # carries only a compact (K, N-1, A, S) pending-cotangent buffer,
    # instead of XLA's reverse scan dragging the full unified-buffer
    # cotangent (ROADMAP item 1).  Applies when twist is None,
    # decisions is None, rescale=True and remat=False; other configs
    # fall back to XLA AD.  Gradient semantics are identical (biased
    # resampling gradient: indices constant, gathered values
    # differentiable; matches XLA AD to 1e-8 in tests/test_sweep_vjp).
    # "auto" (default) enables it when K * N * S >= 3e6 AND N <= 64.
    # At full-S the manual path wins big (interleaved A/B, K=2048,
    # round 3: primate S=898 21.5 vs 40.5 ms, DS1 S=1949 91 vs 199).
    # At S=256 minibatches XLA AD wins STANDALONE (primate 14.8 vs
    # 15.3) but manual wins IN SITU inside the fused-epoch lax.scan
    # (0.0547 vs 0.0590 s/epoch on the headline config) -- the usual
    # standalone-vs-in-situ inversion -- so the gate does not exclude
    # small-S minibatches; True / False force it.  The N cap bounds the reverse
    # pass's Python unroll (N-1 straight-line rank blocks) so
    # many-taxa datasets don't blow compile time; explicit
    # manual_vjp=True overrides it.
    # Cotangents are produced for params, leaves AND site_weights
    # (leaf/weight chains are dead-code-eliminated when unused).
    manual_vjp: Any = "auto"
    # data_grads=False declares that the caller never differentiates
    # w.r.t. `leaves` or `site_weights` (their cotangents come back as
    # zeros).  The manual TWIST reverse pass accumulates dleaves/dw in
    # a lax.scan carry, which XLA cannot dead-code-eliminate even when
    # the caller only grads params -- each rank pays a full
    # log-site-likelihood re-enumeration (pruning.kernels._dw_ref) plus
    # two scatter-adds for nothing.  The trainer/bench hot paths (param
    # gradients only) set False; the default True keeps
    # jax.grad-w.r.t.-data correct for library users (the non-twist
    # manual path needs no flag: its accumulations are straight-line
    # jnp that XLA DCEs when unused).
    data_grads: bool = True
    # block-structured merge contraction for product-space models
    # (GammaSites): G x fewer flops than the dense (G A)^2 form.  Since
    # round 3 the manual whole-sweep VJP accepts blocked configs and
    # dispatches the BLOCKED fused rank kernels on TPU (G*A^2 unrolled
    # terms), so blocked training gets the one-pallas_call rank update
    # too.  Default ON (v5e, GammaSites G=4 K=512 primate fwd+bwd:
    # blocked+manual 45.7 ms vs dense 65.6-67.8; the one arm blocked
    # loses, forced XLA AD at mid scale, is 72.2 vs 65.6).  No-op for
    # models without `transition_blocks`.
    blocked_merge: bool = True


@jax.tree_util.register_dataclass
@dataclass
class SweepResult:
    log_weights: jnp.ndarray        # (N-1, K)
    log_likelihood: jnp.ndarray     # (N-1, K)  forest posterior incl. priors
    elbo: jnp.ndarray               # scalar log Z_SMC
    log_likelihood_R: jnp.ndarray   # (K,) de-biased data log-likelihood
    left_branches: jnp.ndarray      # (N-1, K)
    right_branches: jnp.ndarray     # (N-1, K)
    ancestors: jnp.ndarray          # (N-1, K) resampling indices per rank
    merged_nodes: jnp.ndarray       # (N-1, K, 2) node ids coalesced per rank
    v_minus: jnp.ndarray            # (N-1, K)
    q_proposal: jnp.ndarray         # (N-1, K) proposal penalty used


def compute_log_zsmc(log_weights):
    """log Z_SMC = sum_r logsumexp_k(log w_rk - log K)
    (reference vcsmc.py:270-277)."""
    K = log_weights.shape[-1]
    logK = jnp.log(jnp.asarray(K, dtype=log_weights.dtype))
    return jnp.sum(
        jax.scipy.special.logsumexp(log_weights - logK, axis=-1)
    )


@jax.custom_vjp
def _resample_tables(slot, leaf_counts, root_ll, row_of_node, prev_log_ll,
                     idx):
    """Ancestor-permute the five per-particle tables in ONE gather.

    The float tables (f32) are bitcast to int32 and packed next to the
    int tables so the whole permutation is a single row gather (five
    separate gathers are latency-bound on TPU, ~100us each).  Plain
    ``bitcast_convert_type`` silently ZEROES gradients, so this op
    carries a custom VJP routing the float cotangents through the
    gather transpose (scatter-add by ``idx``) -- the reference's TF
    autodiff flows gradients through the resampling gathers (indices
    treated as constants), and so must we.
    """
    return _resample_tables_impl(slot, leaf_counts, root_ll, row_of_node,
                                 prev_log_ll, idx)


def _resample_tables_impl(slot, leaf_counts, root_ll, row_of_node,
                          prev_log_ll, idx):
    if root_ll.dtype != jnp.float32:
        return (slot[idx], leaf_counts[idx], root_ll[idx],
                row_of_node[idx], prev_log_ll[idx])
    N = slot.shape[1]
    n_ranks = row_of_node.shape[1]

    def bits(x):
        return lax.bitcast_convert_type(x, jnp.int32)

    packed = jnp.concatenate(
        [slot, leaf_counts, bits(root_ll), row_of_node,
         bits(prev_log_ll)[:, None]],
        axis=1,
    )[idx]
    return (
        packed[:, :N],
        packed[:, N:2 * N],
        lax.bitcast_convert_type(packed[:, 2 * N:3 * N], jnp.float32),
        packed[:, 3 * N:3 * N + n_ranks],
        lax.bitcast_convert_type(packed[:, -1], jnp.float32),
    )


def _resample_tables_fwd(slot, leaf_counts, root_ll, row_of_node,
                         prev_log_ll, idx):
    out = _resample_tables_impl(slot, leaf_counts, root_ll, row_of_node,
                                prev_log_ll, idx)
    return out, (idx, slot.shape, row_of_node.shape)


def _resample_tables_bwd(res, cts):
    import numpy as np

    idx, shape_n, shape_r = res
    _, _, ct_root, _, ct_prev = cts
    d_root = jnp.zeros(shape_n, ct_root.dtype).at[idx].add(ct_root)
    d_prev = jnp.zeros(shape_n[:1], ct_prev.dtype).at[idx].add(ct_prev)
    f0 = jax.dtypes.float0
    return (np.zeros(shape_n, f0), np.zeros(shape_n, f0), d_root,
            np.zeros(shape_r, f0), d_prev, np.zeros(shape_n[:1], f0))


_resample_tables.defvjp(_resample_tables_fwd, _resample_tables_bwd)


def _presample_transitions(model, model_params, rates_l, rates_r,
                           eps_l, eps_r, dtype, blocked=False,
                           shardings=None):
    """Branch lengths b = eps / rate (pathwise-differentiable in the
    rates) and ONE batched transition call for all ranks' branches.
    Shared by the sweep prologue and the manual-VJP prologue
    (sweep_vjp) so both linearize at identical values.

    Under a particle-sharded mesh ('k' axis, K divisible), the
    transition call runs inside `jax.shard_map` so each device
    computes its own K-shard -- this is what lets the Pallas expm
    kernel (no partitioning rule of its own; the partitioner would
    otherwise replicate it) keep its single-chip fast path per shard.
    The per-shard batch is bit-identical to the corresponding slice of
    the unsharded batch, so results match exactly; the replicated
    model-params cotangent is psum'd across shards by shard_map's
    transpose."""
    b_l_all = eps_l / rates_l[:, None]
    b_r_all = eps_r / rates_r[:, None]
    transition = (model.transition_blocks if blocked
                  else model.transition)
    b_cat = jnp.concatenate([b_l_all, b_r_all], axis=1)  # (R, 2K)
    mesh = shardings.mesh if shardings is not None else None
    K = b_l_all.shape[1]
    if (mesh is not None and "k" in mesh.axis_names
            and mesh.shape["k"] > 1 and K % mesh.shape["k"] == 0):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        # stack as (2, R, K) so 'k' shards each of b_l/b_r evenly
        b2 = jnp.stack([b_l_all, b_r_all])
        n_batch = 3
        n_mat = 3 if blocked else 2          # (G,) A, A trailing dims
        pspecs = jax.tree.map(lambda _: P(), model_params)
        out_spec = P(*([None] * (n_batch - 1) + ["k"]
                       + [None] * n_mat))
        # check_vma=False: pallas_call (the expm kernel) has no vma
        # rule; the transpose still psums the replicated model-params
        # cotangent correctly (probe-validated, round 4)
        P2 = shard_map(
            lambda mp, b: transition(mp, b).astype(dtype),
            mesh=mesh,
            in_specs=(pspecs, P(None, None, "k")),
            out_specs=out_spec,
            check_vma=False,
        )(model_params, b2)
        P_all = jnp.concatenate([P2[0], P2[1]], axis=1)
    else:
        P_all = transition(model_params, b_cat).astype(dtype)
    # (R, 2K, A, A) / (R, 2K, G, A, A)
    return b_l_all, b_r_all, P_all


def _take_positions(arr, idx):
    """take_along_axis(arr, idx, axis=1) for (K, N) tables with small N,
    via mask-and-sum instead of an XLA gather: per-op gather latency on
    TPU (~100us even for kilobyte tables) dominates an 11-rank sweep,
    while this form is a handful of fused VPU ops.

    arr: (K, N) int or float; idx: (K, P) ints in [0, N).
    """
    mask = idx[..., None] == jnp.arange(arr.shape[1])       # (K, P, N)
    if jnp.issubdtype(arr.dtype, jnp.integer):
        return jnp.sum(mask * arr[:, None, :], axis=-1, dtype=arr.dtype)
    return jnp.sum(
        jnp.where(mask, arr[:, None, :], 0).astype(arr.dtype), axis=-1
    )


def _node_lookup(leaves, internal_msgs, internal_logscale, row_of_node,
                 node_ids, unified=False, rows=None):
    """Fetch messages + log-scale totals for per-particle node ids.

    node_ids: (K,) or (K, P) ints in [0, 2N-2); ids < N are leaves,
    ids >= N are internal nodes resolved through the ancestry
    indirection table.  Batching the last axis fuses what would
    otherwise be several latency-bound small gathers per rank into one
    gather each.

    unified: `internal_msgs` is the unified buffer (K, N + R, A, S) with
    leaf messages replicated in columns 0..N-1, so the message fetch is
    a single gather (no leaf/internal select).

    rows: optionally the precomputed `_take_positions(row_of_node, q)`
    resolution (callers that also need the row indices avoid computing
    them twice).
    """
    N = leaves.shape[0]
    R = row_of_node.shape[1]
    squeeze = node_ids.ndim == 1
    ids = node_ids[:, None] if squeeze else node_ids           # (K, P)
    is_leaf = ids < N
    q = jnp.clip(ids - N, 0, R - 1)                            # (K, P)
    if rows is None:
        rows = _take_positions(row_of_node, q)                 # (K, P)
    if unified:
        K = row_of_node.shape[0]
        own = jnp.arange(K, dtype=rows.dtype)[:, None]
        msg = internal_msgs[jnp.where(is_leaf, own, rows), ids]
    else:
        leaf_part = leaves[jnp.clip(ids, 0, N - 1)]            # (K,P,A,S)
        int_part = internal_msgs[rows, q]                      # (K,P,A,S)
        msg = jnp.where(is_leaf[..., None, None], leaf_part, int_part)
    lsc = jnp.where(is_leaf, 0.0, internal_logscale[rows, q])
    if squeeze:
        return msg[:, 0], lsc[:, 0]
    return msg, lsc


def _compact_positions(arr, perm, merge_pos, new_value):
    """Apply the compaction permutation along positions and write
    ``new_value`` at the merged root's position."""
    out = _take_positions(arr, perm)
    N = arr.shape[1]
    at_merge = jnp.arange(N)[None, :] == merge_pos
    return jnp.where(at_merge, new_value[:, None], out)


def make_leaf_buffer(leaves, config, dtype=None, model=None):
    """Pre-build the unified message buffer for `sample_phylogenies`'s
    `leaf_buffer=` fast path: leaves replicated into columns 0..N-1
    (padded to the kernel site tile), internal columns zeros.

    Rebuilding this (K, N+R, A, Sp) buffer inside every sweep costs a
    ~2 ms concatenate at primate/K=2048; eval loops over FIXED leaves
    can build it once and thread it through calls with donation
    (`sample_phylogenies_with_buffer`) -- the sweep only ever writes
    internal columns, so the returned buffer is immediately reusable.

    STATUS: measured NO WIN on v5e (donated-buffer eval 14.75 ms vs
    12.57 plain at primate/K=2048 -- XLA fuses the in-jit buffer build
    better than it schedules around the input/output alias), so the
    trainer and bench keep the plain path; this entry point remains
    for memory-constrained loops where avoiding the second buffer
    allocation matters more than latency.
    """
    N, S, A = leaves.shape
    dtype = dtype or leaves.dtype
    K = config.K
    sm = jnp.swapaxes(jnp.asarray(leaves, dtype), -1, -2)  # (N, A, S)
    # mirror _sample_body's use_pallas padding decision exactly (a
    # blocked-merge model disables the kernel and its padding)
    blocked = (config.blocked_merge and model is not None
               and hasattr(model, "transition_blocks"))
    if (config.use_pallas and config.rescale and A <= 8
            and not blocked
            and jax.default_backend() == "tpu"):
        from phylo_tpu.pruning.kernels import TS

        Sp = -(-S // TS) * TS
        if Sp != S:
            sm = jnp.pad(sm, ((0, 0), (0, 0), (0, Sp - S)),
                         constant_values=1.0)
    return jnp.concatenate(
        [
            jnp.broadcast_to(sm[None], (K,) + sm.shape),
            jnp.zeros((K, N - 1) + sm.shape[1:], dtype=dtype),
        ],
        axis=1,
    )


def sample_phylogenies_with_buffer(key, leaves, model, params, config,
                                   leaf_buffer, *, shardings=None,
                                   site_weights=None):
    """`sample_phylogenies` with a pre-built unified buffer (see
    `make_leaf_buffer`); returns (SweepResult, final_buffer).  The
    final buffer's leaf columns are untouched, so callers can donate it
    straight back into the next call.  Value-only sweeps (eval loops);
    requires replicate_leaves and takes the plain XLA path."""
    assert config.replicate_leaves and config.twist is None
    res, final_buf = _sample_body(
        key, leaves, model, params, config, shardings=shardings,
        site_weights=site_weights, leaf_buffer=leaf_buffer,
        want_buffer=True,
    )
    return res, final_buf


def sample_phylogenies(key, leaves, model, params, config, *,
                       decisions=None, shardings=None, site_weights=None):
    """Run one full CSMC sweep.  See `_sample_body` for the mechanics;
    this wrapper routes eligible configs through the manual whole-sweep
    VJP (smc.sweep_vjp), which replaces XLA's reverse-scan over the
    O(K N A S) message-buffer cotangent with a compact hand-written
    reverse pass (ROADMAP item 1)."""
    manual = config.manual_vjp
    N, S = leaves.shape[0], leaves.shape[1]
    if manual == "auto":
        # flops scale with A^2, so the size gate weighs the alphabet:
        # K*N*S*A >= 12e6 reduces to the original K*N*S >= 3e6 at
        # DNA's A=4 and admits codon (A=61) / protein (A=20) configs
        # at proportionally smaller K*N*S -- those are exactly the
        # shapes the wide MXU rank kernels (manual-VJP-only) target
        A_states = leaves.shape[2]
        manual = config.K * N * S * A_states >= 12_000_000 and N <= 64
        if config.twist is not None:
            # the twist path's AD bookkeeping (per-rank buffer
            # residuals + dense chunk-cotangent accumulation) is what
            # the manual pass eliminates -- engage whenever the
            # (R, P, M, K) ll residual fits HBM comfortably.  At
            # paper-scale M = K (autorun.sh:3, M=$np K=1024) the llm
            # residual is ~3 GB -- large, but XLA AD is strictly WORSE
            # there: its chunk-skipping lax.cond turns the
            # loop-invariant message buffer into stacked per-chunk
            # residuals ((R, n_chunks, K, N+R, A, S) = 65 GB at
            # primate M=K=1024 b=256, round-5 HLO audit), so the
            # manual pass is the only route that fits
            R, P = N - 1, (N * (N - 1)) // 2
            llm_bytes = R * P * config.twist.M * config.K * 4
            manual = N <= 64 and llm_bytes <= 4 * 2**30
    # the manual twist reverse pass re-gathers candidate children from
    # the unified buffer, so it needs the replicated-leaf layout
    twist_ok = config.twist is None or config.replicate_leaves
    if (manual and decisions is None and twist_ok
            and config.rescale and not config.remat):
        from phylo_tpu.smc.sweep_vjp import sweep_manual_vjp

        return sweep_manual_vjp(key, leaves, model, params, config,
                                shardings, site_weights)
    return _sample_body(key, leaves, model, params, config,
                        decisions=decisions, shardings=shardings,
                        site_weights=site_weights)


def _sample_body(key, leaves, model, params, config, *,
                 decisions=None, shardings=None, site_weights=None,
                 injected=None, want_aux=False, leaf_buffer=None,
                 want_buffer=False, fused_rank=False):
    """Run one full CSMC sweep.

    Parameters
    ----------
    key: PRNG key.
    leaves: (N, S, A) one-hot / ambiguous-coded genomes.  NOT replicated
        K times (the reference feeds a K x N x S x A placeholder,
        vcsmc.py:414,479).
    model: substitution model object.
    params: {'model': model params, 'branches': branch params}.
    config: SweepConfig.
    decisions: optional dict of pre-drawn randomness for golden parity
        tests: 'ancestors' (N-1, K), 'pairs' (N-1, K, 2) positions,
        'branches_l'/'branches_r' (N-1, K).  When provided, the sweep is
        fully deterministic.
    shardings: optional parallel.SweepSharding; constrains the message
        buffer (K on 'k', S on 's') and leaves (S on 's') so GSPMD
        propagates the layout through the scan and reduces per-site
        partial log-likelihood sums with psum over ICI.
    site_weights: optional (S,) per-site weights multiplying each site's
        log-likelihood contribution; 0 masks padded site columns (used
        when S is padded to a mesh multiple), other values reweight
        sites (importance-weighted minibatching).

    Returns SweepResult.
    """
    N, S, A = leaves.shape
    K = config.K
    n_ranks = N - 1
    dtype = leaves.dtype
    # states-major internal layout (N, A, S): site tiles ride TPU vector
    # lanes and the Pallas kernel consumes buffers without transposes
    leaves = jnp.swapaxes(jnp.asarray(leaves), -1, -2)
    # block-structured models (GammaSites): per-block transitions + the
    # blocked merge contraction (non-twist path; the twist enumerates
    # with dense transitions).  Opt-in (SweepConfig.blocked_merge):
    # the blocked contraction wins forward-only sweeps (13.5 -> 11.3
    # ms at GammaSites G=4 K=512 primate) but its best-known backward
    # loses to the dense einsum VJP (47 vs 36 ms fwd+bwd) -- see
    # pruning.felsenstein._contract_blocked.  Either way the model's
    # dense `transition` already uses per-block expms.
    blocks = (getattr(model, "blocks", None)
              if (config.twist is None and config.blocked_merge)
              else None)
    from phylo_tpu.pruning.kernels import (
        INTERPRET as _kernels_interpret,
        kshard_mesh,
        site_sharded_mesh,
    )

    # meshes sharding ONLY the site axis keep the fused rank kernels
    # legal per shard (all particle rows device-local; rootll/d_lsc
    # site-sums psum'd) -- see kernels.shard_fused_rank_update
    s_mesh = site_sharded_mesh(shardings)
    # particle-sharded meshes ('k' > 1): the cross-shard child fetch
    # runs as the structured psum_scatter exchange and the per-shard
    # Pallas MERGE kernel re-engages -- see kernels.shard_gather_pair /
    # shard_merge_loglik (the whole-rank DMA kernels stay off: their
    # gathers are device-local by construction)
    k_mesh = kshard_mesh(shardings)
    kernel_backend = jax.default_backend() == "tpu" or _kernels_interpret
    kernel_ok = (
        config.use_pallas and config.rescale
        and kernel_backend
        # the kernel unrolls A^2; product-space alphabets (GammaSites
        # A' = G*A) blow the Mosaic unroll budget -- use the jnp path
        and A <= 8
        and blocks is None
    )
    # the non-fused merge kernel has no partitioning rule of its own:
    # single-device traces call it directly; particle-sharded meshes
    # get it per shard through kernels.shard_merge_loglik (children
    # made explicit by the shard_gather_pair exchange); 's'-only
    # meshes use the fused rank path below, jnp + GSPMD otherwise
    use_pallas = kernel_ok and shardings is None
    use_pallas_k = (
        kernel_ok and k_mesh is not None and config.replicate_leaves
    )
    # _dma_gather_children moves (GA, Sp) slabs: Mosaic requires the
    # sliced row count to pack the 8-row f32 tile evenly (GA % 8 == 0
    # or 8 % GA == 0) -- A=7 (spikeGP) fails with "slice shape must be
    # aligned to tiling (8)" otherwise.  Misaligned plane counts are
    # re-admitted by PADDING the state planes (dense: A -> 8; blocked:
    # whole zero rate-category blocks) with zero transitions/stationary
    # entries, which the contraction provably zeroes out -- see
    # `plane_pad` application below.
    GA_dim = leaves.shape[1]
    if GA_dim % 8 == 0 or 8 % GA_dim == 0:
        plane_pad = 0
    elif blocks is None and GA_dim <= 128:
        # pad dense states to the 8-row tile: 5..7 -> 8 (unrolled
        # kernels), 20 -> 24 / 61 -> 64 (wide MXU kernels)
        plane_pad = (-GA_dim) % 8
    elif blocks is not None:
        GAp = -(-GA_dim // 8) * 8
        plane_pad = (GAp - GA_dim
                     if (GAp - GA_dim) % blocks[1] == 0 else None)
    else:
        plane_pad = None
    blocks_padded = blocks
    if blocks is not None and plane_pad:
        blocks_padded = (blocks[0] + plane_pad // blocks[1], blocks[1])
    # the fused RANK kernels also come in a block-structured form
    # (G*A^2 unrolled terms, within the Mosaic budget when <= 64): the
    # blocked GammaSites merge gets the one-pallas_call rank update on
    # the manual-VJP path even though the plain merge kernel (dense
    # A'^2 unroll) stays off
    blocked_kernel_ok = (
        config.use_pallas and config.rescale
        and kernel_backend
        and blocks is not None
        and plane_pad is not None
        # <= 64 unrolled terms: the tuned VPU bodies; above: the wide
        # MXU bodies (per-block dot_general), capped at 128-wide blocks
        and blocks_padded[1] <= 128
    )
    # dense wide alphabets (codon A=61, protein A=20): the MXU rank
    # kernels (kernels._kernel_rank_wide) take over where the A^2
    # unroll is infeasible -- manual-VJP path only, like the rest of
    # the fused rank machinery
    wide_kernel_ok = (
        config.use_pallas and config.rescale
        and kernel_backend
        and blocks is None
        and 8 < A <= 128
        and plane_pad is not None
    )
    if fused_rank:
        # fused gather->merge->scatter rank kernel (kernels._kernel_rank):
        # only on the manual-VJP / eval paths (no AD rule),
        # single-device or 's'-only-sharded, unified-buffer, non-twist
        # sweeps with tile-divisible K
        from phylo_tpu.pruning.kernels import FUSED_RANK, TKF

        fused_rank = (
            FUSED_RANK
            and (kernel_ok or blocked_kernel_ok or wide_kernel_ok)
            and plane_pad is not None
            and config.replicate_leaves
            and config.twist is None
            and (shardings is None or s_mesh is not None)
            and decisions is None and injected is None
            and K % TKF == 0
        )
    if fused_rank and plane_pad:
        # zero leaf planes; transitions/stationary padded after they
        # are computed below.  `A` becomes the PADDED plane count for
        # the rest of this function (buffer shapes, kernel params);
        # cotangents are sliced back in sweep_vjp.
        leaves = jnp.pad(leaves, ((0, 0), (0, plane_pad), (0, 0)))
        A = leaves.shape[1]
        blocks = blocks_padded
    else:
        plane_pad = 0
    # manual-VJP forward: save the gathered children as residuals so
    # the reverse pass skips the per-particle DMA re-gather (56% of
    # fused_rank_bwd at batch-256 shapes); capped by residual bytes
    save_children = False
    if fused_rank and want_aux:
        from phylo_tpu.pruning.kernels import (
            SAVE_CHILDREN_CAP, TS, _rank_tile, wide_rank_kernel,
        )

        # the FINAL padded Sp (incl. the 's'-mesh multiple below) and
        # the PER-SHARD kernel tile, so this gate agrees with the
        # backward's fallback check (sweep_vjp._messages_bwd computes
        # the same quantities from the padded aux shapes)
        ns_k = s_mesh.shape["s"] if s_mesh is not None else 1
        Sp_k = -(-S // (TS * ns_k)) * (TS * ns_k)
        GA_k = leaves.shape[1]
        wide_k = wide_rank_kernel(
            blocks[0] if blocks is not None else 1,
            blocks[1] if blocks is not None else GA_k,
        )
        resid_bytes = 2 * n_ranks * K * GA_k * Sp_k * leaves.dtype.itemsize
        # below tk=16 the re-gather backward's per-particle DMA count
        # explodes (spike A->8 Sp=1664 tk=8: 1004 ms/step vs 124 with
        # saved children): ignore the byte cap there, bounded by HBM
        save_children = (
            resid_bytes <= SAVE_CHILDREN_CAP
            or (_rank_tile(Sp_k // ns_k, GA_k, wide=wide_k) < 16
                and resid_bytes <= 6 * 2 ** 30)
        )
    if use_pallas or fused_rank:
        # pre-pad the site axis to the kernel tile so the per-rank pad
        # op disappears; padding columns are all-ones with weight 0.
        # On an 's'-sharded mesh every SHARD must be a tile multiple.
        from phylo_tpu.pruning.kernels import TS

        mult = TS * (s_mesh.shape["s"] if s_mesh is not None else 1)
        Sp = -(-S // mult) * mult
        if Sp != S:
            leaves = jnp.pad(
                leaves, ((0, 0), (0, 0), (0, Sp - S)),
                constant_values=1.0,
            )
            if site_weights is None:
                site_weights = jnp.ones((S,), dtype=dtype)
            site_weights = jnp.pad(site_weights, (0, Sp - S))
            S = Sp
    if shardings is not None:
        leaves = lax.with_sharding_constraint(leaves, shardings.leaves_sm)

    stationary = model.stationary(params["model"]).astype(dtype)
    if plane_pad:
        stationary = jnp.pad(stationary, (0, plane_pad))
    rates_l, rates_r = branch_rates(params["branches"])
    rates_l = rates_l.astype(dtype)
    rates_r = rates_r.astype(dtype)

    # Leaf root log-likelihoods, shared across particles.
    if site_weights is not None:
        site_weights = jnp.asarray(site_weights, dtype=dtype)
        if shardings is not None:
            site_weights = lax.with_sharding_constraint(
                site_weights, shardings.sites
            )
    leaf_ll = root_log_likelihood_sm(
        leaves, stationary, site_weights=site_weights
    )                                                          # (N,)

    # Unrolled-rank mode for twisted sweeps (TwistConfig.unroll_max_ranks):
    # a Python loop over ranks with statically TRUNCATED pair tables --
    # rank r enumerates exactly C(N-r, 2) prefix-ordered pairs instead
    # of masking all C(N, 2) inside a lax.scan body (~2.5x enumeration
    # compute, forward and backward) or paying per-chunk dispatch
    # latency for whole-chunk skipping.  Golden-parity injection
    # (decisions) and GSPMD (shardings) keep the scanned path.
    twist_unrolled = (
        config.twist is not None and decisions is None
        and shardings is None
        and config.twist.unrolled(N, config.twist.M, K, S,
                                  jnp.dtype(dtype).itemsize)
    )
    if config.twist is not None:
        from phylo_tpu.smc.twist import twisted_extend  # lazy import

    if injected is None:
        if leaf_buffer is not None:
            # pre-built (and typically donated) unified buffer: leaf
            # columns already replicated, internal columns are
            # write-before-read so any leftover content is fine
            assert config.replicate_leaves
            internal_msgs0 = leaf_buffer
        elif config.replicate_leaves and not fused_rank:
            # unified buffer: leaves replicated in columns 0..N-1,
            # internal node q at column N+q -> child fetch is one
            # gather, no select.  The fused rank kernel resolves leaf
            # children against the shared (N, A, Sp) array in-kernel,
            # so it always uses the internal-only buffer below.
            internal_msgs0 = jnp.concatenate(
                [
                    jnp.broadcast_to(leaves[None], (K, N, A, S)),
                    jnp.zeros((K, n_ranks, A, S), dtype=dtype),
                ],
                axis=1,
            )
        elif fused_rank:
            # write-once + exact-slab DMA gathers: contents are never
            # read before written, so skip the 300+ MB zero-fill
            from phylo_tpu.pruning.kernels import (
                alloc_rank_buffer,
                shard_alloc_rank_buffer,
            )

            if s_mesh is not None:
                internal_msgs0 = shard_alloc_rank_buffer(
                    s_mesh, K, n_ranks, A, S, dtype)
            else:
                internal_msgs0 = alloc_rank_buffer(K, n_ranks, A, S,
                                                   dtype)
        else:
            internal_msgs0 = jnp.zeros((K, n_ranks, A, S), dtype=dtype)
        if shardings is not None:
            internal_msgs0 = lax.with_sharding_constraint(
                internal_msgs0, shardings.core
            )

    init = dict(
        key=key,
        slot=jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (K, 1)),
        leaf_counts=jnp.ones((K, N), dtype=jnp.int32),
        root_ll=jnp.tile(leaf_ll[None].astype(dtype), (K, 1)),
        row_of_node=jnp.zeros((K, n_ranks), dtype=jnp.int32),
        internal_logscale=jnp.zeros((K, n_ranks), dtype=dtype),
        sum_bl=jnp.zeros((K,), dtype=dtype),
        sum_br=jnp.zeros((K,), dtype=dtype),
        prev_log_w=jnp.zeros((K,), dtype=dtype),
        prev_log_ll=jnp.zeros((K,), dtype=dtype),
        acc_log_w=jnp.zeros((K,), dtype=dtype),
        log_z=jnp.zeros((), dtype=dtype),
        branch_hist_l=jnp.zeros((n_ranks, K), dtype=dtype),
        branch_hist_r=jnp.zeros((n_ranks, K), dtype=dtype),
    )
    if injected is None:
        init["internal_msgs"] = internal_msgs0

    pos_idx = jnp.arange(N, dtype=jnp.int32)

    def step(state, xs):
        r, dec = xs
        n_active = N - r                       # active roots this rank
        rf = jnp.asarray(r, dtype)   # r may be a Python int (unrolled)

        key, k_res, k_pair, k_bl, k_br, k_tw = jax.random.split(
            state["key"], 6
        )

        # ---- 1. Resample (rank > 0), reference vcsmc.py:279-330 -------
        # carried_weights: gate + draw on ACCUMULATED weights; the
        # reference convention uses the previous rank's incremental
        # weight only (valid because it resamples every rank).
        gate_lw = (state["acc_log_w"] if config.carried_weights
                   else state["prev_log_w"])
        if injected is not None:
            # scalar replay (sweep_vjp backward): ancestor indices and
            # the resample gate are injected verbatim from the forward
            # run -- recomputing the gate from slightly-reassociated
            # floats could flip a resample decision and corrupt grads
            sampled = dec["inj_ancestors"]
            do_resample = dec["inj_do_resample"]
        else:
            if decisions is not None:
                sampled = dec["ancestors"]
            else:
                sampled = resample_indices(k_res, gate_lw,
                                           config.resampling)
            do_resample = r > 0
            if config.carried_weights and config.resampling == "none":
                do_resample = do_resample & False
            if config.ess_threshold is not None:
                # ESS = (sum w)^2 / sum w^2 on normalized weights
                lw = gate_lw - jax.scipy.special.logsumexp(gate_lw)
                ess = jnp.exp(-jax.scipy.special.logsumexp(2.0 * lw))
                do_resample = do_resample & (
                    ess < config.ess_threshold * K
                )
        idx = jnp.where(do_resample, sampled, jnp.arange(K))
        logK = jnp.log(jnp.asarray(K, dtype=dtype))
        if config.carried_weights:
            # close the segment when resampling: its log Z contribution
            # is logsumexp(accumulated log w) - log K; survivors restart
            # with equal weights
            seg = jax.scipy.special.logsumexp(state["acc_log_w"]) - logK
            log_z = state["log_z"] + jnp.where(do_resample, seg, 0.0)
            acc_base = jnp.where(do_resample, 0.0, state["acc_log_w"])
        else:
            log_z = state["log_z"]
            acc_base = state["acc_log_w"]
        slot, leaf_counts, root_ll, row_of_node, prev_ll_g = (
            _resample_tables(
                state["slot"], state["leaf_counts"], state["root_ll"],
                state["row_of_node"], state["prev_log_ll"], idx,
            )
        )
        tilde = jnp.where(r > 0, prev_ll_g, -logK)
        if config.resample_branch_history:
            sum_bl = jnp.where(r > 0, state["sum_bl"][idx], state["sum_bl"])
            sum_br = jnp.where(r > 0, state["sum_br"][idx], state["sum_br"])
        else:
            sum_bl, sum_br = state["sum_bl"], state["sum_br"]

        rate_l = rates_l[r]
        rate_r = rates_r[r]

        # ---- 2. Extend partial state: pair + branch proposal ----------
        if config.twist is not None:
            # record the post-resample lookup tables BEFORE this rank's
            # updates: the manual twist reverse pass re-resolves every
            # candidate pair's children against the final buffer with
            # exactly these tables
            slot_pre, rows_pre = slot, row_of_node
            (p1, p2, b_l, b_r, P_l, P_r, q_pen, twist_llm,
             twist_idx) = twisted_extend(
                k_tw, config, model, params, stationary, leaves,
                slot, leaf_counts, row_of_node,
                state["internal_msgs"] if injected is None else None,
                state["internal_logscale"],
                r, n_active, rate_l, rate_r, dec,
                site_weights=site_weights, root_ll=root_ll,
            )
            if P_l is None and injected is None:
                # pool expm was not presampled (over budget): compute
                # the chosen branches' transitions in-loop
                P_lr = model.transition(
                    params["model"], jnp.concatenate([b_l, b_r])
                ).astype(dtype)
                P_l, P_r = P_lr[:K], P_lr[K:]
        else:
            if injected is not None:
                p1 = dec["inj_pairs"][:, 0]
                p2 = dec["inj_pairs"][:, 1]
            elif decisions is not None:
                p1 = dec["pairs"][:, 0]
                p2 = dec["pairs"][:, 1]
            else:
                p1, p2 = uniform_pair(k_pair, K, N, n_active, dtype)
            # branch lengths + transitions were presampled for ALL ranks
            # in one batched expm before the scan (state-independent)
            b_l = dec["branches_l"]
            b_r = dec["branches_r"]
            if injected is None:
                P_l = dec["P_l"]
                P_r = dec["P_r"]
            # topology proposal penalty (reference quirk: the *raw*
            # probability 1/C(n,2) is subtracted from the log weight,
            # vcsmc.py:298,392)
            n_pairs = n_choose_2(n_active).astype(dtype)
            if config.q_raw_subtraction:
                q_pen = jnp.ones((K,), dtype=dtype) / n_pairs
            else:
                q_pen = -jnp.log(n_pairs) * jnp.ones((K,), dtype=dtype)

        # ---- 3. Child lookups (pair-fused gathers) ----------------------
        pair_pos = jnp.stack([p1, p2], axis=1)                  # (K, 2)
        nodes = _take_positions(slot, pair_pos)                 # (K, 2)
        counts = _take_positions(leaf_counts, pair_pos)         # (K, 2)
        n1, n2 = nodes[:, 0], nodes[:, 1]
        c1, c2 = counts[:, 0], counts[:, 1]
        is_leaf_n = nodes < N
        q_n = jnp.clip(nodes - N, 0, n_ranks - 1)
        rows_n = _take_positions(row_of_node, q_n)              # (K, 2)
        lscs = jnp.where(
            is_leaf_n, 0.0, state["internal_logscale"][rows_n, q_n]
        )
        lsc1, lsc2 = lscs[:, 0], lscs[:, 1]

        zero = jnp.zeros((), dtype=jnp.int32)  # r may be a Python int
        if injected is not None:
            # ---- 4'. Injected merge scalars (scalar replay) -----------
            # the unscaled root log-lik and per-merge log-scale computed
            # by the forward sweep are injected; the message buffer is
            # never touched (its gradient is handled by the manual
            # reverse pass in sweep_vjp._messages_bwd)
            node_lsc = dec["inj_dlsc"] + lsc1 + lsc2
            ll_new = dec["inj_rootll"] + lsc1 + lsc2
        elif fused_rank:
            # ---- 4''. Fused rank kernel: gather + merge + scatter ------
            # one pallas_call DMA-gathers both children (leaves from the
            # shared (N, A, Sp) array, internal nodes from the
            # write-once buffer) and writes the merged column back in
            # place (input/output aliasing) -- no gather
            # materialization, no update-slice copy, no K-fold leaf
            # replication
            from phylo_tpu.pruning.kernels import (
                fused_rank_update,
                shard_fused_rank_update,
            )

            idx4 = jnp.stack([
                rows_n[:, 0], nodes[:, 0], rows_n[:, 1], nodes[:, 1],
            ]).astype(jnp.int32)
            outc = jnp.reshape(r, (1,)).astype(jnp.int32)
            w_vec = (site_weights if site_weights is not None
                     else jnp.ones((S,), dtype))
            if s_mesh is not None:
                def _rank_fn(*a, save_children=False):
                    return shard_fused_rank_update(
                        s_mesh, save_children=save_children)(*a)
            else:
                _rank_fn = fused_rank_update
            child_l = child_r = None
            if save_children:
                (internal_msgs, rootll_raw, d_lsc, child_l,
                 child_r) = _rank_fn(
                    leaves, state["internal_msgs"], idx4, outc, P_l,
                    P_r, stationary, w_vec, save_children=True,
                )
            else:
                internal_msgs, rootll_raw, d_lsc = _rank_fn(
                    leaves, state["internal_msgs"], idx4, outc, P_l,
                    P_r, stationary, w_vec,
                )
            node_lsc = d_lsc + lsc1 + lsc2
            ll_new = rootll_raw + lsc1 + lsc2
        else:
            if k_mesh is not None and config.replicate_leaves:
                # particle-sharded mesh: the cross-shard child fetch
                # runs as ONE masked-contribution psum_scatter over 'k'
                # (kernels.shard_gather_pair) instead of GSPMD's
                # generic gather lowering; bit-identical values
                from phylo_tpu.pruning.kernels import shard_gather_pair

                own = jnp.arange(K, dtype=rows_n.dtype)[:, None]
                brow = jnp.where(is_leaf_n, own, rows_n)
                msgs = shard_gather_pair(k_mesh)(
                    state["internal_msgs"], brow.astype(jnp.int32),
                    nodes.astype(jnp.int32),
                )
            else:
                msgs, _ = _node_lookup(
                    leaves, state["internal_msgs"],
                    state["internal_logscale"], row_of_node, nodes,
                    unified=config.replicate_leaves, rows=rows_n,
                )
            m1, m2 = msgs[:, 0], msgs[:, 1]

            # ---- 4. Pruning update (the hot kernel) --------------------
            if use_pallas or use_pallas_k:
                from phylo_tpu.pruning.kernels import (
                    fused_merge_loglik,
                    shard_merge_loglik,
                )

                w_vec = (site_weights if site_weights is not None
                         else jnp.ones((S,), dtype))
                merge_fn = (shard_merge_loglik(k_mesh) if use_pallas_k
                            else fused_merge_loglik)
                merged, rootll_raw, d_lsc = merge_fn(
                    m1, m2, P_l, P_r, stationary, w_vec
                )
                node_lsc = d_lsc + lsc1 + lsc2
                ll_new = rootll_raw + lsc1 + lsc2
            else:
                merged, d_lsc = merge_messages_sm(
                    m1, m2, P_l, P_r, rescale=config.rescale,
                    site_weights=site_weights, blocks=blocks,
                )
                # rootll_raw is the UNSCALED root log-lik (the merge's
                # own log-scale folded back in) so ll_new composes the
                # same way as the kernel branch and the scalar replay
                rootll_raw = root_log_likelihood_sm(
                    merged, stationary, site_weights=site_weights
                ) + d_lsc
                node_lsc = d_lsc + lsc1 + lsc2
                ll_new = rootll_raw + lsc1 + lsc2

            # ---- 5. Write-once buffers ---------------------------------
            msg_col = jnp.asarray(
                r + N if config.replicate_leaves else r, jnp.int32
            )
            internal_msgs = lax.dynamic_update_slice(
                state["internal_msgs"], merged[:, None],
                (zero, msg_col, zero, zero)
            )
        r32 = jnp.asarray(r, jnp.int32)
        internal_logscale = lax.dynamic_update_slice(
            state["internal_logscale"], node_lsc[:, None], (zero, r32)
        )
        row_of_node = lax.dynamic_update_slice(
            row_of_node, jnp.arange(K, dtype=jnp.int32)[:, None],
            (zero, r32)
        )

        # ---- 6. Compact positions ---------------------------------------
        is_coal = (pos_idx[None, :] == p1[:, None]) | (
            pos_idx[None, :] == p2[:, None]
        )
        perm = jnp.argsort(
            pos_idx[None, :] + N * is_coal.astype(jnp.int32),
            axis=1, stable=True,
        ).astype(jnp.int32)
        merge_pos = n_active - 2
        new_node_id = jnp.full((K,), N + r, dtype=jnp.int32)
        slot = _compact_positions(slot, perm, merge_pos, new_node_id)
        leaf_counts = _compact_positions(leaf_counts, perm, merge_pos,
                                         c1 + c2)
        root_ll = _compact_positions(root_ll, perm, merge_pos, ll_new)

        active = pos_idx[None, :] < (n_active - 1)

        # ---- 7. Forest posterior (incremental), vcsmc.py:376-384 -------
        data_ll = jnp.sum(jnp.where(active, root_ll, 0.0), axis=1)
        topo_lp = forest_log_prior(leaf_counts, active).astype(dtype)
        sum_bl = sum_bl + b_l
        sum_br = sum_br + b_r
        # reference quirk: rank-r rates price ALL branches sampled so far
        # (vcsmc.py:378-384)
        branch_lp = (
            (rf + 1.0) * jnp.log(rate_l) - rate_l * sum_bl
            + (rf + 1.0) * jnp.log(rate_r) - rate_r * sum_br
        )
        log_ll_r = data_ll + topo_lp + branch_lp

        # ---- 8. Weight update, vcsmc.py:386-394 -------------------------
        v_minus = overcounting_correction(leaf_counts, active)
        q_branch = (
            jnp.log(rate_l) - rate_l * b_l + jnp.log(rate_r) - rate_r * b_r
        )
        log_w = (
            log_ll_r - tilde - q_branch
            + jnp.log(v_minus.astype(dtype)) - q_pen
        )

        branch_hist_l = lax.dynamic_update_slice(
            state["branch_hist_l"], b_l[None], (r32, zero)
        )
        branch_hist_r = lax.dynamic_update_slice(
            state["branch_hist_r"], b_r[None], (r32, zero)
        )

        new_state = dict(
            key=key, slot=slot, leaf_counts=leaf_counts, root_ll=root_ll,
            row_of_node=row_of_node,
            internal_logscale=internal_logscale, sum_bl=sum_bl,
            sum_br=sum_br, prev_log_w=log_w, prev_log_ll=log_ll_r,
            acc_log_w=acc_base + log_w, log_z=log_z,
            branch_hist_l=branch_hist_l, branch_hist_r=branch_hist_r,
        )
        if injected is None:
            new_state["internal_msgs"] = internal_msgs
        out = dict(
            log_w=log_w, log_ll=log_ll_r, b_l=b_l, b_r=b_r,
            ancestors=idx.astype(jnp.int32),
            merged=jnp.stack([n1, n2], axis=-1),
            v_minus=v_minus.astype(jnp.int32), q_pen=q_pen,
        )
        if want_aux:
            # residual record for the manual whole-sweep VJP: the two
            # child row resolutions plus the merge scalars at the cut
            out.update(
                rows=rows_n, pairs=pair_pos, rootll_raw=rootll_raw,
                d_lsc=d_lsc, do_resample=do_resample,
            )
            if save_children:
                out.update(child_l=child_l, child_r=child_r)
            if config.twist is not None:
                # twist residuals: the (P, M, K) merge log-likelihoods
                # at the cut, the flat choice, the post-resample lookup
                # tables, and the chosen unit-rate draws (b * rate --
                # rate-independent, so the backward can re-express
                # b = eps / rate differentiably)
                out.update(
                    twist_llm=twist_llm,
                    twist_choice=twist_idx.astype(jnp.int32),
                    slot_t=slot_pre, rows_t=rows_pre,
                    twist_eps_l=b_l * rate_l,
                    twist_eps_r=b_r * rate_r,
                )
        return new_state, out

    ranks = jnp.arange(n_ranks, dtype=jnp.int32)
    xs_dec = dict(decisions) if decisions is not None else {}
    eps_l = eps_r = None
    if config.twist is None:
        # Branch proposals are state-independent, so ALL ranks' branch
        # lengths and transition matrices are generated in ONE batched
        # uniformized-expm call before the scan -- the reference (and a
        # naive port) pays a sequential expm chain per rank instead
        # (vcsmc.py:351-356,180-188).
        if decisions is None:
            if injected is not None:
                # scalar replay: reuse the forward sweep's unit-rate
                # exponential draws so b = eps / rate stays
                # differentiable w.r.t. the rates
                eps_l = injected["eps_l"]
                eps_r = injected["eps_r"]
            else:
                k_bl_all, k_br_all = jax.random.split(
                    jax.random.fold_in(key, 0x5eed), 2
                )
                eps_l = jax.random.exponential(
                    k_bl_all, (n_ranks, K), dtype=dtype
                )
                eps_r = jax.random.exponential(
                    k_br_all, (n_ranks, K), dtype=dtype
                )
            b_l_all, b_r_all, P_all = _presample_transitions(
                model, params["model"], rates_l, rates_r, eps_l, eps_r,
                dtype, blocked=blocks is not None, shardings=shardings,
            )
            if plane_pad:
                # zero transitions for the padded planes/blocks: the
                # merge contraction provably writes zero into padded
                # message planes, and pi pad entries drop them from
                # every root reduction
                if blocks is not None:
                    P_all = jnp.pad(P_all, (
                        (0, 0), (0, 0), (0, plane_pad // blocks[1]),
                        (0, 0), (0, 0)))
                else:
                    P_all = jnp.pad(P_all, (
                        (0, 0), (0, 0), (0, plane_pad), (0, plane_pad)))
        else:
            b_l_all = decisions["branches_l"].astype(dtype)
            b_r_all = decisions["branches_r"].astype(dtype)
            transition = (model.transition_blocks if blocks is not None
                          else model.transition)
            P_all = transition(
                params["model"],
                jnp.concatenate([b_l_all, b_r_all], axis=1),
            ).astype(dtype)
        xs_dec.update(branches_l=b_l_all, branches_r=b_r_all)
        if injected is None:
            xs_dec.update(P_l=P_all[:, :K], P_r=P_all[:, K:])
        else:
            xs_dec.update(
                inj_ancestors=injected["ancestors"],
                inj_pairs=injected["pairs"],
                inj_do_resample=injected["do_resample"],
                inj_rootll=injected["rootll_raw"],
                inj_dlsc=injected["d_lsc"],
            )
    else:
        # twist pools (and, within budget, the expm of every pool
        # entry) are state-independent: generate them for ALL ranks in
        # one batched call before the scan (see precompute_twist_xs)
        from phylo_tpu.smc.twist import precompute_twist_xs

        xs_dec.update(
            precompute_twist_xs(
                key, config, model, params, rates_l, rates_r, N, dtype,
                decisions, skip_expm=injected is not None,
                prefix_ordered=twist_unrolled,
            )
        )
        if injected is not None:
            # scalar replay of the manual whole-sweep VJP: resampling /
            # merge decisions plus the per-rank twist cut quantities
            xs_dec.update(
                inj_ancestors=injected["ancestors"],
                inj_do_resample=injected["do_resample"],
                inj_rootll=injected["rootll_raw"],
                inj_dlsc=injected["d_lsc"],
                inj_twist_llm=injected["twist_llm"],
                inj_twist_choice=injected["twist_choice"],
            )
    if twist_unrolled:
        # Python-unrolled rank loop: each rank sees a static n_active so
        # the twist enumeration truncates (see twist._twisted_extend_
        # static).  config.remat is ignored here -- jax.checkpoint would
        # re-trace `r` as an array and defeat the static truncation;
        # enumeration memory is bounded by TwistConfig.remat instead.
        # xs entries are (R, ...) stacked arrays EXCEPT inj_twist_llm,
        # a per-rank tuple of truncated (C(N-r,2), M, K) arrays -- for
        # both, v[rr] picks rank rr's slice/element.
        state = init
        outs_list = []
        for rr in range(n_ranks):
            dec_r = {k: v[rr] for k, v in xs_dec.items()}
            state, out = step(state, (rr, dec_r))
            outs_list.append(out)
        final = state
        outs = {
            k: (tuple(o[k] for o in outs_list) if k == "twist_llm"
                else jnp.stack([jnp.asarray(o[k]) for o in outs_list]))
            for k in outs_list[0]
        }
    else:
        xs = (ranks, xs_dec)
        step_fn = jax.checkpoint(step) if config.remat else step
        unroll = config.unroll
        if unroll is None:
            unroll = n_ranks if (fused_rank and n_ranks <= 32) else 1
        elif unroll == 0:
            unroll = n_ranks
        final, outs = lax.scan(step_fn, init, xs, unroll=unroll)

    log_weights = outs["log_w"]
    log_likelihood = outs["log_ll"]
    if config.carried_weights:
        # final (open) segment closes at the last rank
        logK = jnp.log(jnp.asarray(K, dtype=dtype))
        elbo = final["log_z"] + (
            jax.scipy.special.logsumexp(final["acc_log_w"]) - logK
        )
    else:
        elbo = compute_log_zsmc(log_weights)
    log_likelihood_R = _debiased_log_likelihood(
        log_likelihood, final["branch_hist_l"], final["branch_hist_r"],
        rates_l, rates_r, N, config,
    )

    result = SweepResult(
        log_weights=log_weights,
        log_likelihood=log_likelihood,
        elbo=elbo,
        log_likelihood_R=log_likelihood_R,
        left_branches=outs["b_l"],
        right_branches=outs["b_r"],
        ancestors=outs["ancestors"],
        merged_nodes=outs["merged"],
        v_minus=outs["v_minus"],
        q_proposal=outs["q_pen"],
    )
    if injected is not None:
        # scalar replay of the manual whole-sweep VJP; the caller
        # (sweep_vjp) differentiates this result only -- the message
        # cotangents arrive via the manual reverse passes
        return result, None
    if want_aux:
        aux = dict(
            buf=final["internal_msgs"],
            leaves_sm=leaves,                    # states-major, padded
            site_weights=(site_weights if site_weights is not None
                          else jnp.ones((S,), dtype)),
            eps_l=eps_l, eps_r=eps_r,
            ancestors=outs["ancestors"],
            merged=outs["merged"],
            pairs=outs["pairs"],
            rows=outs["rows"],
            do_resample=outs["do_resample"],
            rootll_raw=outs["rootll_raw"],
            d_lsc=outs["d_lsc"],
        )
        if "child_l" in outs:
            aux.update(child_l=outs["child_l"],
                       child_r=outs["child_r"])
        if config.twist is not None:
            aux.update(
                twist_llm=outs["twist_llm"],
                twist_choice=outs["twist_choice"],
                slot_t=outs["slot_t"], rows_t=outs["rows_t"],
                twist_eps_l=outs["twist_eps_l"],
                twist_eps_r=outs["twist_eps_r"],
            )
        return result, aux
    if want_buffer:
        return result, final["internal_msgs"]
    return result


def _debiased_log_likelihood(log_likelihood, branches_l, branches_r,
                             rates_l, rates_r, N, config):
    """P(Y|t, theta) at the final rank: strip the branch prior and restore
    the (2N-3)!! topology count (reference vcsmc.py:254-268).

    The reference prices the right branches with the LEFT rates'
    multiplier (vcsmc.py:262); reproduced when
    config.right_multiplier_bug.
    """
    dtype = log_likelihood.dtype
    lp_l = jnp.sum(
        jnp.log(rates_l)[:, None] - rates_l[:, None] * branches_l, axis=0
    )
    r_mult = rates_l if config.right_multiplier_bug else rates_r
    lp_r = jnp.sum(
        jnp.log(r_mult)[:, None] - rates_r[:, None] * branches_r, axis=0
    )
    return (
        log_likelihood[-1]
        + log_double_factorial_odd(2 * N - 3).astype(dtype)
        - lp_l - lp_r
    )
