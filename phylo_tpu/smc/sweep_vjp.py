"""Manual whole-sweep VJP for the CSMC sweep (ROADMAP item 1).

XLA's reverse-mode scan over `_sample_body` drags the cotangent of the
full unified message buffer (K, N+R, A, S) through every reverse rank
(carry copies + add_any + dynamic-slice chains measured at ~14 ms of
the 27.5 ms backward at primate/K=2048).  This module replaces it with
a hand-written reverse pass built on two structural facts of the sweep:

1. **The message buffer is write-once.**  Column r is written at rank r
   and never mutated, so the FINAL buffer (a natural forward residual)
   contains every child message any rank ever read -- the backward can
   re-gather them exactly instead of checkpointing per-rank residuals.
2. **Messages reach the loss only through two per-rank scalars.**  The
   merge at rank r contributes `rootll_raw` (unscaled root log-lik) and
   `d_lsc` (the merge's log-scale), and everything downstream of those
   is cheap (K,)-sized bookkeeping.  Cutting the graph there splits the
   backward into (a) an XLA-differentiated *scalar replay* of the sweep
   with the merge scalars injected (no message tensors at all), and
   (b) a manual reverse scan over the message DAG that carries only a
   compact (K, R, A, S) pending-cotangent buffer -- roughly half of
   what XLA carries, with none of the table-bookkeeping cotangents.

Gradient semantics match the reference's biased VSMC gradient exactly
(resampling / topology indices are constants; gathered VALUES carry
gradients, reference vcsmc.py:279-344,488-491): the scalar replay
reuses the forward's decisions verbatim, and the message reverse pass
replays the gather/scatter transpose of the forward child lookups.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def sweep_manual_vjp(key, leaves, model, params, config, shardings,
                     site_weights):
    """`sample_phylogenies` with the manual whole-sweep VJP attached.

    Only called for eligible configs (twist=None, decisions=None,
    rescale=True, remat=False); see `SweepConfig.manual_vjp`.

    Cotangents are produced for `params`, `leaves` AND `site_weights`
    (matching XLA AD): leaves/site-weights reach the loss through (a)
    the leaf root log-likelihoods, covered by differentiating the
    scalar replay w.r.t. them, and (b) the message DAG, covered by
    accumulating leaf-child cotangents / per-rank weight cotangents in
    `_messages_bwd`.  Both accumulations are plain jnp feeding only the
    dleaves/dweights outputs, so XLA dead-code-eliminates them whenever
    the caller differentiates params only (the training hot path pays
    nothing for them).
    """
    from phylo_tpu.smc.sweep import _sample_body

    N = leaves.shape[0]

    @jax.custom_vjp
    def f(params, key, leaves, site_weights):
        res, _ = _sample_body(
            key, leaves, model, params, config,
            shardings=shardings, site_weights=site_weights,
            want_aux=True, fused_rank=True,
        )
        return res

    def f_fwd(params, key, leaves, site_weights):
        # fused_rank is safe here: this custom_vjp intercepts AD, so
        # the no-gradient fused kernel is never differentiated
        res, aux = _sample_body(
            key, leaves, model, params, config,
            shardings=shardings, site_weights=site_weights,
            want_aux=True, fused_rank=True,
        )
        return res, (params, key, leaves, site_weights, aux)

    def f_bwd(saved, ct):
        params, key, leaves, site_weights, aux = saved
        tw = config.twist is not None

        injected = dict(
            ancestors=aux["ancestors"],
            do_resample=aux["do_resample"],
        )
        if tw:
            injected.update(twist_choice=aux["twist_choice"])
        else:
            injected.update(eps_l=aux["eps_l"], eps_r=aux["eps_r"],
                            pairs=aux["pairs"])

        def replay(params, leaves, site_weights, rootll_raw, d_lsc,
                   twist_llm):
            # leaves/site_weights are diff args: on the injected path
            # they reach the result only through the leaf root
            # log-likelihoods (messages are injected scalars).  For
            # twist configs the per-rank pair log-likelihoods are a
            # third injected cut -- their cotangents g_llm drive the
            # manual twist reverse pass.
            inj = dict(injected, rootll_raw=rootll_raw, d_lsc=d_lsc)
            if tw:
                inj["twist_llm"] = twist_llm
            res2, _ = _sample_body(
                key, leaves, model, params, config,
                shardings=shardings, site_weights=site_weights,
                injected=inj,
            )
            return (
                res2.elbo, res2.log_weights, res2.log_likelihood,
                res2.log_likelihood_R, res2.left_branches,
                res2.right_branches, res2.q_proposal,
            )

        def prologue(params):
            # the (P_all, pi) linearization points -- the same helper
            # the forward prologue uses (_presample_transitions), split
            # out so the scalar replay is differentiated ONCE and the
            # dP_all/dpi cotangents pull back through a graph of just
            # rates -> branches -> expm.  For twist configs the merged
            # pairs' transitions are reconstructed from the saved
            # chosen draws (eps = b * rate is rate-independent).
            from phylo_tpu.models.branches import branch_rates
            from phylo_tpu.smc.sweep import _presample_transitions

            if tw:
                eps_l, eps_r = aux["twist_eps_l"], aux["twist_eps_r"]
            else:
                eps_l, eps_r = aux["eps_l"], aux["eps_r"]
            dtype = eps_l.dtype
            rates_l, rates_r = branch_rates(params["branches"])
            # mirror _sample_body's `blocks` condition: blocked models
            # linearize at per-block transitions (R, 2K, G, A, A)
            blocked = (
                config.blocked_merge and not tw
                and getattr(model, "blocks", None) is not None
            )
            _, _, P_all = _presample_transitions(
                model, params["model"], rates_l.astype(dtype),
                rates_r.astype(dtype), eps_l, eps_r, dtype,
                blocked=blocked, shardings=shardings,
            )
            pi = model.stationary(params["model"]).astype(dtype)
            return P_all, pi

        ct_f = (
            ct.elbo, ct.log_weights, ct.log_likelihood,
            ct.log_likelihood_R, ct.left_branches, ct.right_branches,
            ct.q_proposal,
        )
        twist_llm = aux["twist_llm"] if tw else None
        _, vjp_replay = jax.vjp(
            replay, params, leaves, site_weights,
            aux["rootll_raw"], aux["d_lsc"], twist_llm,
        )
        (dparams_a, dleaves_a, dsw_a, g_rootll, g_dlsc,
         g_llm) = vjp_replay(ct_f)

        (P_all, pi), vjp_prologue = jax.vjp(prologue, params)
        pending0 = None
        if tw:
            (pending0, dleaves_tw, dw_tw, dpi_tw,
             dparams_tw) = _twist_messages_bwd(
                key, aux, model, params, config, pi, g_llm, N,
                shardings,
            )
        dP_all, dpi, dleaves_sm, dw_sm = _messages_bwd(
            aux, P_all, pi, g_rootll, g_dlsc, N, config, shardings,
            pending=pending0,
        )
        if tw:
            dpi = dpi + dpi_tw
            dleaves_sm = dleaves_sm + dleaves_tw
            dw_sm = dw_sm + dw_tw
        (dparams_b,) = vjp_prologue((dP_all, dpi))
        dparams = jax.tree.map(jnp.add, dparams_a, dparams_b)
        if tw:
            dparams = jax.tree.map(jnp.add, dparams, dparams_tw)

        # message-DAG contributions back to caller layout: leaves_sm is
        # states-major (N, A, Sp) with the site axis padded to the
        # kernel tile (pad columns are constants -> their cotangents
        # are discarded by the slice)
        S = leaves.shape[1]
        if tw and not config.data_grads:
            # SweepConfig.data_grads=False: the caller declared it never
            # differentiates data, and the twist reverse pass skipped
            # the dleaves/dw accumulation -- return exact zeros rather
            # than a silently partial sum
            dleaves = jnp.zeros_like(leaves)
            dsw = (None if site_weights is None
                   else jnp.zeros_like(site_weights))
        else:
            dleaves = dleaves_a + jnp.swapaxes(
                dleaves_sm[:, :, :S], -1, -2
            )
            if site_weights is None:
                dsw = None
            else:
                dsw = dsw_a + dw_sm[:S].astype(site_weights.dtype)

        return (
            dparams,
            np.zeros(key.shape, dtype=jax.dtypes.float0),
            dleaves,
            dsw,
        )

    f.defvjp(f_fwd, f_bwd)
    return f(params, key, leaves, site_weights)


# use the streaming Pallas merge-backward kernel inside the manual
# reverse pass on TPU instead of XLA's VJP of the reference impl.
# Measured SLOWER in situ (1.16 vs ~0.7 ms/rank at primate/K=2048;
# with it off the manual path edges out XLA AD full-batch, 40.0 vs
# 41.1 ms fwd+bwd) -- default off; env-overridable for A/B probes.
import os as _os

MERGE_BWD_KERNEL_IN_MANUAL = (
    _os.environ.get("PHYLO_MANUAL_MERGE_KERNEL", "0") == "1"
)


def _merge_bwd(residuals, cotangents):
    from phylo_tpu.pruning import kernels

    if MERGE_BWD_KERNEL_IN_MANUAL and residuals[2].ndim == 3 and (
        jax.default_backend() == "tpu" or kernels.INTERPRET
    ):
        return kernels._merge_bwd_pallas(*residuals, *cotangents)

    def fwd(m1, m2, P_l, P_r, pi, w):
        if P_l.ndim == 4:              # blocked (K, G, A, A): the
            P_l = kernels.blockdiag_dense(P_l)   # dense-with-zeros form
            P_r = kernels.blockdiag_dense(P_r)   # is bit-exact in f32
        return kernels._ref_impl(m1, m2, P_l, P_r, pi, w)

    _, vjp = jax.vjp(fwd, *residuals)
    return vjp(cotangents)


def _twist_messages_bwd_unrolled(key, aux, model, params, config, pi,
                                 g_llm, N, shardings):
    """Unrolled-rank twin of `_twist_messages_bwd` (see
    twist.TwistConfig.unroll_max_ranks): `g_llm` arrives as a per-rank
    tuple of truncated (C(N-r, 2), M, K) cotangents in PREFIX pair
    order, matching the forward's statically truncated enumeration --
    each rank is one un-masked, un-chunked vjp against the final
    write-once buffer, so the reverse pass does exactly
    sum_r C(N-r, 2) pair evaluations (the scanned version must pad to
    chunk granularity and lax.cond-skip)."""
    from phylo_tpu.models.branches import branch_rates
    from phylo_tpu.pruning.kernels import pair_loglik
    from phylo_tpu.smc.sweep import _take_positions
    from phylo_tpu.smc.twist import (
        _pool_draws, _prefix_order, upper_tri_pairs,
    )

    twist = config.twist
    buf = aux["buf"]                          # (K, N+R, A, Sp) unified
    leaves_sm = aux["leaves_sm"]
    w_vec = aux["site_weights"]               # (Sp,)
    slot_t = aux["slot_t"]                    # (R, K, N)
    rows_t = aux["rows_t"]                    # (R, K, R)
    K = buf.shape[0]
    A, Sp = leaves_sm.shape[1], leaves_sm.shape[2]
    R = N - 1
    M = twist.M
    dtype = buf.dtype
    data_grads = config.data_grads

    pairs_np = upper_tri_pairs(N)
    P = len(pairs_np)
    order_np, _ = _prefix_order(N)
    pairs_pref = pairs_np[order_np]

    # the forward's exact unit-rate pool draws, regenerated and put in
    # the same prefix order the forward consumed them in
    draws_l, draws_r = _pool_draws(key, R, P, M, K, dtype)
    draws_l = draws_l[:, jnp.asarray(order_np)]
    draws_r = draws_r[:, jnp.asarray(order_np)]

    rates_fn = lambda pb: jax.tree.map(           # noqa: E731
        lambda x: x.astype(dtype), branch_rates(pb)
    )
    (rates_l, rates_r), vjp_rates = jax.vjp(rates_fn, params["branches"])

    own = jnp.arange(K, dtype=jnp.int32)[:, None]
    pending = jnp.zeros((K, R, A, Sp), dtype)
    dleaves = jnp.zeros_like(leaves_sm) if data_grads else None
    dw = jnp.zeros((Sp,), dtype) if data_grads else None
    dpi_acc = jnp.zeros_like(pi)
    dmodel = jax.tree.map(jnp.zeros_like, params["model"])
    drl = jnp.zeros_like(rates_l)
    drr = jnp.zeros_like(rates_r)

    for r in range(R):
        n_active = N - r
        Pv = (n_active * (n_active - 1)) // 2
        # over-budget ranks replay in the same static chunks the
        # forward used (TwistConfig.static_chunks) so the per-chunk
        # vjp's gathered (K, 2C, A, Sp) messages and pair_loglik
        # residuals stay within the memory budget; the last chunk is
        # simply smaller (static Python slicing, no padding needed)
        C, _ = config.twist.static_chunks(
            Pv, M, K, Sp, jnp.dtype(dtype).itemsize
        )
        for c0 in range(0, Pv, C):
            Cc = min(C, Pv - c0)
            pc = jnp.asarray(pairs_pref[c0:c0 + Cc])   # (Cc, 2)
            pos = jnp.broadcast_to(
                pc.T.reshape(-1)[None], (K, 2 * Cc)
            )                                          # [i..., j...]
            nodes = _take_positions(slot_t[r], pos)    # (K, 2Cc)
            is_leaf = nodes < N
            q = jnp.clip(nodes - N, 0, R - 1)
            rows = _take_positions(rows_t[r], q)
            brow = jnp.where(is_leaf, own, rows)
            msgs = buf[brow, nodes]                    # (K, 2Cc, A, Sp)
            m_l = msgs[:, :Cc].reshape(K * Cc, A, Sp)
            m_r = msgs[:, Cc:].reshape(K * Cc, A, Sp)

            dl = draws_l[r, c0:c0 + Cc]                # (Cc, M, K)
            dr = draws_r[r, c0:c0 + Cc]
            g_flat = jnp.transpose(
                g_llm[r][c0:c0 + Cc].astype(dtype), (1, 2, 0)
            ).reshape(M, K * Cc)

            def f(pm, rl, rr_, ml, mr, pi_, w_, dl=dl, dr=dr, Cc=Cc):
                bl = dl / rl
                br = dr / rr_
                P_lr = model.transition(
                    pm, jnp.concatenate([bl, br])
                ).astype(dtype)                        # (2Cc, M, K, A, A)
                P_l = jnp.transpose(
                    P_lr[:Cc], (1, 2, 0, 3, 4)).reshape(M, K * Cc, A, A)
                P_r = jnp.transpose(
                    P_lr[Cc:], (1, 2, 0, 3, 4)).reshape(M, K * Cc, A, A)
                return pair_loglik(ml, mr, P_l, P_r, pi_, w_)

            _, vjp = jax.vjp(
                f, params["model"], rates_l[r], rates_r[r], m_l, m_r,
                pi, w_vec,
            )
            dpm, drl_c, drr_c, dml, dmr, dpi_c, dw_c = vjp(g_flat)

            dmodel = jax.tree.map(jnp.add, dmodel, dpm)
            drl = drl.at[r].add(drl_c)
            drr = drr.at[r].add(drr_c)
            dpi_acc = dpi_acc + dpi_c
            if data_grads:
                dw = dw + dw_c
            for dm, sl in ((dml, slice(None, Cc)), (dmr, slice(Cc, None))):
                dm = dm.reshape(K, Cc, A, Sp)
                nd = nodes[:, sl]
                lf = is_leaf[:, sl]
                if data_grads:
                    idl = jnp.where(lf, nd, N)
                    dleaves = dleaves.at[idl].add(dm, mode="drop")
                qd = jnp.where(lf, R, nd - N)
                pending = pending.at[rows[:, sl], qd].add(dm, mode="drop")

    (dbranches,) = vjp_rates((drl, drr))
    dparams_tw = dict(model=dmodel, branches=dbranches)
    if not data_grads:
        dleaves = jnp.zeros_like(leaves_sm)
        dw = jnp.zeros((Sp,), dtype)
    return pending, dleaves, dw, dpi_acc, dparams_tw


def _twist_messages_bwd(key, aux, model, params, config, pi, g_llm, N,
                        shardings):
    """Reverse pass over the TWIST potential DAG (VNCSMC manual VJP).

    The scalar replay injects each rank's (P, M, K) pair-merge data
    log-likelihoods `ll_m` and returns their cotangents `g_llm`
    (R, P, M, K).  This pass pulls those back onto the message buffer,
    the model parameters (through the candidate transition matrices),
    the branch rates (through the pool b = eps / rate), pi and the
    site weights -- by re-running the forward's chunked pair
    enumeration against the FINAL write-once buffer (the lookup tables
    the forward used at each rank are saved in aux: slot_t / rows_t)
    and calling the streaming pair-loglik backward kernel per chunk.

    One lax.scan over the flattened (rank x chunk) grid, with the same
    prefix-order whole-chunk skipping as the forward (g_llm for
    invalid pairs is identically zero, so granularity mismatches are
    impossible).  Compared to XLA AD over the forward this eliminates
    the per-rank buffer residual stacking and the dense per-chunk
    buffer-cotangent accumulation (xprof round 3: ~45% of the
    betacorona step).

    Returns (pending (K, R, A, Sp), dleaves_sm (N, A, Sp), dw (Sp,),
    dpi (A,), dparams_tw pytree like params).
    """
    if isinstance(g_llm, (tuple, list)):
        # unrolled-rank forward (twist.TwistConfig.unroll_max_ranks):
        # per-rank truncated residuals take the unrolled reverse pass
        return _twist_messages_bwd_unrolled(
            key, aux, model, params, config, pi, g_llm, N, shardings
        )
    from phylo_tpu.models.branches import branch_rates
    from phylo_tpu.pruning.kernels import pair_loglik
    from phylo_tpu.smc.sweep import _take_positions
    from phylo_tpu.smc.twist import (
        _pool_draws, _prefix_order, upper_tri_pairs,
    )

    twist = config.twist
    buf = aux["buf"]                          # (K, N+R, A, Sp) unified
    leaves_sm = aux["leaves_sm"]
    w_vec = aux["site_weights"]               # (Sp,)
    slot_t = aux["slot_t"]                    # (R, K, N)
    rows_t = aux["rows_t"]                    # (R, K, R)
    K = buf.shape[0]
    A, Sp = leaves_sm.shape[1], leaves_sm.shape[2]
    R = N - 1
    M = twist.M
    dtype = buf.dtype

    pairs_np = upper_tri_pairs(N)
    P = len(pairs_np)
    order_np, _ = _prefix_order(N)

    # the forward's exact unit-rate pool draws, regenerated
    draws_l, draws_r = _pool_draws(key, R, P, M, K, dtype)

    C = twist.resolve_chunk(P, M, K, Sp, jnp.dtype(dtype).itemsize)
    P_pad = -(-P // C) * C
    pad_p = P_pad - P
    n_chunks = P_pad // C

    def prefix_chunks(x, fill):
        pad = jnp.full((x.shape[0], pad_p) + x.shape[2:], fill, x.dtype)
        xp = jnp.concatenate([x[:, order_np], pad], axis=1)
        return xp.reshape((x.shape[0], n_chunks, C) + x.shape[2:])

    dl_pc = prefix_chunks(draws_l, 1.0)       # (R, nc, C, M, K)
    dr_pc = prefix_chunks(draws_r, 1.0)
    g_pc = prefix_chunks(g_llm.astype(dtype), 0.0)
    pairs_pc = jnp.asarray(np.concatenate(
        [pairs_np[order_np], np.zeros((pad_p, 2), np.int32)]
    ).reshape(n_chunks, C, 2))

    rates_fn = lambda pb: jax.tree.map(           # noqa: E731
        lambda x: x.astype(dtype), branch_rates(pb)
    )
    (rates_l, rates_r), vjp_rates = jax.vjp(rates_fn, params["branches"])

    own = jnp.arange(K, dtype=jnp.int32)[:, None]
    pending = jnp.zeros((K, R, A, Sp), dtype)
    if shardings is not None:
        pending = lax.with_sharding_constraint(pending, shardings.core)
    # data_grads=False: dleaves/dw never leave this function non-zero,
    # so keep them OUT of the scan carry -- a live carry defeats XLA's
    # DCE and forces the per-chunk _dw_ref re-enumeration (log + full
    # site reduce) plus two leaf scatter-adds (SweepConfig.data_grads)
    data_grads = config.data_grads
    carry0 = dict(
        pending=pending,
        dpi=jnp.zeros_like(pi),
        dmodel=jax.tree.map(jnp.zeros_like, params["model"]),
        drl=jnp.zeros_like(rates_l),
        drr=jnp.zeros_like(rates_r),
    )
    if data_grads:
        carry0.update(
            dleaves=jnp.zeros_like(leaves_sm),
            dw=jnp.zeros((Sp,), dtype),
        )

    t_r = jnp.repeat(jnp.arange(R, dtype=jnp.int32), n_chunks)
    t_c = jnp.tile(jnp.arange(n_chunks, dtype=jnp.int32), R)

    def body(carry, t):
        r, c = t
        n_active = N - r
        n_valid = (n_active * (n_active - 1)) // 2

        def do(carry):
            pc = pairs_pc[c]                          # (C, 2)
            pos = jnp.broadcast_to(
                pc.T.reshape(-1)[None], (K, 2 * C)
            )                                          # [i..., j...]
            slot_r = slot_t[r]
            nodes = _take_positions(slot_r, pos)       # (K, 2C)
            is_leaf = nodes < N
            q = jnp.clip(nodes - N, 0, R - 1)
            rows = _take_positions(rows_t[r], q)
            brow = jnp.where(is_leaf, own, rows)
            msgs = buf[brow, nodes]                    # (K, 2C, A, Sp)
            m_l = msgs[:, :C].reshape(K * C, A, Sp)
            m_r = msgs[:, C:].reshape(K * C, A, Sp)

            dl = dl_pc[r, c]                           # (C, M, K)
            dr = dr_pc[r, c]
            g_flat = jnp.transpose(
                g_pc[r, c], (1, 2, 0)
            ).reshape(M, K * C)

            def f(pm, rl, rr, ml, mr, pi_, w_):
                bl = dl / rl
                br = dr / rr
                P_lr = model.transition(
                    pm, jnp.concatenate([bl, br])
                ).astype(dtype)                        # (2C, M, K, A, A)
                P_l = jnp.transpose(
                    P_lr[:C], (1, 2, 0, 3, 4)
                ).reshape(M, K * C, A, A)
                P_r = jnp.transpose(
                    P_lr[C:], (1, 2, 0, 3, 4)
                ).reshape(M, K * C, A, A)
                return pair_loglik(ml, mr, P_l, P_r, pi_, w_)

            _, vjp = jax.vjp(
                f, params["model"], rates_l[r], rates_r[r],
                m_l, m_r, pi, w_vec,
            )
            dpm, drl_c, drr_c, dml, dmr, dpi_c, dw_c = vjp(g_flat)

            out = dict(carry)
            out["dmodel"] = jax.tree.map(jnp.add, carry["dmodel"], dpm)
            out["drl"] = carry["drl"].at[r].add(drl_c)
            out["drr"] = carry["drr"].at[r].add(drr_c)
            out["dpi"] = carry["dpi"] + dpi_c
            if data_grads:
                out["dw"] = carry["dw"] + dw_c
            # scatter the message cotangents: internal children into
            # the pending buffer, leaf children into dleaves (same
            # high-OOB drop sentinels as _messages_bwd)
            pending = carry["pending"]
            dleaves = carry["dleaves"] if data_grads else None
            for dm, sl in ((dml, slice(None, C)), (dmr, slice(C, None))):
                dm = dm.reshape(K, C, A, Sp)
                nd = nodes[:, sl]
                lf = is_leaf[:, sl]
                if data_grads:
                    idl = jnp.where(lf, nd, N)
                    dleaves = dleaves.at[idl].add(dm, mode="drop")
                qd = jnp.where(lf, R, nd - N)
                pending = pending.at[rows[:, sl], qd].add(
                    dm, mode="drop"
                )
            out["pending"] = pending
            if data_grads:
                out["dleaves"] = dleaves
            return out

        carry = lax.cond(c * C < n_valid, do, lambda x: x, carry)
        return carry, None

    carry, _ = lax.scan(body, carry0, (t_r, t_c))
    (dbranches,) = vjp_rates((carry["drl"], carry["drr"]))
    dparams_tw = dict(model=carry["dmodel"], branches=dbranches)
    dleaves = (carry["dleaves"] if data_grads
               else jnp.zeros_like(leaves_sm))
    dw = carry["dw"] if data_grads else jnp.zeros((Sp,), dtype)
    return carry["pending"], dleaves, dw, carry["dpi"], dparams_tw


def _messages_bwd(aux, P_all, pi, g_rootll, g_dlsc, N, config,
                  shardings, pending=None):
    """Reverse pass over the message DAG, fully unrolled over ranks.

    Maintains `pending` (K, R, A, S): the accumulated cotangents of
    each internal node's (scaled) message in the ABSOLUTE buffer frame.
    Column r was written at rank r at the particle's own row, and is
    only ever read at ranks > r -- so by the time reverse step r
    consumes `pending[:, r]`, every contribution has been scattered in.
    Per rank (reverse order):

      1. re-gather the two child messages from the FINAL buffer via the
         saved (row, node-id) records (exact: write-once columns);
      2. run the merge-op backward with cotangents (pending column,
         g_rootll[r], g_dlsc[r]) to get child-message and
         transition-matrix cotangents;
      3. scatter-add the internal-child cotangents into `pending`;
         leaf-child cotangents accumulate into a (N, A, Sp) dleaves
         buffer (summed over particles -- every particle's leaf column
         is a broadcast copy of the same leaf message).

    The loop is a PYTHON loop (straight-line XLA): R = N-1 is small and
    static, the pending-column reads become static slices, and XLA
    aliases the scatter updates in place -- a `lax.scan` formulation
    measured 7.6 ms/run of reverse-while carry overhead at
    primate/K=2048 (tools/vjp_trace.py).

    Returns (dP_all (R, 2K, A, A), dpi (A,), dleaves_sm (N, A, Sp),
    dweights (Sp,)).  The dleaves/dweights chains feed only their own
    outputs, so XLA dead-code-eliminates them when the caller
    differentiates params alone.
    """
    buf = aux["buf"]                          # (K, C, A, Sp)
    leaves_sm = aux["leaves_sm"]              # (N, A, Sp)
    w_vec = aux["site_weights"]               # (Sp,)
    rows_all = aux["rows"]                    # (R, K, 2)
    ids_all = aux["merged"]                   # (R, K, 2)
    K = buf.shape[0]
    R, A, Sp = rows_all.shape[0], leaves_sm.shape[1], leaves_sm.shape[2]
    # plane padding (sweep.py `plane_pad`): the forward padded the
    # state planes to a DMA-aligned count; the prologue's (P_all, pi)
    # linearization is REAL-sized.  Pad them to match here, slice the
    # cotangents back before returning.
    if P_all.ndim == 5:                       # blocked (R, 2K, G, Ab, Ab)
        real_planes = P_all.shape[2] * P_all.shape[3]
        if real_planes != A:
            gpad = (A - real_planes) // P_all.shape[3]
            P_all = jnp.pad(P_all, ((0, 0), (0, 0), (0, gpad),
                                    (0, 0), (0, 0)))
    else:
        real_planes = P_all.shape[-1]
        if real_planes != A:
            ppad = A - real_planes
            P_all = jnp.pad(P_all, ((0, 0), (0, 0), (0, ppad),
                                    (0, ppad)))
    if real_planes != A:
        pi = jnp.pad(pi, (0, A - pi.shape[0]))
    P_l_all, P_r_all = P_all[:, :K], P_all[:, K:]

    if pending is None:
        pending = jnp.zeros((K, R, A, Sp), buf.dtype)
        if shardings is not None:
            pending = lax.with_sharding_constraint(
                pending, shardings.core
            )
    own = jnp.arange(K, dtype=rows_all.dtype)[:, None]

    # fused reverse rank kernel: the internal-only buffer layout is the
    # marker that the forward ran the fused rank kernel (TPU,
    # K % TKF == 0), so its backward twin applies too
    from phylo_tpu.pruning.kernels import (
        INTERPRET, TKF, _rank_tile, fused_rank_bwd,
        fused_rank_bwd_saved, kshard_mesh, shard_fused_rank_bwd,
        shard_gather_pair, shard_scatter_pair_add, site_sharded_mesh,
        wide_rank_kernel,
    )

    use_fused = (
        buf.shape[1] == R and K % TKF == 0
        and (jax.default_backend() == "tpu" or INTERPRET)
    )
    s_mesh = site_sharded_mesh(shardings)
    k_mesh = kshard_mesh(shardings)
    ns_tile = s_mesh.shape["s"] if s_mesh is not None else 1
    wide_k = wide_rank_kernel(
        P_all.shape[2] if P_all.ndim == 5 else 1, P_all.shape[-1]
    )
    if (use_fused and aux.get("child_l") is None
            and _rank_tile(Sp // ns_tile, A, wide=wide_k) < 16):
        # no saved residuals AND the small-tile regime where the DMA
        # re-gather backward collapses (see sweep.py save_children,
        # which computes the same per-shard tile): the jnp re-gather
        # chain is the faster backward here
        use_fused = False
    if use_fused and s_mesh is not None:
        # 's'-only mesh: per-shard backward kernels + psum'd
        # site-summed cotangents (kernels.shard_fused_rank_bwd)
        fused_rank_bwd = shard_fused_rank_bwd(s_mesh, saved=False)
        fused_rank_bwd_saved = shard_fused_rank_bwd(s_mesh, saved=True)
    # children saved by the forward kernel -> DMA-free reverse kernel
    # (the per-particle re-gather is 56% of fused_rank_bwd's time at
    # batch-256 shapes; see kernels.fused_rank_bwd_saved)
    child_l = aux.get("child_l") if use_fused else None
    child_r = aux.get("child_r") if use_fused else None

    dPl_out = [None] * R
    dPr_out = [None] * R
    dpi = jnp.zeros_like(pi)
    dleaves = jnp.zeros_like(leaves_sm)
    dw = jnp.zeros((Sp,), buf.dtype)
    for r in range(R - 1, -1, -1):
        rows, ids = rows_all[r], ids_all[r]
        cot_merged = pending[:, r]

        if use_fused:
            is_leaf = ids < N
            if child_l is not None:
                dm1, dm2, dPl, dPr, dpi_p, dw_p = fused_rank_bwd_saved(
                    child_l[r], child_r[r], cot_merged, g_rootll[r],
                    g_dlsc[r], P_l_all[r], P_r_all[r], pi, w_vec,
                )
            else:
                idx4 = jnp.stack([
                    rows[:, 0], ids[:, 0], rows[:, 1], ids[:, 1],
                ]).astype(jnp.int32)
                dm1, dm2, dPl, dPr, dpi_p, dw_p = fused_rank_bwd(
                    leaves_sm, buf, idx4, cot_merged, g_rootll[r],
                    g_dlsc[r], P_l_all[r], P_r_all[r], pi, w_vec,
                )
            dpi_r = jnp.sum(dpi_p, axis=0)
            dw_r = jnp.sum(dw_p, axis=0)
        else:
            # child re-gather -- mirrors _node_lookup on the final
            # buffer, but as TWO (K, A, S) gathers: the pair-fused form
            # pays a (K, 2, A, S) materialization + squeeze copies here
            # (bandwidth beats latency at reverse-pass sizes)
            is_leaf = ids < N
            if k_mesh is not None and buf.shape[1] == N + R:
                # particle-sharded mesh: structured psum_scatter
                # exchange, same as the forward (shard_gather_pair)
                brow = jnp.where(is_leaf, own, rows)
                m = shard_gather_pair(k_mesh)(
                    buf, brow.astype(jnp.int32), ids.astype(jnp.int32)
                )
                m1, m2 = m[:, 0], m[:, 1]
            elif buf.shape[1] == N + R:
                brow = jnp.where(is_leaf, own, rows)
                m1 = buf[brow[:, 0], ids[:, 0]]
                m2 = buf[brow[:, 1], ids[:, 1]]
            else:
                q = jnp.clip(ids - N, 0, R - 1)
                leaf_part = leaves_sm[jnp.clip(ids, 0, N - 1)]
                int_part = buf[rows, q]
                m = jnp.where(is_leaf[..., None, None], leaf_part,
                              int_part)
                m1, m2 = m[:, 0], m[:, 1]

            dm1, dm2, dPl, dPr, dpi_r, dw_r = _merge_bwd(
                (m1, m2, P_l_all[r], P_r_all[r], pi, w_vec),
                (cot_merged, g_rootll[r], g_dlsc[r]),
            )
        dPl_out[r], dPr_out[r] = dPl, dPr
        dpi = dpi + dpi_r
        dw = dw + dw_r

        # leaf children accumulate into dleaves.  Internal children are
        # dropped via a HIGH out-of-bounds sentinel: mode="drop"
        # normalizes NEGATIVE indices first (-1 wraps to the last slot
        # and silently corrupts it), only indices >= size are dropped.
        idl = jnp.where(is_leaf, ids, N)
        dleaves = dleaves.at[idl[:, 0]].add(dm1, mode="drop")
        dleaves = dleaves.at[idl[:, 1]].add(dm2, mode="drop")

        if r:
            # internal children accumulate; leaf children drop (same
            # high-OOB sentinel: a -1 here wrapped into column R-1,
            # latent-harmless only because reverse step R-1 had already
            # consumed that column)
            qd = jnp.where(is_leaf, R, ids - N)
            if k_mesh is not None:
                # cross-shard cotangent routing: all_gather over 'k' +
                # local masked scatter-add (shard_scatter_pair_add)
                pending = shard_scatter_pair_add(k_mesh)(
                    pending, rows.astype(jnp.int32),
                    qd.astype(jnp.int32),
                    jnp.stack([dm1, dm2], axis=1),
                )
            else:
                pending = pending.at[rows[:, 0], qd[:, 0]].add(
                    dm1, mode="drop"
                )
                pending = pending.at[rows[:, 1], qd[:, 1]].add(
                    dm2, mode="drop"
                )

    dP_all = jnp.concatenate(
        [jnp.stack(dPl_out), jnp.stack(dPr_out)], axis=1
    )                                          # (R, 2K, A, A)
    if real_planes != A:
        # slice the plane-padding cotangents back to the prologue's
        # real shapes (pad-plane cotangents are identically zero: pad
        # transitions/stationary are zero and pad messages never reach
        # the loss)
        if dP_all.ndim == 5:                   # blocked
            dP_all = dP_all[:, :, :real_planes // dP_all.shape[3]]
        else:
            dP_all = dP_all[..., :real_planes, :real_planes]
        dpi = dpi[:real_planes]
        dleaves = dleaves[:, :real_planes]
    return dP_all, dpi, dleaves, dw
