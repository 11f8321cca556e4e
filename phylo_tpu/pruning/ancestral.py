"""Marginal ancestral state reconstruction on a fixed tree.

Standard two-pass belief propagation (the up pass is Felsenstein
pruning, reference vcsmc.py:180-188's recursion; the down pass has no
reference equivalent -- the reference can only sample topologies, not
interrogate states at their internal nodes):

    post[v, s, a] = P(state at node v, site s is a | Y, tree, theta)

Orientation follows the merge convention (models/substitution.py module
docstring): transition matrices are M[a, b] = P(child a | parent b), so

    up pass:    up_parent(b)  = prod_children sum_a up_child(a) M[a, b]
    down pass:  down_child(a) = sum_b M[a, b] down_parent(b) *
                                      (sibling's up pushed through its M)(b)
    marginal:   post_v propto up_v * down_v   (root prior pi enters as
                                               down_root = pi)

Per-site rescaling keeps float32 safe at deep trees; marginals are
normalized per site, so scale factors cancel.

Works with ambiguity-coded / gapped leaves: a leaf's own marginal is
then the model's posterior over the compatible states -- a principled
imputation of missing data.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from phylo_tpu.pruning.felsenstein import merge_messages, root_log_likelihood


def ancestral_marginals(leaves, model, params, record, *, branches=None,
                        site_weights=None):
    """Posterior state marginals at EVERY node of a fixed tree.

    leaves: (N, S, A) one-hot / ambiguity-coded genomes.
    model/params/record/branches: as `fixed_tree.tree_log_likelihood`
        (record from parse_newick or a decoded SMC particle).

    Returns (post, ll):
      post (N + R, S, A) -- post[v, s, :] sums to 1; rows 0..N-1 are the
          leaves (one-hot columns stay one-hot; ambiguous/gap rows
          become posteriors over the compatible states), rows N..N+R-1
          the internal nodes in the record's postorder (root last);
      ll   scalar data log-likelihood (identical to
          tree_log_likelihood -- the up pass IS that computation).
    """
    merges = np.asarray(record["merges"])
    R = merges.shape[0]
    N = leaves.shape[0]
    if R != N - 1:
        raise ValueError(f"record has {R} merges for {N} leaves; need N-1")
    if branches is None:
        if "branches" not in record:
            raise ValueError(
                "record carries no branch lengths; pass branches=(R, 2)"
            )
        branches = record["branches"]
    branches = jnp.asarray(branches)
    dtype = leaves.dtype

    M = model.transition(params["model"], branches.astype(dtype))
    pi = model.stationary(params["model"]).astype(dtype)

    # ---- up pass (Felsenstein pruning), saving each child's pushed
    # message lp_c(b) = sum_a up_c(a) M_c[a, b] for the down pass
    up = list(leaves) + [None] * R
    pushed = [None] * R                      # (lp1, lp2) per merge
    total_scale = jnp.zeros((), dtype=dtype)
    tiny = jnp.finfo(dtype).tiny
    for q in range(R):
        c1, c2 = int(merges[q, 0]), int(merges[q, 1])
        lp1 = jnp.einsum("sa,ab->sb", up[c1], M[q, 0],
                         precision="highest")
        lp2 = jnp.einsum("sa,ab->sb", up[c2], M[q, 1],
                         precision="highest")
        pushed[q] = (lp1, lp2)
        msg = lp1 * lp2
        scale = jnp.maximum(jnp.max(msg, axis=-1, keepdims=True), tiny)
        up[N + q] = msg / scale
        log_scale = jnp.log(scale[..., 0])
        if site_weights is not None:
            log_scale = log_scale * site_weights
        total_scale = total_scale + jnp.sum(log_scale, axis=-1)
        # the saved pushed messages must pair with the RESCALED parent:
        # down-pass products only ever need lp up to a per-site factor,
        # and marginals renormalize, so no correction is required
    ll = root_log_likelihood(up[N + R - 1], pi, total_scale,
                             site_weights=site_weights)

    # ---- down pass, root to leaves (reverse postorder: parents resolve
    # before their children because merges[q] only names nodes < N + q)
    S = leaves.shape[1]
    down = [None] * (N + R)
    down[N + R - 1] = jnp.broadcast_to(pi, (S, pi.shape[0]))
    for q in range(R - 1, -1, -1):
        v = N + q
        lp1, lp2 = pushed[q]
        for child, M_c, lp_sib in (
            (int(merges[q, 0]), M[q, 0], lp2),
            (int(merges[q, 1]), M[q, 1], lp1),
        ):
            f = down[v] * lp_sib
            d = jnp.einsum("sb,ab->sa", f, M_c, precision="highest")
            scale = jnp.maximum(jnp.max(d, axis=-1, keepdims=True), tiny)
            down[child] = d / scale

    post = jnp.stack([up[v] * down[v] for v in range(N + R)])
    post = post / jnp.sum(post, axis=-1, keepdims=True)
    return post, ll


def collapse_categories(post, G):
    """Split product-space marginals (GammaSites: A = G * A_base) into
    (base_post, cat_post): (..., S, G*A) -> ((..., S, A), (..., S, G)).

    base_post marginalizes the hidden rate category out of the state;
    cat_post is the per-site posterior over rate categories -- at the
    ROOT row this is the classic "which sites are fast" readout (the
    category is shared along the whole tree, so any node's cat_post
    agrees up to numerics; the root's is exact).
    """
    post = jnp.asarray(post)
    GA = post.shape[-1]
    if GA % G:
        raise ValueError(f"state count {GA} not divisible by G={G}")
    blocks = post.reshape(*post.shape[:-1], G, GA // G)
    return jnp.sum(blocks, axis=-2), jnp.sum(blocks, axis=-1)


def decode_states(post, alphabet="ACGT"):
    """Argmax-decode marginals to sequences: (V, S, A) -> V strings.

    A convenience for reports; the full distribution in `post` is the
    real result (argmax sequences are not themselves a jointly likely
    reconstruction).
    """
    post = np.asarray(post)
    if post.shape[-1] != len(alphabet):
        raise ValueError(
            f"posterior has {post.shape[-1]} states but alphabet "
            f"{alphabet!r} has {len(alphabet)}"
        )
    idx = post.argmax(axis=-1)
    return ["".join(alphabet[a] for a in row) for row in idx]
