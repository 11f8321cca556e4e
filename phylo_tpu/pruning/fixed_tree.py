"""Fixed-tree likelihood: parse a Newick topology and score it.

The reference can only *sample* trees (its likelihood engine is welded
into the SMC sweep); scoring a user-supplied topology — the other half
of everyday phylogenetics, e.g. evaluating a published tree under the
learned model or optimizing branch lengths on a fixed topology — has no
reference equivalent.  This module provides it on top of the same
pruning primitives the sweep uses (felsenstein.merge_messages /
root_log_likelihood, the rescaled float32-safe forms of reference
vcsmc.py:180-188,231-245):

    taxa, record = parse_newick("((A:0.1,B:0.2):0.05,(C:0.1,D:0.3));")
    ll = tree_log_likelihood(leaves, model, params, record)

`record` uses the same merge-record convention the sweep emits and
`viz.trees.to_newick` consumes (leaves 0..N-1 in taxa order, internal
node q at id N+q, one (R, 2) row per coalescence in postorder), so
decoded SMC genealogies and parsed Newick trees are interchangeable.

`tree_log_likelihood` is differentiable w.r.t. the model parameters AND
the branch lengths; `optimize_branch_lengths` runs a simple fixed-
topology ML branch-length fit with optax.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from phylo_tpu.pruning.felsenstein import (
    merge_messages,
    root_log_likelihood,
)


def _strip_ws(text):
    """Drop whitespace outside quoted labels (the Newick format allows
    line breaks / indentation between tokens — FigTree and hand-edited
    exports use them)."""
    out = []
    in_quote = False
    for ch in text:
        if ch == "'":
            in_quote = not in_quote
        if in_quote or not ch.isspace():
            out.append(ch)
    return "".join(out)


def parse_newick(text, taxa=None, *, clamp_negative=False):
    """Parse a rooted binary Newick string.

    Returns (taxa, record): the leaf names in id order and a merge
    record dict with 'merges' (R, 2) int32 — children of internal node
    N+q in postorder — and 'branches' (R, 2) float64 (the children's
    edge lengths), or 'branches' absent when the string carries no
    lengths at all.

    taxa: optional list fixing the leaf-name -> id mapping (required
    when the record must line up with an existing genome array whose
    rows follow dataset order).  Without it, leaves are numbered in
    first-appearance order.

    clamp_negative: neighbor-joining trees routinely carry tiny
    negative branch lengths, which would make the pruning likelihood
    NaN; True clamps them to 0, False (default) rejects them with an
    error naming the option.

    Multifurcations and unrooted trifurcating roots are rejected with a
    clear error (the CSMC state space is rooted binary trees); internal
    node labels are accepted and ignored; quoted labels ('...') are
    supported; whitespace between tokens is fine; the root's own branch
    length, if present, is ignored (a root edge has no effect on the
    likelihood).
    """
    s = _strip_ws(text)
    if s.endswith(";"):
        s = s[:-1]
    pos = [0]

    def error(msg):
        raise ValueError(
            f"Newick parse error at char {pos[0]}: {msg}\n  {text!r}"
        )

    def peek():
        return s[pos[0]] if pos[0] < len(s) else ""

    def parse_label():
        if peek() == "'":
            end = s.find("'", pos[0] + 1)
            if end < 0:
                error("unterminated quoted label")
            lab = s[pos[0] + 1:end]
            pos[0] = end + 1
            return lab
        start = pos[0]
        while pos[0] < len(s) and s[pos[0]] not in "(),:;":
            pos[0] += 1
        return s[start:pos[0]].strip()

    def parse_length():
        if peek() != ":":
            return None
        pos[0] += 1
        start = pos[0]
        while pos[0] < len(s) and s[pos[0]] not in "(),;":
            pos[0] += 1
        try:
            b = float(s[start:pos[0]])
        except ValueError:
            error(f"bad branch length {s[start:pos[0]]!r}")
        if b < 0:
            if not clamp_negative:
                error(
                    f"negative branch length {b}; the pruning "
                    "likelihood is undefined for negative lengths "
                    "(NJ trees often carry tiny ones -- pass "
                    "clamp_negative=True to clamp them to 0)"
                )
            b = 0.0
        return b

    leaf_names = []
    merges = []
    branch_rows = []

    # returns (node_payload, edge_length); internal payloads are
    # ('int', (left, right)) resolved to ids in a second pass so leaf
    # ids can follow either taxa order or first-appearance order
    def parse_node():
        if peek() == "(":
            pos[0] += 1
            children = [parse_node()]
            while peek() == ",":
                pos[0] += 1
                children.append(parse_node())
            if peek() != ")":
                error("expected ')'")
            pos[0] += 1
            parse_label()              # optional internal label, ignored
            length = parse_length()
            if len(children) != 2:
                error(
                    f"node has {len(children)} children; rooted BINARY "
                    "trees only (resolve multifurcations / root an "
                    "unrooted tree first)"
                )
            return ("int", children), length
        name = parse_label()
        if not name:
            error("empty leaf label")
        leaf_names.append(name)
        return ("leaf", name), parse_length()

    # caterpillar (ladder) trees nest ~N deep; give the recursive
    # descent and the resolve pass headroom beyond the default 1000
    import sys

    depth_bound = 8 * s.count("(") + 1000
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, depth_bound))
    try:
        root, _ = parse_node()
    finally:
        sys.setrecursionlimit(old_limit)
    if pos[0] != len(s):
        error(f"trailing characters {s[pos[0]:]!r}")

    if taxa is None:
        taxa = list(leaf_names)
    if len(set(leaf_names)) != len(leaf_names):
        dupes = sorted({n for n in leaf_names if leaf_names.count(n) > 1})
        raise ValueError(f"duplicate leaf labels: {dupes}")
    idx = {name: i for i, name in enumerate(taxa)}
    missing = [n for n in leaf_names if n not in idx]
    if missing:
        raise ValueError(
            f"leaves not in taxa list: {missing}; taxa={list(taxa)}"
        )
    if len(leaf_names) != len(taxa):
        absent = sorted(set(taxa) - set(leaf_names))
        raise ValueError(f"tree is missing taxa: {absent}")
    N = len(taxa)

    def resolve(node):
        """Postorder id assignment; returns (node_id, edge_length)."""
        (kind, payload), length = node
        if kind == "leaf":
            return idx[payload], length
        (lid, llen), (rid, rlen) = resolve(payload[0]), resolve(payload[1])
        merges.append((lid, rid))
        branch_rows.append((llen, rlen))
        return N + len(merges) - 1, length

    sys.setrecursionlimit(max(old_limit, depth_bound))
    try:
        resolve((root, None))
    finally:
        sys.setrecursionlimit(old_limit)

    record = {"merges": np.asarray(merges, dtype=np.int32)}
    flat = [b for row in branch_rows for b in row]
    if all(b is not None for b in flat):
        record["branches"] = np.asarray(branch_rows, dtype=np.float64)
    elif any(b is not None for b in flat):
        raise ValueError(
            "Newick string has branch lengths on some edges but not "
            "others; provide all or none"
        )
    return list(taxa), record


def tree_log_likelihood(leaves, model, params, record, *, branches=None,
                        site_weights=None, rescale=True):
    """log P(Y | tree, theta) by Felsenstein pruning over a fixed tree.

    leaves: (N, S, A) one-hot / ambiguity-coded genomes (dataset.genome).
    model/params: substitution model as used by the sweep.
    record: merge record from `parse_newick` or a decoded SMC particle
        (viz.trees.decode_genealogy): 'merges' (R, 2) static node ids.
    branches: optional (R, 2) branch lengths overriding
        record['branches'] — pass a traced array here to differentiate
        or optimize branch lengths on the fixed topology.

    Differentiable w.r.t. params and branches.  The merge structure is
    static Python control flow: wrap in jit with `record` closed over
    (e.g. ``jax.jit(lambda p, b: tree_log_likelihood(lv, m, p, rec,
    branches=b))``).

    Matches the sweep's decoded-tree semantics: the independent-pruning
    oracle in tests/test_likelihood_semantics.py pins
    `SweepResult.log_likelihood_R` to exactly this recursion.
    """
    merges = np.asarray(record["merges"])
    R = merges.shape[0]
    N = leaves.shape[0]
    if R != N - 1:
        raise ValueError(
            f"record has {R} merges for {N} leaves; need N-1"
        )
    if branches is None:
        if "branches" not in record:
            raise ValueError(
                "record carries no branch lengths; pass branches=(R, 2)"
            )
        branches = record["branches"]
    branches = jnp.asarray(branches)
    dtype = leaves.dtype

    # one batched transition solve for all 2(N-1) edges
    P = model.transition(params["model"], branches.astype(dtype))
    pi = model.stationary(params["model"]).astype(dtype)

    msgs = list(leaves) + [None] * R
    total_scale = jnp.zeros((), dtype=dtype)
    for q in range(R):
        c1, c2 = int(merges[q, 0]), int(merges[q, 1])
        msg, lsc = merge_messages(
            msgs[c1], msgs[c2], P[q, 0], P[q, 1],
            rescale=rescale, site_weights=site_weights,
        )
        msgs[N + q] = msg
        total_scale = total_scale + lsc
    return root_log_likelihood(
        msgs[N + R - 1], pi, total_scale, site_weights=site_weights
    )


def optimize_tree(leaves, model, params, record, *, steps=300,
                  learning_rate=0.05, site_weights=None, init=None):
    """Joint ML fit of substitution-model parameters AND branch lengths
    on a fixed topology (what model-selection / final-tree polishing
    needs; `optimize_branch_lengths` fits lengths only).

    Adam ascent on `tree_log_likelihood` over {model params,
    log-branch-lengths}.  Returns (params, branches (R, 2),
    log_likelihood) at the final step; `params` has the same structure
    as the input (only params['model'] is updated — models with no free
    parameters, e.g. JC69, get a branch-only fit).
    """
    import optax

    R = np.asarray(record["merges"]).shape[0]
    if init is None:
        init = record.get("branches")
    if init is None:
        init = np.full((R, 2), 0.1)
    init = np.maximum(np.asarray(init, dtype=np.float64), 1e-6)
    theta0 = {
        "model": params["model"],
        "log_b": jnp.log(jnp.asarray(init, dtype=leaves.dtype)),
    }

    def loss(theta):
        return -tree_log_likelihood(
            leaves, model, {"model": theta["model"]}, record,
            branches=jnp.exp(theta["log_b"]).astype(leaves.dtype),
            site_weights=site_weights,
        )

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(theta, state):
        ll, g = jax.value_and_grad(loss)(theta)
        updates, state = opt.update(g, state)
        return optax.apply_updates(theta, updates), state, ll

    theta, state = theta0, opt.init(theta0)
    for _ in range(steps):
        theta, state, _ = step(theta, state)
    b = jnp.exp(theta["log_b"])
    fit_params = dict(params, model=theta["model"])
    ll = tree_log_likelihood(
        leaves, model, fit_params, record,
        branches=b.astype(leaves.dtype), site_weights=site_weights,
    )
    return fit_params, b, ll


def optimize_branch_lengths(leaves, model, params, record, *, steps=200,
                            learning_rate=0.05, site_weights=None,
                            init=None):
    """Maximum-likelihood branch lengths on a fixed topology.

    Adam ascent on `tree_log_likelihood` over log-parameterized branch
    lengths (positivity by construction).  Returns (branches (R, 2),
    log_likelihood) at the final step.
    """
    import optax

    R = np.asarray(record["merges"]).shape[0]
    if init is None:
        init = record.get("branches")
    if init is None:
        init = np.full((R, 2), 0.1)
    # floor zero-length edges: log(0) = -inf would freeze them forever
    init = np.maximum(np.asarray(init, dtype=np.float64), 1e-6)
    log_b0 = jnp.log(jnp.asarray(init, dtype=leaves.dtype))

    def loss(log_b):
        return -tree_log_likelihood(
            leaves, model, params, record,
            branches=jnp.exp(log_b).astype(leaves.dtype),
            site_weights=site_weights,
        )

    opt = optax.adam(learning_rate)
    state = opt.init(log_b0)

    @jax.jit
    def step(log_b, state):
        ll, g = jax.value_and_grad(loss)(log_b)
        updates, state = opt.update(g, state)
        return optax.apply_updates(log_b, updates), state, ll

    log_b = log_b0
    for _ in range(steps):
        log_b, state, _ = step(log_b, state)
    b = jnp.exp(log_b)
    ll = tree_log_likelihood(
        leaves, model, params, record,
        branches=b.astype(leaves.dtype), site_weights=site_weights,
    )
    return b, ll
