"""Gradients must flow through the resampled log-likelihood tables.

The reference's TF autodiff flows gradients through the resampling
gathers of `core` and `log_likelihood_tilde` (only the categorical
*indices* are constants, reference vcsmc.py:279-289,340-344).  The f32
sweep packs the per-particle tables through `bitcast_convert_type` for
a single-gather ancestor permutation -- and a plain bitcast silently
ZEROES gradients.  These tests pin the custom-VJP fix
(`smc/sweep._resample_tables`): f32 gradients must match the f64
plain-gather branch on identical injected trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, _resample_tables, sample_phylogenies


def _decisions(key, n_ranks, K, N):
    ks = jax.random.split(key, 4)
    anc = jax.random.randint(ks[0], (n_ranks, K), 0, K)
    pairs = []
    for r in range(n_ranks):
        p1 = jax.random.randint(ks[1], (K,), 0, N - r - 1)
        p2 = jax.random.randint(ks[2], (K,), 0, N - r)
        p2 = jnp.where(p2 == p1, N - r - 1, p2)
        pairs.append(jnp.stack([p1, p2], axis=1))
    return dict(
        ancestors=anc.astype(jnp.int32),
        pairs=jnp.stack(pairs).astype(jnp.int32),
        branches_l=jax.random.exponential(ks[3], (n_ranks, K)) * 0.1,
        branches_r=jax.random.exponential(ks[3], (n_ranks, K)) * 0.07,
    )


def test_resample_tables_vjp_matches_plain_gather():
    key = jax.random.PRNGKey(0)
    K, N, R = 6, 5, 4
    slot = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (K, 1))
    counts = jnp.ones((K, N), jnp.int32)
    row = jnp.zeros((K, R), jnp.int32)
    root_ll = jax.random.normal(key, (K, N), jnp.float32)
    prev = jax.random.normal(key, (K,), jnp.float32)
    idx = jax.random.randint(key, (K,), 0, K)

    def loss_packed(root_ll, prev):
        _, _, r, _, p = _resample_tables(slot, counts, root_ll, row, prev, idx)
        return jnp.sum(r * jnp.arange(N)) + jnp.sum(p * 3.0)

    def loss_plain(root_ll, prev):
        return (jnp.sum(root_ll[idx] * jnp.arange(N))
                + jnp.sum(prev[idx] * 3.0))

    g1 = jax.grad(loss_packed, argnums=(0, 1))(root_ll, prev)
    g2 = jax.grad(loss_plain, argnums=(0, 1))(root_ll, prev)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    # and the packed-gather VALUES keep matching the plain gathers
    o1 = _resample_tables(slot, counts, root_ll, row, prev, idx)
    o2 = (slot[idx], counts[idx], root_ll[idx], row[idx], prev[idx])
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("carried", [False, True])
def test_f32_sweep_grads_match_f64_branch(carried):
    """Same injected trajectory, f32 (packed path) vs f64 (plain path):
    parameter gradients must agree to f32 tolerance.  Before the
    custom-VJP fix the f32 path zeroed every gradient contribution that
    flowed through the resampled root_ll / prev_log_ll tables."""
    key = jax.random.PRNGKey(1)
    N, S, K = 6, 37, 8
    genome = (
        jax.random.uniform(key, (N, S, 4)) ==
        jax.random.uniform(key, (N, S, 1))
    )
    genome = jax.nn.one_hot(jax.random.randint(key, (N, S), 0, 4), 4)
    model = ReferenceQ(A=4)
    dec = _decisions(jax.random.PRNGKey(2), N - 1, K, N)

    grads = {}
    for dtype in (jnp.float32, jnp.float64):
        leaves = jnp.asarray(genome, dtype)
        params = {
            "model": jax.tree.map(
                lambda x: x.astype(dtype), model.init_params(jnp.float64)
            ),
            "branches": init_branch_params(N, dtype=dtype),
        }
        d = {k: v.astype(dtype) if v.dtype.kind == "f" else v
             for k, v in dec.items()}
        cfg = SweepConfig(K=K, carried_weights=carried)

        def loss(p):
            return -sample_phylogenies(
                jax.random.PRNGKey(3), leaves, model, p, cfg, decisions=d
            ).elbo

        grads[dtype] = jax.grad(loss)(params)

    flat32 = jax.tree.leaves(grads[jnp.float32])
    flat64 = jax.tree.leaves(grads[jnp.float64])
    for a, b in zip(flat32, flat64):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b), rtol=2e-3, atol=1e-5
        )
        assert np.any(np.asarray(a) != 0.0)
