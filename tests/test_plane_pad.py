"""Plane-padded fused rank path: A=7 (spikeGP) and G*A=12 (GammaSites
G=3) are re-admitted to the DMA kernels by padding the state planes to
an 8-row-tile-aligned count with zero transitions/stationary entries.
Value AND gradient parity against the jnp path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import GammaSites, ReferenceQ
from phylo_tpu.pruning import kernels
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


@pytest.fixture
def interpret_mode():
    kernels.INTERPRET = True
    yield
    kernels.INTERPRET = False


def _run(model, leaves, params, config, interpret):
    kernels.INTERPRET = interpret

    def loss(p):
        return -sample_phylogenies(
            jax.random.PRNGKey(7), leaves, model, p, config,
        ).elbo

    return jax.value_and_grad(loss)(params)


@pytest.mark.parametrize("saved", [True, False])
@pytest.mark.parametrize("case", ["dense_a7", "blocked_g3"])
def test_padded_fused_matches_jnp_path(interpret_mode, rng, case, saved,
                                       monkeypatch):
    if not saved:
        # force the DMA re-gather backward (fused_rank_bwd) instead of
        # the saved-children variant
        monkeypatch.setattr(kernels, "SAVE_CHILDREN_CAP", 0)
    N, S, K = 5, 70, 32                  # K % TKF == 0
    if case == "dense_a7":
        A = 7
        model = ReferenceQ(A=A)
        genome = np.eye(A)[rng.integers(0, A, (N, S))]
    else:
        model = GammaSites(ReferenceQ(A=4), G=3)   # GA = 12 -> pad 16
        genome = model.expand_leaves(
            np.eye(4)[rng.integers(0, 4, (N, S))])
    leaves = jnp.asarray(genome, jnp.float64)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    config = SweepConfig(K=K, manual_vjp=True)

    v_pad, g_pad = _run(model, leaves, params, config, True)
    v_ref, g_ref = _run(model, leaves, params, config, False)
    np.testing.assert_allclose(float(v_pad), float(v_ref), rtol=1e-10)
    for a, b in zip(jax.tree.leaves(g_pad), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)
    assert all(np.all(np.isfinite(x)) for x in jax.tree.leaves(g_pad))
