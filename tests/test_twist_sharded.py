"""VNCSMC twisting under site sharding must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.dataio import simulate_dna
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.parallel import make_mesh, sweep_sharding
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.smc.twist import TwistConfig
from tests.test_twist import make_twist_decisions

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_twist_matches_single_device():
    ds = simulate_dna(5, 40, seed=6)
    N, K, M = ds.N, 4, 2
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    rng = np.random.default_rng(0)
    rates = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    dec = make_twist_decisions(rng, N, K, M, rates, rates)
    config = SweepConfig(K=K, twist=TwistConfig(M=M, pair_chunk=4))
    leaves = jnp.asarray(ds.genome)

    base = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config,
        decisions=dec,
    )
    mesh = make_mesh((8,))
    sh = sweep_sharding(mesh)
    got = sample_phylogenies(
        jax.random.PRNGKey(0), jax.device_put(leaves, sh.leaves),
        model, params, config, decisions=dec, shardings=sh,
    )
    np.testing.assert_allclose(
        np.asarray(got.log_weights), np.asarray(base.log_weights),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        float(got.elbo), float(base.elbo), rtol=1e-10
    )


@pytest.mark.parametrize("mesh_shape,axes", [
    ((2, 4), ("k", "s")),
    ((8,), ("s",)),
])
def test_sharded_twist_gradients_match_single_device(mesh_shape, axes):
    """VNCSMC GRADIENTS on a k x s mesh vs single device (VERDICT r2
    item 6: prior coverage was value-only on an (8,)-site mesh)."""
    ds = simulate_dna(5, 40, seed=6)
    N, K, M = ds.N, 4, 2
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    rng = np.random.default_rng(1)
    rates = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    dec = make_twist_decisions(rng, N, K, M, rates, rates)
    config = SweepConfig(
        K=K, twist=TwistConfig(M=M, pair_chunk=4), carried_weights=True
    )
    leaves = jnp.asarray(ds.genome)

    def loss(params, leaves, sh):
        return -sample_phylogenies(
            jax.random.PRNGKey(0), leaves, model, params, config,
            decisions=dec, shardings=sh,
        ).elbo

    g_base = jax.grad(loss)(params, leaves, None)
    mesh = make_mesh(mesh_shape, axes)
    sh = sweep_sharding(mesh)
    leaves_sh = jax.device_put(leaves, sh.leaves)
    g_sh = jax.jit(jax.grad(loss), static_argnums=(2,))(
        params, leaves_sh, sh
    )
    for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-10)
    assert any(np.any(np.asarray(x) != 0.0)
               for x in jax.tree.leaves(g_base))
