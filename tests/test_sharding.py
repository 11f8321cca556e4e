"""Multi-device correctness on the virtual 8-device CPU mesh:
site-sharded (and particle-sharded) sweeps must equal the single-device
sweep bit-for-bit up to reduction reordering (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.dataio import simulate_dna
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.parallel import make_mesh, sweep_sharding
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from tests.test_sweep_parity import make_decisions

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(K=8, N=6, S=64):
    ds = simulate_dna(N, S, seed=2)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    rng = np.random.default_rng(0)
    rates = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    dec = make_decisions(rng, N, K, rates, rates)
    leaves = jnp.asarray(ds.genome, dtype=jnp.float64)
    return leaves, model, params, dec


@pytest.mark.parametrize("mesh_shape,axes", [
    ((8,), ("s",)),
    ((2, 4), ("k", "s")),
    ((4, 2), ("k", "s")),
])
def test_sharded_sweep_matches_single_device(mesh_shape, axes):
    leaves, model, params, dec = _setup()
    config = SweepConfig(K=8)

    base = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config,
        decisions=dec,
    )

    mesh = make_mesh(mesh_shape, axes)
    sh = sweep_sharding(mesh)
    leaves_sh = jax.device_put(leaves, sh.leaves)

    @jax.jit
    def run(leaves, params):
        return sample_phylogenies(
            jax.random.PRNGKey(0), leaves, model, params, config,
            decisions=dec, shardings=sh,
        )

    got = run(leaves_sh, params)
    np.testing.assert_allclose(
        np.asarray(got.log_weights), np.asarray(base.log_weights),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        float(got.elbo), float(base.elbo), rtol=1e-10
    )


def test_sharded_gradient_matches_single_device():
    leaves, model, params, dec = _setup(S=40)
    config = SweepConfig(K=8)

    def loss(params, leaves, sh):
        return -sample_phylogenies(
            jax.random.PRNGKey(0), leaves, model, params, config,
            decisions=dec, shardings=sh,
        ).elbo

    g_base = jax.grad(loss)(params, leaves, None)

    mesh = make_mesh((8,))
    sh = sweep_sharding(mesh)
    leaves_sh = jax.device_put(leaves, sh.leaves)
    g_sh = jax.jit(
        jax.grad(loss), static_argnums=(2,)
    )(params, leaves_sh, sh)

    for a, b in zip(jax.tree.leaves(g_base), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
        )


def test_uneven_site_count_pads_with_weights():
    # S=37 not divisible by 8: pad to 40 with weight-0 missing columns;
    # results must equal the unpadded single-device sweep exactly
    from phylo_tpu.parallel import pad_sites

    leaves, model, params, dec = _setup(S=37)
    config = SweepConfig(K=8)
    base = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config,
        decisions=dec,
    )
    mesh = make_mesh((8,))
    sh = sweep_sharding(mesh)
    padded, w = pad_sites(np.asarray(leaves), sh.site_multiple())
    assert padded.shape[1] == 40 and w.sum() == 37
    got = sample_phylogenies(
        jax.random.PRNGKey(0),
        jax.device_put(jnp.asarray(padded), sh.leaves),
        model, params, config, decisions=dec, shardings=sh,
        site_weights=jnp.asarray(w),
    )
    np.testing.assert_allclose(
        np.asarray(got.log_weights), np.asarray(base.log_weights),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        float(got.elbo), float(base.elbo), rtol=1e-10
    )
