"""Trainer-level sharding + remat + vmap-seed tests on the virtual
8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.dataio import simulate_dna
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.train import TrainConfig, train

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_train_with_mesh_uneven_sites(tmp_path):
    # S=37 not divisible by 8 -> trainer pads + weights the eval pass
    ds = simulate_dna(5, 37, seed=3)
    cfg = TrainConfig(
        n_particles=8, batch_size=16, num_epoch=2, optimizer="Adam",
        dtype="float64", mesh_shape=(8,), results_dir=str(tmp_path),
        collect_trees=False, log_every=0,
    )
    res = train(ds, cfg)
    assert np.isfinite(res.history["elbo"]).all()

    # same run without mesh: ELBO magnitudes comparable (different RNG
    # trajectories are impossible -- same seed, same ops, same dtypes --
    # so they should be exactly equal)
    cfg2 = TrainConfig(
        n_particles=8, batch_size=16, num_epoch=2, optimizer="Adam",
        dtype="float64", mesh_shape=None, results_dir=str(tmp_path),
        collect_trees=False, log_every=0,
    )
    res2 = train(ds, cfg2)
    np.testing.assert_allclose(
        res.history["elbo"], res2.history["elbo"], rtol=1e-8
    )


def test_remat_matches_non_remat():
    ds = simulate_dna(5, 24, seed=4)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(ds.genome)
    key = jax.random.PRNGKey(0)

    def loss(p, remat):
        cfg = SweepConfig(K=8, remat=remat)
        return -sample_phylogenies(key, leaves, model, p, cfg).elbo

    v1, g1 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10)


def test_vmap_over_seeds():
    # seed-parallel replica sweeps (the autorun.sh repeat role) vmap
    # cleanly over keys
    ds = simulate_dna(5, 20, seed=5)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(ds.genome)
    cfg = SweepConfig(K=4)

    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    elbos = jax.vmap(
        lambda k: sample_phylogenies(k, leaves, model, params, cfg).elbo
    )(keys)
    assert elbos.shape == (5,)
    assert np.isfinite(np.asarray(elbos)).all()
    assert len(set(np.asarray(elbos).tolist())) == 5  # distinct runs
