"""Fused rank kernels under site-sharded meshes (round-4 headline:
the Pallas fast paths survive sharding instead of standing down).

kernels.shard_fused_rank_update / shard_fused_rank_bwd run the
single-device kernels per 's'-shard inside jax.shard_map and psum the
site-summed outputs; these tests pin exact parity with the unsharded
kernels (interpret mode, virtual CPU mesh), and that the sweep's
shard_map'd expm presample matches the unsharded presample bit-for-bit
with correctly psum'd parameter gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phylo_tpu.parallel import make_mesh, sweep_sharding
from phylo_tpu.pruning import kernels
from tests.test_kernels_interpret import _rank_inputs

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture
def interpret_mode():
    kernels.INTERPRET = True
    yield
    kernels.INTERPRET = False


def test_site_sharded_mesh_detection():
    assert kernels.site_sharded_mesh(None) is None
    sh_s = sweep_sharding(make_mesh((8,), ("s",)))
    assert kernels.site_sharded_mesh(sh_s) is not None
    sh_ks = sweep_sharding(make_mesh((2, 4), ("k", "s")))
    assert kernels.site_sharded_mesh(sh_ks) is None      # k > 1: off
    sh_k1 = sweep_sharding(make_mesh((1, 8), ("k", "s")))
    assert kernels.site_sharded_mesh(sh_k1) is not None  # trivial k


def test_shard_fused_rank_update_matches_unsharded(interpret_mode, rng,
                                                   monkeypatch):
    monkeypatch.setattr(kernels, "TKF", 4)
    K, R, N, A, S = 8, 5, 6, 4, 256     # 128-lane tile per shard, ns=2
    mesh = make_mesh((2,), ("s",))
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs(rng, K, R, N, A, S)
    outc = jnp.asarray([R - 1], jnp.int32)

    for save in (False, True):
        fn = kernels.shard_fused_rank_update(mesh, save_children=save)
        got = jax.jit(fn)(leaves, buf, idx, outc, P_l, P_r, pi, w)
        want = kernels._fused_rank_ref(leaves, buf, idx, outc, P_l,
                                       P_r, pi, w, save_children=save)
        for n, a, b in zip(
            ["buf", "rootll", "logscale", "child_l", "child_r"],
            got, want,
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-14,
                err_msg=n,
            )


def test_shard_fused_rank_bwd_matches_unsharded(interpret_mode, rng,
                                                monkeypatch):
    monkeypatch.setattr(kernels, "TKF", 4)
    K, R, N, A, S = 8, 5, 6, 4, 256
    mesh = make_mesh((2,), ("s",))
    buf, leaves, idx, P_l, P_r, pi, w = _rank_inputs(rng, K, R, N, A, S)
    gm = jnp.asarray(rng.normal(0, 1.0, (K, A, S)))
    gr = jnp.asarray(rng.normal(0, 1.0, (K,)))
    gl = jnp.asarray(rng.normal(0, 1.0, (K,)))
    names = ["dm1", "dm2", "dPl", "dPr", "dpi", "dw"]

    got = jax.jit(kernels.shard_fused_rank_bwd(mesh))(
        leaves, buf, idx, gm, gr, gl, P_l, P_r, pi, w)
    want = kernels._fused_rank_bwd_ref(leaves, buf, idx, gm, gr, gl,
                                       P_l, P_r, pi, w)
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )

    # DMA-free saved-children variant
    outc = jnp.asarray([R - 1], jnp.int32)
    _, _, _, m1, m2 = kernels._fused_rank_ref(
        leaves, buf, idx, outc, P_l, P_r, pi, w, save_children=True)
    got_s = jax.jit(kernels.shard_fused_rank_bwd(mesh, saved=True))(
        m1, m2, gm, gr, gl, P_l, P_r, pi, w)
    want_s = kernels._fused_rank_bwd_saved_ref(m1, m2, gm, gr, gl,
                                               P_l, P_r, pi, w)
    for n, a, b in zip(names, got_s, want_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12,
            err_msg=n,
        )


def test_presample_sharded_matches_unsharded(rng):
    """The 'k'-sharded shard_map presample (what keeps the Pallas expm
    kernel engaged per shard on TPU) is bit-identical to the unsharded
    call, with correctly psum'd model-parameter gradients."""
    from phylo_tpu.models.branches import branch_rates, init_branch_params
    from phylo_tpu.models.substitution import ReferenceQ
    from phylo_tpu.smc.sweep import _presample_transitions

    N, K = 6, 16
    model = ReferenceQ(A=4)
    mp = model.init_params(jnp.float64)
    rates_l, rates_r = branch_rates(
        init_branch_params(N, dtype=jnp.float64))
    eps_l = jnp.asarray(rng.exponential(1.0, (N - 1, K)))
    eps_r = jnp.asarray(rng.exponential(1.0, (N - 1, K)))
    sh = sweep_sharding(make_mesh((8,), ("k",)))

    def run(mp, shardings):
        return _presample_transitions(
            model, mp, rates_l, rates_r, eps_l, eps_r, jnp.float64,
            shardings=shardings)

    bl0, br0, P0 = jax.jit(lambda mp: run(mp, None))(mp)
    bl1, br1, P1 = jax.jit(lambda mp: run(mp, sh))(mp)
    assert np.array_equal(np.asarray(P0), np.asarray(P1))
    assert np.array_equal(np.asarray(bl0), np.asarray(bl1))
    assert np.array_equal(np.asarray(br0), np.asarray(br1))

    def loss(mp, shardings):
        return jnp.sum(run(mp, shardings)[2] ** 2)

    g0 = jax.jit(jax.grad(lambda mp: loss(mp, None)))(mp)
    g1 = jax.jit(jax.grad(lambda mp: loss(mp, sh)))(mp)
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=1e-12, atol=1e-14, err_msg=k)


def test_sharded_sweep_fused_kernels_match_single_device(interpret_mode,
                                                         rng):
    """End-to-end: an 's'-sharded manual-VJP sweep with the fused rank
    kernels ENGAGED (interpret) matches the single-device fused sweep
    -- value and parameter gradients -- proving the round-3 stand-down
    gate is no longer needed on site-sharded meshes."""
    from phylo_tpu.dataio import simulate_dna
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import ReferenceQ
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

    N, K, S = 6, 32, 100        # K % TKF == 0; Sp pads to 128/256
    ds = simulate_dna(N, S, seed=5)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(ds.genome, jnp.float64)
    config = SweepConfig(K=K, manual_vjp=True)
    mesh = make_mesh((2,), ("s",))
    sh = sweep_sharding(mesh)

    def loss(params, shardings):
        return -sample_phylogenies(
            jax.random.PRNGKey(3), leaves, model, params, config,
            shardings=shardings,
        ).elbo

    v0, g0 = jax.jit(
        jax.value_and_grad(lambda p: loss(p, None)))(params)
    v1, g1 = jax.jit(
        jax.value_and_grad(lambda p: loss(p, sh)))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-10)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-12)


def test_kshard_gather_scatter_roundtrip(rng):
    """shard_gather_pair == buf[brow, col] bit-for-bit on a k- and
    k x s-sharded buffer, and shard_scatter_pair_add == the local
    .at[].add(mode='drop') with the same sentinel contract."""
    K, C, GA, Sp = 8, 6, 4, 256
    buf = jnp.asarray(rng.uniform(0.1, 1.0, (K, C, GA, Sp)))
    brow = jnp.asarray(rng.integers(0, K, (K, 2)), jnp.int32)
    col = jnp.asarray(rng.integers(0, C, (K, 2)), jnp.int32)
    for axes in (((2,), ("k",)), ((2, 2), ("k", "s"))):
        mesh = make_mesh(*axes)
        got = jax.jit(kernels.shard_gather_pair(mesh))(buf, brow, col)
        want = buf[brow, col]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=0)

        dm = jnp.asarray(rng.normal(0, 1.0, (K, 2, GA, Sp)))
        cold = col.at[0, 0].set(C)            # sentinel: dropped
        got2 = jax.jit(kernels.shard_scatter_pair_add(mesh))(
            buf, brow, cold, dm)
        want2 = buf.at[brow, cold].add(dm, mode="drop")
        np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                                   rtol=1e-12, atol=1e-12)


def test_kshard_sweep_merge_kernel_matches_single_device(interpret_mode,
                                                         rng):
    """Round-5: a 'k'-sharded sweep runs the structured psum_scatter
    child exchange + the per-shard Pallas MERGE kernel
    (kernels.shard_merge_loglik) and must match the single-device
    kernel sweep -- value and parameter gradients -- under both XLA AD
    and the manual whole-sweep VJP."""
    from phylo_tpu.dataio import simulate_dna
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import ReferenceQ
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

    N, K, S = 6, 8, 100
    ds = simulate_dna(N, S, seed=7)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(ds.genome, jnp.float64)

    for manual in (False, True):
        config = SweepConfig(K=K, manual_vjp=manual)

        def loss(params, shardings):
            return -sample_phylogenies(
                jax.random.PRNGKey(3), leaves, model, params, config,
                shardings=shardings,
            ).elbo

        v0, g0 = jax.jit(
            jax.value_and_grad(lambda p: loss(p, None)))(params)
        for axes in (((2,), ("k",)), ((2, 2), ("k", "s"))):
            sh = sweep_sharding(make_mesh(*axes))
            v1, g1 = jax.jit(
                jax.value_and_grad(lambda p: loss(p, sh)))(params)
            np.testing.assert_allclose(float(v0), float(v1),
                                       rtol=1e-10)
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-8,
                    atol=1e-12,
                )
