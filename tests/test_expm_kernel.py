"""models.expm_kernel exercised via pallas_call(interpret=True) on CPU.

The kernel replaces the jnp uniformized-delta chain (models.expm) on
the TPU f32 path (PHYLO_EXPM_KERNEL); forward must be bit-compatible
with the chain and backward must match XLA AD of the chain away from
the branch-length clamp (the kernel evaluates the TRUE Frechet adjoint
via the block-pair identity instead of differentiating the scheme).
Shapes hit the TB padding edge and a batched-Q vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.models import expm, expm_kernel
from phylo_tpu.models.expm import expm_ctmc
from phylo_tpu.models.expm_kernel import expm_ctmc_pallas


@pytest.fixture
def interpret_mode():
    old_tb = expm_kernel.TB
    expm_kernel.INTERPRET = True
    expm_kernel.TB = 128          # keep interpret runs fast on 1 vCPU
    yield
    expm_kernel.INTERPRET = False
    expm_kernel.TB = old_tb


def _rate_matrix(rng, A, dtype):
    M = rng.uniform(0.1, 1.0, (A, A))
    return jnp.asarray(M - np.diag(M.sum(1)), dtype)


# kernel and chain run the SAME polynomial scheme, so parity holds at
# any (order, squarings); the heavy cases use small ones because the
# interpret-mode unrolled entry grid is slow on the 1-vCPU CI box
# (A=7 at the production 12/12 took >10 min to trace+run).
@pytest.mark.parametrize("A,B,dtype,order,sq", [
    (4, 128, jnp.float32, 12, 12),   # exact tile, production scheme
    (4, 200, jnp.float64, 8, 6),     # padded batch, f64 interpret
    (7, 96, jnp.float32, 6, 6),      # spike alphabet, odd sublanes
])
def test_expm_kernel_fwd_matches_chain(interpret_mode, rng, A, B, dtype,
                                       order, sq):
    Q = _rate_matrix(rng, A, dtype)
    b = jnp.asarray(rng.uniform(0.01, 3.0, (2, B // 2)), dtype)
    P_chain = expm_ctmc(Q, b, order=order, squarings=sq)
    P_kernel = expm_ctmc_pallas(Q, b, order, sq)
    tol = 1e-12 if dtype == jnp.float64 else 2e-6
    np.testing.assert_allclose(np.asarray(P_kernel),
                               np.asarray(P_chain), atol=tol)
    # rows of a stochastic matrix sum to 1
    np.testing.assert_allclose(
        np.asarray(jnp.sum(P_kernel, axis=-1)), 1.0, atol=5e-5)


def test_expm_kernel_grads_match_chain_ad(interpret_mode, rng):
    # the block-pair Frechet chain is exactly forward-mode AD of the
    # polynomial scheme, so kernel grads equal XLA AD of the chain at
    # ANY (order, squarings); use small ones (interpret-mode cost).
    A, B, order, sq = 4, 160, 8, 6
    Q = _rate_matrix(rng, A, jnp.float64)
    b = jnp.asarray(rng.uniform(0.05, 2.0, (B,)), jnp.float64)
    g = jnp.asarray(rng.standard_normal((B, A, A)), jnp.float64)

    dq_ref, db_ref = jax.grad(
        lambda Q, b: jnp.sum(g * expm_ctmc(Q, b, order=order,
                                           squarings=sq)), (0, 1))(Q, b)
    dq_k, db_k = jax.grad(
        lambda Q, b: jnp.sum(g * expm_ctmc_pallas(Q, b, order, sq)),
        (0, 1))(Q, b)
    np.testing.assert_allclose(np.asarray(dq_k), np.asarray(dq_ref),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(db_k), np.asarray(db_ref),
                               rtol=1e-9, atol=1e-9)


def test_expm_kernel_clamp_region(interpret_mode, rng):
    """Saturated branches: P is the stationary projector and b receives
    zero cotangent (d b_eff / d b = 0 past the clamp)."""
    A, order, sq = 4, 8, 6
    Q = _rate_matrix(rng, A, jnp.float64)
    b = jnp.asarray([500.0, 0.5] * 64, jnp.float64)
    P = expm_ctmc_pallas(Q, b, order, sq)
    np.testing.assert_allclose(
        np.asarray(P),
        np.asarray(expm_ctmc(Q, b, order=order, squarings=sq)),
        atol=1e-12)
    db = jax.grad(
        lambda b: jnp.sum(expm_ctmc_pallas(Q, b, order, sq) ** 2))(b)
    assert float(jnp.max(jnp.abs(db[::2]))) == 0.0
    assert float(jnp.max(jnp.abs(db[1::2]))) > 0.0


def test_expm_kernel_vmap_over_Q(interpret_mode, rng):
    """Replica training vmaps over per-seed params; the custom_vjp +
    pallas_call pair must batch correctly."""
    A, V, B, order, sq = 4, 3, 130, 8, 6
    Qs = jnp.stack([_rate_matrix(rng, A, jnp.float64) for _ in range(V)])
    b = jnp.asarray(rng.uniform(0.05, 2.0, (V, B)), jnp.float64)
    out = jax.vmap(lambda Q, b: expm_ctmc_pallas(Q, b, order, sq))(Qs, b)
    ref = jax.vmap(lambda Q, b: expm_ctmc(Q, b, order=order,
                                          squarings=sq))(Qs, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)


def test_expm_auto_gate(rng, monkeypatch):
    """The "auto" gate routes TPU f32 2-D-Q batches >= 2048 through the
    Pallas kernel (sharded traces included -- the partitioner runs it
    replicated; the sweep's presample shard_maps it per 'k'-shard
    instead); "1" forces, "0" disables."""
    from phylo_tpu.models import expm_kernel as ek

    hits = []

    def spy(Q, b, order=12, squarings=12):
        hits.append(1)
        # don't run real pallas on CPU; the chain is the same math
        # (gate forced off so this call doesn't recurse into the spy)
        prev = expm._KERNEL_MODE
        expm._KERNEL_MODE = "0"
        try:
            return expm_ctmc(Q, b, order=order, squarings=squarings)
        finally:
            expm._KERNEL_MODE = prev

    monkeypatch.setattr(ek, "expm_ctmc_pallas", spy)
    monkeypatch.setattr(expm.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(expm, "_KERNEL_MODE", "auto")
    Q = _rate_matrix(rng, 4, jnp.float32)
    b = jnp.asarray(rng.uniform(0.05, 2.0, (2048,)), jnp.float32)

    expm_ctmc(Q, b)
    assert hits == [1]                       # auto engages at 2048
    expm_ctmc(Q, b[:512])
    assert hits == [1]                       # small batch: jnp chain
    monkeypatch.setattr(expm, "_KERNEL_MODE", "0")
    expm_ctmc(Q, b)
    assert hits == [1]                       # "0" disables
    monkeypatch.setattr(expm, "_KERNEL_MODE", "1")
    expm_ctmc(Q, b)
    assert hits == [1, 1]                    # "1" forces


def test_expm_ctmc_dispatch_gate(interpret_mode, rng, monkeypatch):
    """PHYLO_EXPM_KERNEL=1 forces the kernel through the public
    expm_ctmc entry point (the auto gate requires a real TPU)."""
    monkeypatch.setattr(expm, "_KERNEL_MODE", "1")
    A = 4
    Q = _rate_matrix(rng, A, jnp.float64)
    b = jnp.asarray(rng.uniform(0.05, 2.0, (96,)), jnp.float64)
    monkeypatch.setattr(expm, "_KERNEL_MODE", "0")
    ref = expm_ctmc(Q, b)
    monkeypatch.setattr(expm, "_KERNEL_MODE", "1")
    out = expm_ctmc(Q, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-12)
