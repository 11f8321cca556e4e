"""Statistical properties of the resampling strategies and proposals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phylo_tpu.smc.proposals import uniform_pair
from phylo_tpu.smc.resampling import resample_indices


@pytest.mark.parametrize("strategy",
                         ["multinomial", "systematic", "stratified"])
def test_resampling_is_unbiased(strategy):
    # expected offspring counts proportional to normalized weights
    log_w = jnp.asarray(np.log([0.1, 0.4, 0.2, 0.3]))
    K = 4
    reps = 3000
    keys = jax.random.split(jax.random.PRNGKey(0), reps)
    idx = jax.vmap(
        lambda k: resample_indices(k, log_w, strategy)
    )(keys)
    counts = np.bincount(np.asarray(idx).ravel(), minlength=K)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.4, 0.2, 0.3], atol=0.02)


def test_systematic_has_lower_variance_than_multinomial():
    log_w = jnp.asarray(np.log([0.25, 0.25, 0.25, 0.25]))
    reps = 2000
    keys = jax.random.split(jax.random.PRNGKey(1), reps)

    def offspring_var(strategy):
        idx = jax.vmap(
            lambda k: resample_indices(k, log_w, strategy)
        )(keys)
        idx = np.asarray(idx)
        counts = np.stack(
            [np.bincount(row, minlength=4) for row in idx]
        )
        return counts.var(axis=0).mean()

    # uniform weights: systematic resampling is exact (variance 0)
    assert offspring_var("systematic") < 1e-12
    assert offspring_var("multinomial") > 0.1


def test_uniform_pair_is_uniform_over_active_prefix():
    K, N, n_active = 4000, 8, 5
    p1, p2 = uniform_pair(jax.random.PRNGKey(2), K, N,
                          jnp.int32(n_active), jnp.float64)
    p1, p2 = np.asarray(p1), np.asarray(p2)
    assert (p1 < n_active).all() and (p2 < n_active).all()
    assert (p1 != p2).all()
    # unordered pair frequencies ~ uniform over C(5,2)=10 pairs
    pairs = np.stack([np.minimum(p1, p2), np.maximum(p1, p2)], 1)
    keys = pairs[:, 0] * 10 + pairs[:, 1]
    _, counts = np.unique(keys, return_counts=True)
    assert len(counts) == 10
    freq = counts / K
    np.testing.assert_allclose(freq, 0.1, atol=0.02)


def test_cdf_schemes_never_return_out_of_range_indices():
    """side='right' searchsorted can hit K when the top stratum's
    uniform rounds to 1.0 in f32; the clamp must keep indices < K."""
    import jax
    import jax.numpy as jnp

    from phylo_tpu.smc.resampling import resample_indices

    K = 2048
    # the clamp target: an exactly-1.0 query really does return K
    ones_cdf = jnp.ones((K,), jnp.float32)
    raw = jnp.searchsorted(ones_cdf, jnp.float32(1.0), side="right",
                           method="scan_unrolled")
    assert int(raw) == K          # the hazard being clamped
    lw = jax.random.normal(jax.random.PRNGKey(0), (K,), jnp.float32)
    for strategy in ("systematic", "stratified"):
        for seed in range(25):
            idx = resample_indices(jax.random.PRNGKey(seed), lw,
                                   strategy)
            assert int(jnp.max(idx)) < K
            assert int(jnp.min(idx)) >= 0


def test_resample_kernel_auto_gate(monkeypatch):
    """The hardware-PRNG multinomial kernel engages on TPU at
    K >= 1024 (sharded traces included: the partitioner runs the (K,)
    kernel replicated, deterministic per seed); "0" disables, "1"
    forces (pltpu has no CPU lowering, so the spy stands in for the
    real pallas_call)."""
    from phylo_tpu.smc import resampling
    from phylo_tpu.smc import resample_kernel as rk

    hits = []

    def spy(key, logits):
        hits.append(logits.shape[0])
        return jnp.zeros((logits.shape[0],), jnp.int32)

    monkeypatch.setattr(rk, "categorical_pallas", spy)
    monkeypatch.setattr(resampling.jax, "default_backend",
                        lambda: "tpu")
    monkeypatch.setattr(resampling, "_KERNEL_MODE", "auto")

    lw = jax.random.normal(jax.random.PRNGKey(0), (2048,), jnp.float32)
    resample_indices(jax.random.PRNGKey(1), lw, "multinomial")
    assert hits == [2048]                     # engages at K=2048

    resample_indices(jax.random.PRNGKey(1), lw[:512], "multinomial")
    assert hits == [2048]                     # K < 1024: jax path

    monkeypatch.setattr(resampling, "_KERNEL_MODE", "1")
    resample_indices(jax.random.PRNGKey(1), lw, "multinomial")
    assert hits == [2048, 2048]               # "1" still forces

    monkeypatch.setattr(resampling, "_KERNEL_MODE", "0")
    resample_indices(jax.random.PRNGKey(1), lw, "multinomial")
    assert hits == [2048, 2048]               # "0" disables


def test_categorical_pallas_survives_jvp_tracing(monkeypatch):
    """Differentiating a sweep that draws ancestors with the HW-PRNG
    kernel must not JVP-trace the pallas_call (pallas has no JVP rule;
    pl.program_id asserts outside a grid context) -- round-5 regression
    from the first XLA-AD + kernel-on config (paper-scale twist
    K=1024).  stop_gradient inside categorical_pallas makes the
    tangents symbolic zeros."""
    import jax
    import jax.numpy as jnp

    from phylo_tpu.smc import resample_kernel as rk

    def loss(logits):
        idx = rk.categorical_pallas(jax.random.PRNGKey(0), logits)
        # downstream use: gather weights by the sampled ancestors
        return jnp.sum(logits[idx] ** 2)

    # trace only: the TPU prng primitives have no CPU lowering, but the
    # original failure was an AD-*tracing* assertion, which make_jaxpr
    # reproduces without executing the kernel
    jaxpr = jax.make_jaxpr(jax.grad(loss))(
        jnp.linspace(-1.0, 1.0, 64, dtype=jnp.float32)
    )
    assert "pallas_call" in str(jaxpr)
