import jax
import jax.numpy as jnp
import numpy as np

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC",
           "ACTTCGACTG"]


def _run(config):
    ds = dataset_from_strings(STRINGS)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    return sample_phylogenies(
        jax.random.PRNGKey(5), jnp.asarray(ds.genome), model, params,
        config,
    )


def test_threshold_zero_never_resamples():
    res = _run(SweepConfig(K=8, ess_threshold=0.0))
    want = _run(SweepConfig(K=8, resampling="none"))
    # identical keys + no resampling in both -> identical ancestors and
    # (given the same proposal draws) identical weights
    np.testing.assert_array_equal(
        np.asarray(res.ancestors),
        np.tile(np.arange(8), (4, 1)),
    )
    np.testing.assert_allclose(
        float(res.elbo), float(want.elbo), rtol=1e-12
    )


def test_threshold_one_matches_always_resample():
    res = _run(SweepConfig(K=8, ess_threshold=1.0))
    want = _run(SweepConfig(K=8))
    # ESS < K at every rank > 0 with continuous weights, so the gate is
    # always open and trajectories coincide
    np.testing.assert_allclose(
        float(res.elbo), float(want.elbo), rtol=1e-12
    )


def test_carried_unconditional_matches_reference_estimator():
    # With resampling at EVERY rank each segment is one rank long, so
    # the carried-weights estimator reduces exactly to the reference's
    # per-rank convention (identical keys -> identical trajectories).
    res = _run(SweepConfig(K=8, carried_weights=True))
    want = _run(SweepConfig(K=8))
    np.testing.assert_allclose(
        float(res.elbo), float(want.elbo), rtol=1e-12
    )


def test_carried_none_is_the_importance_sampling_estimator():
    # No resampling ever: log Z must be the K-particle IS estimator
    # logsumexp(sum_r log w_r) - log K, computed from the returned
    # per-rank incremental weights.
    res = _run(SweepConfig(K=8, resampling="none", carried_weights=True))
    lw = np.asarray(res.log_weights)          # (R, K) incremental
    total = lw.sum(axis=0)
    want = float(
        jax.scipy.special.logsumexp(jnp.asarray(total)) - jnp.log(8.0)
    )
    np.testing.assert_allclose(float(res.elbo), want, rtol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(res.ancestors), np.tile(np.arange(8), (4, 1))
    )


def test_carried_threshold_zero_equals_none():
    # A gate that never opens is the same estimator as strategy 'none'.
    res = _run(SweepConfig(K=8, ess_threshold=0.0, carried_weights=True))
    want = _run(
        SweepConfig(K=8, resampling="none", carried_weights=True)
    )
    np.testing.assert_allclose(
        float(res.elbo), float(want.elbo), rtol=1e-12
    )


def test_carried_intermediate_threshold_segments():
    # tau=0.5: some ranks resample, some do not; estimator stays finite
    # and the segment reconstruction from (ancestors, log_weights)
    # reproduces the returned elbo.
    res = _run(
        SweepConfig(K=16, ess_threshold=0.4, carried_weights=True)
    )
    assert np.isfinite(float(res.elbo))
    anc = np.asarray(res.ancestors)
    lw = np.asarray(res.log_weights)
    K = 16
    logK = np.log(K)
    # rank r>0 resampled iff its ancestor row is a fresh draw; with the
    # accumulated-weight gate closed idx == arange exactly.  A fresh
    # multinomial draw colliding with identity on all 16 particles has
    # probability ~K^-K -- negligible.
    identity = np.tile(np.arange(K), (lw.shape[0], 1))
    resampled = (anc != identity).any(axis=1)
    acc = np.zeros(K)
    logz = 0.0
    for r in range(lw.shape[0]):
        if r > 0 and resampled[r]:
            logz += jax.scipy.special.logsumexp(jnp.asarray(acc)) - logK
            acc = np.zeros(K)
        acc = acc + lw[r]
    logz += float(
        jax.scipy.special.logsumexp(jnp.asarray(acc)) - logK
    )
    np.testing.assert_allclose(float(res.elbo), logz, rtol=1e-10)
    # both behaviors must actually occur in this run
    assert resampled[1:].any() and (~resampled[1:]).any()


def test_intermediate_threshold_runs_finite():
    res = _run(SweepConfig(K=16, ess_threshold=0.5))
    assert np.isfinite(float(res.elbo))
    anc = np.asarray(res.ancestors)
    identity = np.tile(np.arange(16), (4, 1))
    # with tau=0.5 some ranks resample and some do not (probabilistic
    # but overwhelmingly likely at these scales)
    per_rank_identity = (anc == identity).all(axis=1)
    assert per_rank_identity[0]  # rank 0 never resamples
