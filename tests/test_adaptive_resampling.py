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


def test_intermediate_threshold_runs_finite():
    res = _run(SweepConfig(K=16, ess_threshold=0.5))
    assert np.isfinite(float(res.elbo))
    anc = np.asarray(res.ancestors)
    identity = np.tile(np.arange(16), (4, 1))
    # with tau=0.5 some ranks resample and some do not (probabilistic
    # but overwhelmingly likely at these scales)
    per_rank_identity = (anc == identity).all(axis=1)
    assert per_rank_identity[0]  # rank 0 never resamples
