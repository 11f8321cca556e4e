"""Trajectory-level GRADIENT parity vs the torch reference baseline.

`baselines/torch_reference.py` re-executes the reference recursion with
torch autograd, which implements the reference's biased VSMC gradient
exactly: resampling/topology indices are constants, every gathered
VALUE (core messages, log-likelihood tilde) carries gradients
(reference vcsmc.py:279-344,488-491).  Under identical injected
decisions the JAX sweep must produce the same ELBO *and the same
parameter gradients* -- the strongest check that XLA AD (and the
`_resample_tables` custom VJP on the f32 packed path) matches the
reference's gradient semantics end-to-end.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import ReferenceQ
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


def _make_case(N=6, S=31, A=4, K=6, seed=0):
    rng = np.random.default_rng(seed)
    genome = np.eye(A)[rng.integers(0, A, size=(N, S))]
    n_ranks = N - 1
    dec = {
        "ancestors": rng.integers(0, K, size=(n_ranks, K)).astype(np.int32),
        "pairs": np.stack(
            [
                np.stack(
                    [
                        (p := rng.integers(0, N - r, size=(K,))),
                        (p + 1 + rng.integers(0, N - r - 1, size=(K,)))
                        % (N - r),
                    ],
                    axis=1,
                )
                for r in range(n_ranks)
            ]
        ).astype(np.int32),
        "branches_l": rng.exponential(0.1, size=(n_ranks, K)),
        "branches_r": rng.exponential(0.08, size=(n_ranks, K)),
    }
    return genome, dec


def test_elbo_and_grads_match_torch_reference():
    genome, dec = _make_case()
    N, S, A = genome.shape
    K = dec["ancestors"].shape[1]

    # --- torch side -----------------------------------------------------
    from baselines.torch_reference import TorchVCSMC

    tv = TorchVCSMC(genome, K=K)
    t_elbo = tv.sweep(decisions=dec)
    t_elbo.backward()
    t_elbo = t_elbo.detach()
    t_grads = {
        "log_rates_l": tv.log_rates_l.grad.numpy(),
        "log_rates_r": tv.log_rates_r.grad.numpy(),
        "y_q": tv.y_q.grad.numpy(),
        "y_station": tv.y_station.grad.numpy(),
    }

    # --- jax side (identical init, identical decisions) ------------------
    model = ReferenceQ(A=A)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(
            N, branch_prior=float(math.log(10.0)), dtype=jnp.float64
        ),
    }
    leaves = jnp.asarray(genome, jnp.float64)
    jdec = {k: jnp.asarray(v) for k, v in dec.items()}
    cfg = SweepConfig(K=K)

    def elbo_fn(p):
        return sample_phylogenies(
            jax.random.PRNGKey(0), leaves, model, p, cfg, decisions=jdec
        ).elbo

    j_elbo, j_grads = jax.value_and_grad(elbo_fn)(params)

    np.testing.assert_allclose(
        float(j_elbo), float(t_elbo), rtol=1e-10,
        err_msg="ELBO value parity vs torch reference",
    )
    np.testing.assert_allclose(
        np.asarray(j_grads["branches"]["log_rates_l"]),
        t_grads["log_rates_l"], rtol=1e-8, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(j_grads["branches"]["log_rates_r"]),
        t_grads["log_rates_r"], rtol=1e-8, atol=1e-12,
    )
    # y_q's diagonal is dead in both parameterizations; compare off-diag
    off = ~np.eye(A, dtype=bool)
    np.testing.assert_allclose(
        np.asarray(j_grads["model"]["y_q"])[off], t_grads["y_q"][off],
        rtol=1e-8, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(j_grads["model"]["y_station"]), t_grads["y_station"],
        rtol=1e-8, atol=1e-12,
    )
    # the gradient is not trivially zero
    assert np.abs(t_grads["y_q"][off]).max() > 0


def test_grad_parity_holds_under_manual_decisions_with_repeats():
    """Repeated ancestor indices (heavy resampling collisions) stress
    the gather-transpose accumulation."""
    genome, dec = _make_case(seed=3)
    dec["ancestors"][:] = 0   # every particle resamples from particle 0
    N, S, A = genome.shape
    K = dec["ancestors"].shape[1]

    from baselines.torch_reference import TorchVCSMC

    tv = TorchVCSMC(genome, K=K)
    t_elbo = tv.sweep(decisions=dec)
    t_elbo.backward()
    t_elbo = t_elbo.detach()

    model = ReferenceQ(A=A)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    jdec = {k: jnp.asarray(v) for k, v in dec.items()}

    def elbo_fn(p):
        return sample_phylogenies(
            jax.random.PRNGKey(0), jnp.asarray(genome, jnp.float64),
            model, p, SweepConfig(K=K), decisions=jdec,
        ).elbo

    j_elbo, j_grads = jax.value_and_grad(elbo_fn)(params)
    np.testing.assert_allclose(float(j_elbo), float(t_elbo), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(j_grads["branches"]["log_rates_l"]),
        tv.log_rates_l.grad.numpy(), rtol=1e-8, atol=1e-12,
    )
    off = ~np.eye(A, dtype=bool)
    np.testing.assert_allclose(
        np.asarray(j_grads["model"]["y_q"])[off],
        tv.y_q.grad.numpy()[off], rtol=1e-8, atol=1e-12,
    )
