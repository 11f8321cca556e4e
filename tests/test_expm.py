import jax.numpy as jnp
import numpy as np
import scipy.linalg

from phylo_tpu.models.expm import expm_ctmc, jc69_transition
from phylo_tpu.models.substitution import GTR, JC69, ReferenceQ


def _random_rate_matrix(rng, A):
    q = rng.uniform(0.1, 1.0, size=(A, A))
    np.fill_diagonal(q, 0.0)
    np.fill_diagonal(q, -q.sum(axis=1))
    return q


def test_jc69_closed_form_matches_scipy(rng):
    A = 4
    Q = np.full((A, A), 1.0 / A) - np.eye(A)
    for b in [0.0, 0.01, 0.3, 1.7, 25.0]:
        want = scipy.linalg.expm(Q * b)
        got = np.asarray(jc69_transition(jnp.float64(b), A))
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_jc69_batched_shapes():
    P = jc69_transition(jnp.ones((7, 3)), 4)
    assert P.shape == (7, 3, 4, 4)
    np.testing.assert_allclose(np.asarray(P.sum(-1)), 1.0, atol=1e-12)


def test_expm_ctmc_matches_scipy(rng):
    for A in (4, 7):
        Q = _random_rate_matrix(rng, A)
        bs = np.array([0.0, 1e-4, 0.05, 0.9, 4.0, 60.0, 400.0])
        got = np.asarray(expm_ctmc(jnp.asarray(Q), jnp.asarray(bs)))
        for i, b in enumerate(bs):
            want = scipy.linalg.expm(Q * b)
            np.testing.assert_allclose(got[i], want, atol=1e-10)


def test_expm_ctmc_rows_sum_to_one(rng):
    Q = _random_rate_matrix(rng, 4)
    b = rng.exponential(scale=1.0, size=(64,))
    P = np.asarray(expm_ctmc(jnp.asarray(Q), jnp.asarray(b)))
    np.testing.assert_allclose(P.sum(-1), 1.0, atol=1e-10)
    assert (P >= -1e-12).all()


def test_reference_q_construction():
    m = ReferenceQ(A=4)
    p = m.init_params(jnp.float64)
    Q = np.asarray(m.Q(p))
    # off-diagonal rows sum to 1, diagonal exactly -1
    # (reference vcsmc.py:138-148)
    off = Q - np.diag(np.diag(Q))
    np.testing.assert_allclose(off.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.diag(Q), -1.0, atol=1e-12)
    pi = np.asarray(m.stationary(p))
    np.testing.assert_allclose(pi, 0.25, atol=1e-12)


def test_jc69_model_q_matches_reference_constants():
    m = JC69(A=4)
    Q = np.asarray(m.Q({}))
    assert Q[0, 1] == 0.25 and Q[0, 0] == -0.75


def test_gtr_is_reversible(rng):
    m = GTR(A=4)
    p = m.init_params(jnp.float64)
    p = {
        "log_exch": jnp.asarray(rng.normal(size=6)),
        "y_station": jnp.asarray(rng.normal(size=4)),
    }
    Q = np.asarray(m.Q(p))
    pi = np.asarray(m.stationary(p))
    np.testing.assert_allclose(Q.sum(axis=1), 0.0, atol=1e-12)
    # detailed balance: pi_i Q_ij == pi_j Q_ji
    bal = pi[:, None] * Q
    np.testing.assert_allclose(bal, bal.T, atol=1e-12)
    # unit expected rate
    np.testing.assert_allclose(-np.sum(pi * np.diag(Q)), 1.0, atol=1e-12)


def test_expm_gradient_flows():
    import jax

    Q = jnp.asarray(_random_rate_matrix(np.random.default_rng(1), 4))

    def f(b):
        return expm_ctmc(Q, b)[0, 0]

    g = jax.grad(f)(jnp.float64(0.5))
    # finite difference
    eps = 1e-6
    fd = (f(jnp.float64(0.5 + eps)) - f(jnp.float64(0.5 - eps))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-5)


def test_hky_structure_and_jc_reduction(rng):
    import jax.numpy as jnp
    import scipy.linalg

    from phylo_tpu.models.substitution import HKY, get_model

    m = HKY(A=4)
    params = m.init_params(jnp.float64)
    # kappa=1 + uniform pi reduces HKY to JC69 (normalized): off-diag
    # equal, rows sum to zero, unit expected rate
    q = np.asarray(m.Q(params))
    np.testing.assert_allclose(q.sum(axis=1), 0.0, atol=1e-12)
    off = q[~np.eye(4, dtype=bool)]
    np.testing.assert_allclose(off, off[0])
    pi = np.asarray(m.stationary(params))
    np.testing.assert_allclose(-(pi * np.diag(q)).sum(), 1.0, rtol=1e-12)

    # kappa>1 boosts exactly the A<->G and C<->T entries
    params["log_kappa"] = jnp.asarray(np.log(4.0))
    q2 = np.asarray(m.Q(params))
    ratio = q2 * 0
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(np.eye(4, dtype=bool), np.nan, q2 / q2[0, 1])
    assert ratio[0, 2] > ratio[0, 1] and ratio[1, 3] > ratio[1, 0]

    # detailed balance: pi_i q_ij == pi_j q_ji (time reversibility)
    params["y_station"] = jnp.asarray(rng.normal(0, 0.4, 4))
    pi = np.asarray(m.stationary(params))
    q3 = np.asarray(m.Q(params))
    np.testing.assert_allclose(pi[:, None] * q3, (pi[:, None] * q3).T,
                               atol=1e-12)
    # stationarity under the matrix exponential
    P = scipy.linalg.expm(q3 * 0.7)
    np.testing.assert_allclose(pi @ P, pi, atol=1e-12)
    # transition() agrees with scipy, in MERGE orientation (the
    # transpose of the row-stochastic expm; substitution.py docstring)
    import jax

    Pj = np.asarray(m.transition(params, jnp.float64(0.7)))
    np.testing.assert_allclose(Pj, P.T, atol=1e-9)
    assert isinstance(get_model("hky85"), HKY)


def test_expm_poisson_matches_scipy_and_chain(rng):
    """Poisson power-table expm (the wide-alphabet shared-Q fast path,
    round 5): scipy parity across the full branch-length range incl.
    the t=0 / tiny-t first-order branch and the mu*b=80 clamp, plus
    finite gradients matching the delta chain."""
    import jax

    from phylo_tpu.models.expm import expm_poisson

    for A in (4, 20):
        M = rng.uniform(0.1, 1.0, (A, A))
        np.fill_diagonal(M, 0)
        M = M / M.sum(1, keepdims=True)
        Q = M - np.diag(M.sum(1))
        bs = np.concatenate([
            [0.0, 1e-9, 1e-7, 1e-5],
            rng.exponential(0.3, 20),
            [5.0, 20.0, 79.0, 200.0],
        ])
        ref = np.stack(
            [scipy.linalg.expm(Q * b) for b in np.minimum(bs, 80.0)]
        )
        P64 = np.asarray(expm_poisson(jnp.asarray(Q), jnp.asarray(bs)))
        np.testing.assert_allclose(P64, ref, atol=1e-12)
        P32 = np.asarray(expm_poisson(
            jnp.asarray(Q, jnp.float32), jnp.asarray(bs, jnp.float32)
        ))
        np.testing.assert_allclose(P32, ref, atol=1e-6)
        assert np.all(P32 >= 0.0)

        g_p = jax.jacfwd(
            lambda b: expm_poisson(jnp.asarray(Q), b).sum()
        )(jnp.asarray(bs))
        # f32 gradients must be FINITE across the whole b range (the
        # log1p(d) branch emitted inf VJPs at d -> -1 in f32 on TPU)
        g32 = jax.grad(
            lambda b: expm_poisson(
                jnp.asarray(Q, jnp.float32), b).sum()
        )(jnp.asarray(bs, jnp.float32))
        assert np.all(np.isfinite(np.asarray(g32)))
        gq32 = jax.grad(
            lambda q: expm_poisson(
                q, jnp.asarray(bs, jnp.float32)).sum()
        )(jnp.asarray(Q, jnp.float32))
        assert np.all(np.isfinite(np.asarray(gq32)))
        g_c = jax.jacfwd(
            lambda b: expm_ctmc(jnp.asarray(Q), b).sum()
        )(jnp.asarray(bs))
        np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_c),
                                   atol=1e-10)
