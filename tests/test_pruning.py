import jax.numpy as jnp
import numpy as np
import scipy.linalg

from phylo_tpu.pruning.felsenstein import merge_messages, root_log_likelihood
from phylo_tpu.pruning.posterior import (
    forest_log_prior,
    overcounting_correction,
)


def _rand_msgs(rng, K, S, A):
    return rng.uniform(0.05, 1.0, size=(K, S, A))


def test_merge_matches_reference_formula(rng):
    K, S, A = 3, 11, 4
    Q = np.full((A, A), 0.25) - np.eye(A)
    l_msg = _rand_msgs(rng, K, S, A)
    r_msg = _rand_msgs(rng, K, S, A)
    b_l = rng.exponential(0.2, K)
    b_r = rng.exponential(0.2, K)
    P_l = np.stack([scipy.linalg.expm(Q * b) for b in b_l])
    P_r = np.stack([scipy.linalg.expm(Q * b) for b in b_r])

    got_scaled, log_scale = merge_messages(
        jnp.asarray(l_msg), jnp.asarray(r_msg),
        jnp.asarray(P_l), jnp.asarray(P_r),
    )
    want = (l_msg @ P_l) * (r_msg @ P_r)  # reference vcsmc.py:185-187

    # scaled message * per-site scale == unscaled reference result;
    # verify via the root log-likelihood identity instead of
    # reconstructing scales
    pi = np.full(A, 0.25)
    ll_got = np.asarray(
        root_log_likelihood(got_scaled, jnp.asarray(pi), log_scale)
    )
    ll_want = np.log(want @ pi).sum(axis=-1)
    np.testing.assert_allclose(ll_got, ll_want, rtol=1e-10)

    # no-rescale path is bit-identical to the formula
    got_raw, zero = merge_messages(
        jnp.asarray(l_msg), jnp.asarray(r_msg),
        jnp.asarray(P_l), jnp.asarray(P_r), rescale=False,
    )
    np.testing.assert_allclose(np.asarray(got_raw), want, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(zero), 0.0)


def test_rescaling_prevents_underflow_f32():
    # 40-leaf-deep chain of merges underflows f32 without rescaling
    S, A = 8, 4
    rng = np.random.default_rng(3)
    msg = jnp.asarray(rng.uniform(0.1, 1, (1, S, A)), dtype=jnp.float32)
    P = jnp.asarray(np.eye(A) * 0.05 + 0.01, dtype=jnp.float32)[None]
    total = jnp.zeros((1,), jnp.float32)
    cur = msg
    for _ in range(40):
        cur, d = merge_messages(cur, msg, P, P)
        total = total + d
    ll = root_log_likelihood(cur, jnp.full((A,), 0.25, jnp.float32), total)
    assert np.isfinite(np.asarray(ll)).all()
    assert float(ll[0]) < -100  # genuinely tiny likelihood, no underflow


def test_leaf_root_loglik_one_hot():
    pi = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    leaf = jnp.asarray(np.eye(4)[[0, 3, 1]])[None]  # (1, 3, 4)
    ll = np.asarray(root_log_likelihood(leaf, pi))
    np.testing.assert_allclose(ll, np.log(0.1) + np.log(0.4) + np.log(0.2),
                               rtol=1e-12)


def test_forest_prior_and_overcounting():
    counts = jnp.asarray([[1, 1, 2, 5, 999]])
    mask = jnp.asarray([[True, True, True, True, False]])
    lp = np.asarray(forest_log_prior(counts, mask))
    want = -(np.log(1.0) + np.log(1.0) + np.log(1.0) + np.log(105.0))
    np.testing.assert_allclose(lp, want, rtol=1e-12)
    # v_minus: 1->0, 1->0, 2->2, 5->5; masked slot ignored
    v = np.asarray(overcounting_correction(counts, mask))
    assert v[0] == 7
