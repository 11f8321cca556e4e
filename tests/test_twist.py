"""VNCSMC twisting: golden parity vs the nested-SMC oracle, plus
sampled-path sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import JC69, ReferenceQ
from phylo_tpu.oracle.reference_vncsmc import OracleVNCSMC
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies
from phylo_tpu.smc.twist import TwistConfig, upper_tri_pairs

STRINGS = ["ACTTTGAGAG", "ACTTTGACAG", "ACTTTGACTG", "ACTTTGACTC",
           "ACTTCGACTG"]


def make_twist_decisions(rng, N, K, M, rates_l, rates_r):
    R = N - 1
    P = len(upper_tri_pairs(N))
    dec = dict(
        ancestors=jnp.asarray(rng.integers(0, K, size=(R, K)),
                              dtype=jnp.int32),
        twist_pool_l=jnp.asarray(
            rng.exponential(1.0, size=(R, P, M, K))
            / np.asarray(rates_l)[:, None, None, None]
        ),
        twist_pool_r=jnp.asarray(
            rng.exponential(1.0, size=(R, P, M, K))
            / np.asarray(rates_r)[:, None, None, None]
        ),
    )
    # choices must land on VALID pairs: pair p valid at rank r iff
    # pairs[p][1] < N - r
    pairs = upper_tri_pairs(N)
    choice = np.zeros((R, K), dtype=np.int32)
    for r in range(R):
        valid = [p for p in range(P) if pairs[p, 1] < N - r]
        pick_p = rng.choice(valid, size=K)
        pick_m = rng.integers(0, M, size=K)
        choice[r] = pick_p * M + pick_m
    dec["twist_choice"] = jnp.asarray(choice)
    # unused by the twist path but the scan maps over the dict uniformly
    dec["pairs"] = jnp.zeros((R, K, 2), dtype=jnp.int32)
    dec["branches_l"] = jnp.zeros((R, K))
    dec["branches_r"] = jnp.zeros((R, K))
    return dec


def test_twist_parity_vs_oracle():
    ds = dataset_from_strings(STRINGS)
    N, K, M = ds.N, 4, 3
    model = ReferenceQ(A=4)
    rng = np.random.default_rng(0)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    params["branches"]["log_rates_l"] = params["branches"][
        "log_rates_l"] + jnp.asarray(rng.normal(0, 0.2, N - 1))
    rates_l = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    rates_r = np.exp(np.asarray(params["branches"]["log_rates_r"]))

    dec = make_twist_decisions(rng, N, K, M, rates_l, rates_r)
    config = SweepConfig(K=K, twist=TwistConfig(M=M, pair_chunk=4))
    leaves = jnp.asarray(ds.genome, dtype=jnp.float64)
    got = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config,
        decisions=dec,
    )

    oracle = OracleVNCSMC(
        ds.genome,
        np.asarray(model.Q(params["model"])),
        np.asarray(model.stationary(params["model"])),
        rates_l, rates_r, K, M=M,
    )
    want = oracle.run(jax.tree.map(np.asarray, dec))
    np.testing.assert_allclose(
        np.asarray(got.log_weights), want["log_weights"], rtol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(got.log_likelihood), want["log_likelihood"], rtol=1e-8
    )
    np.testing.assert_allclose(float(got.elbo), want["elbo"], rtol=1e-8)


def test_twist_parity_chunked_scale():
    """Golden parity where pair-axis chunking actually kicks in
    (VERDICT round-1 weak item 6): N=9 gives P=C(9,2)=36 static pairs;
    pair_chunk=10 forces 4 lax.map chunks including a padded tail
    (P_pad=40), and ranks shrink n_active through several chunk
    boundaries.  M=4 exercises the subsample-recovery idx//M, idx%M
    arithmetic beyond the toy M."""
    from phylo_tpu.dataio import simulate_dna

    ds = simulate_dna(9, 17, seed=7)
    N, K, M = ds.N, 5, 4
    model = ReferenceQ(A=4)
    rng = np.random.default_rng(42)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(N, dtype=jnp.float64),
    }
    params["branches"]["log_rates_l"] = params["branches"][
        "log_rates_l"] + jnp.asarray(rng.normal(0, 0.3, N - 1))
    params["branches"]["log_rates_r"] = params["branches"][
        "log_rates_r"] + jnp.asarray(rng.normal(0, 0.3, N - 1))
    rates_l = np.exp(np.asarray(params["branches"]["log_rates_l"]))
    rates_r = np.exp(np.asarray(params["branches"]["log_rates_r"]))

    dec = make_twist_decisions(rng, N, K, M, rates_l, rates_r)
    config = SweepConfig(K=K, twist=TwistConfig(M=M, pair_chunk=10))
    assert len(upper_tri_pairs(N)) == 36       # 4 chunks, padded tail
    leaves = jnp.asarray(ds.genome, dtype=jnp.float64)
    got = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config,
        decisions=dec,
    )

    oracle = OracleVNCSMC(
        ds.genome,
        np.asarray(model.Q(params["model"])),
        np.asarray(model.stationary(params["model"])),
        rates_l, rates_r, K, M=M,
    )
    want = oracle.run(jax.tree.map(np.asarray, dec))
    np.testing.assert_allclose(
        np.asarray(got.log_weights), want["log_weights"], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(got.log_likelihood), want["log_likelihood"],
        rtol=1e-9,
    )
    np.testing.assert_allclose(float(got.elbo), want["elbo"], rtol=1e-9)

    # chunking must be a pure implementation detail: a different chunk
    # size yields bit-comparable results under the same decisions
    config2 = SweepConfig(K=K, twist=TwistConfig(M=M, pair_chunk=36))
    got2 = sample_phylogenies(
        jax.random.PRNGKey(0), leaves, model, params, config2,
        decisions=dec,
    )
    np.testing.assert_allclose(
        np.asarray(got.log_weights), np.asarray(got2.log_weights),
        rtol=1e-12,
    )


def test_twist_sampled_path_runs_and_jits():
    ds = dataset_from_strings(STRINGS)
    model = JC69(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    config = SweepConfig(K=6, twist=TwistConfig(M=2, pair_chunk=4))
    leaves = jnp.asarray(ds.genome, dtype=jnp.float64)

    @jax.jit
    def run(key):
        return sample_phylogenies(key, leaves, model, params, config)

    res = run(jax.random.PRNGKey(1))
    assert np.isfinite(float(res.elbo))
    assert np.isfinite(np.asarray(res.log_weights)).all()
    # chosen pairs must always be active: merged node ids valid
    merged = np.asarray(res.merged_nodes)
    assert (merged >= 0).all() and (merged < 2 * ds.N - 1).all()


def test_unrolled_matches_scanned_distribution():
    """Unrolled-rank mode (TwistConfig.unroll_max_ranks) enumerates
    pairs in PREFIX order, so the same key draws a different (equally
    valid) trajectory than the scanned path -- but the proposal LAW
    over (pair, subsample) is identical (the categorical is
    order-invariant).  Check the two paths' mean ELBO over seeds agrees
    within 3 combined standard errors."""
    ds = dataset_from_strings(STRINGS)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(ds.genome, dtype=jnp.float64)
    cfg_u = SweepConfig(K=8, twist=TwistConfig(M=2))
    cfg_s = SweepConfig(K=8, twist=TwistConfig(M=2, unroll_max_ranks=0))

    @jax.jit
    def elbo_pair(key):
        return (
            sample_phylogenies(key, leaves, model, params, cfg_u).elbo,
            sample_phylogenies(key, leaves, model, params, cfg_s).elbo,
        )

    keys = jax.random.split(jax.random.PRNGKey(0), 48)
    pairs = [elbo_pair(k) for k in keys]
    eu = np.array([float(a) for a, _ in pairs])
    es = np.array([float(b) for _, b in pairs])
    se = np.sqrt(eu.var(ddof=1) / len(eu) + es.var(ddof=1) / len(es))
    assert abs(eu.mean() - es.mean()) <= 3.0 * se


def test_chunked_unrolled_bit_matches_plain_unrolled():
    """TwistConfig.unroll_chunked_max_ranks: over-budget ranks evaluate
    their statically truncated pair table in static chunks.  Chunking
    only re-partitions the evaluation -- pools, prefix order, and the
    categorical's logit order are unchanged -- so the same key must
    yield the IDENTICAL trajectory, ELBO, and gradients as the plain
    (single-batch) unrolled mode."""
    ds = dataset_from_strings(STRINGS)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    leaves = jnp.asarray(ds.genome, dtype=jnp.float64)
    cfg_plain = SweepConfig(K=8, twist=TwistConfig(M=2))
    # budget 0 forces every rank over budget; chunk_budget_mb=0 makes
    # resolve_chunk pick single-pair chunks (maximal partitioning)
    cfg_chunk = SweepConfig(
        K=8,
        twist=TwistConfig(M=2, unroll_budget_mb=0, chunk_budget_mb=0,
                          unroll_chunked_max_ranks=16),
    )
    key = jax.random.PRNGKey(5)

    def run(cfg):
        return sample_phylogenies(key, leaves, model, params, cfg)

    res_p, res_c = run(cfg_plain), run(cfg_chunk)
    np.testing.assert_array_equal(np.asarray(res_p.merged_nodes),
                                  np.asarray(res_c.merged_nodes))
    np.testing.assert_allclose(float(res_p.elbo), float(res_c.elbo),
                               rtol=1e-12)

    def loss(p, cfg):
        return -sample_phylogenies(key, leaves, model, p, cfg).elbo

    g_p = jax.grad(loss)(params, cfg_plain)
    g_c = jax.grad(loss)(params, cfg_chunk)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_twist_gradients_flow():
    ds = dataset_from_strings(STRINGS)
    model = ReferenceQ(A=4)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    config = SweepConfig(K=4, twist=TwistConfig(M=2, pair_chunk=4))
    leaves = jnp.asarray(ds.genome, dtype=jnp.float64)

    def loss(p):
        return -sample_phylogenies(
            jax.random.PRNGKey(2), leaves, model, p, config
        ).elbo

    from jax.flatten_util import ravel_pytree

    g = jax.grad(loss)(params)
    flat, _ = ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).max()) > 0
