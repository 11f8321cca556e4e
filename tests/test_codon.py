"""Codon alphabet + GY94 model: code tables, encoding, generator
properties, likelihood semantics, end-to-end training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from phylo_tpu.dataio.codons import (
    CODON_AA,
    SENSE_CODONS,
    codon_dataset,
    empirical_codon_frequencies,
    encode_codon_strings,
)
from phylo_tpu.models.codon import GY94, _structure_masks


def test_genetic_code_tables():
    assert len(SENSE_CODONS) == 61
    assert len(set(SENSE_CODONS)) == 61
    assert not any(c in SENSE_CODONS for c in ("TAA", "TAG", "TGA"))
    aa_counts = {}
    for aa in CODON_AA:
        aa_counts[aa] = aa_counts.get(aa, 0) + 1
    # standard-code degeneracies
    assert aa_counts["L"] == 6 and aa_counts["R"] == 6
    assert aa_counts["S"] == 6
    assert aa_counts["M"] == 1 and aa_counts["W"] == 1
    assert "*" not in aa_counts
    assert sum(aa_counts.values()) == 61


def test_structure_masks():
    nb, ts, syn = _structure_masks()
    assert nb.shape == (61, 61)
    # symmetric relations, zero diagonal
    for m in (nb, ts, syn):
        np.testing.assert_array_equal(m, m.T)
        assert np.all(np.diagonal(m) == 0)
    # transitions/synonymy only defined on one-step neighbors
    assert np.all(ts <= nb) and np.all(syn <= nb)
    # each codon has at most 9 one-step neighbors (3 positions x 3
    # alternatives), fewer when a change would create a stop codon
    assert nb.sum(1).max() == 9
    i = SENSE_CODONS.index("TTT")          # Phe
    j = SENSE_CODONS.index("TTC")          # Phe; T<->C is a transition
    assert nb[i, j] == 1 and ts[i, j] == 1 and syn[i, j] == 1
    k = SENSE_CODONS.index("TTA")          # Leu; T<->A transversion
    assert nb[i, k] == 1 and ts[i, k] == 0 and syn[i, k] == 0


def test_encode_codon_strings():
    taxa, g = encode_codon_strings({"a": "TTTTTC", "b": "ATGTGG"})
    assert g.shape == (2, 2, 61)
    assert g[0, 0, SENSE_CODONS.index("TTT")] == 1 and g[0, 0].sum() == 1
    assert g[1, 0, SENSE_CODONS.index("ATG")] == 1
    assert g[1, 1, SENSE_CODONS.index("TGG")] == 1

    # ambiguity: TTY -> {TTT, TTC}; full gap codon -> missing
    _, g2 = encode_codon_strings({"a": "TTY---"})
    row = g2[0, 0]
    assert row.sum() == 2
    assert row[SENSE_CODONS.index("TTT")] == 1
    assert row[SENSE_CODONS.index("TTC")] == 1
    assert g2[0, 1].sum() == 61            # all-ones = missing

    # a pattern consistent only with stops (TAA/TAG -> TAR) is missing
    _, g3 = encode_codon_strings({"a": "TAR"})
    assert g3[0, 0].sum() == 61

    with pytest.raises(ValueError):
        encode_codon_strings({"a": "TTTT"})     # not a multiple of 3


def test_codon_dataset_roundtrip():
    from phylo_tpu.dataio import dataset_from_strings

    ds = dataset_from_strings(
        ["ATGTTTCCC", "ATGTTCCCA"], taxa=["x", "y"], name="toy")
    cds = codon_dataset(ds)
    assert cds.A == 61 and cds.S == 3 and cds.N == 2
    assert cds.genome[0, 0, SENSE_CODONS.index("ATG")] == 1
    f = empirical_codon_frequencies(cds.genome, pseudocount=0.5)
    assert f.shape == (61,) and abs(f.sum() - 1) < 1e-12
    # observed codons outrank unobserved ones
    assert f[SENSE_CODONS.index("ATG")] > f[SENSE_CODONS.index("GGG")]


def test_gy94_generator_properties(rng):
    freqs = rng.uniform(0.5, 2.0, 61)
    model = GY94(freqs / freqs.sum())
    params = model.init_params(jnp.float64)
    Q = np.asarray(model.Q(params), np.float64)
    pi = np.asarray(model.stationary(params), np.float64)

    np.testing.assert_allclose(Q.sum(axis=1), 0, atol=1e-12)
    off = Q - np.diag(np.diagonal(Q))
    assert np.all(off >= 0)
    # reversibility: pi_i q_ij == pi_j q_ji
    np.testing.assert_allclose(pi[:, None] * Q, (pi[:, None] * Q).T,
                               rtol=1e-10, atol=1e-14)
    # unit expected rate
    np.testing.assert_allclose(-np.sum(pi * np.diagonal(Q)), 1.0,
                               rtol=1e-12)
    # stationarity under the transition matrix
    P = np.asarray(model.transition(params, jnp.asarray(0.7)))
    assert P.shape == (61, 61)
    np.testing.assert_allclose(P.sum(axis=0), 1.0, rtol=1e-8)
    np.testing.assert_allclose(P @ pi, pi, rtol=1e-8)

    # omega/kappa actually modulate the right entries
    i, j = SENSE_CODONS.index("TTT"), SENSE_CODONS.index("TTA")  # nonsyn tv
    k = SENSE_CODONS.index("TTC")                                # syn ts
    p2 = dict(params, log_omega=jnp.asarray(np.log(2.0)))
    Q2 = np.asarray(GY94(freqs / freqs.sum()).Q(p2))
    assert Q2[i, j] > Q[i, j]              # nonsynonymous scaled up
    # synonymous entries are untouched pre-normalization, so raising
    # omega (more total rate) strictly SHRINKS them post-normalization
    assert Q2[i, k] < Q[i, k]
    # and the nonsyn/syn ratio doubles exactly with omega 0.2 -> 2.0
    np.testing.assert_allclose((Q2[i, j] / Q2[i, k]) /
                               (Q[i, j] / Q[i, k]), 10.0, rtol=1e-10)


def test_gy94_two_taxon_likelihood_matches_direct():
    """Fixed-tree likelihood of two codon sequences == the direct
    sum_root pi_r P(b1)_{r,x} P(b2)_{r,y} computation."""
    from phylo_tpu.pruning.fixed_tree import tree_log_likelihood

    rng = np.random.default_rng(3)
    freqs = rng.uniform(0.5, 2.0, 61)
    model = GY94(freqs / freqs.sum())
    params = {"model": model.init_params(jnp.float64)}
    S = 7
    x = rng.integers(0, 61, S)
    y = rng.integers(0, 61, S)
    leaves = jnp.asarray(np.stack([np.eye(61)[x], np.eye(61)[y]]))
    b1, b2 = 0.3, 0.9
    rec = {"merges": np.array([[0, 1]], np.int32),
           "branches": np.array([[b1, b2]])}
    got = float(tree_log_likelihood(leaves, model, params, rec))

    # direct: transition() returns expm(Q^T b) so P(b).T is the
    # textbook row-stochastic matrix
    Q = np.asarray(model.Q(params["model"]), np.float64)
    import scipy.linalg

    P1 = scipy.linalg.expm(Q * b1)
    P2 = scipy.linalg.expm(Q * b2)
    pi = np.asarray(model.stationary(params["model"]))
    want = sum(
        np.log(np.sum(pi * P1[:, x[s]] * P2[:, y[s]]))
        for s in range(S)
    )
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_gy94_sweep_end_to_end(rng):
    """Tiny VCSMC sweep on codon data: finite ELBO, nonzero
    kappa/omega gradients; +f spec learns frequencies."""
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import get_model
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

    model = get_model("gy94+f", A=61)
    assert isinstance(model, GY94) and model.plus_f
    N, S = 4, 6
    g = np.eye(61)[rng.integers(0, 61, (N, S))]
    leaves = jnp.asarray(g)
    params = {"model": model.init_params(jnp.float64),
              "branches": init_branch_params(N, dtype=jnp.float64)}

    def loss(p):
        return -sample_phylogenies(
            jax.random.PRNGKey(0), leaves, model, p, SweepConfig(K=4)
        ).elbo

    v, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(v))
    gm = grads["model"]
    assert float(jnp.abs(gm["log_kappa"])) > 0
    assert float(jnp.abs(gm["log_omega"])) > 0
    assert float(jnp.sum(jnp.abs(gm["y_station"]))) > 0


def test_gy94_omega_recovery():
    """Simulate codon data under a known omega on a fixed tree, then
    ML-fit kappa/omega by gradient ascent on the fixed-tree likelihood:
    the dN/dS estimate must land near the truth (the workhorse
    positive-selection inference this model family exists for)."""
    import optax

    from phylo_tpu.dataio.simulate import simulate_on_tree
    from phylo_tpu.pruning.fixed_tree import (
        parse_newick,
        tree_log_likelihood,
    )

    true_kappa, true_omega = 3.0, 0.15
    nwk = ("((A:0.25,B:0.25):0.15,(C:0.25,D:0.25):0.15);")
    taxa, rec = parse_newick(nwk)
    rng = np.random.default_rng(5)
    freqs = rng.uniform(0.5, 2.0, 61)
    model = GY94(freqs / freqs.sum(), kappa=true_kappa,
                 omega=true_omega)
    true_params = {"model": model.init_params(jnp.float64)}
    ds = simulate_on_tree(rec, model, true_params, 600, seed=17,
                          taxa=taxa)
    leaves = jnp.asarray(ds.genome, jnp.float64)

    # fit from a deliberately wrong start (kappa=1, omega=1)
    fit_model = GY94(freqs / freqs.sum(), kappa=1.0, omega=1.0)
    p0 = fit_model.init_params(jnp.float64)

    def loss(mp):
        return -tree_log_likelihood(leaves, fit_model,
                                    {"model": mp}, rec)

    opt = optax.adam(0.05)

    @jax.jit
    def step(mp, state):
        g = jax.grad(loss)(mp)
        up, state = opt.update(g, state)
        return optax.apply_updates(mp, up), state

    state = opt.init(p0)
    mp = p0
    for _ in range(150):
        mp, state = step(mp, state)
    kappa_hat = float(jnp.exp(mp["log_kappa"]))
    omega_hat = float(jnp.exp(mp["log_omega"]))
    # 600 codon sites on 4 taxa: expect rough but unambiguous recovery
    assert 0.08 < omega_hat < 0.30, omega_hat
    assert 1.8 < kappa_hat < 5.0, kappa_hat
    # and the fit beats the wrong-start likelihood decisively
    assert float(loss(mp)) < float(loss(p0)) - 50.0


def test_gy94_spectral_matches_uniformized(rng):
    """The default spectral transition (one eigh + one matmul) equals
    the uniformized chain to float64 precision, including gradients
    through kappa/omega/pi."""
    freqs = rng.uniform(0.5, 2.0, 61)
    spec = GY94(freqs / freqs.sum(), spectral=True, plus_f=True)
    unif = GY94(freqs / freqs.sum(), spectral=False, plus_f=True)
    p = spec.init_params(jnp.float64)
    b = jnp.asarray(rng.exponential(0.3, 32))

    P_s = np.asarray(spec.transition(p, b))
    P_u = np.asarray(unif.transition(p, b))
    np.testing.assert_allclose(P_s, P_u, rtol=1e-8, atol=1e-12)

    def loss(model, mp):
        return jnp.sum(model.transition(mp, b) ** 2)

    g_s = jax.grad(lambda mp: loss(spec, mp))(p)
    g_u = jax.grad(lambda mp: loss(unif, mp))(p)
    for k in g_s:
        np.testing.assert_allclose(np.asarray(g_s[k]),
                                   np.asarray(g_u[k]),
                                   rtol=1e-6, atol=1e-10, err_msg=k)
