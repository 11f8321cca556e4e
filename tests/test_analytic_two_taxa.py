"""Analytic oracle: for two taxa there is exactly one topology, and the
data likelihood has the closed form

    P(Y | b_l, b_r) = prod_s sum_a pi_a P(b_l)[a, y1_s] P(b_r)[a, y2_s]

(JC69: P(b)[a,c] = e^{-b} 1{a=c} + (1-e^{-b})/4).  The sweep's de-biased
log_likelihood_R must equal this by-hand value exactly (SURVEY.md
section 4's "2-3 taxon likelihoods computed by hand")."""

import jax
import jax.numpy as jnp
import numpy as np

from phylo_tpu.dataio import dataset_from_strings
from phylo_tpu.models.branches import init_branch_params
from phylo_tpu.models.substitution import JC69
from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies


def test_two_taxon_likelihood_by_hand():
    ds = dataset_from_strings(["ACGTAC", "ACGTTT"])
    b_l, b_r = 0.3, 0.7
    K = 1

    dec = dict(
        ancestors=jnp.zeros((1, K), jnp.int32),
        pairs=jnp.zeros((1, K, 2), jnp.int32).at[0, 0].set(
            jnp.asarray([0, 1], jnp.int32)
        ),
        branches_l=jnp.full((1, K), b_l),
        branches_r=jnp.full((1, K), b_r),
    )
    model = JC69(A=4)
    params = {
        "model": {},
        "branches": init_branch_params(2, dtype=jnp.float64),
    }
    res = sample_phylogenies(
        jax.random.PRNGKey(0), jnp.asarray(ds.genome), model, params,
        SweepConfig(K=K), decisions=dec,
    )

    # by hand
    def P(b):
        return np.exp(-b) * np.eye(4) + (1 - np.exp(-b)) / 4

    y1, y2 = np.asarray(ds.genome[0]), np.asarray(ds.genome[1])
    Pl, Pr = P(b_l), P(b_r)
    want = 0.0
    for s in range(6):
        lik_s = 0.0
        for a in range(4):
            lik_s += 0.25 * (Pl[a] @ y1[s]) * (Pr[a] @ y2[s])
        want += np.log(lik_s)

    np.testing.assert_allclose(
        float(res.log_likelihood_R[0]), want, rtol=1e-12
    )

    # matched sites agree more often than mismatched ones: sanity that
    # the likelihood actually responds to the data
    ds2 = dataset_from_strings(["ACGTAC", "ACGTAC"])
    res2 = sample_phylogenies(
        jax.random.PRNGKey(0), jnp.asarray(ds2.genome), model, params,
        SweepConfig(K=K), decisions=dec,
    )
    assert float(res2.log_likelihood_R[0]) > float(
        res.log_likelihood_R[0]
    )
