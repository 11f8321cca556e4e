"""Codon substitution models (GY94 / Goldman-Yang 1994 family).

State space: the 61 sense codons (dataio/codons.py).  The generator
couples codons differing at exactly ONE nucleotide position:

    q_ij = 0                                (>= 2 differences)
    q_ij = pi_j                             (transversion, synonymous)
    q_ij = kappa * pi_j                     (transition,   synonymous)
    q_ij = omega * pi_j                     (transversion, nonsynonymous)
    q_ij = kappa * omega * pi_j             (transition,   nonsynonymous)

with kappa the transition/transversion ratio and omega = dN/dS the
selection parameter -- the workhorse model for detecting positive
selection.  Both are learnable (log-parameterized); pi is either fixed
empirical (F61 counts from the alignment) or learnable (+F-style).
The chain is reversible (pi_i q_ij = pi_j q_ji by construction), and
Q is normalized to unit expected substitution rate, so branch lengths
are in expected substitutions per codon.

The reference framework is DNA-only (vcsmc.py:118-148); this extends
the model zoo the same way GTR/HKY/EmpiricalProtein do.  The one-step
neighbor structure, transition/transversion classification, and
synonymy table are static numpy constants, so Q assembly is a handful
of fused elementwise ops on (61, 61) masks -- XLA-friendly, no
data-dependent control flow; expm goes through the same uniformized
chain as every other model (einsum precision='highest' at A=61).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from phylo_tpu.dataio.codons import CODON_AA, SENSE_CODONS
from phylo_tpu.models.expm import expm_ctmc, expm_reversible
from phylo_tpu.models.substitution import _Model

_TRANSITIONS = {frozenset("AG"), frozenset("CT")}


@functools.lru_cache(maxsize=1)
def _structure_masks():
    """Static (61, 61) masks: one-nucleotide neighbors, transition vs
    transversion at the differing position, synonymous vs not.

    Module-level cached (NOT instance attributes): `_Model.__eq__` /
    `__hash__` compare instance __dict__s, which ndarrays would
    break."""
    A = len(SENSE_CODONS)
    neighbor = np.zeros((A, A))
    is_transition = np.zeros((A, A))
    is_synonymous = np.zeros((A, A))
    for i, ci in enumerate(SENSE_CODONS):
        for j, cj in enumerate(SENSE_CODONS):
            if i == j:
                continue
            diffs = [p for p in range(3) if ci[p] != cj[p]]
            if len(diffs) != 1:
                continue
            (p,) = diffs
            neighbor[i, j] = 1.0
            if frozenset((ci[p], cj[p])) in _TRANSITIONS:
                is_transition[i, j] = 1.0
            if CODON_AA[i] == CODON_AA[j]:
                is_synonymous[i, j] = 1.0
    return neighbor, is_transition, is_synonymous


class GY94(_Model):
    """Goldman-Yang codon model with learnable kappa and omega.

    frequencies: fixed (61,) stationary codon frequencies (e.g.
    `dataio.codons.empirical_codon_frequencies` of the alignment);
    None = uniform.  plus_f=True makes pi learnable instead
    (initialized at `frequencies`).
    """

    A = 61

    def __init__(self, frequencies=None, *, plus_f=False,
                 kappa=2.0, omega=0.2, normalize=True, spectral=True):
        if frequencies is None:
            frequencies = np.full((self.A,), 1.0 / self.A)
        freqs = np.asarray(frequencies, np.float64)
        if freqs.shape != (self.A,):
            raise ValueError(
                f"need {self.A} codon frequencies, got {freqs.shape}")
        if np.any(freqs <= 0):
            raise ValueError("codon frequencies must be positive "
                             "(use a pseudocount)")
        self._freqs = tuple(freqs / freqs.sum())
        self.plus_f = bool(plus_f)
        self._init_kappa = float(kappa)
        self._init_omega = float(omega)
        self.normalize = bool(normalize)
        self.spectral = bool(spectral)

    def init_params(self, dtype=jnp.float32):
        p = {
            "log_kappa": jnp.asarray(np.log(self._init_kappa), dtype),
            "log_omega": jnp.asarray(np.log(self._init_omega), dtype),
        }
        if self.plus_f:
            p["y_station"] = jnp.asarray(
                np.log(np.asarray(self._freqs)), dtype)
        return p

    def stationary(self, params):
        if self.plus_f:
            e = jnp.exp(params["y_station"])
            return e / jnp.sum(e)
        return jnp.asarray(self._freqs)

    def Q(self, params):
        dtype = jnp.result_type(params["log_kappa"].dtype, jnp.float32)
        pi = self.stationary(params).astype(dtype)
        kappa = jnp.exp(params["log_kappa"]).astype(dtype)
        omega = jnp.exp(params["log_omega"]).astype(dtype)
        nb_np, ts_np, syn_np = _structure_masks()
        nb = jnp.asarray(nb_np, dtype)
        ts = jnp.asarray(ts_np, dtype)
        syn = jnp.asarray(syn_np, dtype)
        # kappa on transitions, omega on nonsynonymous changes
        rate = nb * jnp.where(ts > 0, kappa, 1.0) \
                  * jnp.where(syn > 0, 1.0, omega)
        q = rate * pi[None, :]
        q = q - jnp.diag(jnp.sum(q, axis=1))
        if self.normalize:
            mean_rate = -jnp.sum(pi * jnp.diagonal(q))
            q = q / jnp.maximum(mean_rate, 1e-30)
        return q

    def transition(self, params, b):
        # merge orientation: same convention as GTR (textbook Q with
        # pi_j columns; the sweep contracts `message @ P`).  GY94 is
        # reversible by construction, so the default path is the
        # spectral one-matmul form (expm_reversible) -- the 23-matmul
        # uniformized chain was 51% of the codon train step
        # (ROADMAP r5 item 1); spectral=False keeps it for A/B.
        if self.spectral:
            return expm_reversible(self.Q(params),
                                   self.stationary(params), b)
        return expm_ctmc(self.Q(params).T, b)
