"""Empirical amino-acid substitution models (LG / WAG / JTT class).

An empirical protein model is a fixed symmetric exchangeability matrix
plus stationary frequencies, estimated once from large curated
alignment collections and published as PAML ``.dat`` files (lower
triangle of the 20x20 exchangeabilities, then 20 frequencies, in PAML's
amino-acid order ``ARNDCQEGHILKMFPSTWYV``).  This module ships the
MECHANISM -- a PAML parser and the ``EmpiricalProtein`` model class --
and deliberately does NOT embed any published matrix: the constants are
190+20 published decimals per model, and shipping silently-misremembered
values would be worse than requiring the user's own ``lg.dat``.

Use::

    model = EmpiricalProtein.from_paml("lg.dat")            # fixed pi
    model = EmpiricalProtein.from_paml("lg.dat", plus_f=True)  # +F: learn pi

The model is A-generic plumbing-wise (stationary enters the root reduce,
transitions the merge), so it composes with GammaSites / FreeRates /
invariant sites like any other base model (LG+G4+I etc.).

The reference framework is DNA-only (vcsmc.py:118-148); this is an
extension in the same family as the protein alphabet support in
``dataio/alphabets.py``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from phylo_tpu.dataio.alphabets import PROTEIN_ALPHABET
from phylo_tpu.models.expm import expm_ctmc, expm_reversible
from phylo_tpu.models.substitution import _Model

# PAML's canonical amino-acid ordering for .dat matrices
PAML_ORDER = "ARNDCQEGHILKMFPSTWYV"

_N_AA = 20
_N_EXCH = _N_AA * (_N_AA - 1) // 2       # 190 lower-triangle entries


def load_paml_dat(source):
    """Parse a PAML ``.dat`` empirical rate file.

    ``source`` is a path or the file's text.  Format: the strict lower
    triangle of the symmetric exchangeability matrix (19 rows, row i
    holding i entries), followed by 20 stationary frequencies --
    whitespace/newline separated, in PAML's ``ARNDCQEGHILKMFPSTWYV``
    order.  Trailing commentary (every published .dat carries notes) is
    ignored: exactly the first 210 numeric tokens are consumed.

    Returns ``(exch, freqs)`` as float64 arrays REORDERED to this
    package's alphabetical ``PROTEIN_ALPHABET`` so they line up with
    ``dataio``'s one-hot encoding; ``exch`` is symmetric (20, 20) with a
    zero diagonal, ``freqs`` sums to 1.
    """
    import os

    text = source
    if "\n" not in str(source) and len(str(source)) < 4096:
        if not os.path.exists(source):
            raise FileNotFoundError(
                f"PAML .dat file not found: {source!r} (pass a path or "
                "the file's text)"
            )
        with open(source) as f:
            text = f.read()

    values = []
    for tok in str(text).split():
        try:
            values.append(float(tok))
        except ValueError:
            # first non-numeric token ends the numeric block only if we
            # already have the full matrix+freqs; PAML files put notes
            # after the numbers
            if len(values) >= _N_EXCH + _N_AA:
                break
            raise ValueError(
                f"non-numeric token {tok!r} after {len(values)} values; "
                f"need {_N_EXCH} exchangeabilities + {_N_AA} frequencies"
            )
    if len(values) < _N_EXCH + _N_AA:
        raise ValueError(
            f"PAML .dat holds {len(values)} numbers; need at least "
            f"{_N_EXCH} exchangeabilities + {_N_AA} frequencies"
        )

    exch_paml = np.zeros((_N_AA, _N_AA))
    k = 0
    for i in range(1, _N_AA):
        for j in range(i):
            exch_paml[i, j] = exch_paml[j, i] = values[k]
            k += 1
    freqs_paml = np.asarray(values[k:k + _N_AA])

    perm = np.asarray([PAML_ORDER.index(a) for a in PROTEIN_ALPHABET])
    exch = exch_paml[np.ix_(perm, perm)]
    freqs = freqs_paml[perm]
    total = freqs.sum()
    if not (0.9 < total < 1.1):
        raise ValueError(
            f"frequencies sum to {total:.4f}; not a PAML frequency row"
        )
    return exch, freqs / total


class EmpiricalProtein(_Model):
    """Fixed-exchangeability reversible model: Q_ij = s_ij * pi_j
    (i != j), diagonal = -row sum, normalized to unit expected
    substitution rate.  ``plus_f=True`` makes the stationary frequencies
    learnable (softmax, initialized at the supplied frequencies) -- the
    standard +F variant; otherwise the model has no free parameters.

    Transitions are returned in MERGE orientation (``expm(Q^T b)``; see
    models.substitution's module docstring) so pruning computes the
    textbook time-reversible likelihood.
    """

    def __init__(self, exch, freqs, *, name="custom", plus_f=False,
                 normalize=True, spectral=True):
        exch = np.asarray(exch, dtype=float)
        freqs = np.asarray(freqs, dtype=float)
        A = exch.shape[0]
        if exch.shape != (A, A) or freqs.shape != (A,):
            raise ValueError(
                f"exch {exch.shape} / freqs {freqs.shape} mismatch"
            )
        if not np.allclose(exch, exch.T):
            raise ValueError("exchangeability matrix must be symmetric")
        # tuples for hashability (models are jit static args)
        self._exch = tuple(map(tuple, exch))
        self._freqs = tuple(freqs / freqs.sum())
        self.A = A
        self.name = str(name)
        self.plus_f = bool(plus_f)
        self.normalize = bool(normalize)
        # reversible-by-construction: the spectral transition (one
        # eigh + one batched matmul) replaces the 23-matmul
        # uniformized chain -- the A=61 GY94 A/B measured 3.9x on the
        # codon train step with BETTER f32 accuracy (2.5e-6 vs 3.3e-6
        # vs scipy); same structure here at A=20.  Caveat: with
        # plus_f=True gradients flow through eigh's VJP, which divides
        # by eigenvalue gaps -- a (near-)degenerate spectrum (unusual
        # for published matrices, but reachable when a learnable pi
        # wanders) yields exploding gradients; pass spectral=False to
        # keep the uniformized chain in that case.  With fixed pi the
        # decomposition is a constant and no eigh gradient exists.
        self.spectral = bool(spectral)

    @classmethod
    def from_paml(cls, source, *, name=None, plus_f=False,
                  normalize=True):
        exch, freqs = load_paml_dat(source)
        if name is None:
            import os

            name = (os.path.splitext(os.path.basename(str(source)))[0]
                    if "\n" not in str(source) else "custom")
        return cls(exch, freqs, name=name, plus_f=plus_f,
                   normalize=normalize)

    def init_params(self, dtype=jnp.float32):
        if not self.plus_f:
            return {}
        logp = jnp.log(jnp.asarray(self._freqs, dtype=dtype))
        return {"y_station": logp - jnp.mean(logp)}

    def stationary(self, params):
        if not self.plus_f:
            return jnp.asarray(self._freqs)
        e = jnp.exp(params["y_station"])
        return e / jnp.sum(e)

    def Q(self, params):
        pi = self.stationary(params)
        s = jnp.asarray(self._exch, dtype=pi.dtype)
        q = s * pi[None, :]
        q = q - jnp.diag(jnp.sum(q, axis=1))
        if self.normalize:
            rate = -jnp.sum(pi * jnp.diagonal(q))
            q = q / jnp.maximum(rate, 1e-30)
        return q

    def transition(self, params, b):
        if self.spectral:
            return expm_reversible(self.Q(params),
                                   self.stationary(params), b)
        return expm_ctmc(self.Q(params).T, b)
