"""Substitution models as stateless objects over parameter pytrees.

Three models:

* ``JC69`` -- fixed Jukes-Cantor generator, closed-form transitions
  (reference vcsmc.py:125-130 builds the same Q and uses generic expm;
  we skip the expm entirely).
* ``ReferenceQ`` -- the reference's learned parameterization
  (vcsmc.py:122-124,133-148): a free A x A variable whose off-diagonal is
  row-softmax-normalized (rows of off-diagonal sum to 1, diagonal -1) plus
  a softmax stationary distribution.  This is NOT textbook GTR; we keep it
  bit-for-bit for parity.
* ``GTR`` -- textbook general time-reversible extension
  (exchangeabilities x stationary), not present in the reference.

Model objects are stateless and hashable (safe as jit static args);
parameters live in plain dicts of jnp arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from phylo_tpu.models.expm import expm_ctmc, jc69_transition


class _Model:
    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items()))))


class JC69(_Model):
    """Jukes-Cantor: off-diagonal 1/A, diagonal -(A-1)/A, uniform
    stationary distribution.  No learnable parameters."""

    def __init__(self, A=4):
        self.A = A

    def init_params(self, dtype=jnp.float32):
        return {}

    def Q(self, params):
        A = self.A
        return jnp.full((A, A), 1.0 / A) - jnp.eye(A)

    def stationary(self, params):
        return jnp.full((self.A,), 1.0 / self.A)

    def transition(self, params, b):
        return jc69_transition(b, self.A)


class ReferenceQ(_Model):
    """The reference's learned rate matrix + stationary distribution.

    Parameters:
      y_q       (A, A): free matrix; only off-diagonal entries matter.
      y_station (A,)  : stationary logits.

    Q construction (reference vcsmc.py:138-148): off-diagonal
    exp(y_q) normalized so each row's off-diagonal sums to 1; diagonal is
    minus the row sum (= -1 exactly).  Initialization matches
    vcsmc.py:122-124: y_q = 1/A everywhere with zero diagonal,
    y_station = 1/A.
    """

    def __init__(self, A=4):
        self.A = A

    def init_params(self, dtype=jnp.float32):
        A = self.A
        y_q = jnp.full((A, A), 1.0 / A, dtype=dtype) * (1 - jnp.eye(A, dtype=dtype))
        y_station = jnp.full((A,), 1.0 / A, dtype=dtype)
        return {"y_q": y_q, "y_station": y_station}

    def Q(self, params):
        A = self.A
        off = jnp.exp(params["y_q"]) * (1.0 - jnp.eye(A, dtype=params["y_q"].dtype))
        off = off / jnp.sum(off, axis=1, keepdims=True)
        return off - jnp.diag(jnp.sum(off, axis=1))

    def stationary(self, params):
        e = jnp.exp(params["y_station"])
        return e / jnp.sum(e)

    def transition(self, params, b):
        return expm_ctmc(self.Q(params), b)


class GTR(_Model):
    """Textbook GTR: Q_ij = s_ij * pi_j (i != j), diagonal = -row sum,
    with exchangeabilities s parameterized in log space and stationary
    probabilities via softmax.  Optionally normalized to unit expected
    substitution rate (`normalize=True`)."""

    def __init__(self, A=4, normalize=True):
        self.A = A
        self.normalize = normalize

    def n_exch(self):
        return self.A * (self.A - 1) // 2

    def init_params(self, dtype=jnp.float32):
        return {
            "log_exch": jnp.zeros((self.n_exch(),), dtype=dtype),
            "y_station": jnp.zeros((self.A,), dtype=dtype),
        }

    def _exch_matrix(self, log_exch):
        A = self.A
        iu = jnp.triu_indices(A, k=1)
        s = jnp.zeros((A, A), dtype=log_exch.dtype)
        s = s.at[iu].set(jnp.exp(log_exch))
        return s + s.T

    def Q(self, params):
        pi = self.stationary(params)
        s = self._exch_matrix(params["log_exch"])
        q = s * pi[None, :]
        q = q - jnp.diag(jnp.sum(q, axis=1))
        if self.normalize:
            rate = -jnp.sum(pi * jnp.diagonal(q))
            q = q / jnp.maximum(rate, 1e-30)
        return q

    def stationary(self, params):
        e = jnp.exp(params["y_station"])
        return e / jnp.sum(e)

    def transition(self, params, b):
        return expm_ctmc(self.Q(params), b)


class HKY(_Model):
    """HKY85: one transition/transversion rate ratio kappa plus a learned
    stationary distribution (A=4 nucleotides in ACGT order: transitions
    are A<->G and C<->T).  Q_ij = kappa * pi_j for transitions,
    pi_j for transversions, diagonal = -row sum; optionally normalized to
    unit expected substitution rate.  Not present in the reference
    (which has only JC69 and its learned row-normalized Q,
    vcsmc.py:119-148); a standard family between the two.
    """

    def __init__(self, A=4, normalize=True):
        if A != 4:
            raise ValueError("HKY85 is defined for the A=4 DNA alphabet")
        self.A = 4
        self.normalize = normalize

    def init_params(self, dtype=jnp.float32):
        return {
            "log_kappa": jnp.zeros((), dtype=dtype),
            "y_station": jnp.zeros((self.A,), dtype=dtype),
        }

    _TRANSITION_MASK = (
        (0, 0, 1, 0),   # A<->G
        (0, 0, 0, 1),   # C<->T
        (1, 0, 0, 0),
        (0, 1, 0, 0),
    )

    def Q(self, params):
        pi = self.stationary(params)
        kappa = jnp.exp(params["log_kappa"])
        mask = jnp.asarray(self._TRANSITION_MASK,
                           dtype=params["y_station"].dtype)
        off = jnp.where(mask == 1.0, kappa, 1.0) * pi[None, :]
        off = off * (1.0 - jnp.eye(4, dtype=off.dtype))
        q = off - jnp.diag(jnp.sum(off, axis=1))
        if self.normalize:
            rate = -jnp.sum(pi * jnp.diagonal(q))
            q = q / jnp.maximum(rate, 1e-30)
        return q

    def stationary(self, params):
        e = jnp.exp(params["y_station"])
        return e / jnp.sum(e)

    def transition(self, params, b):
        return expm_ctmc(self.Q(params), b)


class FixedQ(_Model):
    """A fixed, user-supplied rate matrix with uniform (or supplied)
    stationary probabilities -- the non-variational CSMC oracle's setup
    (reference csmc.py:141-150 hardcodes 4x4 and 6x6 generators)."""

    def __init__(self, Q, stationary=None):
        import numpy as _np

        self._Q = tuple(map(tuple, _np.asarray(Q, dtype=float)))
        A = len(self._Q)
        if stationary is None:
            stationary = [1.0 / A] * A
        self._pi = tuple(float(x) for x in stationary)
        self.A = A

    def init_params(self, dtype=jnp.float32):
        return {}

    def Q(self, params):
        return jnp.asarray(self._Q)

    def stationary(self, params):
        return jnp.asarray(self._pi)

    def transition(self, params, b):
        return expm_ctmc(self.Q(params), b)


def get_model(name, A=4):
    name = name.lower()
    if name in ("jc", "jc69", "jcmodel"):
        return JC69(A)
    if name in ("reference", "referenceq", "learned", "learned_q"):
        return ReferenceQ(A)
    if name == "gtr":
        return GTR(A)
    if name in ("hky", "hky85"):
        return HKY(A)
    raise KeyError(f"unknown substitution model {name!r}")
