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

Transition-matrix ORIENTATION convention: the pruning merge contracts
``merged(parent b) = sum_a msg_child(a) * M[a, b]`` (felsenstein.py /
the fused kernels, matching the reference's ``data @ P``,
vcsmc.py:180-188).  So ``model.transition(params, b)`` must return
matrices in MERGE orientation: ``M[a, b] = P(child state a | parent
state b)``, i.e. the TRANSPOSE of the row-stochastic
``expm(Q b)[from, to]``.  Concretely:

* ``JC69`` -- expm(Q b) is symmetric; orientation is moot.
* ``GTR`` / ``HKY`` -- ``transition`` returns ``expm(Q^T b)``
  (= ``expm(Q b)^T``, bit-exact under the uniformization series since
  ``(Q^T)^k = (Q^k)^T``), so the pruning likelihood is the textbook
  time-reversible likelihood.  With the raw ``expm(Q b)`` these models
  scored a NON-standard quantity whenever pi is non-uniform (caught by
  the enumeration parity test, tests/test_orientation.py).
* ``ReferenceQ`` / ``FixedQ`` -- keep the reference's raw
  ``expm(Q b)`` under ``data @ P``; that contraction IS the
  reference's model definition (its learned stationary vector is a
  free parameter unrelated to Q anyway), preserved bit-for-bit for
  parity (oracle/, tests/test_sweep_parity.py).

Generative code (dataio/simulate.py) must therefore sample a child
state from the COLUMN ``M[:, parent]`` of whatever ``transition``
returns -- that keeps simulation and likelihood consistent for every
model, including ReferenceQ's implied generative law.
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
        # raw expm(Qb): the reference's `data @ P` contraction defines
        # this model (module docstring) -- do NOT transpose
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
        # merge orientation (module docstring): expm(Q^T b) = expm(Qb)^T
        return expm_ctmc(self.Q(params).T, b)


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
        # merge orientation (module docstring): expm(Q^T b) = expm(Qb)^T
        return expm_ctmc(self.Q(params).T, b)


def discrete_gamma_rates(alpha, G, newton_iters=25):
    """Mean-of-bin discrete Gamma(alpha, alpha) category rates
    (Yang 1994), differentiable in alpha.

    The G quantile boundaries solve gammainc(alpha, y) = g/G; solved by
    Newton iterations (Wilson-Hilferty start), which unroll into plain
    jnp ops so d rates / d alpha flows.  Bin means use the identity
    E[X; X in bin] = gammainc(alpha+1, .) differences for
    X ~ Gamma(alpha, rate=alpha).  mean_g r_g == 1 exactly.
    """
    import jax

    alpha = jnp.asarray(alpha)
    dtype = alpha.dtype
    if G == 1:
        return jnp.ones((1,), dtype)
    p = jnp.arange(1, G, dtype=dtype) / G
    # Wilson-Hilferty initial guess for the Gamma(alpha, 1) quantile
    z = jax.scipy.special.ndtri(p)
    c = 1.0 - 1.0 / (9.0 * alpha) + z * jnp.sqrt(1.0 / (9.0 * alpha))
    y = alpha * jnp.maximum(c, 1e-3) ** 3

    def newton(y, _):
        f = jax.scipy.special.gammainc(alpha, y) - p
        log_pdf = (
            (alpha - 1.0) * jnp.log(y) - y
            - jax.scipy.special.gammaln(alpha)
        )
        y = jnp.clip(y - f * jnp.exp(-log_pdf), 1e-12, None)
        return y, None

    y, _ = jax.lax.scan(newton, y, None, length=newton_iters)
    # bin masses of Gamma(alpha + 1, 1) at the same boundaries
    q1 = jnp.concatenate([
        jnp.zeros((1,), dtype),
        jax.scipy.special.gammainc(alpha + 1.0, y),
        jnp.ones((1,), dtype),
    ])
    return G * jnp.diff(q1)


class _SiteMixture(_Model):
    """Shared machinery for across-site rate-mixture models expressed
    as PRODUCT-SPACE substitution models.

    The rate category is a hidden variable shared along the whole tree,
    so it rides the state space: A' = C*A with
    Q' = blockdiag(r_c * Q_base) and pi' = w_c (x) pi (category weights
    enter ONLY through the root stationary vector).  Felsenstein pruning
    over A' then computes the exact mixture likelihood
    L_s = sum_c w_c L_s^(c) with NO changes to the SMC sweep, rescaling,
    or sharding: categories never mix along branches and are
    marginalized at the root by pi'.

    Subclasses provide `init_params`, `rates(params) -> (C,)` and
    `weights(params) -> (C,)` (summing to 1); everything else --
    stationary, blocked transitions, leaf expansion -- is shared.

    Costs C x memory and up to C x flops versus a category-batched
    formulation (the dense A'xA' transition is block-diagonal) -- the
    exactness/zero-surgery tradeoff is documented in ROADMAP.md.  The
    reference has no rate heterogeneity at all.
    """

    base: _Model
    n_cat: int

    def rates(self, params):
        raise NotImplementedError

    def weights(self, params):
        raise NotImplementedError

    def Q(self, params):
        r = self.rates(params)
        qb = self.base.Q(params["base"]).astype(r.dtype)
        return jnp.kron(jnp.diag(r), qb)

    def stationary(self, params):
        pib = self.base.stationary(params["base"])
        w = self.weights(params).astype(pib.dtype)
        return jnp.kron(w, pib)

    @property
    def blocks(self):
        """(C, A_base) block structure of the transition matrices --
        the sweep uses `transition_blocks` + the blocked merge when a
        model exposes this."""
        return (self.n_cat, self.base.A)

    def transition_blocks(self, params, b):
        """Per-category transitions (..., C, A, A): expm of a
        block-diagonal generator is the block-diagonal of the blocks'
        expms, so C batched A x A expms (through the base model's
        transition -- JC69 keeps its closed form) replace one dense
        (C A)^3 series: C^2 x fewer flops, identical math."""
        r = self.rates(params)
        b = jnp.asarray(b)
        return self.base.transition(
            params["base"], b[..., None] * r.astype(b.dtype)
        )

    def transition(self, params, b):
        b = jnp.asarray(b)
        Pg = self.transition_blocks(params, b)   # (..., C, A, A)
        C, A = self.n_cat, self.base.A
        eye = jnp.eye(C, dtype=Pg.dtype)
        # exact f32 broadcast-multiply assembly (no dot_general)
        dense = Pg[..., :, :, None, :] * eye[:, None, :, None]
        return dense.reshape(*b.shape, C * A, C * A)

    def expand_leaves(self, genome):
        """(N, S, A) one-hot/ambiguous codes -> (N, S, C*A): the
        observation is category-independent, so each category block
        repeats the base code (gap all-ones rows stay all-ones)."""
        import numpy as _np

        return _np.tile(_np.asarray(genome), (1, 1, self.n_cat))


class GammaSites(_SiteMixture):
    """Discrete-Gamma rate heterogeneity across sites (Yang 1994),
    optionally with a proportion of invariant sites (+I, Gu et al.
    1995): `invariant=True` prepends a rate-0 category whose weight
    p_inv is learnable (params['logit_pinv']); the Gamma categories are
    rescaled by 1/(1-p_inv) so the mean rate stays exactly 1.  alpha is
    learnable (params['log_alpha']) through a differentiable Newton
    inverse of the regularized incomplete gamma (discrete_gamma_rates).
    G=1 with invariant=True is the plain +I model.
    """

    def __init__(self, base, G=4, invariant=False):
        self.base = get_model(base) if isinstance(base, str) else base
        self.G = int(G)
        self.invariant = bool(invariant)
        self.n_cat = self.G + (1 if self.invariant else 0)
        self.A = self.base.A * self.n_cat

    def init_params(self, dtype=jnp.float32):
        p = {
            "base": self.base.init_params(dtype),
            "log_alpha": jnp.zeros((), dtype=dtype),
        }
        if self.invariant:
            # sigmoid(-2) ~ 0.12: start with a small invariant fraction
            p["logit_pinv"] = jnp.asarray(-2.0, dtype=dtype)
        return p

    def _pinv(self, params):
        import jax

        return jax.nn.sigmoid(params["logit_pinv"])

    def rates(self, params):
        r = discrete_gamma_rates(jnp.exp(params["log_alpha"]), self.G)
        if not self.invariant:
            return r
        p = self._pinv(params).astype(r.dtype)
        return jnp.concatenate([
            jnp.zeros((1,), r.dtype), r / (1.0 - p)
        ])

    def weights(self, params):
        if not self.invariant:
            return jnp.full((self.G,), 1.0 / self.G)
        p = self._pinv(params)
        return jnp.concatenate([
            p[None], jnp.full((self.G,), 1.0, p.dtype) * (1.0 - p) / self.G
        ])


class FreeRates(_SiteMixture):
    """FreeRates across-site heterogeneity (Yang 1995; RAxML/IQ-TREE's
    +R model): G categories with fully learnable rates AND weights --
    weights via softmax(params['w_logits']), rates via
    exp(params['log_rates']) normalized so sum_c w_c r_c == 1 exactly
    (rate/branch-length identifiability).  Strictly generalizes
    discrete-Gamma; useful when the Gamma shape is a poor fit.
    """

    def __init__(self, base, G=4):
        self.base = get_model(base) if isinstance(base, str) else base
        self.G = int(G)
        self.n_cat = self.G
        self.A = self.base.A * self.G

    def init_params(self, dtype=jnp.float32):
        # spread initial rates so categories are not permutation-
        # symmetric at init (softmax/exp of zeros would make every
        # category identical and gradients symmetric forever)
        g = jnp.arange(self.G, dtype=dtype)
        return {
            "base": self.base.init_params(dtype),
            "w_logits": jnp.zeros((self.G,), dtype=dtype),
            "log_rates": (g - (self.G - 1) / 2.0) * (2.0 / max(self.G, 2)),
        }

    def weights(self, params):
        e = jnp.exp(params["w_logits"] - jnp.max(params["w_logits"]))
        return e / jnp.sum(e)

    def rates(self, params):
        raw = jnp.exp(params["log_rates"])
        w = self.weights(params)
        return raw / jnp.sum(w * raw)


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
        # raw expm(Qb), matching the reference csmc's `data @ P` use of
        # its hardcoded generators (module docstring)
        return expm_ctmc(self.Q(params), b)


def _get_base_model(name, A):
    lowered = name.lower()
    if lowered.endswith(".dat"):
        # PAML empirical amino-acid file -- path kept case-sensitive;
        # '.dat:f' / the '+f' modifier selects learnable frequencies
        from phylo_tpu.models.empirical import EmpiricalProtein

        return EmpiricalProtein.from_paml(name)
    if lowered in ("jc", "jc69", "jcmodel"):
        return JC69(A)
    if lowered in ("reference", "referenceq", "learned", "learned_q"):
        return ReferenceQ(A)
    if lowered == "gtr":
        return GTR(A)
    if lowered in ("hky", "hky85"):
        return HKY(A)
    if lowered in ("gy94", "codon"):
        # uniform-frequency GY94; callers with data in hand pass
        # empirical F61 frequencies to models.codon.GY94 directly
        from phylo_tpu.models.codon import GY94

        return GY94()
    raise KeyError(f"unknown substitution model {name!r}")


def get_model(name, A=4):
    """Resolve a substitution-model spec string.

    A spec is a base model name -- ``jc69`` / ``reference`` / ``gtr`` /
    ``hky`` / a PAML ``.dat`` path (empirical protein) -- optionally
    followed by '+'-separated across-site modifiers:

    * ``+gN``: discrete-Gamma with N categories (``+g`` = ``+g4``),
    * ``+i``: a learnable proportion of invariant sites,
    * ``+rN``: FreeRates with N learnable rate/weight categories,
    * ``+f``: learnable stationary frequencies (.dat bases only).

    e.g. ``gtr+g4+i``, ``jc69+r3``, ``lg.dat+f+g4``.  Matches the
    standard PhyML/RAxML/IQ-TREE model-string idiom.
    """
    parts = str(name).split("+")
    base = _get_base_model(parts[0], A)
    gamma = None
    invariant = False
    freerates = None
    for mod in parts[1:]:
        m = mod.strip().lower()
        if not m:
            continue
        if m == "i":
            invariant = True
        elif m == "f":
            from phylo_tpu.models.codon import GY94
            from phylo_tpu.models.empirical import EmpiricalProtein

            if isinstance(base, GY94):
                base = GY94(base._freqs, plus_f=True,
                            normalize=base.normalize,
                            spectral=base.spectral)
            elif isinstance(base, EmpiricalProtein):
                base = EmpiricalProtein(
                    base._exch, base._freqs, name=base.name,
                    plus_f=True, normalize=base.normalize,
                    spectral=base.spectral,
                )
            else:
                raise ValueError(
                    f"'+f' requires a PAML .dat or gy94 base model "
                    f"(spec {name!r})"
                )
        elif m[0] == "g" and (len(m) == 1 or m[1:].isdigit()):
            gamma = int(m[1:]) if len(m) > 1 else 4
        elif m[0] == "r" and (len(m) == 1 or m[1:].isdigit()):
            freerates = int(m[1:]) if len(m) > 1 else 4
        else:
            raise ValueError(
                f"unknown model modifier {mod!r} in spec {name!r}"
            )
    if freerates is not None:
        if gamma is not None or invariant:
            raise ValueError(
                f"'+r' cannot combine with '+g'/'+i' (spec {name!r})"
            )
        return FreeRates(base, G=freerates)
    if gamma is not None or invariant:
        return GammaSites(base, G=gamma or 1, invariant=invariant)
    return base
