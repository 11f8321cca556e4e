"""Reference-equivalent CPU baseline in PyTorch (float64, autograd).

The reference repo ships no benchmark numbers and its pinned TF 1.15
stack cannot be installed here (BASELINE.md), so the 50x epoch-speedup
target is anchored against this faithful CPU re-execution of the same
recursion: K-replicated float64 core tensors (reference vcsmc.py:479),
full-core gathers at every resampling step (vcsmc.py:286), batched
`matrix_exp` transitions (vcsmc.py:180-188), full-forest posterior
recomputation per rank (vcsmc.py:231-245), autograd through the whole
sweep, and SGD on -ELBO -- i.e. the reference's exact computational
shape on a modern CPU stack (torch is, if anything, generous to the
baseline relative to TF 1.15).
"""

from __future__ import annotations

import math

import numpy as np
import torch


def log_double_factorial_odd(n):
    k = (n + 1.0) / 2.0
    return (
        torch.lgamma(2 * k + 1) - k * math.log(2.0) - torch.lgamma(k + 1)
    )


class TorchVCSMC:
    def __init__(self, genome_NxSxA, K, branch_prior=math.log(10.0),
                 seed=0):
        torch.manual_seed(seed)
        self.g = torch.generator = torch.Generator().manual_seed(seed)
        self.leaves = torch.asarray(
            np.asarray(genome_NxSxA), dtype=torch.float64
        )
        self.N, self.S, self.A = self.leaves.shape
        self.K = K
        N, A = self.N, self.A
        self.log_rates_l = torch.full(
            (N - 1,), branch_prior, dtype=torch.float64, requires_grad=True
        )
        self.log_rates_r = torch.full(
            (N - 1,), branch_prior, dtype=torch.float64, requires_grad=True
        )
        y_q = torch.full((A, A), 1.0 / A, dtype=torch.float64)
        y_q.fill_diagonal_(0.0)
        self.y_q = y_q.requires_grad_(True)
        self.y_station = torch.full(
            (A,), 1.0 / A, dtype=torch.float64, requires_grad=True
        )

    def params(self):
        return [self.log_rates_l, self.log_rates_r, self.y_q,
                self.y_station]

    def Q(self):
        A = self.A
        off = torch.exp(self.y_q) * (1 - torch.eye(A, dtype=torch.float64))
        off = off / off.sum(dim=1, keepdim=True)
        return off - torch.diag(off.sum(dim=1))

    def stationary(self):
        e = torch.exp(self.y_station)
        return e / e.sum()

    def sweep(self, sites_idx=None, decisions=None):
        """One full SMC sweep (reference vcsmc.py:332-451 shape) on the
        given site subset; returns the ELBO tensor.

        decisions: optional dict of pre-drawn randomness ('ancestors'
        (N-1, K) ints, 'pairs' (N-1, K, 2) positions, 'branches_l'/
        'branches_r' (N-1, K) branch LENGTHS) making the sweep fully
        deterministic -- the same contract as the JAX sweep's
        `decisions`, for trajectory-level value/gradient parity tests.
        Injected branch lengths are constants in both implementations
        (no pathwise rate gradient; that path is covered by the
        finite-difference tests on sampled sweeps).
        """
        N, K, A = self.N, self.K, self.A
        leaves = self.leaves
        if sites_idx is not None:
            leaves = leaves[:, sites_idx]
        # reference replicates data K times (vcsmc.py:479)
        core = leaves.unsqueeze(0).expand(K, N, -1, A).clone()
        counts = torch.ones((K, N), dtype=torch.long)
        Q = self.Q()
        pi = self.stationary()
        rates_l = torch.exp(self.log_rates_l)
        rates_r = torch.exp(self.log_rates_r)

        log_weights = []
        log_ll_prev = None
        tilde = torch.full((K,), -math.log(K), dtype=torch.float64)
        bl_hist, br_hist = [], []
        prev_w = None

        for r in range(N - 1):
            n = N - r
            if r > 0:
                if decisions is not None:
                    idx = torch.as_tensor(
                        np.asarray(decisions["ancestors"][r]),
                        dtype=torch.long,
                    )
                else:
                    probs = torch.softmax(prev_w.detach(), dim=0)
                    idx = torch.multinomial(
                        probs, K, replacement=True, generator=self.g
                    )
                core = core[idx]
                counts = counts[idx]
                tilde = log_ll_prev[idx]

            if decisions is not None:
                pair = torch.as_tensor(
                    np.asarray(decisions["pairs"][r]), dtype=torch.long
                )
            else:
                # uniform pair without replacement (gumbel top-2,
                # vcsmc.py:302-305)
                z = -torch.log(-torch.log(
                    torch.rand((K, n), generator=self.g)
                ))
                pair = torch.topk(z, 2, dim=1).indices
            p1, p2 = pair[:, 0], pair[:, 1]

            if decisions is not None:
                b_l = torch.as_tensor(
                    np.asarray(decisions["branches_l"][r]),
                    dtype=torch.float64,
                )
                b_r = torch.as_tensor(
                    np.asarray(decisions["branches_r"][r]),
                    dtype=torch.float64,
                )
            else:
                u1 = torch.rand((K,), generator=self.g,
                                dtype=torch.float64)
                u2 = torch.rand((K,), generator=self.g,
                                dtype=torch.float64)
                b_l = -torch.log1p(-u1) / rates_l[r]
                b_r = -torch.log1p(-u2) / rates_r[r]
            bl_hist.append(b_l)
            br_hist.append(b_r)

            ar = torch.arange(K)
            l_data = core[ar, p1]
            r_data = core[ar, p2]
            P_l = torch.matrix_exp(Q * b_l[:, None, None])
            P_r = torch.matrix_exp(Q * b_r[:, None, None])
            merged = (l_data @ P_l) * (r_data @ P_r)
            new_count = counts[ar, p1] + counts[ar, p2]

            keep = torch.ones((K, n), dtype=torch.bool)
            keep[ar, p1] = False
            keep[ar, p2] = False
            Sb = core.shape[2]
            core = torch.cat(
                [
                    core[:, :n][keep].reshape(K, n - 2, Sb, A),
                    merged.unsqueeze(1),
                ],
                dim=1,
            )
            counts = torch.cat(
                [
                    counts[:, :n][keep].reshape(K, n - 2),
                    new_count.unsqueeze(1),
                ],
                dim=1,
            )

            # full-forest posterior recomputation (vcsmc.py:231-245)
            lik = torch.einsum("kxsa,a->kxs", core, pi)
            data_ll = torch.log(lik).sum(dim=(1, 2))
            topo = -log_double_factorial_odd(
                2 * torch.clamp(counts, min=2).double() - 3
            ).sum(dim=1)
            lp_l = ((r + 1) * torch.log(rates_l[r])
                    - rates_l[r] * torch.stack(bl_hist).sum(0))
            lp_r = ((r + 1) * torch.log(rates_r[r])
                    - rates_r[r] * torch.stack(br_hist).sum(0))
            log_ll = data_ll + topo + lp_l + lp_r

            v_minus = (counts - (counts == 1).long()).sum(dim=1).double()
            q_branch = (
                torch.log(rates_l[r]) - rates_l[r] * b_l
                + torch.log(rates_r[r]) - rates_r[r] * b_r
            )
            q_pen = 1.0 / (n * (n - 1) / 2.0)
            w = log_ll - tilde - q_branch + torch.log(v_minus) - q_pen
            log_weights.append(w)
            log_ll_prev = log_ll
            prev_w = w

        lw = torch.stack(log_weights)
        return torch.logsumexp(lw - math.log(self.K), dim=1).sum()

    def epoch(self, batch_size, lr=0.001, rng=None):
        """One training epoch: floor(S/B) minibatch SGD steps + one
        full-data eval (reference vcsmc.py:529-551)."""
        rng = rng or np.random.default_rng(0)
        opt = torch.optim.SGD(self.params(), lr=lr)
        perm = rng.permutation(self.S)
        n_batches = max(1, self.S // batch_size)
        for i in range(n_batches):
            idx = torch.asarray(
                perm[i * batch_size: (i + 1) * batch_size].copy()
            )
            opt.zero_grad()
            loss = -self.sweep(idx)
            loss.backward()
            opt.step()
        with torch.no_grad():
            elbo = self.sweep()
        return float(elbo)


class TorchVNCSMC(TorchVCSMC):
    """Reference-equivalent VNCSMC (twisted) CPU baseline.

    Mirrors the computational shape of the reference's nested-SMC rank
    update (reference vncsmc.py:283-553): per rank, a sequential loop
    over the C(n,2) candidate pairs (the reference uses doubly-nested
    tf.while_loops), each evaluating an M*K batch of look-ahead merges
    with batched matrix_exp, then a categorical choice over pairs x M
    and the twisted weight update (log q subtracted).
    """

    def __init__(self, genome_NxSxA, K, M=10, **kw):
        super().__init__(genome_NxSxA, K, **kw)
        self.M = M

    def sweep(self, sites_idx=None):
        N, K, A, M = self.N, self.K, self.A, self.M
        leaves = self.leaves
        if sites_idx is not None:
            leaves = leaves[:, sites_idx]
        core = leaves.unsqueeze(0).expand(K, N, -1, A).clone()
        counts = torch.ones((K, N), dtype=torch.long)
        Q = self.Q()
        pi = self.stationary()
        rates_l = torch.exp(self.log_rates_l)
        rates_r = torch.exp(self.log_rates_r)

        log_weights = []
        log_ll_prev = None
        tilde = torch.full((K,), -math.log(K), dtype=torch.float64)
        bl_hist, br_hist = [], []
        prev_w = None
        ar = torch.arange(K)

        def root_ll(msg):      # (B, S, A) -> (B,)
            return torch.log(torch.einsum("bsa,a->bs", msg, pi)).sum(-1)

        def topo(c):
            c = torch.clamp(c, min=2).double()
            return -log_double_factorial_odd(2 * c - 3)

        for r in range(N - 1):
            n = N - r
            if r > 0:
                probs = torch.softmax(prev_w.detach(), dim=0)
                idx = torch.multinomial(probs, K, replacement=True,
                                        generator=self.g)
                core = core[idx]
                counts = counts[idx]
                tilde = log_ll_prev[idx]

            # --- twisting: sequential pair loop (vncsmc.py:324-416) ---
            pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
            pots, bls, brs = [], [], []
            for (i, j) in pairs:
                l_data = core[:, i]                  # (K, S, A)
                r_data = core[:, j]
                b_l = -torch.log1p(-torch.rand((M, K),
                    generator=self.g, dtype=torch.float64)) / rates_l[r]
                b_r = -torch.log1p(-torch.rand((M, K),
                    generator=self.g, dtype=torch.float64)) / rates_r[r]
                P_l = torch.matrix_exp(Q * b_l[..., None, None])
                P_r = torch.matrix_exp(Q * b_r[..., None, None])
                u = torch.einsum("ksa,mkab->mksb", l_data, P_l)
                v = torch.einsum("ksa,mkab->mksb", r_data, P_r)
                merged = (u * v).reshape(M * K, -1, A)
                c1, c2 = counts[:, i], counts[:, j]
                pot = (
                    root_ll(merged).reshape(M, K)
                    + topo(c1 + c2)[None]
                    - (root_ll(l_data) + topo(c1))[None]
                    - (root_ll(r_data) + topo(c2))[None]
                )
                pots.append(pot)
                bls.append(b_l)
                brs.append(b_r)

            flat = torch.stack(pots, 0).permute(2, 0, 1).reshape(
                K, len(pairs) * M)                    # (K, P*M)
            flat = flat - torch.logsumexp(flat, dim=1, keepdim=True)
            choice = torch.multinomial(
                torch.softmax(flat.detach(), dim=1), 1,
                generator=self.g)[:, 0]
            q_log = flat[ar, choice]
            p_idx = choice // M
            m_idx = choice % M
            bl_pool = torch.stack(bls, 0)             # (P, M, K)
            br_pool = torch.stack(brs, 0)
            b_l = bl_pool[p_idx, m_idx, ar]
            b_r = br_pool[p_idx, m_idx, ar]
            bl_hist.append(b_l)
            br_hist.append(b_r)
            pair_t = torch.as_tensor(pairs, dtype=torch.long)
            p1 = pair_t[p_idx, 0]
            p2 = pair_t[p_idx, 1]

            l_data = core[ar, p1]
            r_data = core[ar, p2]
            P_l = torch.matrix_exp(Q * b_l[:, None, None])
            P_r = torch.matrix_exp(Q * b_r[:, None, None])
            merged = (l_data @ P_l) * (r_data @ P_r)
            new_count = counts[ar, p1] + counts[ar, p2]

            keep = torch.ones((K, n), dtype=torch.bool)
            keep[ar, p1] = False
            keep[ar, p2] = False
            Sb = core.shape[2]
            core = torch.cat(
                [core[:, :n][keep].reshape(K, n - 2, Sb, A),
                 merged.unsqueeze(1)], dim=1)
            counts = torch.cat(
                [counts[:, :n][keep].reshape(K, n - 2),
                 new_count.unsqueeze(1)], dim=1)

            lik = torch.einsum("kxsa,a->kxs", core, pi)
            data_ll = torch.log(lik).sum(dim=(1, 2))
            topo_lp = topo(counts).sum(dim=1)
            lp_l = ((r + 1) * torch.log(rates_l[r])
                    - rates_l[r] * torch.stack(bl_hist).sum(0))
            lp_r = ((r + 1) * torch.log(rates_r[r])
                    - rates_r[r] * torch.stack(br_hist).sum(0))
            log_ll = data_ll + topo_lp + lp_l + lp_r

            v_minus = (counts - (counts == 1).long()).sum(dim=1).double()
            q_branch = (torch.log(rates_l[r]) - rates_l[r] * b_l
                        + torch.log(rates_r[r]) - rates_r[r] * b_r)
            w = log_ll - tilde - q_branch + torch.log(v_minus) - q_log
            log_weights.append(w)
            log_ll_prev = log_ll
            prev_w = w

        lw = torch.stack(log_weights)
        return torch.logsumexp(lw - math.log(self.K), dim=1).sum()


class TorchBlockVCSMC(TorchVCSMC):
    """Reference-equivalent discrete-Gamma (G rate categories) CPU
    baseline: the product-space workload behind the framework's
    GammaSites rows (gamma_primate_step / protein_gamma_step).

    Same recursion shape as TorchVCSMC but every message carries a
    category axis: core (K, n, S, G, A), transitions are the per-
    category BLOCKS matrix_exp(r_g * Q * b) (K, G, A, A) -- the honest
    blocked cost, not a dense (G*A)^2 expm -- and the root likelihood
    averages categories (stationary pi/G per block, matching
    phylo_tpu.models.substitution.GammaSites semantics).  Category
    rates are fixed constants (discrete-Gamma, mean 1): learning alpha
    adds G scalars of work and is cost-neutral for an anchor.
    """

    def __init__(self, genome_NxSxA, K, rates, **kw):
        super().__init__(genome_NxSxA, K, **kw)
        self.rates = torch.asarray(
            np.asarray(rates), dtype=torch.float64
        )
        self.G = int(self.rates.shape[0])

    def sweep(self, sites_idx=None):
        N, K, A, G = self.N, self.K, self.A, self.G
        leaves = self.leaves
        if sites_idx is not None:
            leaves = leaves[:, sites_idx]
        Sb = leaves.shape[1]
        # (K, n, S, G, A): replicated data, category axis broadcast
        core = (leaves.unsqueeze(0).unsqueeze(3)
                .expand(K, N, Sb, G, A).clone())
        counts = torch.ones((K, N), dtype=torch.long)
        Q = self.Q()
        Qg = Q.unsqueeze(0) * self.rates[:, None, None]   # (G, A, A)
        pi = self.stationary()
        rates_l = torch.exp(self.log_rates_l)
        rates_r = torch.exp(self.log_rates_r)

        log_weights = []
        log_ll_prev = None
        tilde = torch.full((K,), -math.log(K), dtype=torch.float64)
        bl_hist, br_hist = [], []
        prev_w = None
        ar = torch.arange(K)

        for r in range(N - 1):
            n = N - r
            if r > 0:
                probs = torch.softmax(prev_w.detach(), dim=0)
                idx = torch.multinomial(probs, K, replacement=True,
                                        generator=self.g)
                core = core[idx]
                counts = counts[idx]
                tilde = log_ll_prev[idx]

            z = -torch.log(-torch.log(
                torch.rand((K, n), generator=self.g)
            ))
            pair = torch.topk(z, 2, dim=1).indices
            p1, p2 = pair[:, 0], pair[:, 1]

            u1 = torch.rand((K,), generator=self.g, dtype=torch.float64)
            u2 = torch.rand((K,), generator=self.g, dtype=torch.float64)
            b_l = -torch.log1p(-u1) / rates_l[r]
            b_r = -torch.log1p(-u2) / rates_r[r]
            bl_hist.append(b_l)
            br_hist.append(b_r)

            l_data = core[ar, p1]                  # (K, S, G, A)
            r_data = core[ar, p2]
            # blocked transitions: (K, G, A, A)
            P_l = torch.matrix_exp(Qg[None] * b_l[:, None, None, None])
            P_r = torch.matrix_exp(Qg[None] * b_r[:, None, None, None])
            u = torch.einsum("ksga,kgab->ksgb", l_data, P_l)
            v = torch.einsum("ksga,kgab->ksgb", r_data, P_r)
            merged = u * v
            new_count = counts[ar, p1] + counts[ar, p2]

            keep = torch.ones((K, n), dtype=torch.bool)
            keep[ar, p1] = False
            keep[ar, p2] = False
            core = torch.cat(
                [core[:, :n][keep].reshape(K, n - 2, Sb, G, A),
                 merged.unsqueeze(1)], dim=1)
            counts = torch.cat(
                [counts[:, :n][keep].reshape(K, n - 2),
                 new_count.unsqueeze(1)], dim=1)

            # category-averaged site likelihood (pi/G per block)
            lik = torch.einsum("kxsga,a->kxs", core, pi) / G
            data_ll = torch.log(lik).sum(dim=(1, 2))
            topo = -log_double_factorial_odd(
                2 * torch.clamp(counts, min=2).double() - 3
            ).sum(dim=1)
            lp_l = ((r + 1) * torch.log(rates_l[r])
                    - rates_l[r] * torch.stack(bl_hist).sum(0))
            lp_r = ((r + 1) * torch.log(rates_r[r])
                    - rates_r[r] * torch.stack(br_hist).sum(0))
            log_ll = data_ll + topo + lp_l + lp_r

            v_minus = (counts - (counts == 1).long()).sum(dim=1).double()
            q_branch = (torch.log(rates_l[r]) - rates_l[r] * b_l
                        + torch.log(rates_r[r]) - rates_r[r] * b_r)
            q_pen = 1.0 / (n * (n - 1) / 2.0)
            w = log_ll - tilde - q_branch + torch.log(v_minus) - q_pen
            log_weights.append(w)
            log_ll_prev = log_ll
            prev_w = w

        lw = torch.stack(log_weights)
        return torch.logsumexp(lw - math.log(self.K), dim=1).sum()


class TorchGY94VCSMC(TorchVCSMC):
    """Reference-equivalent GY94 codon CPU baseline (codon_gy94_step):
    the parent recursion unchanged on the 61-codon state space, with Q
    re-parameterized as Goldman-Yang (learnable kappa/omega, fixed
    empirical frequencies, unit-mean-rate normalized -- mirrors
    phylo_tpu.models.codon.GY94) and transitions via batched
    matrix_exp on (K, 61, 61) float64, the cost a reference-shaped
    codebase would pay (tf.linalg.expm)."""

    def __init__(self, genome_codons, K, frequencies, masks, **kw):
        super().__init__(genome_codons, K, **kw)
        assert self.A == 61
        self.freqs = torch.asarray(np.asarray(frequencies),
                                   dtype=torch.float64)
        nb, ts, syn = (torch.asarray(np.asarray(m), dtype=torch.float64)
                       for m in masks)
        self.nb, self.ts, self.syn = nb, ts, syn
        self.log_kappa = torch.tensor(math.log(2.0), dtype=torch.float64,
                                      requires_grad=True)
        self.log_omega = torch.tensor(math.log(0.2), dtype=torch.float64,
                                      requires_grad=True)

    def params(self):
        return [self.log_rates_l, self.log_rates_r, self.log_kappa,
                self.log_omega]

    def stationary(self):
        return self.freqs

    def Q(self):
        kappa = torch.exp(self.log_kappa)
        omega = torch.exp(self.log_omega)
        rate = (self.nb * torch.where(self.ts > 0, kappa, 1.0)
                * torch.where(self.syn > 0, 1.0, omega))
        q = rate * self.freqs[None, :]
        q = q - torch.diag(q.sum(dim=1))
        mean_rate = -(self.freqs * torch.diagonal(q)).sum()
        return q / torch.clamp(mean_rate, min=1e-30)
