"""Plain (non-variational) Combinatorial SMC sampler.

The reference ships this as a self-contained NumPy oracle
(reference csmc.py:129-454): fixed rate matrix, FIXED branch lengths
(bl1 = bl2 = 2, csmc.py:254-255), uniform pair proposal, optional
multinomial resampling, and a weight recursion

    log w_i = log pi(s_i) - log pi~(s_{i-1}) + log(1/rho) - log q

where rho is the number of non-trivial roots (csmc.py:328-333 -- note
the oracle's overcounting convention 1/rho differs from VCSMC's
v_minus) and pi~ is evaluated on a RANDOM particle's previous forest
(csmc.py:390-396).  Outputs: per-rank weights, aggregated tree posterior
probabilities (csmc.py:335-349), and the normalization-constant estimate
prod_i mean_k w_ik (csmc.py:351-355).

This re-implementation vectorizes the per-particle message passing with
NumPy and reuses the framework's genealogy/tree utilities; it exists as
the algorithmic ground truth + teaching entry point, not the TPU path.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import expm as scipy_expm


DEFAULT_Q4 = (
    np.array(
        [
            [-1.0, 0.25, 0.5, 0.25],
            [0.25, -1.0, 0.25, 0.5],
            [0.5, 0.25, -1.0, 0.25],
            [0.25, 0.5, 0.25, -1.0],
        ]
    )
    / 10.0
)  # reference csmc.py:145-148


class CSMC:
    """CSMC over a PhyloDataset-style (taxa, genome) input."""

    def __init__(self, datadict, Q=None, branch_length=2.0, seed=0):
        self.taxa = list(datadict["taxa"] if isinstance(datadict, dict)
                         else datadict.taxa)
        genome = (datadict["genome"] if isinstance(datadict, dict)
                  else datadict.genome)
        self.leaves = np.asarray(genome, dtype=np.float64)
        self.N, self.S, self.A = self.leaves.shape
        self.Q = np.asarray(Q if Q is not None else DEFAULT_Q4,
                            dtype=np.float64)
        if self.Q.shape[0] != self.A:
            raise ValueError(
                f"Q is {self.Q.shape[0]}x{self.Q.shape[0]} but data has "
                f"A={self.A} states"
            )
        self.prior = np.ones(self.A) / self.A
        self.bl = float(branch_length)
        self.P = scipy_expm(self.Q * self.bl)
        self.rng = np.random.default_rng(seed)

    def _root_loglik(self, msg):
        return float(np.log(msg @ self.prior).sum())

    def sample_phylogenies(self, K, resampling=False, showing=False,
                           save_path=None):
        """Run the sampler; returns a result dict with log_weights
        (K, N-1), tree_probabilities, trees (topology keys), norm, and
        the decoded genealogy.

        showing: draw the max-posterior-probability tree labeled with
        its probability (reference csmc.py:450-452 builds the selected
        particle's graph and G.draw()s it when showing).  The figure is
        saved to ``save_path`` (default ``max_prob_tree.png`` in the
        cwd); the networkx DiGraph is returned under 'graph'.
        """
        N, K = self.N, int(K)
        R = N - 1
        # per-particle forests: lists of (node_id, message, loglik)
        core = [
            [(n, self.leaves[n], self._root_loglik(self.leaves[n]))
             for n in range(N)]
            for _ in range(K)
        ]
        log_weights = np.zeros((K, R))
        ancestors = np.zeros((R, K), dtype=np.int64)
        merged_nodes = np.zeros((R, K, 2), dtype=np.int64)
        prev_forest_ll = np.array(
            [sum(e[2] for e in c) for c in core]
        )

        for i in range(R):
            n = N - i
            ancestors[i] = np.arange(K)
            if resampling and i > 0:
                w = np.exp(log_weights[:, i - 1]
                           - log_weights[:, i - 1].max())
                idx = self.rng.choice(K, K, p=w / w.sum())
                core = [[e for e in core[j]] for j in idx]
                prev_forest_ll = prev_forest_ll[idx]
                ancestors[i] = idx

            # pi~ from a RANDOM particle's previous forest
            # (reference csmc.py:390-396)
            tilde = np.zeros(K)
            if i > 0:
                rand_idx = self.rng.integers(0, K, size=K)
                tilde = prev_forest_ll[rand_idx]

            q = 1.0 / (n * (n - 1) / 2.0)
            new_ll = np.zeros(K)
            for k in range(K):
                p1, p2 = self.rng.choice(n, size=2, replace=False)
                n1, m1, ll1 = core[k][p1]
                n2, m2, ll2 = core[k][p2]
                merged_nodes[i, k] = (n1, n2)
                msg = (m1 @ self.P) * (m2 @ self.P)
                ll = self._root_loglik(msg)
                keep = [core[k][j] for j in range(n)
                        if j not in (p1, p2)]
                core[k] = keep + [(N + i, msg, ll)]
                new_ll[k] = sum(e[2] for e in core[k])

                rho = sum(1 for e in core[k] if e[0] >= N)
                if i > 0:
                    log_weights[k, i] = (
                        new_ll[k] - tilde[k] + np.log(1.0 / rho)
                        - np.log(q)
                    )
            prev_forest_ll = new_ll

        from phylo_tpu.viz.trees import (
            decode_genealogy,
            tree_probabilities,
        )

        genealogy = decode_genealogy(ancestors, merged_nodes)
        weights = np.exp(log_weights)
        weights[:, 0] = 1.0
        probs = tree_probabilities(
            self.taxa, genealogy, log_weights[:, -1]
        )
        # norm = prod_{i=1..N-2} mean_k w_ik (reference csmc.py:351-355)
        norm = float(np.prod(weights[:, 1:].mean(axis=0)))
        result = dict(
            log_weights=log_weights,
            tree_probabilities=probs,
            norm=norm,
            genealogy=genealogy,
            ancestors=ancestors,
            merged_nodes=merged_nodes,
        )
        if showing:
            from phylo_tpu.viz.plots import draw_tree

            best_prob, best_k = probs[0]
            path = save_path or "max_prob_tree.png"
            result["graph"] = draw_tree(
                self.taxa, genealogy[best_k], prob=best_prob, path=path
            )
            result["max_prob_tree_png"] = path
        return result
