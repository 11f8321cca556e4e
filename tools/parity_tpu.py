"""On-TPU float32 parity artifact (VERDICT r2 item 4 / PARITY.md S4).

Compares the PRODUCTION path -- real chip, float32, Pallas fused rank
kernels, packed-gather resampling, manual whole-sweep VJP -- against
the float64 CPU path (the one pinned to the NumPy/torch oracles in
PARITY.md S1-S3) at primate/K=2048:

1. Distributional ELBO check: n sweeps under different keys on each
   path at IDENTICAL initial parameters; the two means must agree
   within 3 combined standard errors (the estimator is stochastic, so
   per-key values differ by design: the paths draw different
   trajectories from the same distribution).
2. A paired fixed-decision check: with injected decisions the same
   sweep is fully deterministic, so f32-vs-f64 differences measure
   pure arithmetic error.

Writes PARITY_TPU.json; run on the real chip (TPU stage), then the CPU
stage runs itself in a subprocess with x64.

Usage: python tools/parity_tpu.py [n_sweeps]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SWEEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 12
K = 2048


def run_sweeps(dtype_name):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import ReferenceQ
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

    dtype = jnp.float32 if dtype_name == "f32" else jnp.float64
    ds = load_dataset("primate")
    model = ReferenceQ(A=ds.A)
    params = {
        "model": jax.tree.map(lambda x: x.astype(dtype),
                              model.init_params(jnp.float64)),
        "branches": init_branch_params(ds.N, dtype=dtype),
    }
    leaves = jnp.asarray(ds.genome, dtype=dtype)
    cfg = SweepConfig(K=K)

    fwd = jax.jit(
        lambda key: sample_phylogenies(
            key, leaves, model, params, cfg
        ).elbo
    )
    elbos = [float(fwd(jax.random.PRNGKey(1000 + i)))
             for i in range(N_SWEEPS)]

    # VNCSMC production path: on TPU the unrolled-rank mode engages
    # (primate R=11 <= unroll_max_ranks); the CPU f64 stage pins the
    # SCANNED enumeration (unroll_max_ranks=0), so this section also
    # certifies the unrolled/scanned proposal laws agree on-chip
    from phylo_tpu.smc.twist import TwistConfig

    tw = (TwistConfig(M=10) if dtype_name == "f32"
          else TwistConfig(M=10, unroll_max_ranks=0))
    cfg_tw = SweepConfig(K=32, twist=tw)
    fwd_tw = jax.jit(
        lambda key: sample_phylogenies(
            key, leaves, model, params, cfg_tw
        ).elbo
    )
    elbos_tw = [float(fwd_tw(jax.random.PRNGKey(2000 + i)))
                for i in range(N_SWEEPS)]

    # paired fixed-decision sweep (fully deterministic given decisions)
    import numpy as np

    from phylo_tpu.models.branches import branch_rates
    from tests.test_sweep_parity import make_decisions

    rl, rr = branch_rates(params["branches"])
    dec = make_decisions(
        np.random.default_rng(7), ds.N, 64,
        np.asarray(rl, np.float64), np.asarray(rr, np.float64),
    )
    dec = {k: jnp.asarray(v, dtype if v.dtype.kind == "f" else v.dtype)
           for k, v in dec.items()}
    cfg_d = SweepConfig(K=64)
    res = sample_phylogenies(
        jax.random.PRNGKey(0), leaves[:, :512], model, params, cfg_d,
        decisions=dec,
    )
    return elbos, elbos_tw, float(res.elbo), jax.default_backend()


if __name__ == "__main__":
    import numpy as np

    if os.environ.get("PHYLO_PARITY_STAGE") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        elbos, elbos_tw, fixed, backend = run_sweeps("f64")
        json.dump({"elbos": elbos, "elbos_tw": elbos_tw, "fixed": fixed,
                   "backend": backend},
                  open("/tmp/parity_cpu.json", "w"))
        sys.exit(0)

    import numpy as np  # noqa: F811

    elbos_tpu, elbos_tw_tpu, fixed_tpu, backend = run_sweeps("f32")
    assert backend == "tpu", f"run this on the chip (got {backend})"

    env = dict(os.environ, PHYLO_PARITY_STAGE="cpu")
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    str(N_SWEEPS)], env=env, check=True, cwd=REPO)
    cpu = json.load(open("/tmp/parity_cpu.json"))

    t = np.asarray(elbos_tpu)
    c = np.asarray(cpu["elbos"])
    se = float(np.sqrt(t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c)))
    gap = float(abs(t.mean() - c.mean()))
    fixed_rel = abs(fixed_tpu - cpu["fixed"]) / abs(cpu["fixed"])
    out = {
        "config": f"primate K={K} ReferenceQ init params, "
                  f"n={N_SWEEPS} sweeps/path",
        "tpu_f32": {"mean": t.mean(), "sd": float(t.std(ddof=1)),
                    "elbos": elbos_tpu,
                    "path": "v5e f32 + fused rank kernel + packed "
                            "resampling (production)"},
        "cpu_f64": {"mean": c.mean(), "sd": float(c.std(ddof=1)),
                    "elbos": cpu["elbos"],
                    "path": "CPU x64 jnp (PARITY.md oracle-pinned)"},
        "gap_nats": gap,
        "combined_se": se,
        "gap_in_se": gap / se,
        "pass_3se": gap <= 3 * se,
        "fixed_decision_K64_S512": {
            "tpu_f32": fixed_tpu, "cpu_f64": cpu["fixed"],
            "rel_err": fixed_rel, "pass_1e3": fixed_rel <= 1e-3,
        },
    }
    tt = np.asarray(elbos_tw_tpu)
    ct = np.asarray(cpu["elbos_tw"])
    se_tw = float(np.sqrt(tt.var(ddof=1) / len(tt)
                          + ct.var(ddof=1) / len(ct)))
    gap_tw = float(abs(tt.mean() - ct.mean()))
    out["vncsmc_K32_M10"] = {
        "tpu_f32": {"mean": tt.mean(), "sd": float(tt.std(ddof=1)),
                    "elbos": elbos_tw_tpu,
                    "path": "v5e f32 unrolled-rank twist + Pallas twist "
                            "bwd (production)"},
        "cpu_f64": {"mean": ct.mean(), "sd": float(ct.std(ddof=1)),
                    "elbos": cpu["elbos_tw"],
                    "path": "CPU x64 scanned chunked enumeration "
                            "(unroll_max_ranks=0, oracle-pinned)"},
        "gap_nats": gap_tw,
        "combined_se": se_tw,
        "gap_in_se": gap_tw / se_tw,
        "pass_3se": gap_tw <= 3 * se_tw,
    }
    json.dump(out, open(os.path.join(REPO, "PARITY_TPU.json"), "w"),
              indent=2)
    print(json.dumps(out, indent=2))
