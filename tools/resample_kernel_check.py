"""Statistical validation of smc.resample_kernel on the real chip.

The hardware-PRNG categorical kernel cannot run under CPU interpret
mode (pltpu.prng_* has no CPU lowering), so its distribution is pinned
here instead: draw n_rounds x K ancestors from a skewed target and
compare per-category frequencies against the exact probabilities, and
against jax.random.categorical under the same budget (the two use
different streams; both must sit inside the same multinomial band).

Run on TPU: python tools/resample_kernel_check.py
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from phylo_tpu.smc.resample_kernel import categorical_pallas

    K = 2048
    rng = np.random.default_rng(7)
    # skewed weights spanning ~3 orders of magnitude
    logits = jnp.asarray(rng.gumbel(size=K) * 2.0, jnp.float32)
    p = np.asarray(jax.nn.softmax(logits), np.float64)

    # 512 rounds timed out round 4 on the remote-compile relay (the
    # two lax.map compiles alone took most of the 30-min budget);
    # 192 rounds keeps dof ~ K-1 power while fitting the window
    n_rounds = int(os.environ.get("PHYLO_RESAMPLE_CHECK_ROUNDS", "192"))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(n_rounds))

    # one device-side lax.map per path (sequential scan -- no pallas
    # batching rule needed), one host transfer each
    @jax.jit
    def all_k(keys):
        return jax.lax.map(
            lambda k: categorical_pallas(k, logits), keys)

    @jax.jit
    def all_j(keys):
        return jax.lax.map(
            lambda k: jax.random.categorical(k, logits, shape=(K,)),
            keys)

    import time
    t0 = time.time()
    ck = np.bincount(np.asarray(all_k(keys)).ravel(), minlength=K)
    print(f"kernel draws done in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    cj = np.bincount(np.asarray(all_j(keys)).ravel(), minlength=K)
    print(f"jax draws done in {time.time()-t0:.1f}s", flush=True)
    counts = {"kernel": ck, "jax": cj}

    n = n_rounds * K
    out = {}
    for name, c in counts.items():
        # Pearson chi-square against the exact categorical; dof ~ K-1.
        chi2 = float(((c - n * p) ** 2 / (n * p)).sum())
        # z-score of the statistic under its asymptotic normal
        z = (chi2 - (K - 1)) / np.sqrt(2 * (K - 1))
        out[name] = {"chi2": round(chi2, 1), "dof": K - 1,
                     "z": round(float(z), 2)}
        print(f"{name}: chi2 {chi2:.1f} on {K-1} dof (z = {z:+.2f})")
    # pass if the kernel's statistic is as plausible as jax's own
    # (|z| < 4 is ~1e-4 two-sided; jax itself sits well inside)
    ok = abs(out["kernel"]["z"]) < 4.0
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
