"""Committed per-round profile report for the headline config
(VERDICT r3 item 9): xprof-traces the primate K=2048 forward sweep and
fwd+bwd train step (full-S and batch-256), and writes the top ops by
device self-time to docs/PROFILE.md.

Run on the real TPU: python tools/profile_report.py [--top 8]
"""

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _top_ops(trace_dir, n):
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import (  # noqa
            raw_to_tool_data as rtd,
        )

    xplane = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {})
    payload = json.loads(data) if isinstance(data, (str, bytes)) else data
    table = payload[0]
    cols = [c["id"] for c in table["cols"]]
    recs = []
    for r in table["rows"]:
        vals = [c.get("v") if c else None for c in r["c"]]
        recs.append(dict(zip(cols, vals)))
    recs = [r for r in recs if r.get("host_or_device") == "Device"]
    recs.sort(key=lambda r: -(r.get("total_self_time") or 0))
    return recs[:n]


def _capture(step, args, label, n_top, iters=10):
    import jax

    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = step(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / iters
    trace_dir = f"/tmp/profile_report_{label}"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = step(*args)
        jax.block_until_ready(out)
    return per, _top_ops(trace_dir, n_top)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "PROFILE.md"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from phylo_tpu.dataio import load_dataset
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import ReferenceQ
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

    ds = load_dataset("primate")
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(jnp.float32),
        "branches": init_branch_params(ds.N, dtype=jnp.float32),
    }
    leaves = jnp.asarray(ds.genome, dtype=jnp.float32)
    cfg = SweepConfig(K=2048)

    sections = []

    fwd = jax.jit(lambda key, p: sample_phylogenies(
        key, leaves, model, p, cfg).elbo)
    per, ops = _capture(fwd, (jax.random.PRNGKey(0), params),
                        "fwd", args.top, iters=30)
    sections.append(("forward sweep, full S", per, ops))

    def loss(p, key, lv):
        return -sample_phylogenies(key, lv, model, p, cfg).elbo

    step = jax.jit(jax.value_and_grad(loss))
    per, ops = _capture(step, (params, jax.random.PRNGKey(0), leaves),
                        "step_fullS", args.top, iters=10)
    sections.append(("train step (fwd+bwd), full S", per, ops))

    lv256 = leaves[:, :256]
    per, ops = _capture(step, (params, jax.random.PRNGKey(0), lv256),
                        "step_b256", args.top, iters=20)
    sections.append(("train step (fwd+bwd), batch 256", per, ops))

    lines = [
        "# Profile report — primate.p, K=2048, learned-Q "
        "(headline config)",
        "",
        f"Captured {time.strftime('%Y-%m-%d')} on "
        f"{jax.devices()[0].device_kind}; xprof framework_op_stats, "
        "top device ops by SELF time over 5 traced steps "
        "(tools/profile_report.py).",
        "",
    ]
    for title, per, ops in sections:
        lines += [f"## {title} — {per * 1e3:.2f} ms/step", "",
                  "| self µs | total µs | occ | bound | op |",
                  "|---:|---:|---:|---|---|"]
        for r in ops:
            op = str(r["operation"])[:60].replace("|", "\\|")
            lines.append(
                f"| {r['total_self_time']:.0f} | {r['total_time']:.0f} "
                f"| {r['occurrences']} | {r.get('bound_by') or ''} "
                f"| `{op}` |"
            )
        lines.append("")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
