"""Multi-host (multi-process) parity: two CPU processes with two local
devices each form a 4-device global 's' mesh; the site-sharded sweep
must reproduce the single-process ELBO exactly (SURVEY section 2.2 /
VERDICT round-1 item 5 -- the reference has no distribution layer to
compare against, reference vcsmc.py:155,196 commented device hints).
"""

import os
import re
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_elbo():
    from phylo_tpu.dataio import simulate_dna
    from phylo_tpu.models.branches import init_branch_params
    from phylo_tpu.models.substitution import ReferenceQ
    from phylo_tpu.smc.sweep import SweepConfig, sample_phylogenies

    ds = simulate_dna(6, 31, seed=0)
    model = ReferenceQ(A=ds.A)
    params = {
        "model": model.init_params(jnp.float64),
        "branches": init_branch_params(ds.N, dtype=jnp.float64),
    }
    res = sample_phylogenies(
        jax.random.PRNGKey(7), jnp.asarray(ds.genome), model, params,
        SweepConfig(K=8),
    )
    return float(res.elbo)


def test_two_process_sharded_elbo_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip() + " --xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    # running the worker by path puts tests/ (not the repo) on sys.path
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    want = _single_process_elbo()
    for out in outs:
        m = re.search(r"ELBO (.+)", out)
        assert m, out
        got = float(m.group(1))
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_initialize_distributed_noop_without_config():
    # In-process (already single-process initialized) the helper must be
    # a safe no-op when neither args nor env ask for distribution.
    from phylo_tpu.parallel import initialize_distributed, is_multiprocess

    assert initialize_distributed() is False
    assert is_multiprocess() is False
