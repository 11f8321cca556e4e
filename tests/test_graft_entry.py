"""Driver-contract tests for __graft_entry__.

The round-1 driver artifact MULTICHIP_r01.json recorded rc=1 because
dryrun_multichip assumed jax.devices() already held n devices.  These
tests pin the fixed contract:

- inline path: with enough devices present (conftest provisions 8
  virtual CPU devices), the dryrun runs in-process;
- self-provisioning path: with FEWER devices than requested, the entry
  point relaunches itself on a virtual CPU platform and still succeeds.
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_inline_8_devices():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    assert len(jax.devices()) >= 8
    g.dryrun_multichip(8)


def test_dryrun_self_provisions_when_devices_insufficient():
    # Fresh interpreter pinned to a SINGLE CPU device, then ask for 4:
    # dryrun_multichip must relaunch itself on a 4-device virtual
    # platform instead of crashing (the round-1 failure mode).
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(4)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip" in proc.stdout
