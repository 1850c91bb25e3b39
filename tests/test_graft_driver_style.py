"""Regression: dryrun_multichip must work exactly as the driver invokes it
(fresh process, env vars that this container's sitecustomize ignores)."""

import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_fresh_process_driver_env():
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=1800)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout
    # round 3: the sharded inference runner (gait branch, uneven batch)
    # must also validate against the unsharded runner
    assert "dryrun sharded-inference ok" in out.stdout
