"""Multi-host (DCN) dry run: 2 jax.distributed CPU processes == single host.

Spawns two coordinator-connected processes (each with 2 virtual CPU devices)
running tools/multihost_dryrun.py's sharded tracking scan and compares the
resulting trajectories against a single-process run on the same inputs.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":") if ".axon_site" not in p)
    kept = [f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    kept.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(kept)
    return env


@pytest.mark.slow
def test_two_process_scan_matches_single_host(tmp_path):
    script = os.path.join(REPO, "tools", "multihost_dryrun.py")
    port = _free_port()
    n_bodies = 8

    out_multi = str(tmp_path / "multi.npz")
    out_single = str(tmp_path / "single.npz")

    procs = []
    for pid in range(2):
        cmd = [sys.executable, script, "--coordinator", f"127.0.0.1:{port}",
               "--num-processes", "2", "--process-id", str(pid),
               "--n-bodies", str(n_bodies)]
        if pid == 0:
            cmd += ["--out", out_multi]
        procs.append(subprocess.Popen(cmd, env=_env(2), cwd=REPO,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            stdout, _ = p.communicate()
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, stdout[-3000:]
    assert "2 processes" in outputs[0] and "4 global devices" in outputs[0], \
        outputs[0][-1500:]

    single = subprocess.run(
        [sys.executable, script, "--n-bodies", str(n_bodies),
         "--out", out_single],
        env=_env(4), cwd=REPO, capture_output=True, text=True, timeout=600)
    assert single.returncode == 0, single.stdout[-3000:] + single.stderr[-2000:]

    poses_multi = np.load(out_multi)["poses"]
    poses_single = np.load(out_single)["poses"]
    assert poses_multi.shape == poses_single.shape
    np.testing.assert_allclose(poses_multi, poses_single, rtol=0, atol=1e-5)
