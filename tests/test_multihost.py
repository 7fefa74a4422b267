"""Multi-host (multi-process) distributed BA: a 2-process CPU run must
produce IDENTICAL results to the 1-process run on the same global problem
(VERDICT r4 item 8; SURVEY §2.4 — jax.distributed over DCN replaces the
reference's ROS process graph, run.sh:11-22).

Both runs use 8 global devices (1x8 vs 2x4), the same deterministic
problem, and one heavily-damped LM step — so the only difference is the
process topology; psum over in-process devices vs across the coordination
backend must agree to summation roundoff."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(nproc, out_prefix, devices_per_process):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    port = 23000 + os.getpid() % 10000 + nproc
    procs = []
    for rank in range(nproc):
        env_r = dict(env)
        env_r.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(nproc),
            JAX_PROCESS_ID=str(rank),
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "multihost_run.py"),
             "--out", f"{out_prefix}_p{nproc}.npz",
             "--devices-per-process", str(devices_per_process)],
            env=env_r, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out.decode(errors="replace"))
        assert p.returncode == 0, outs[-1][-3000:]
    return f"{out_prefix}_p{nproc}.npz"


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    f1 = _run(1, str(tmp_path / "mh"), devices_per_process=8)
    f2 = _run(2, str(tmp_path / "mh"), devices_per_process=4)
    a, b = np.load(f1), np.load(f2)
    np.testing.assert_allclose(b["initial_cost"], a["initial_cost"],
                               rtol=1e-12)
    np.testing.assert_allclose(b["knots"], a["knots"], atol=1e-9)
    np.testing.assert_allclose(b["landmarks"], a["landmarks"], atol=1e-9)
    np.testing.assert_allclose(b["final_cost"], a["final_cost"], rtol=1e-9)
