"""Multi-HOST (multi-process) runtime test: 2 processes x 4 virtual CPU
devices running the dense schedule with the view axis sharded ACROSS
processes, value-checked against single-process execution.

The CI-able analog of a pod-slice run (SURVEY §5.8): Gloo carries the
cross-process collectives that DCN would carry on real hardware.  The
worker lives in hcmvs_tpu/parallel/mh_check.py (also the pod bring-up
template)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["direct", "volume"])
def test_two_process_dense_matches_single_process(tmp_path, backend):
    """``volume`` runs the production exact-scoring path with the sigma
    tables sharded across processes (round-4 hardening: the table
    gathers become cross-process collectives)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # the workers build their own XLA_FLAGS (4 devices each)
    env.pop("XLA_FLAGS", None)

    def spawn(pid):
        return subprocess.Popen(
            [sys.executable, "-m", "hcmvs_tpu.parallel.mh_check",
             "--process-id", str(pid), "--num-processes", "2",
             "--port", str(port), "--backend", backend],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=repo)

    procs = [spawn(0), spawn(1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host worker timed out:\n"
                    + "\n".join(o or "" for o in outs))

    assert procs[0].returncode == 0, outs[0][-2000:]
    assert procs[1].returncode == 0, outs[1][-2000:]
    assert "MHCHECK OK" in outs[0], outs[0][-2000:]
