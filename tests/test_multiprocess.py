"""REAL multi-process multi-host training: two OS processes, each with 4
virtual CPU devices, joined by jax.distributed into one 8-device
("host", "clique", "member") mesh. Validates the full bring-up path the
CLI uses (run.py --coordinator/--num-processes/--process-id):
cross-process gradient pmean, global device_put of banks/params, and the
per-partition seed sharding (SURVEY.md §7 stage 6)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "mp_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = root
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=root, env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, out[-3000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    # both processes observe the SAME replicated losses and accuracy
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["acc"] == results[1]["acc"]
    assert all(np.isfinite(results[0]["losses"]))
    # and training makes progress
    assert results[0]["losses"][-1] < results[0]["losses"][0]
