"""Multi-host (multi-controller) data path, simulated with 2 CPU processes.

Spawns 2 subprocesses (2 virtual CPU devices each -> a 4-device global mesh,
jax.distributed over localhost) running tests/mh_worker.py: per-process
dataset sharding, jax.make_array_from_process_local_data batch assembly,
replicated-state globalisation, one jit train step, and the cross-process
string gather. The loss and the post-step parameter checksum must agree
between the two processes AND match a single-process run of the identical
global batch on a 4-device mesh."""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "mh_worker.py"),
             str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    results = {}
    for out in outs:
        m = re.search(
            r"RESULT pid=(\d) loss=([-\d.]+) checksum=([-\d.]+) gathered=(\S+)",
            out,
        )
        assert m, out[-3000:]
        results[int(m.group(1))] = (
            float(m.group(2)), float(m.group(3)), m.group(4)
        )
    assert set(results) == {0, 1}
    # both processes observe the same global step
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-6)
    assert results[0][1] == pytest.approx(results[1][1], rel=1e-6)
    # string gather saw both hosts' strings
    assert results[0][2] == "host-0-a,host-0-b,host-1-a,host-1-b"

    # single-process reference on a 4-device mesh over the same global batch
    from tests.mh_worker import run_step

    loss_ref, checksum_ref = run_step(0, 1)
    assert results[0][0] == pytest.approx(loss_ref, rel=1e-5)
    assert results[0][1] == pytest.approx(checksum_ref, rel=1e-5)
