"""Multi-host DP integration: 2 real processes x 4 virtual CPU devices
(gloo collectives) run one sharded Learner.step on a global mesh and
must agree with the single-process 8-device run on the same global
batch (SURVEY.md §5.8 — the net-new distributed backend)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HELPER = os.path.join(os.path.dirname(__file__), "helpers", "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    port = _free_port()
    out = str(tmp_path / "p0.json")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, HELPER, str(pid), "2", str(port), out],
            env=env, cwd=os.path.dirname(os.path.dirname(HELPER)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    with open(out) as f:
        res = json.load(f)
    assert res["devices"] == 8

    # single-process oracle: same global batch, same code path, the
    # pytest process's own 8 virtual devices
    from libreasr_tpu.parallel import distributed as dist
    from libreasr_tpu.parallel.mesh import make_mesh

    sys.path.insert(0, os.path.dirname(HELPER))
    from dist_worker import run_step

    mesh = make_mesh(data=8, model=1)
    want = run_step(mesh, dist)
    assert np.isfinite(res["loss"])
    np.testing.assert_allclose(res["loss"], want, rtol=1e-5, atol=1e-5)
