"""Multi-process wire load driver (scripts/bench_serving.py --procs,
r4 verdict weak #3): the single-process thread driver GIL-saturates
past ~128 clients and measures the bench host. This smokes the
process-fan-out path end to end against an in-process golden server:
2 worker processes x 2 paced clients each, stats merged across workers.
"""

import json
import os
import socket
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    from libreasr_tpu.api import ASRBundle
    from libreasr_tpu.models.streaming import StreamingEngine
    from libreasr_tpu.serving.server import make_server

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
    bundle = ASRBundle.from_bundle(
        os.path.join(fixtures, "model.tar.gz"),
        extract_to=str(tmp_path_factory.mktemp("loadsrv")),
    )
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    engine = StreamingEngine(bundle, n_streams=8)
    server, _ = make_server(bundle, port, engine=engine)
    server.start()
    yield port
    server.stop(0)


def test_load_workers_merge(live_server):
    start_at = time.time() + 8.0  # worker startup (fresh interpreters)
    workers = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "scripts", "bench_serving.py"),
             "--role", "load", "--port", str(live_server),
             "--count", "2", "--duration", "2.0",
             "--start-at", repr(start_at), "--seed-base", str(w * 2)],
            cwd=REPO, stdout=subprocess.PIPE, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        for w in range(2)
    ]
    merged = []
    for w in workers:
        out, _ = w.communicate(timeout=180)
        assert w.returncode == 0, out[-500:]
        lines = [l for l in out.splitlines() if l.startswith("LOAD ")]
        assert len(lines) == 1
        merged.append(json.loads(lines[0][5:]))
    assert sum(d["n_errors"] for d in merged) == 0, merged
    # every client closed its stream (overrun recorded)
    assert sum(len(d["over"]) for d in merged) == 4
    # latency samples are floats in seconds
    lat = [x for d in merged for x in d["lat"]]
    assert all(0 <= x < 60 for x in lat)
