"""Wire-level serving benchmark: N concurrent gRPC clients stream
real-time-paced 80 ms chunks at a live server running the flagship model
(6-2-1024 / vocab-2048, blank-biased random weights — the same workload
proxy as bench.py) and measure what the CLIENT observes:

- partial latency: Transcript arrival time minus the send time of the
  most recently sent chunk (bounded by chunk cadence + step + wire when
  the server keeps up; grows with server backlog when it doesn't);
- overrun: stream-close time minus last-chunk-send time (end-of-stream
  flush + any backlog the server accumulated). Sustained real time means
  overrun stays near the flush cost instead of growing with duration.

The server runs in a separate process (it owns the TPU); clients run in
this process on CPU. Compare with bench.py's engine-direct numbers to
quantify the wire gap (VERDICT round 1, "Next round" #2).

Usage:
  python scripts/bench_serving.py --streams 64 --duration 20
  python scripts/bench_serving.py --role server --port P --streams N  (internal)
"""

import argparse
import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ---------------------------------------------------------------------------
# server role (separate process: owns the device)
# ---------------------------------------------------------------------------


def run_server(port: int, n_streams: int, n_buffer: int, beam: int,
               blank_bias: float, bundle_path: str = ""):
    from bench import build_bundle, set_blank_bias
    from libreasr_tpu.models.streaming import (
        CHAIN_DEPTHS, StreamingConfig, StreamingEngine,
    )
    from libreasr_tpu.serving.server import make_server
    from libreasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    if bundle_path:
        # a TRAINED bundle (e.g. the tone-corpus flagship the 960 recipe
        # exports) replaces the blank-biased random proxy: real weights,
        # natural emission rate
        from libreasr_tpu.api import ASRBundle

        bundle = ASRBundle.from_bundle(
            bundle_path, extract_to="./tmp/bench_serving_bundle"
        )
    else:
        bundle = build_bundle()
        set_blank_bias(bundle, blank_bias)
    scfg = StreamingConfig(
        sr=bundle.frontend.sr, n_buffer=n_buffer, beam_width=beam,
        transfer_dtype="int16",  # the server default (serving/server.py)
    )
    engine = StreamingEngine(bundle, n_streams=n_streams, scfg=scfg)
    # compile + first-step warmup before clients arrive, so the bench
    # measures steady state, not jit latency. The warm state is KEPT:
    # slot opens reset on-device; rebuilding the state eagerly costs
    # seconds of per-leaf round-trips through the tunnel
    engine.warmup(3, chain_depths=CHAIN_DEPTHS)
    server, servicer = make_server(
        bundle, port, workers=max(2 * n_streams, 16), engine=engine
    )
    server.start()
    print(f"READY port={port}", flush=True)
    try:
        server.wait_for_termination()
    finally:
        stats = servicer.timings.snapshot()
        print(f"TIMINGS {json.dumps(stats)}", flush=True)


# ---------------------------------------------------------------------------
# client role
# ---------------------------------------------------------------------------


class ClientStats:
    def __init__(self):
        self.partial_lat = []
        self.overrun = None
        self.n_text = 0
        self.error = None


def run_client(port: int, duration_s: float, chunk_samples: int, stats: ClientStats,
               start_barrier, seed: int):
    """start_barrier: a threading.Barrier, or a float wall-clock time
    every client (across processes) sleeps until — the multi-process
    load driver can't share a Barrier."""
    import grpc

    from libreasr_tpu.serving import proto

    chunk_s = chunk_samples / 16000.0
    n_chunks = int(duration_s / chunk_s)
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(chunk_samples) * 0.1).astype(np.float32).tobytes()
    state = {"last_send": 0.0, "done_send": 0.0}

    channel = grpc.insecure_channel(f"localhost:{port}")
    stream = channel.stream_stream(
        "/ASR.ASR/TranscribeStream",
        request_serializer=proto.Audio.SerializeToString,
        response_deserializer=proto.Transcript.FromString,
    )

    def gen():
        if isinstance(start_barrier, float):
            dt = start_barrier - time.time()
            if dt > 0:
                time.sleep(dt)
        else:
            start_barrier.wait()
        t0 = time.perf_counter()
        for i in range(n_chunks):
            # real-time pacing against the global clock (no drift)
            target = t0 + i * chunk_s
            dt = target - time.perf_counter()
            if dt > 0:
                time.sleep(dt)
            state["last_send"] = time.perf_counter()
            yield proto.Audio(data=pcm, sr=16000)
        state["done_send"] = time.perf_counter()

    try:
        for tr in stream(gen()):
            now = time.perf_counter()
            if tr.data:
                stats.n_text += 1
                stats.partial_lat.append(now - state["last_send"])
        stats.overrun = time.perf_counter() - (state["done_send"] or time.perf_counter())
    except Exception as e:  # pragma: no cover
        stats.error = repr(e)
    finally:
        channel.close()


# ---------------------------------------------------------------------------
# load-worker role (one of P processes, each M threaded clients — the
# single-process thread driver saturates its own GIL past ~128 clients
# and measures the bench host, not the server; r4 verdict weak #3)
# ---------------------------------------------------------------------------


def run_load_worker(port: int, count: int, duration_s: float,
                    start_at: float, seed_base: int):
    stats = [ClientStats() for _ in range(count)]
    threads = [
        threading.Thread(
            target=run_client,
            args=(port, duration_s, 1280, stats[i], start_at, seed_base + i),
        )
        for i in range(count)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=duration_s * 3 + 120)
    out = {
        "lat": [x for s in stats for x in s.partial_lat],
        "over": [s.overrun for s in stats if s.overrun is not None],
        "texts": sum(s.n_text for s in stats),
        "errors": [s.error for s in stats if s.error][:3],
        "n_errors": sum(1 for s in stats if s.error),
    }
    print("LOAD " + json.dumps(out), flush=True)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--role", default="bench",
                   choices=["bench", "server", "load"])
    p.add_argument("--procs", type=int, default=0,
                   help="client driver processes (0 = auto: one per 64 "
                        "clients). >1 removes the driver-side GIL "
                        "bottleneck above ~128 clients")
    p.add_argument("--count", type=int, default=0, help="(load role)")
    p.add_argument("--start-at", type=float, default=0.0, help="(load role)")
    p.add_argument("--seed-base", type=int, default=0, help="(load role)")
    p.add_argument("--streams", type=int, default=64)
    p.add_argument("--duration", type=float, default=20.0)
    p.add_argument("--n-buffer", type=int, default=1)
    p.add_argument("--beam", type=int, default=0)
    p.add_argument("--port", type=int, default=50199)
    p.add_argument("--blank-bias", type=float, default=0.0,
                   help="0 = saturated emission (decode upper bound), "
                        "6 = pure blank (lower bound)")
    p.add_argument("--bundle", default="",
                   help="serve this trained .tar.gz bundle instead of "
                        "the blank-biased random proxy")
    a = p.parse_args()

    if a.role == "server":
        run_server(a.port, a.streams, a.n_buffer, a.beam, a.blank_bias,
                   a.bundle)
        return
    if a.role == "load":
        run_load_worker(a.port, a.count, a.duration, a.start_at,
                        a.seed_base)
        return

    env = dict(os.environ)
    srv = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--role", "server",
         "--port", str(a.port), "--streams", str(a.streams),
         "--n-buffer", str(a.n_buffer), "--beam", str(a.beam),
         "--blank-bias", str(a.blank_bias)]
        + (["--bundle", os.path.abspath(a.bundle)] if a.bundle else []),
        env=env, cwd=REPO, stdout=subprocess.PIPE, text=True,
    )
    try:
        for line in srv.stdout:
            print(f"[server] {line}", end="", file=sys.stderr)
            if line.startswith("READY"):
                break
        else:
            raise RuntimeError("server died before READY")

        chunk_samples = 1280
        procs = a.procs or max(1, -(-a.streams // 64))
        t0 = time.perf_counter()
        if procs <= 1:
            barrier = threading.Barrier(a.streams)
            stats = [ClientStats() for _ in range(a.streams)]
            threads = [
                threading.Thread(
                    target=run_client,
                    args=(a.port, a.duration, chunk_samples, stats[i],
                          barrier, i),
                )
                for i in range(a.streams)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=a.duration * 3 + 120)
            errors = [s.error for s in stats if s.error]
            n_errors = len(errors)
            lat = np.array(sum((s.partial_lat for s in stats), []))
            over = np.array(
                [s.overrun for s in stats if s.overrun is not None])
            texts = sum(s.n_text for s in stats)
        else:
            # multi-process fan-out: P workers x M threads, synchronized
            # on a shared wall-clock start
            per = -(-a.streams // procs)
            start_at = time.time() + 5.0
            workers = []
            for w in range(procs):
                cnt = min(per, a.streams - w * per)
                if cnt <= 0:
                    break
                workers.append(subprocess.Popen(
                    [sys.executable, os.path.abspath(__file__),
                     "--role", "load", "--port", str(a.port),
                     "--count", str(cnt), "--duration", str(a.duration),
                     "--start-at", repr(start_at),
                     "--seed-base", str(w * per)],
                    cwd=REPO, stdout=subprocess.PIPE, text=True,
                ))
            lat_l, over_l, errors = [], [], []
            texts = n_errors = 0
            for w in workers:
                out, _ = w.communicate(timeout=a.duration * 3 + 300)
                for line in out.splitlines():
                    if line.startswith("LOAD "):
                        d = json.loads(line[5:])
                        lat_l.extend(d["lat"])
                        over_l.extend(d["over"])
                        texts += d["texts"]
                        n_errors += d["n_errors"]
                        errors.extend(d["errors"])
            lat, over = np.array(lat_l), np.array(over_l)
        wall = time.perf_counter() - t0
        result = {
            "metric": "wire_p50_partial_latency_ms",
            "value": round(float(np.percentile(lat, 50) * 1e3), 1) if len(lat) else None,
            "unit": "ms",
            "streams": a.streams,
            "blank_bias": a.blank_bias,
            "beam": a.beam,
            "duration_s": a.duration,
            "wall_s": round(wall, 1),
            "p90_ms": round(float(np.percentile(lat, 90) * 1e3), 1) if len(lat) else None,
            "p99_ms": round(float(np.percentile(lat, 99) * 1e3), 1) if len(lat) else None,
            "latency_samples": int(len(lat)),
            "transcript_msgs": texts,
            "overrun_p50_ms": round(float(np.percentile(over, 50) * 1e3), 1) if len(over) else None,
            "overrun_p99_ms": round(float(np.percentile(over, 99) * 1e3), 1) if len(over) else None,
            "procs": procs,
            "errors": errors[:3],
            "n_errors": n_errors,
        }
        print(json.dumps(result))
    finally:
        srv.terminate()
        try:
            for line in srv.stdout:
                print(f"[server] {line}", end="", file=sys.stderr)
        except Exception:
            pass
        srv.wait(timeout=30)


if __name__ == "__main__":
    main()
