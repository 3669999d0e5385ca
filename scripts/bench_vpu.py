"""VPU micro-bench: measured elementwise/transcendental throughput.

The matmul-only roofline under-counts the RNN-T joint: tanh over
[rows, J] and logsumexp/softmax over [rows, V] are VPU work whose
throughput is far below MXU peak. This measures the achieved rates on
the actual chip (chained-k protocol, median) so
`flops.train_step_ceiling` can carry a calibrated VPU term instead of
an invented constant.

Usage: python scripts/bench_vpu.py [--mb 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def rate(label, fn, x, k=8, reps=5):
    @jax.jit
    def run1(x):
        return jnp.sum(fn(x).ravel()[:2])

    @jax.jit
    def runk(x):
        def body(c, _):
            return fn(c), ()

        out, _ = jax.lax.scan(body, x, jnp.arange(k))
        return jnp.sum(out.ravel()[:2])

    float(run1(x))
    float(runk(x))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1(x))
        t1 = time.perf_counter()
        float(runk(x))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (k - 1))
    s = float(np.median(deltas))
    gels = x.size / s / 1e9
    print(f"  {label:22s} {s*1e3:7.3f} ms  {gels:8.1f} Gelem/s")
    return gels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=256,
                    help="array size in Mi elements")
    args = ap.parse_args()
    n = args.mb * (1 << 20)
    x = jnp.linspace(-3.0, 3.0, n, dtype=jnp.float32).reshape(-1, 2048)
    print(f"backend: {jax.default_backend()}  array {x.shape} f32 "
          f"({x.size/2**20:.0f} Mi elements)")
    print("elementwise rates (chained k=8, per full pass):")
    rate("add (x+1)", lambda a: a + 1.0, x)
    rate("mul (2x)", lambda a: a * 2.0, x)
    rate("exp", jnp.exp, x)
    rate("tanh", jnp.tanh, x)
    r_ls = rate("logsumexp(rowwise)",
                lambda a: a - jax.nn.logsumexp(a, axis=-1, keepdims=True), x)
    r_sm = rate("softmax(rowwise)",
                lambda a: jax.nn.softmax(a, axis=-1), x)
    print("# suggested calibration (elements/s through the full op):")
    print(f"#   logsumexp {r_ls*1e9:.3e}  softmax {r_sm*1e9:.3e}")


if __name__ == "__main__":
    main()
