"""Pallas fused LSTM vs lax.scan LSTM on the real chip, at serving shapes.

The scan cell re-reads the recurrent matrix R [H,4H] from HBM every
timestep; the Pallas kernel (ops/pallas/lstm.py) pins R in VMEM (bf16)
and streams the input projections through the pipeline. This script
measures both at the flagship encoder shape (H=1024, the role haste's
CUDA kernels play in the reference, custom_rnn.py:25-44) across batch
sizes N and sequence lengths T, and prints a markdown table for
docs/performance.md.

Usage: python scripts/bench_pallas.py [--quick]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chain(step_fn, k: int):
    """Build a jit program that runs `step_fn` k times with a data
    dependency between iterations — device-side repetition, immune to the
    dispatch/tunnel jitter that makes per-call block_until_ready timing
    unreliable on this backend. step_fn must map x -> y with matching
    [N, T, H] shapes (I == H here)."""

    @jax.jit
    def run(x, s, p):
        def body(c, _):
            y = step_fn(c, s, p)
            return y, ()

        out, _ = jax.lax.scan(body, x, None, length=k)
        # scalar result: timing forces a host transfer of 4 bytes, the
        # only reliable completion barrier on the tunneled backend
        # (block_until_ready returns at enqueue there)
        return jnp.sum(out[:, -1, 0])

    return run


def timeit(step_fn, x, s, p, k=8, reps=5):
    """Median of (T_k - T_1)/(k-1) over reps: the scalar-transfer and
    dispatch overhead is identical for both programs and cancels,
    leaving pure device time per iteration."""
    run1 = chain(step_fn, 1)
    runk = chain(step_fn, k)
    float(run1(x, s, p))
    float(runk(x, s, p))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1(x, s, p))
        t1 = time.perf_counter()
        float(runk(x, s, p))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (k - 1))
    return float(np.median(deltas)), None


def train_main(args):
    """fwd+bwd per layer: scan autodiff vs the custom-VJP Pallas path.
    The chained step maps x -> dx (same shape), with the weight grads
    kept alive through an epsilon-weighted sum so neither path can DCE
    the dR / dW work."""
    from libreasr_tpu.ops import rnn
    from libreasr_tpu.ops.pallas.lstm import lstm_pack_train_pallas

    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    h = args.hidden
    i = h
    params = rnn.init_lstm(jax.random.PRNGKey(0), i, h)
    rng = np.random.default_rng(0)

    def mk(fn):
        def step(x, s, p):
            def loss(xx, pp):
                return jnp.sum(fn(xx, s, pp))

            dx, dp = jax.grad(loss, argnums=(0, 1))(x, p)
            keep = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(dp))
            return dx + 1e-30 * keep

        return step

    scan_train = mk(
        lambda x, s, p: rnn.lstm_scan(
            x, s, p, training=True, compute_dtype=jnp.bfloat16
        )[0]
    )
    pallas_train = mk(
        lambda x, s, p: lstm_pack_train_pallas(
            x, s, p, None, compute_dtype=jnp.bfloat16
        )[0]
    )

    shapes = [(8, 500), (32, 250), (64, 100), (64, 500)]
    if not args.quick:
        shapes += [(8, 2000), (128, 250), (256, 100)]
    print("\n| N | T | scan fwd+bwd | pallas fwd+bwd | speedup |")
    print("|---|---|---|---|---|")
    for n, t in shapes:
        x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
        state = (jnp.zeros((n, h)), jnp.zeros((n, h)))
        try:
            ts, _ = timeit(scan_train, x, state, params)
            tp, _ = timeit(pallas_train, x, state, params)
            print(f"| {n} | {t} | {ts*1e3:.2f} ms | {tp*1e3:.2f} ms "
                  f"| {ts/tp:.2f}x |")
        except Exception as e:  # noqa: BLE001
            print(f"| {n} | {t} | - | FAIL {type(e).__name__}: {e} | - |")

    # gradient sanity at one shape (scan f32 as the oracle)
    n, t = 8, 100
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    state = (jnp.zeros((n, h)), jnp.zeros((n, h)))

    def gx(fn):
        return jax.grad(lambda xx: jnp.sum(fn(xx, state, params)[0]))(x)

    g_ref = gx(lambda x, s, p: rnn.lstm_scan(x, s, p))
    g_p = gx(lambda x, s, p: lstm_pack_train_pallas(
        x, s, p, None, compute_dtype=jnp.bfloat16
    ))
    err = float(jnp.max(jnp.abs(g_ref - g_p)))
    rel = err / float(jnp.max(jnp.abs(g_ref)))
    print(f"\nmax |dx_scan_f32 - dx_pallas| @ N={n},T={t}: {err:.2e} "
          f"(rel {rel:.2e}; bf16 R in the kernel)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--hidden", type=int, default=1024)
    ap.add_argument("--train", action="store_true",
                    help="benchmark fwd+bwd (training) instead of encode")
    args = ap.parse_args()
    if args.train:
        return train_main(args)

    from libreasr_tpu.ops import rnn
    from libreasr_tpu.ops.pallas.lstm import lstm_forward_pallas

    print(f"backend: {jax.default_backend()}  device: {jax.devices()[0]}")
    h = args.hidden
    i = h
    params = rnn.init_lstm(jax.random.PRNGKey(0), i, h)
    rng = np.random.default_rng(0)

    shapes = [(8, 500), (64, 100), (64, 500), (256, 100)]
    if not args.quick:
        shapes += [(8, 2000), (256, 500), (512, 100), (64, 1)]

    scan_f32 = jax.jit(lambda x, s, p: rnn.lstm_scan(x, s, p)[0])
    scan_bf16 = jax.jit(
        lambda x, s, p: rnn.lstm_scan(x, s, p, compute_dtype=jnp.bfloat16)[0]
    )
    pallas = jax.jit(lambda x, s, p: lstm_forward_pallas(x, s, p)[0])

    rows = []
    print(f"\n| N | T | scan f32 | scan bf16 | pallas | pallas vs f32 |")
    print("|---|---|---|---|---|---|")
    for n, t in shapes:
        x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
        state = (jnp.zeros((n, h)), jnp.zeros((n, h)))
        try:
            tf32, _ = timeit(scan_f32, x, state, params)
            tbf16, _ = timeit(scan_bf16, x, state, params)
            tp, _ = timeit(pallas, x, state, params)
            speed = tf32 / tp
            print(
                f"| {n} | {t} | {tf32*1e3:.2f} ms | {tbf16*1e3:.2f} ms "
                f"| {tp*1e3:.2f} ms | {speed:.2f}x |"
            )
            rows.append((n, t, tf32, tbf16, tp))
        except Exception as e:  # noqa: BLE001
            print(f"| {n} | {t} | - | - | FAIL {type(e).__name__} | - |")

    # numeric sanity at one shape
    n, t = 8, 100
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    state = (jnp.zeros((n, h)), jnp.zeros((n, h)))
    y_ref = scan_f32(x, state, params)
    y_p = pallas(x, state, params)
    err = jnp.max(jnp.abs(y_ref - y_p))
    print(f"\nmax |scan_f32 - pallas| @ N={n},T={t}: {float(err):.2e} "
          "(bf16 R in the kernel)")


if __name__ == "__main__":
    main()
