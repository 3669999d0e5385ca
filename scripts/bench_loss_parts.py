"""Fused-loss decomposition: joint kernels vs the DP.

bench_step_parts attributes ~70% of the bs-64 train step to the fused
joint+loss fwd+bwd. This drills one level down with the same chained
protocol:

  lp_fwd     joint_lp fwd (Pallas): (encp, pp) -> (lp_blank, lp_emit)
  dp         alphas + betas + occupancies on fixed lp arrays (pure DP)
  lp_bwd     joint_lp bwd (Pallas): occupancy grads -> d_encp/d_pp/dW
  loss_fwd   rnnt_loss_fused forward (lp_fwd + alphas + gather)
  loss_bwd   full custom-vjp backward via jax.grad

Usage: python scripts/bench_loss_parts.py [--bs 64] [--t 80] [--u 60]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, x, k, reps):
    run1, runk = fn(1), fn(k)
    t0 = time.perf_counter()
    float(run1(x))
    c1 = time.perf_counter() - t0
    float(runk(x))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run1(x))
        t1 = time.perf_counter()
        float(runk(x))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (k - 1))
    ms = float(np.median(deltas)) * 1e3
    print(f"  {label:10s} {ms:8.2f} ms   (compile+first {c1:.0f} s)")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--t", type=int, default=80, help="padded enc frames")
    ap.add_argument("--u", type=int, default=60)
    ap.add_argument("--h", type=int, default=2048, help="tower out width")
    ap.add_argument("--j", type=int, default=1024)
    ap.add_argument("--v", type=int, default=2048)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from libreasr_tpu.ops.fused_loss import (
        JointParams, _mmc, _pred_proj, rnnt_loss_fused,
    )
    from libreasr_tpu.ops.pallas.joint_lp import (
        joint_lp_bwd_pallas, joint_lp_fwd_pallas,
    )
    from libreasr_tpu.ops.rnnt_loss import (
        _backward_betas, _forward_alphas, _occupancies, _terminal_gather,
    )
    from libreasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    n, t, u, j, v = args.bs, args.t, args.u, args.j, args.v
    u1 = u + 1
    cdt = jnp.bfloat16
    interp = jax.default_backend() != "tpu"
    print(f"backend: {jax.default_backend()}  N={n} T={t} U1={u1} "
          f"J={j} V={v}")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    enc_out = jax.random.normal(ks[0], (n, t, args.h), jnp.float32) * 0.1
    pred_out = jax.random.normal(ks[1], (n, u1, args.h), jnp.float32) * 0.1
    jp = JointParams(
        w_pred=jax.random.normal(ks[2], (args.h, j)) * 0.02,
        b_pred=jnp.zeros((j,)),
        w_enc=jax.random.normal(ks[3], (args.h, j)) * 0.02,
        w_out=jax.random.normal(ks[4], (j, v)) * 0.02,
        b_out=jnp.zeros((v,)),
    )
    labels = jax.random.randint(ks[5], (n, u), 4, v)
    fl = jnp.full((n,), t, jnp.int32)
    yl = jnp.full((n,), u, jnp.int32)

    encp = jax.block_until_ready(jax.jit(
        lambda e: _mmc(e, jp.w_enc, cdt))(enc_out))
    pp = jax.block_until_ready(jax.jit(
        lambda p: _pred_proj(p, jp, cdt))(pred_out))

    # fixed lp arrays + grads for the dp / lp_bwd parts
    lpb0, lpe0 = jax.jit(
        lambda e, p: joint_lp_fwd_pallas(
            e, p, jp.w_out, jp.b_out, labels, 0, interpret=interp,
            w_dtype=cdt)
    )(encp, pp)
    lpb0 = jax.block_until_ready(lpb0)
    g = jnp.ones((n,), jnp.float32)

    k, reps = args.k, args.reps
    print(f"parts (chained k={k}, median of {reps}):")

    def chained(fn, kk):
        @jax.jit
        def run(x):
            def body(c, _):
                return fn(c), ()

            out, _ = jax.lax.scan(body, x, jnp.arange(kk))
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.ravel()[:2]).astype(jnp.float32)
                       for l in leaves[:4])

        return run

    # Pallas fwd kernel: thread encp
    def fwd_step(e):
        lpb, lpe = joint_lp_fwd_pallas(
            e, pp, jp.w_out, jp.b_out, labels, 0, interpret=interp,
            w_dtype=cdt)
        return e + (lpb[:, :1, :1].sum() * 0).astype(e.dtype)

    timeit("lp_fwd", lambda kk: chained(fwd_step, kk), encp, k, reps)

    # DP: alphas + terminal + betas + occupancies on fixed lp
    def dp_step(lpb):
        alpha, lpe_m = _forward_alphas(lpb, lpe0, yl)
        log_z = _terminal_gather(alpha, lpb, fl, yl)
        beta = _backward_betas(lpb, lpe_m, fl, yl)
        ob, oe = _occupancies(lpb, lpe_m, alpha, beta, fl, yl, log_z)
        return lpb + (ob[:, :1, :1].sum() * 0).astype(lpb.dtype)

    timeit("dp", lambda kk: chained(dp_step, kk), lpb0, k, reps)

    # Pallas bwd kernel: thread encp
    def bwd_step(e):
        d_encp, d_pp, d_wout, d_bout = joint_lp_bwd_pallas(
            e, pp, jp.w_out, jp.b_out, labels,
            -jnp.ones_like(lpb0), -jnp.ones_like(lpe0), 0,
            interpret=interp, w_dtype=cdt)
        return e + (d_encp[:, :1, :1].sum() * 0).astype(e.dtype)

    timeit("lp_bwd", lambda kk: chained(bwd_step, kk), encp, k, reps)

    # full forward
    def lf_step(e):
        loss = rnnt_loss_fused(e, pred_out, jp, labels, fl, yl, 0, 16, cdt)
        return e + (loss.sum() * 0).astype(e.dtype)

    timeit("loss_fwd", lambda kk: chained(lf_step, kk), enc_out, k, reps)

    # full fwd+bwd
    def lb_step(e):
        def lf(ee):
            return rnnt_loss_fused(
                ee, pred_out, jp, labels, fl, yl, 0, 16, cdt).mean()

        d = jax.grad(lf)(e)
        return e + 0.0 * d

    timeit("loss_bwd", lambda kk: chained(lb_step, kk), enc_out, k, reps)


if __name__ == "__main__":
    main()
