"""Train-step decomposition: where the non-speed-of-light time goes.

bench_train_step measures the whole step vs its shape-aware roofline
(2.3x SoL at bs 16, 4.0x at bs 64). This script times each stage as
its OWN chained jitted program (same (T_k - T_1)/(k-1) protocol, data
dependency threaded through the chain) so the residue is attributed by
measurement instead of argument:

  frontend   device STFT->mel->SpecAug->stack (augment on)
  enc_fwd    encoder tower forward, train=True
  enc_bwd    encoder forward + grad wrt params (fwd+bwd)
  pred_bwd   predictor forward + grad
  loss_bwd   fused joint+loss fwd+grad given fixed enc/pred outputs
  opt        ranger transform + apply_updates on fixed grads

The parts legitimately don't sum to the full step (XLA fuses across
stage boundaries in the real program; grads of a sum are not grads of
the loss) — the point is each part's distance from ITS roofline
component, which localizes the gap.

Usage: python scripts/bench_step_parts.py [--bs 64] [--secs 6] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained(fn, k):
    """Chain k data-dependent applications of fn(x)->x into one jit."""

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()

        out, _ = jax.lax.scan(body, x, jnp.arange(k))
        # ONE 4-byte host transfer is the only reliable completion
        # barrier on the tunneled backend (bench_train_step protocol)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.ravel()[:2]).astype(jnp.float32)
                   for l in leaves[:4])

    return run


def timeit(label, fn1, fnk, x, k, reps):
    t0 = time.perf_counter()
    float(fn1(x))
    c1 = time.perf_counter() - t0
    float(fnk(x))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn1(x))
        t1 = time.perf_counter()
        float(fnk(x))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (k - 1))
    ms = float(np.median(deltas)) * 1e3
    print(f"  {label:10s} {ms:8.2f} ms/step   (compile+first {c1:.0f} s)")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--u", type=int, default=60)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--parts", default="",
                    help="comma list to restrict (frontend,enc_fwd,"
                         "enc_bwd,pred_bwd,loss_bwd,opt)")
    args = ap.parse_args()

    from libreasr_tpu.config import open_config
    from libreasr_tpu.models.transducer import (
        Transducer, TransducerConfig, init_transducer,
    )
    from libreasr_tpu.ops.frontend import FrontendConfig, features_batch
    from libreasr_tpu.ops.fused_loss import (
        joint_params_from_flax, rnnt_loss_fused,
    )
    from libreasr_tpu.training.optimizers import build_optimizer
    from libreasr_tpu.utils import enable_compilation_cache
    import optax

    enable_compilation_cache()
    print(f"backend: {jax.default_backend()}  bs={args.bs} x {args.secs:.0f}s")

    conf = open_config("config/base.yaml")
    conf["dtypes"]["compute"] = "bfloat16"
    cfg = TransducerConfig.from_config(conf)
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    frontend = FrontendConfig.from_config(conf)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    rng = np.random.default_rng(0)
    n_samp = int(args.secs * conf["sr"])
    rows = []
    for lo in range(0, args.bs, 16):
        n = min(16, args.bs - lo)
        pcm = (rng.standard_normal((n, n_samp)) * 0.1).astype(np.float32)
        q = np.clip(np.round(pcm * 32768.0), -32768, 32767).astype(np.int16)
        rows.append(jax.device_put(q))
    audio = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
    audio_len = jnp.full((args.bs,), n_samp, jnp.int32)
    labels = jnp.asarray(
        rng.integers(4, cfg.vocab_sz, (args.bs, args.u)).astype(np.int32))
    yl = jnp.full((args.bs,), args.u, jnp.int32)
    key = jax.random.PRNGKey(1)

    # materialize stage inputs once (device-resident)
    feats, flens = jax.jit(
        lambda a, al: features_batch(a, al, frontend, rng=key, augment=True)
    )(audio, audio_len)
    feats = jax.block_until_ready(feats)
    flens_red = flens // max(cfg.reduction_factor, 1)

    def enc_fwd(p, f):
        (out, _), _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, f, lengths=flens,
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
            method=Transducer.encode,
        )
        return out

    def pred_fwd(p, y):
        (out, _), _ = model.apply(
            {"params": p, "batch_stats": batch_stats}, y, lengths=yl,
            train=True, rngs={"dropout": key}, mutable=["batch_stats"],
            method=Transducer.predict,
        )
        return out

    enc_out = jax.block_until_ready(jax.jit(enc_fwd)(params, feats))
    yconcat = jnp.concatenate(
        [jnp.full((args.bs, 1), cfg.bos, jnp.int32), labels], axis=1)
    pred_out = jax.block_until_ready(jax.jit(pred_fwd)(params, yconcat))

    tx = build_optimizer("ranger", 5e-4, weight_decay=0.01, grad_clip=10.0)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)

    want = set(args.parts.split(",")) if args.parts else None
    k, reps = args.k, args.reps
    print(f"parts (chained k={k}, median of {reps}):")

    def maybe(name, make1, makek, x):
        if want and name not in want:
            return
        timeit(name, make1, makek, x, k, reps)

    # frontend: thread audio -> audio (scale output back to pcm shape)
    def fe_step(a):
        f, _ = features_batch(a, audio_len, frontend, rng=key, augment=True)
        # data dependency back into the next iteration's input
        return a + (f[:, 0, :1].sum() * 0).astype(a.dtype)

    maybe("frontend", chained(fe_step, 1), chained(fe_step, k), audio)

    # encoder fwd: thread feats
    def ef_step(f):
        return f + enc_fwd(params, f)[:, :1, :1].mean().astype(f.dtype) * 0

    maybe("enc_fwd", chained(ef_step, 1), chained(ef_step, k), feats)

    # encoder fwd+bwd: thread params
    def eb_step(p):
        g = jax.grad(lambda pp: enc_fwd(pp, feats).mean())(p)
        return jax.tree_util.tree_map(lambda a, b: a + 0.0 * b, p, g)

    maybe("enc_bwd", chained(eb_step, 1), chained(eb_step, k), params)

    def pb_step(p):
        g = jax.grad(lambda pp: pred_fwd(pp, yconcat).mean())(p)
        return jax.tree_util.tree_map(lambda a, b: a + 0.0 * b, p, g)

    maybe("pred_bwd", chained(pb_step, 1), chained(pb_step, k), params)

    # fused loss fwd+bwd given fixed tower outputs: thread joint params
    def lb_step(jp_flax):
        def lf(j):
            per = rnnt_loss_fused(
                enc_out, pred_out, joint_params_from_flax(j), labels,
                flens_red, yl, cfg.blank, 16, cfg.compute_dtype,
            )
            return per.mean()

        g = jax.grad(lf)(jp_flax)
        return jax.tree_util.tree_map(lambda a, b: a + 0.0 * b, jp_flax, g)

    maybe("loss_bwd", chained(lb_step, 1), chained(lb_step, k),
          params["joint"])

    # optimizer: thread params through update+apply
    def opt_step(p):
        upd, _ = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, upd)

    maybe("opt", chained(opt_step, 1), chained(opt_step, k), params)


if __name__ == "__main__":
    main()
