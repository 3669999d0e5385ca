"""Kernel smoke test on the current backend (reference
scripts/check-haste.py ran the CUDA haste kernels fw/bw): runs every RNN
cell forward+backward, the RNN-T loss (lattice + fused), the frontend,
and — on TPU — the Pallas LSTM kernel.

Usage: python scripts/check_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    print(f"  {name:<28} ok  ({(time.time() - t0) * 1e3:7.1f} ms)")
    return out


def main():
    from libreasr_tpu.ops import frontend as fe
    from libreasr_tpu.ops import rnn
    from libreasr_tpu.ops.fused_loss import JointParams, rnnt_loss_fused
    from libreasr_tpu.ops.rnnt_loss import rnnt_loss

    print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    n, t, i, h = 4, 32, 64, 64

    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    for name in ("LSTM", "GRU", "NBRC", "LN_LSTM"):
        scan_fn, init_fn, n_state = rnn.CELLS[name]
        params = init_fn(jax.random.PRNGKey(0), i, h)
        state = tuple(jnp.zeros((n, h)) for _ in range(n_state))
        timed(f"{name} fw", jax.jit(lambda p: scan_fn(x, state, p)[0]), params)
        timed(
            f"{name} bw",
            jax.jit(jax.grad(lambda p: scan_fn(x, state, p)[0].sum())),
            params,
        )

    v, u = 48, 8
    logits = jnp.asarray(rng.standard_normal((n, t, u + 1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (n, u)).astype(np.int32))
    fl = jnp.full((n,), t)
    yl = jnp.full((n,), u)
    timed("rnnt_loss fw", jax.jit(lambda l: rnnt_loss(l, labels, fl, yl).mean()), logits)
    timed(
        "rnnt_loss bw",
        jax.jit(jax.grad(lambda l: rnnt_loss(l, labels, fl, yl).mean())),
        logits,
    )

    enc = jnp.asarray(rng.standard_normal((n, t, h)).astype(np.float32))
    pred = jnp.asarray(rng.standard_normal((n, u + 1, h)).astype(np.float32))
    jp = JointParams(
        w_pred=jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * 0.2),
        b_pred=jnp.zeros(h),
        w_enc=jnp.asarray(rng.standard_normal((h, h)).astype(np.float32) * 0.2),
        w_out=jnp.asarray(rng.standard_normal((h, v)).astype(np.float32) * 0.2),
        b_out=jnp.zeros(v),
    )
    timed(
        "rnnt_loss_fused fw+bw",
        jax.jit(jax.grad(
            lambda e: rnnt_loss_fused(e, pred, jp, labels, fl, yl, 0, 8).mean()
        )),
        enc,
    )

    audio = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    timed(
        "frontend",
        jax.jit(lambda a: fe.features_batch(a, jnp.array([16000, 8000]),
                                            fe.FrontendConfig())[0]),
        audio,
    )

    if jax.default_backend() != "cpu":
        from libreasr_tpu.ops.pallas.lstm import lstm_forward_pallas

        params = rnn.init_lstm(jax.random.PRNGKey(0), i, h)
        timed(
            "pallas LSTM (TPU)",
            jax.jit(lambda xx: lstm_forward_pallas(
                xx, (jnp.zeros((n, h)), jnp.zeros((n, h))), params
            )[0]),
            x,
        )

        from libreasr_tpu.ops.pallas.lstm import lstm_pack_train_pallas

        timed(
            "pallas LSTM train fwd+bwd (TPU)",
            jax.jit(lambda xx: jax.grad(
                lambda z: jnp.sum(lstm_pack_train_pallas(
                    z, (jnp.zeros((n, h)), jnp.zeros((n, h))), params, None,
                    compute_dtype=jnp.bfloat16,
                )[0])
            )(xx)),
            x,
        )

        # fused Pallas joint kernels vs the XLA chunked path, ON
        # HARDWARE: loss parity + gradient cosines (the default-on
        # train path since round 3; interpret-mode CI can't see Mosaic
        # numerics)
        import os

        # lane-aligned shapes — the Pallas path only engages when
        # J % 128 == 0 and V % 128 == 0 (a misaligned check would
        # silently compare XLA against itself)
        jj, vv = 128, 256
        enc_a = jnp.asarray(rng.standard_normal((n, t, jj)).astype(np.float32))
        pred_a = jnp.asarray(
            rng.standard_normal((n, u + 1, jj)).astype(np.float32)
        )
        jp_a = JointParams(
            w_pred=jnp.asarray(
                rng.standard_normal((jj, jj)).astype(np.float32) * 0.2
            ),
            b_pred=jnp.zeros(jj),
            w_enc=jnp.asarray(
                rng.standard_normal((jj, jj)).astype(np.float32) * 0.2
            ),
            w_out=jnp.asarray(
                rng.standard_normal((jj, vv)).astype(np.float32) * 0.2
            ),
            b_out=jnp.zeros(vv),
        )
        labels_a = jnp.asarray(rng.integers(1, vv, (n, u)).astype(np.int32))

        def fused_grads(disable_pallas):
            env = dict(os.environ)
            os.environ["LIBREASR_NO_PALLAS_JOINT"] = (
                "1" if disable_pallas else "0"
            )
            try:
                def loss_fn(e, p, jp_):
                    return rnnt_loss_fused(
                        e, p, jp_, labels_a, fl, yl, 0, 8, jnp.bfloat16
                    ).mean()

                val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                    enc_a, pred_a, jp_a
                )
                return float(val), jax.tree_util.tree_leaves(grads)
            finally:
                os.environ.clear()
                os.environ.update(env)

        v_x, g_x = fused_grads(disable_pallas=True)
        v_p, g_p = fused_grads(disable_pallas=False)
        rel = abs(v_p - v_x) / max(abs(v_x), 1e-9)
        cosines = []
        for a, b_ in zip(g_x, g_p):
            a = np.asarray(a).ravel()
            b_ = np.asarray(b_).ravel()
            denom = np.linalg.norm(a) * np.linalg.norm(b_)
            cosines.append(float(a @ b_ / denom) if denom > 0 else 1.0)
        print(f"  pallas joint loss rel err {rel:.2e}, "
              f"min grad cosine {min(cosines):.6f}")
        assert rel < 1e-3 and min(cosines) > 0.999, (rel, cosines)
    print("all kernels ok")


if __name__ == "__main__":
    main()
