"""Fused joint+loss vs the unfused joint->rnnt_loss composition: same
loss, same gradients w.r.t. encoder, predictor, and joint params."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.ops.fused_loss import JointParams, rnnt_loss_fused
from libreasr_tpu.ops.rnnt_loss import rnnt_loss


def make_inputs(rng, n=2, t=10, u=4, h=6, j=5, v=9):
    enc = jnp.asarray(rng.standard_normal((n, t, h)).astype(np.float32) * 0.5)
    pred = jnp.asarray(rng.standard_normal((n, u + 1, h)).astype(np.float32) * 0.5)
    jp = JointParams(
        w_pred=jnp.asarray(rng.standard_normal((h, j)).astype(np.float32) * 0.4),
        b_pred=jnp.asarray(rng.standard_normal(j).astype(np.float32) * 0.1),
        w_enc=jnp.asarray(rng.standard_normal((h, j)).astype(np.float32) * 0.4),
        w_out=jnp.asarray(rng.standard_normal((j, v)).astype(np.float32) * 0.4),
        b_out=jnp.asarray(rng.standard_normal(v).astype(np.float32) * 0.1),
    )
    labels = jnp.asarray(rng.integers(1, v, (n, u)).astype(np.int32))
    fl = jnp.array([t, t - 3])
    yl = jnp.array([u, u - 2])
    return enc, pred, jp, labels, fl, yl


def unfused(enc, pred, jp, labels, fl, yl):
    hidden = jnp.tanh(
        (enc @ jp.w_enc)[:, :, None, :]
        + (pred @ jp.w_pred + jp.b_pred)[:, None, :, :]
    )
    logits = hidden @ jp.w_out + jp.b_out
    return rnnt_loss(logits, labels, fl, yl)


@pytest.mark.parametrize("t_chunk", [4, 5, 16])
def test_fused_matches_unfused(rng, t_chunk):
    enc, pred, jp, labels, fl, yl = make_inputs(rng)
    want = unfused(enc, pred, jp, labels, fl, yl)
    got = rnnt_loss_fused(enc, pred, jp, labels, fl, yl, 0, t_chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_fused_gradients_match(rng):
    enc, pred, jp, labels, fl, yl = make_inputs(rng)

    def loss_fused(enc, pred, jp):
        return jnp.sum(rnnt_loss_fused(enc, pred, jp, labels, fl, yl, 0, 4))

    def loss_ref(enc, pred, jp):
        return jnp.sum(unfused(enc, pred, jp, labels, fl, yl))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(enc, pred, jp)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(enc, pred, jp)
    for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_fused_jit(rng):
    enc, pred, jp, labels, fl, yl = make_inputs(rng)
    f = jax.jit(
        lambda e, p, j: rnnt_loss_fused(e, p, j, labels, fl, yl, 0, 5).mean()
    )
    assert np.isfinite(float(f(enc, pred, jp)))


def test_fused_bf16_matmuls_close_and_grad_aligned(rng):
    """compute_dtype=bfloat16 rounds only the joint matmul INPUTS
    (accumulation and the DP stay f32): losses stay close and gradients
    stay directionally aligned with the f32 path — the mixed-precision
    contract the bf16 training policy relies on."""
    enc, pred, jp, labels, fl, yl = make_inputs(rng)

    f32 = rnnt_loss_fused(enc, pred, jp, labels, fl, yl, 0, 4)
    b16 = rnnt_loss_fused(enc, pred, jp, labels, fl, yl, 0, 4, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32),
                               rtol=5e-2, atol=5e-2)

    def loss(cdt):
        def go(e, p, j):
            return jnp.sum(rnnt_loss_fused(e, p, j, labels, fl, yl, 0, 4, cdt))

        return jax.grad(go, argnums=(0, 1, 2))(enc, pred, jp)

    g32 = jax.tree_util.tree_leaves(loss(None))
    g16 = jax.tree_util.tree_leaves(loss(jnp.bfloat16))
    for a, b in zip(g32, g16):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        if denom > 1e-12:
            cos = float(np.dot(a, b) / denom)
            assert cos > 0.99, cos


def test_pallas_joint_matches_xla(rng, monkeypatch):
    """The fused Pallas joint kernels (ops/pallas/joint_lp.py), forced on
    CPU in interpret mode with f32 weights: loss and all gradients must
    match the XLA chunked path exactly (same math, no lattice in HBM)."""
    enc, pred, jp, labels, fl, yl = make_inputs(rng)

    def run():
        def go(e, p, j):
            return jnp.sum(rnnt_loss_fused(e, p, j, labels, fl, yl, 0, 4))

        val, grads = jax.value_and_grad(go, argnums=(0, 1, 2))(enc, pred, jp)
        return val, grads

    v_x, g_x = run()
    monkeypatch.setenv("LIBREASR_FORCE_PALLAS", "1")
    v_p, g_p = run()
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-6)
    # dW accumulates tile-by-tile in the kernel vs one big sum in XLA —
    # reassociation noise at float-epsilon scale
    for a, b in zip(jax.tree_util.tree_leaves(g_x),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_gate_bounds_label_length(monkeypatch):
    """On TPU the eligibility gate must route long-label batches to the
    XLA chunked path: the fwd kernel holds a full [BT*Up, V] logits tile
    in VMEM and the bwd row-slicer's bound only holds for u1 <= MAX_U1 —
    past that, engaging Pallas means a Mosaic allocation failure, not a
    slow path. FORCE_PALLAS must not bypass the hardware checks."""
    from libreasr_tpu.ops import fused_loss as flmod
    from libreasr_tpu.ops.pallas.joint_lp import MAX_U1

    j, v = 128, 256
    jp = JointParams(
        w_pred=jnp.zeros((8, j)), b_pred=jnp.zeros(j),
        w_enc=jnp.zeros((8, j)), w_out=jnp.zeros((j, v)),
        b_out=jnp.zeros(v),
    )
    monkeypatch.setattr(flmod.jax, "default_backend", lambda: "tpu")
    assert flmod._joint_pallas_ok(jp, jnp.bfloat16, MAX_U1)
    assert not flmod._joint_pallas_ok(jp, jnp.bfloat16, MAX_U1 + 1)
    assert not flmod._joint_pallas_ok(jp, None, MAX_U1)  # f32 policy
    # FORCE_PALLAS is an interpret-mode (off-TPU) switch only
    monkeypatch.setenv("LIBREASR_FORCE_PALLAS", "1")
    assert not flmod._joint_pallas_ok(jp, jnp.bfloat16, MAX_U1 + 1)
    assert not flmod._joint_pallas_ok(jp, None, MAX_U1)
    # misaligned vocab falls back too
    jp_bad = jp._replace(w_out=jnp.zeros((j, v + 8)), b_out=jnp.zeros(v + 8))
    assert not flmod._joint_pallas_ok(jp_bad, jnp.bfloat16, MAX_U1)
