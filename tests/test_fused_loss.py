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
