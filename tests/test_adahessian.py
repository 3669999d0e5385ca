"""AdaHessian: standalone convergence, extra-args plumbing through
chain/MultiSteps, and the full hutchinson train step."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
from libreasr_tpu.training.learner import Batch, Learner
from libreasr_tpu.training.optimizers import adahessian, build_optimizer


def test_adahessian_quadratic():
    params = {"w": jnp.array([3.0, -2.0, 1.5])}
    tx = build_optimizer("adahessian", 0.5)
    state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    p = params
    for _ in range(60):
        g = jax.grad(loss)(p)
        # exact hessian diag of sum(w^2) is 2
        hd = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 2.0), g)
        u, state = tx.update(g, state, p, hessian_diag=hd)
        p = optax.apply_updates(p, u)
    assert float(loss(p)) < 0.1 * float(loss(params))


def test_hutchinson_train_step(rng):
    cfg = TransducerConfig(
        feature_sz=12, embed_sz=6, vocab_sz=12, hidden_sz=8, out_sz=8,
        joint_sz=8, enc_num_layers=1, pred_num_layers=1,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adahessian", 1e-2)
    learner = Learner(model, variables, tx, frontend=None, hutchinson=True)
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((2, 6, 12)).astype(np.float32)),
        audio_len=jnp.array([6, 5]),
        labels=jnp.asarray(rng.integers(1, 12, (2, 3)).astype(np.int32)),
        label_len=jnp.array([3, 2]),
    )
    losses = [learner.step(batch)["loss"] for _ in range(6)]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_autodiff_loss_matches_custom_vjp(rng):
    """rnnt_loss_autodiff (any-order differentiable, scan-sized program)
    must match the analytic custom_vjp path in value and gradient."""
    import jax
    import jax.numpy as jnp

    from libreasr_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_autodiff

    n, t, u1, v = 3, 7, 5, 11
    logits = jnp.asarray(rng.standard_normal((n, t, u1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (n, u1 - 1)).astype(np.int32))
    fl = jnp.asarray([7, 5, 3])
    yl = jnp.asarray([4, 2, 0])

    def f(impl):
        return jax.value_and_grad(
            lambda lg: jnp.sum(impl(lg, labels, fl, yl))
        )(logits)

    v_ref, g_ref = f(rnnt_loss)
    v_ad, g_ad = f(rnnt_loss_autodiff)
    np.testing.assert_allclose(float(v_ad), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_autodiff_loss_hvp_matches_finite_differences(rng):
    """Forward-over-reverse hvp through rnnt_loss_autodiff (what the
    AdaHessian train step computes) vs central finite differences of the
    gradient — VERDICT r2 #7 done-criterion."""
    import jax
    import jax.numpy as jnp

    from libreasr_tpu.ops.rnnt_loss import rnnt_loss_autodiff

    n, t, u1, v = 2, 5, 4, 8
    logits = jnp.asarray(rng.standard_normal((n, t, u1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (n, u1 - 1)).astype(np.int32))
    fl = jnp.asarray([5, 4])
    yl = jnp.asarray([3, 2])
    z = jnp.asarray(rng.standard_normal(logits.shape).astype(np.float32))

    def loss(lg):
        return jnp.sum(rnnt_loss_autodiff(lg, labels, fl, yl))

    grad = jax.grad(loss)
    _, hz = jax.jvp(grad, (logits,), (z,))
    eps = 1e-3
    fd = (grad(logits + eps * z) - grad(logits - eps * z)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(hz), np.asarray(fd),
                               rtol=5e-2, atol=5e-3)
