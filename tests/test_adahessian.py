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
