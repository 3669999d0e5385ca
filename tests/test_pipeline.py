"""Pipeline-parallel LSTM stack: forward/backward parity vs the
sequential scan stack on a virtual 4-stage pipe mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from libreasr_tpu.ops.rnn import init_lstm, lstm_scan
from libreasr_tpu.parallel.pipeline import (
    pipeline_lstm_stack, stack_layer_params,
)

H, T, N, L, STAGES, MICRO = 16, 10, 8, 4, 4, 4


def make_stack(seed=0):
    rngs = jax.random.split(jax.random.PRNGKey(seed), L)
    return [init_lstm(r, H, H) for r in rngs]


def sequential(layers, x, lengths=None):
    zero = (jnp.zeros((x.shape[0], H)), jnp.zeros((x.shape[0], H)))
    y = x
    for p in layers:
        y, _ = lstm_scan(y, zero, p, lengths=lengths)
    return y


def pipe_mesh():
    return Mesh(np.asarray(jax.devices()[:STAGES]), ("pipe",))


def test_pipeline_forward_matches_sequential(rng):
    layers = make_stack()
    x = jnp.asarray(rng.standard_normal((N, T, H)).astype(np.float32))
    lengths = jnp.asarray([T, T - 1, T - 3, T, T - 2, T, T - 5, T])
    want = sequential(layers, x, lengths)
    got = pipeline_lstm_stack(
        stack_layer_params(layers), x,
        mesh=pipe_mesh(), n_micro=MICRO, lengths=lengths,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_backward_matches_sequential(rng):
    layers = make_stack(1)
    x = jnp.asarray(rng.standard_normal((N, T, H)).astype(np.float32))
    stacked = stack_layer_params(layers)

    def loss_pipe(params, x):
        y = pipeline_lstm_stack(params, x, mesh=pipe_mesh(), n_micro=MICRO)
        return jnp.sum(y ** 2)

    def loss_seq(params, x):
        y = sequential([
            jax.tree_util.tree_map(lambda a: a[i], params) for i in range(L)
        ], x)
        return jnp.sum(y ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked, x)
    g_seq = jax.grad(loss_seq)(stacked, x)
    for a, b, name in zip(
        jax.tree_util.tree_leaves(g_pipe),
        jax.tree_util.tree_leaves(g_seq),
        [f for f in type(stacked)._fields],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"grad mismatch in {name}",
        )


def test_pipeline_shape_guards():
    layers = make_stack()
    stacked = stack_layer_params(layers)
    x = jnp.zeros((N, T, H))
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_lstm_stack(stacked, x, mesh=pipe_mesh(), n_micro=3)
    with pytest.raises(ValueError, match="uniform"):
        pipeline_lstm_stack(stacked, jnp.zeros((N, T, H + 2)),
                            mesh=pipe_mesh(), n_micro=MICRO)
