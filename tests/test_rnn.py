"""RNN cell tests vs explicit numpy step oracles implementing the
reference math (haste lstm.py:34-67, gru.py:30-63)."""

import numpy as np
import jax
import jax.numpy as jnp

from libreasr_tpu.ops import rnn


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_lstm(x, h0, c0, kernel, rkernel, bias):
    n, t, _ = x.shape
    hsz = h0.shape[-1]
    h, c = h0.copy(), c0.copy()
    ys = []
    for ti in range(t):
        v = h @ rkernel + x[:, ti] @ kernel + bias
        i, g, f, o = np.split(v, 4, axis=-1)
        c = sigmoid(f) * c + sigmoid(i) * np.tanh(g)
        h = sigmoid(o) * np.tanh(c)
        ys.append(h)
    return np.stack(ys, 1), h, c


def np_gru(x, h0, kernel, rkernel, bias, rbias):
    n, t, _ = x.shape
    h = h0.copy()
    ys = []
    for ti in range(t):
        wx = x[:, ti] @ kernel + bias
        rh = h @ rkernel + rbias
        wz, wr, wg = np.split(wx, 3, -1)
        rz, rr, rg = np.split(rh, 3, -1)
        z = sigmoid(wz + rz)
        r = sigmoid(wr + rr)
        g = np.tanh(wg + r * rg)
        h = z * h + (1 - z) * g
        ys.append(h)
    return np.stack(ys, 1), h


def test_lstm_matches_numpy(rng):
    n, t, i, h = 3, 7, 5, 4
    x = rng.standard_normal((n, t, i)).astype(np.float32)
    params = rnn.init_lstm(jax.random.PRNGKey(0), i, h)
    h0 = rng.standard_normal((n, h)).astype(np.float32) * 0.1
    c0 = rng.standard_normal((n, h)).astype(np.float32) * 0.1
    y, (hf, cf) = rnn.lstm_scan(jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0)), params)
    y_np, hf_np, cf_np = np_lstm(
        x, h0, c0, np.asarray(params.kernel),
        np.asarray(params.recurrent_kernel), np.asarray(params.bias),
    )
    np.testing.assert_allclose(np.asarray(y), y_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), hf_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), cf_np, rtol=1e-4, atol=1e-5)


def test_gru_matches_numpy(rng):
    n, t, i, h = 2, 6, 4, 5
    x = rng.standard_normal((n, t, i)).astype(np.float32)
    params = rnn.init_gru(jax.random.PRNGKey(1), i, h)
    params = params._replace(
        bias=jnp.asarray(rng.standard_normal(3 * h).astype(np.float32) * 0.1),
        recurrent_bias=jnp.asarray(rng.standard_normal(3 * h).astype(np.float32) * 0.1),
    )
    h0 = rng.standard_normal((n, h)).astype(np.float32) * 0.1
    y, (hf,) = rnn.gru_scan(jnp.asarray(x), (jnp.asarray(h0),), params)
    y_np, hf_np = np_gru(
        x, h0, np.asarray(params.kernel), np.asarray(params.recurrent_kernel),
        np.asarray(params.bias), np.asarray(params.recurrent_bias),
    )
    np.testing.assert_allclose(np.asarray(y), y_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), hf_np, rtol=1e-4, atol=1e-5)


def test_lstm_forget_bias_init():
    params = rnn.init_lstm(jax.random.PRNGKey(0), 4, 8, forget_bias=1.0)
    b = np.asarray(params.bias)
    assert (b[:16] == 0).all() and (b[16:24] == 1.0).all() and (b[24:] == 0).all()


def test_length_masking(rng):
    n, t, i, h = 2, 8, 3, 4
    x = rng.standard_normal((n, t, i)).astype(np.float32)
    params = rnn.init_lstm(jax.random.PRNGKey(0), i, h)
    h0 = jnp.zeros((n, h))
    c0 = jnp.zeros((n, h))
    lengths = jnp.array([8, 3])
    y, (hf, cf) = rnn.lstm_scan(jnp.asarray(x), (h0, c0), params, lengths=lengths)
    # outputs past length are exactly zero (pack_padded semantics)
    assert np.abs(np.asarray(y)[1, 3:]).max() == 0.0
    # final state equals the state at the length boundary
    y_short, (hf_s, cf_s) = rnn.lstm_scan(
        jnp.asarray(x[1:2, :3]), (h0[1:2], c0[1:2]), params
    )
    np.testing.assert_allclose(np.asarray(hf)[1], np.asarray(hf_s)[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cf)[1], np.asarray(cf_s)[0], rtol=1e-5, atol=1e-6)


def test_zoneout_eval_mode(rng):
    n, t, i, h = 2, 5, 3, 4
    x = rng.standard_normal((n, t, i)).astype(np.float32)
    params = rnn.init_gru(jax.random.PRNGKey(0), i, h)
    h0 = (jnp.zeros((n, h)),)
    y_plain, _ = rnn.gru_scan(jnp.asarray(x), h0, params)
    y_zo, _ = rnn.gru_scan(jnp.asarray(x), h0, params, zoneout=0.5, training=False)
    # eval zoneout damps the state trajectory; first step: h1_zo = 0.5 * h1
    np.testing.assert_allclose(
        np.asarray(y_zo)[:, 0], 0.5 * np.asarray(y_plain)[:, 0], rtol=1e-5, atol=1e-6
    )


def test_layernorm_lstm_runs(rng):
    n, t, i, h = 2, 6, 4, 8
    x = rng.standard_normal((n, t, i)).astype(np.float32)
    params = rnn.init_layernorm_lstm(jax.random.PRNGKey(0), i, h)
    y, (hf, cf) = rnn.layernorm_lstm_scan(
        jnp.asarray(x), (jnp.zeros((n, h)), jnp.zeros((n, h))), params
    )
    assert y.shape == (n, t, h)
    assert np.isfinite(np.asarray(y)).all()


def test_time_reduce():
    x = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)
    y, lens = rnn.time_reduce(x, jnp.array([8, 5]), 2)
    assert y.shape == (2, 4, 3)
    np.testing.assert_allclose(
        np.asarray(y)[0, 0], np.asarray(x)[0, :2].mean(axis=0)
    )
    np.testing.assert_array_equal(np.asarray(lens), [4, 2])


def test_lstm_grad_flows(rng):
    n, t, i, h = 2, 5, 3, 4
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    params = rnn.init_lstm(jax.random.PRNGKey(0), i, h)

    def loss_fn(p):
        y, _ = rnn.lstm_scan(x, (jnp.zeros((n, h)), jnp.zeros((n, h))), p)
        return jnp.sum(y**2)

    grads = jax.grad(loss_fn)(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert np.abs(np.asarray(grads.kernel)).max() > 0
