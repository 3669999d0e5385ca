"""Checkpoint-import parity tests.

1. torch nn.LSTM -> convert_torch_lstm -> our lstm_scan matches torch
   output exactly (gate-order permutation correctness).
2. A synthetic reference-layout state_dict -> convert_transducer -> our
   Transducer forward matches an independent numpy implementation of the
   reference math (LN -> LSTM stack + BN -> embed/ffn/GRU stack + BN ->
   concat joint).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.compat.torch_import import (
    convert_torch_lstm, convert_transducer,
)
from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
from libreasr_tpu.ops import rnn as rnn_ops


def test_torch_lstm_parity(rng):
    torch = pytest.importorskip("torch")
    n, t, i, h = 2, 6, 5, 4
    lstm = torch.nn.LSTM(i, h, batch_first=True)
    x = rng.standard_normal((n, t, i)).astype(np.float32)
    with torch.no_grad():
        want, (h_t, c_t) = lstm(torch.from_numpy(x))
    sd = {k: v.detach().numpy() for k, v in lstm.state_dict().items()}
    cell = convert_torch_lstm(
        {f"x.{k}": v for k, v in sd.items()}, "x", layer=0
    )
    params = rnn_ops.LSTMParams(
        jnp.asarray(cell["kernel"]),
        jnp.asarray(cell["recurrent_kernel"]),
        jnp.asarray(cell["bias"]),
    )
    y, (hf, cf) = rnn_ops.lstm_scan(
        jnp.asarray(x), (jnp.zeros((n, h)), jnp.zeros((n, h))), params
    )
    np.testing.assert_allclose(
        np.asarray(y), want.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hf), h_t[0].numpy(), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# numpy oracle of the reference forward
# ---------------------------------------------------------------------------


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def np_bn_eval(x, w, b, mean, var, eps=1e-5):
    return (x - mean) / np.sqrt(var + eps) * w + b


def np_lstm_torch_layout(x, sd, p, h0):
    """torch LSTM (i,f,g,o) with learnable initial state h0 [2,1,1,H]."""
    n, t, _ = x.shape
    w_ih, w_hh = sd[f"{p}.weight_ih_l0"], sd[f"{p}.weight_hh_l0"]
    bias = sd[f"{p}.bias_ih_l0"] + sd[f"{p}.bias_hh_l0"]
    hsz = w_hh.shape[1]
    h = np.broadcast_to(h0[0, 0], (n, hsz)).copy()
    c = np.broadcast_to(h0[1, 0], (n, hsz)).copy()
    ys = []
    for ti in range(t):
        v = x[:, ti] @ w_ih.T + h @ w_hh.T + bias
        i, f, g, o = np.split(v, 4, -1)
        c = sigmoid(f) * c + sigmoid(i) * np.tanh(g)
        h = sigmoid(o) * np.tanh(c)
        ys.append(h)
    return np.stack(ys, 1)


def np_gru_haste(x, sd, p, h0):
    n, t, _ = x.shape
    k, rk = sd[f"{p}.kernel"], sd[f"{p}.recurrent_kernel"]
    b, rb = sd[f"{p}.bias"], sd[f"{p}.recurrent_bias"]
    hsz = rk.shape[0]
    h = np.broadcast_to(h0[0, 0], (n, hsz)).copy()
    ys = []
    for ti in range(t):
        wx = x[:, ti] @ k + b
        rh = h @ rk + rb
        wz, wr, wg = np.split(wx, 3, -1)
        rz, rr, rg = np.split(rh, 3, -1)
        z = sigmoid(wz + rz)
        r = sigmoid(wr + rr)
        g = np.tanh(wg + r * rg)
        h = z * h + (1 - z) * g
        ys.append(h)
    return np.stack(ys, 1)


def make_reference_state_dict(rng, cfg):
    """Random reference-layout (torch-style) Transducer state_dict."""
    sd = {}
    f, h, e, v, j = (
        cfg.feature_sz, cfg.hidden_sz, cfg.embed_sz, cfg.vocab_sz, cfg.joint_sz,
    )
    r = lambda *s: (rng.standard_normal(s) * 0.3).astype(np.float32)
    sd["encoder.input_norm.weight"] = r(f) + 1
    sd["encoder.input_norm.bias"] = r(f)
    in_sz = f
    for i in range(cfg.enc_num_layers):
        p = f"encoder.rnn_stack.rnns.{i}"
        sd[f"{p}.weight_ih_l0"] = r(4 * h, in_sz)
        sd[f"{p}.weight_hh_l0"] = r(4 * h, h)
        sd[f"{p}.bias_ih_l0"] = r(4 * h)
        sd[f"{p}.bias_hh_l0"] = r(4 * h)
        sd[f"encoder.rnn_stack.hs.{i}"] = r(2, 1, 1, h)
        sd[f"encoder.rnn_stack.bns.{i}.weight"] = r(h) + 1
        sd[f"encoder.rnn_stack.bns.{i}.bias"] = r(h)
        sd[f"encoder.rnn_stack.bns.{i}.running_mean"] = r(h) * 0.1
        sd[f"encoder.rnn_stack.bns.{i}.running_var"] = np.abs(r(h)) + 1
        in_sz = h
    sd["predictor.embed.weight"] = r(v, e)
    sd["predictor.embed.weight"][0] = 0  # padding_idx
    sd["predictor.ffn.weight"] = r(h, e)
    sd["predictor.ffn.bias"] = r(h)
    for i in range(cfg.pred_num_layers):
        p = f"predictor.rnn_stack.rnns.{i}"
        sd[f"{p}.kernel"] = r(h, 3 * h)
        sd[f"{p}.recurrent_kernel"] = r(h, 3 * h)
        sd[f"{p}.bias"] = r(3 * h)
        sd[f"{p}.recurrent_bias"] = r(3 * h)
        sd[f"predictor.rnn_stack.hs.{i}"] = r(1, 1, 1, h)
        sd[f"predictor.rnn_stack.bns.{i}.weight"] = r(h) + 1
        sd[f"predictor.rnn_stack.bns.{i}.bias"] = r(h)
        sd[f"predictor.rnn_stack.bns.{i}.running_mean"] = r(h) * 0.1
        sd[f"predictor.rnn_stack.bns.{i}.running_var"] = np.abs(r(h)) + 1
    sd["joint.joint.0.weight"] = r(j, 2 * h)
    sd["joint.joint.0.bias"] = r(j)
    sd["joint.joint.2.weight"] = r(v, j)
    sd["joint.joint.2.bias"] = r(v)
    return sd


def np_reference_forward(sd, cfg, x, y):
    """Reference Transducer.forward math in numpy (models.py:308-359),
    eval mode, returning pre-log_softmax joint logits."""
    n = x.shape[0]
    h = np_ln(x, sd["encoder.input_norm.weight"], sd["encoder.input_norm.bias"])
    for i in range(cfg.enc_num_layers):
        h = np_lstm_torch_layout(
            h, sd, f"encoder.rnn_stack.rnns.{i}", sd[f"encoder.rnn_stack.hs.{i}"]
        )
        bn = f"encoder.rnn_stack.bns.{i}"
        h = np_bn_eval(
            h, sd[f"{bn}.weight"], sd[f"{bn}.bias"],
            sd[f"{bn}.running_mean"], sd[f"{bn}.running_var"],
        )
    enc = h

    bos = np.full((n, 1), cfg.bos, np.int64)
    yy = np.concatenate([bos, y], 1)
    emb = sd["predictor.embed.weight"][yy]
    p = emb @ sd["predictor.ffn.weight"].T + sd["predictor.ffn.bias"]
    for i in range(cfg.pred_num_layers):
        p = np_gru_haste(
            p, sd, f"predictor.rnn_stack.rnns.{i}",
            sd[f"predictor.rnn_stack.hs.{i}"],
        )
        bn = f"predictor.rnn_stack.bns.{i}"
        p = np_bn_eval(
            p, sd[f"{bn}.weight"], sd[f"{bn}.bias"],
            sd[f"{bn}.running_mean"], sd[f"{bn}.running_var"],
        )
    pred = p

    t_len, u_len = enc.shape[1], pred.shape[1]
    cat = np.concatenate(
        [
            np.broadcast_to(pred[:, None, :, :], (n, t_len, u_len, pred.shape[-1])),
            np.broadcast_to(enc[:, :, None, :], (n, t_len, u_len, enc.shape[-1])),
        ],
        axis=-1,
    )
    jnt = np.tanh(cat @ sd["joint.joint.0.weight"].T + sd["joint.joint.0.bias"])
    return jnt @ sd["joint.joint.2.weight"].T + sd["joint.joint.2.bias"]


def test_transducer_import_parity(rng):
    cfg = TransducerConfig(
        feature_sz=6, embed_sz=5, vocab_sz=11, hidden_sz=7, out_sz=7,
        joint_sz=9, enc_num_layers=2, pred_num_layers=1,
    )
    sd = make_reference_state_dict(rng, cfg)
    converted = convert_transducer(sd, cfg)

    from flax import serialization

    model, template = init_transducer(cfg, jax.random.PRNGKey(0))
    variables = serialization.from_state_dict(template, converted)

    n, t, u = 2, 5, 3
    x = rng.standard_normal((n, t, cfg.feature_sz)).astype(np.float32)
    y = rng.integers(1, cfg.vocab_sz, (n, u)).astype(np.int32)
    got, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(y))
    want = np_reference_forward(sd, cfg, x, y)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)
