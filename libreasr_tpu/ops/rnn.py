"""Fused recurrent cells as `lax.scan` programs (TPU-first).

Replaces the reference's per-timestep Python RNN loops
(libreasr/lib/layers/haste/{lstm,gru,nbrc,layer_norm_lstm}.py) and the
disabled haste CUDA kernels (custom_rnn.py:25-44) with a design that maps
onto TPU hardware:

- the input projection ``Wx = x @ kernel`` for *all* timesteps is one big
  MXU matmul hoisted out of the recurrence;
- the scan body is a single [N,H]x[H,GH] matmul plus fused pointwise ops
  (XLA fuses the gate nonlinearities into the matmul epilogue);
- state is an explicit functional carry, so the same cell runs training,
  batched greedy decode, and streaming chunks.

Parameter layout is haste-compatible for checkpoint parity
(lstm.py docstring: kernel [I, 4H] with i,g,f,o gate order;
gru.py: kernel [I, 3H] z,r,g order with separate bias/recurrent_bias).
"NBRC" in the reference is a verbatim rename of haste GRU
(SURVEY.md §2.1), so it shares the GRU implementation here.

Gate math parity:
- LSTM  (haste lstm.py:34-67):   v = h@R + Wx + b; i,g,f,o;
  c' = σ(f)c + σ(i)tanh(g); h' = σ(o)tanh(c')
- GRU   (haste gru.py:30-63):    Wx = x@W + b; Rh = h@R + rb;
  z = σ(Wx_z+Rh_z); r = σ(Wx_r+Rh_r); g = tanh(Wx_g + r·Rh_g);
  h' = z·h + (1-z)·g   (reset applied *after* matmul, 1406.1078v1)
- zoneout (training): h' = (h_new - h_old)·mask + h_old,
  mask ~ Bernoulli(1-p); (eval): h' = p·h_old + (1-p)·h_new
  (haste base formula, lstm.py:60-66)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LSTMParams(NamedTuple):
    kernel: jax.Array            # [I, 4H]  gates i,g,f,o
    recurrent_kernel: jax.Array  # [H, 4H]
    bias: jax.Array              # [4H]


class GRUParams(NamedTuple):
    kernel: jax.Array            # [I, 3H]  gates z,r,g
    recurrent_kernel: jax.Array  # [H, 3H]
    bias: jax.Array              # [3H]
    recurrent_bias: jax.Array    # [3H]


class LayerNormLSTMParams(NamedTuple):
    kernel: jax.Array            # [I, 4H]
    recurrent_kernel: jax.Array  # [H, 4H]
    bias: jax.Array              # [4H]
    gamma: jax.Array             # [2, 4H]  LN scales for Wx / Rh
    gamma_h: jax.Array           # [H]      LN scale on cell output
    beta_h: jax.Array            # [H]      LN shift on cell output


def init_lstm(rng, input_sz: int, hidden_sz: int, forget_bias: float = 1.0):
    """Xavier-uniform kernels, zero bias with forget gate at forget_bias
    (haste LSTM defaults)."""
    k1, k2 = jax.random.split(rng)
    kernel = jax.nn.initializers.xavier_uniform()(k1, (input_sz, 4 * hidden_sz))
    rkernel = jax.nn.initializers.xavier_uniform()(k2, (hidden_sz, 4 * hidden_sz))
    bias = np.zeros(4 * hidden_sz, np.float32)
    bias[2 * hidden_sz : 3 * hidden_sz] = forget_bias  # f gate (i,g,f,o)
    return LSTMParams(kernel, rkernel, jnp.asarray(bias))


def init_gru(rng, input_sz: int, hidden_sz: int):
    k1, k2 = jax.random.split(rng)
    kernel = jax.nn.initializers.xavier_uniform()(k1, (input_sz, 3 * hidden_sz))
    rkernel = jax.nn.initializers.xavier_uniform()(k2, (hidden_sz, 3 * hidden_sz))
    # two distinct buffers — aliased leaves break train-state donation
    return GRUParams(
        kernel, rkernel, jnp.zeros(3 * hidden_sz), jnp.zeros(3 * hidden_sz)
    )


def init_layernorm_lstm(rng, input_sz: int, hidden_sz: int, forget_bias: float = 1.0):
    base = init_lstm(rng, input_sz, hidden_sz, forget_bias)
    return LayerNormLSTMParams(
        base.kernel,
        base.recurrent_kernel,
        base.bias,
        jnp.ones((2, 4 * hidden_sz)),
        jnp.ones(hidden_sz),
        jnp.zeros(hidden_sz),
    )


def _mm(a, b, compute_dtype):
    """Matmul with optional low-precision inputs and f32 accumulation.

    An int8-quantized weight (ops.quant.QuantizedTensor) runs as a
    dynamic int8 x int8 MXU matmul (torch dynamic-quantization numerics,
    the reference's LSTM serving path — utils.py:197-210): weights are
    read from HBM as int8 (4x less bandwidth than f32), activations
    quantize per row on the fly, accumulation is int32."""
    from .quant import QuantizedTensor, int8_matmul

    if isinstance(b, QuantizedTensor):
        return int8_matmul(a, b)
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _ln(x, gamma, beta=None, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * gamma
    return y + beta if beta is not None else y


def _apply_zoneout(h_new, h_old, p: float, mask, training: bool):
    if p == 0.0:
        return h_new
    if training:
        return (h_new - h_old) * mask + h_old
    return p * h_old + (1.0 - p) * h_new


def _drop_connect(rkernel, rng, p: float):
    """DropConnect on the recurrent matrix (haste `dropout` arg)."""
    if p == 0.0 or rng is None:
        return rkernel
    keep = jax.random.bernoulli(rng, 1.0 - p, rkernel.shape)
    return jnp.where(keep, rkernel / (1.0 - p), 0.0)


def _zoneout_masks(rng, p: float, t: int, shape, training: bool):
    if p == 0.0 or not training or rng is None:
        return jnp.zeros((t, 1, 1), jnp.float32)  # unused placeholder
    return jax.random.bernoulli(rng, 1.0 - p, (t, *shape)).astype(jnp.float32)


def _length_gate(t_idx, lengths, new, old):
    """Freeze state past each sequence's length and zero the output
    (torch pack_padded/pad_packed semantics — the reference's LSTM/GRU
    path, custom_rnn.py:162-172)."""
    if lengths is None:
        return new, new
    valid = (t_idx < lengths)[:, None]
    carried = jnp.where(valid, new, old)
    output = jnp.where(valid, new, jnp.zeros_like(new))
    return carried, output


def _snap_gate(t_idx, lengths, new, snap):
    """haste semantics (the reference's NBRC path,
    layers/haste/base_rnn.py:49-60): the recurrence rolls through the
    whole padded sequence and outputs are kept everywhere; only the
    *returned* state is read off at each sequence's length. `snap`
    carries that snapshot."""
    if lengths is None:
        return new
    return jnp.where((t_idx < lengths)[:, None], new, snap)


def lstm_scan(
    x: jax.Array,
    state: tuple[jax.Array, jax.Array],
    params: LSTMParams,
    *,
    lengths: jax.Array | None = None,
    zoneout: float = 0.0,
    dropconnect: float = 0.0,
    rng: jax.Array | None = None,
    training: bool = False,
    compute_dtype=None,
    length_mode: str = "pack",
):
    """x: [N, T, I]; state: (h, c) each [N, H]. Returns (y [N,T,H], (h,c))."""
    n, t, _ = x.shape
    h0, c0 = state
    hidden = h0.shape[-1]
    wx = _mm(x, params.kernel, compute_dtype) + params.bias  # [N, T, 4H]
    wx = jnp.moveaxis(wx, 1, 0)                              # [T, N, 4H]
    rk = _drop_connect(
        params.recurrent_kernel,
        None if rng is None else jax.random.fold_in(rng, 1),
        dropconnect if training else 0.0,
    )
    zmask = _zoneout_masks(
        None if rng is None else jax.random.fold_in(rng, 2),
        zoneout, t, (n, hidden), training,
    )
    t_ids = jnp.arange(t)

    haste = length_mode == "haste"

    def step(carry, inp):
        h, c, sh, sc = carry
        wx_t, zm, ti = inp
        v = _mm(h, rk, compute_dtype) + wx_t
        i, g, f, o = jnp.split(v, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h_new = _apply_zoneout(h_new, h, zoneout, zm, training)
        if haste:
            return (h_new, c_new, _snap_gate(ti, lengths, h_new, sh),
                    _snap_gate(ti, lengths, c_new, sc)), h_new
        h_c, y = _length_gate(ti, lengths, h_new, h)
        c_c, _ = _length_gate(ti, lengths, c_new, c)
        return (h_c, c_c, sh, sc), y

    (hc, cc, hs, cs), ys = jax.lax.scan(
        step, (h0, c0, h0, c0), (wx, zmask, t_ids)
    )
    hf, cf = (hs, cs) if haste else (hc, cc)
    return jnp.moveaxis(ys, 0, 1), (hf, cf)


def gru_scan(
    x: jax.Array,
    state: tuple[jax.Array],
    params: GRUParams,
    *,
    lengths: jax.Array | None = None,
    zoneout: float = 0.0,
    dropconnect: float = 0.0,
    rng: jax.Array | None = None,
    training: bool = False,
    compute_dtype=None,
    length_mode: str = "pack",
):
    """x: [N, T, I]; state: (h,) [N, H]. Covers both GRU and "NBRC"."""
    n, t, _ = x.shape
    (h0,) = state
    hidden = h0.shape[-1]
    wx = _mm(x, params.kernel, compute_dtype) + params.bias  # [N, T, 3H]
    wx = jnp.moveaxis(wx, 1, 0)
    rk = _drop_connect(
        params.recurrent_kernel,
        None if rng is None else jax.random.fold_in(rng, 1),
        dropconnect if training else 0.0,
    )
    zmask = _zoneout_masks(
        None if rng is None else jax.random.fold_in(rng, 2),
        zoneout, t, (n, hidden), training,
    )
    t_ids = jnp.arange(t)

    haste = length_mode == "haste"

    def step(carry, inp):
        h, sh = carry
        wx_t, zm, ti = inp
        rh = _mm(h, rk, compute_dtype) + params.recurrent_bias
        wz, wr, wg = jnp.split(wx_t, 3, axis=-1)
        rz, rr, rg = jnp.split(rh, 3, axis=-1)
        z = jax.nn.sigmoid(wz + rz)
        r = jax.nn.sigmoid(wr + rr)
        g = jnp.tanh(wg + r * rg)
        h_new = z * h + (1.0 - z) * g
        h_new = _apply_zoneout(h_new, h, zoneout, zm, training)
        if haste:
            return (h_new, _snap_gate(ti, lengths, h_new, sh)), h_new
        h_c, y = _length_gate(ti, lengths, h_new, h)
        return (h_c, sh), y

    (hc, hs), ys = jax.lax.scan(step, (h0, h0), (wx, zmask, t_ids))
    return jnp.moveaxis(ys, 0, 1), (hs if haste else hc,)


def layernorm_lstm_scan(
    x: jax.Array,
    state: tuple[jax.Array, jax.Array],
    params: LayerNormLSTMParams,
    *,
    lengths: jax.Array | None = None,
    zoneout: float = 0.0,
    dropconnect: float = 0.0,
    rng: jax.Array | None = None,
    training: bool = False,
    compute_dtype=None,
    length_mode: str = "pack",
):
    """LayerNorm LSTM (haste layer_norm_lstm.py:34-): LN on Wx and Rh
    separately (scale-only), LN with scale+shift on the cell before the
    output gate."""
    n, t, _ = x.shape
    h0, c0 = state
    hidden = h0.shape[-1]
    wx = _mm(x, params.kernel, compute_dtype)
    wx = _ln(wx, params.gamma[0])
    wx = jnp.moveaxis(wx, 1, 0)
    rk = _drop_connect(
        params.recurrent_kernel,
        None if rng is None else jax.random.fold_in(rng, 1),
        dropconnect if training else 0.0,
    )
    zmask = _zoneout_masks(
        None if rng is None else jax.random.fold_in(rng, 2),
        zoneout, t, (n, hidden), training,
    )
    t_ids = jnp.arange(t)

    haste = length_mode == "haste"

    def step(carry, inp):
        h, c, sh, sc = carry
        wx_t, zm, ti = inp
        rh = _ln(_mm(h, rk, compute_dtype), params.gamma[1])
        v = rh + wx_t + params.bias
        i, g, f, o = jnp.split(v, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        c_out = _ln(c_new, params.gamma_h, params.beta_h)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_out)
        h_new = _apply_zoneout(h_new, h, zoneout, zm, training)
        if haste:
            return (h_new, c_new, _snap_gate(ti, lengths, h_new, sh),
                    _snap_gate(ti, lengths, c_new, sc)), h_new
        h_c, y = _length_gate(ti, lengths, h_new, h)
        c_c, _ = _length_gate(ti, lengths, c_new, c)
        return (h_c, c_c, sh, sc), y

    (hc, cc, hs, cs), ys = jax.lax.scan(
        step, (h0, c0, h0, c0), (wx, zmask, t_ids)
    )
    hf, cf = (hs, cs) if haste else (hc, cc)
    return jnp.moveaxis(ys, 0, 1), (hf, cf)


def time_reduce(x: jax.Array, lengths, factor: int):
    """Mean-pool time axis by `factor` (reference inter-layer reduction,
    custom_rnn.py:184-202). [N, T, H] -> [N, T//factor, H]."""
    n, t, h = x.shape
    t_out = t // factor
    x = x[:, : t_out * factor].reshape(n, t_out, factor, h).mean(axis=2)
    if lengths is not None:
        lengths = lengths // factor
    return x, lengths


def mish(x):
    """Mish activation x * tanh(softplus(x)) (reference layers/mish.py —
    a hand-written autograd fn there; here plain jnp, XLA differentiates
    and fuses it)."""
    return x * jnp.tanh(jax.nn.softplus(x))


CELLS = {
    "LSTM": (lstm_scan, init_lstm, 2),
    "GRU": (gru_scan, init_gru, 1),
    "NBRC": (gru_scan, init_gru, 1),  # NBRC == haste GRU (SURVEY.md §2.1)
    "LN_LSTM": (layernorm_lstm_scan, init_layernorm_lstm, 2),
}
