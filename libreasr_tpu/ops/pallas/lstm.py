"""Pallas fused LSTM sequence kernel.

The lax.scan LSTM (ops/rnn.py) re-reads the recurrent matrix R [H, 4H]
from HBM every timestep — for the flagship encoder that is megabytes of
HBM traffic x T x 6 layers on long-utterance encode. This kernel runs
the recurrence with R pinned in VMEM: the grid iterates over time (TPU
grid steps execute sequentially on a core, so VMEM scratch carries the
h/c state), while the Pallas pipeline streams the precomputed input
projections Wx[t] in and the outputs y[t] out with automatic double
buffering. The gate pointwise math fuses behind the MXU matmul — the
role haste's CUDA kernels play in the reference (custom_rnn.py:25-44).

Layout contract matches ops/rnn.py (kernel [I,4H], gates i,g,f,o), so
this is a drop-in inference/encode fast path; training keeps the scan
path (autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_step_kernel(wx_ref, r_ref, h0_ref, c0_ref, y_ref, ht_ref, ct_ref,
                      h_s, c_s):
    """One grid step = one timestep; h_s/c_s persist across the grid.

    wx_ref: [1, N, 4H] this step's input projection (pipelined)
    r_ref:  [H, 4H] bf16, resident in VMEM for the whole grid
    y_ref:  [1, N, H] this step's output block
    """
    t = pl.program_id(0)
    t_steps = pl.num_programs(0)
    h = h0_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    v = (
        jnp.dot(
            h_s[:].astype(r_ref.dtype), r_ref[:],
            preferred_element_type=jnp.float32,
        )
        + wx_ref[0]
    )
    i = jax.nn.sigmoid(v[:, :h])
    g = jnp.tanh(v[:, h : 2 * h])
    f = jax.nn.sigmoid(v[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(v[:, 3 * h :])
    c_new = f * c_s[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_s[:] = h_new
    c_s[:] = c_new
    y_ref[0] = h_new

    @pl.when(t == t_steps - 1)
    def _():
        ht_ref[:] = h_new
        ct_ref[:] = c_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_seq_pallas(wx, r, h0, c0, *, interpret: bool = False):
    """Run the fused sequence kernel.

    wx: [N, T, 4H] input projections (x @ kernel + bias, precomputed);
    r: [H, 4H]; h0/c0: [N, H]. Returns (y [N, T, H], (hT, cT)).
    """
    n, t, g4 = wx.shape
    h = g4 // 4
    wx_t = jnp.moveaxis(wx, 1, 0).astype(jnp.float32)  # [T, N, 4H]

    y, ht, ct = pl.pallas_call(
        _lstm_step_kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, n, g4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n, h), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((n, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, h), jnp.float32),
            pltpu.VMEM((n, h), jnp.float32),
        ],
        interpret=interpret,
    )(
        wx_t,
        # bf16 halves the VMEM residency of R (16 MB fp32 barely fits on
        # v5e); accumulation stays f32 via preferred_element_type
        r.astype(jnp.bfloat16),
        h0.astype(jnp.float32),
        c0.astype(jnp.float32),
    )
    return jnp.moveaxis(y, 0, 1), (ht, ct)


def lstm_forward_pallas(x, state, params, *, interpret: bool = False):
    """Drop-in inference fast path matching ops.rnn.lstm_scan semantics
    (no lengths/zoneout — full-sequence encode)."""
    h0, c0 = state
    wx = (
        jnp.dot(x, params.kernel, preferred_element_type=jnp.float32)
        + params.bias
    )
    return lstm_seq_pallas(wx, params.recurrent_kernel, h0, c0, interpret=interpret)
