"""Pallas fused LSTM sequence kernel.

The lax.scan LSTM (ops/rnn.py) re-reads the recurrent matrix R [H, 4H]
from HBM every timestep — for the flagship encoder that is megabytes of
HBM traffic x T x 6 layers on long-utterance encode. This kernel runs
the recurrence with R pinned in VMEM: the grid iterates (batch-block,
time) — TPU grid steps execute sequentially on a core, so VMEM scratch
carries the h/c state across the time dimension, and R stays resident
for the *entire* grid (every batch block, every timestep: one HBM read
of R total). The Pallas pipeline streams the precomputed input
projections Wx[t] in and the outputs y[t] out with automatic double
buffering. The gate pointwise math fuses behind the MXU matmul — the
role haste's CUDA kernels play in the reference (custom_rnn.py:25-44).

Layout contract matches ops/rnn.py (kernel [I,4H], gates i,g,f,o), so
this is a drop-in fast path for inference/encode AND training: the
training section below pairs the fused forward with a reverse-time
backward kernel behind a custom_vjp (lstm_train_core).

Measured on TPU v5e at the flagship shape (H=1024, f32 in/out, bf16 R):
2.1-3.5x over the scan cell for N<=128, T>=100 (scripts/bench_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# largest batch block held in VMEM alongside R: bf16 R (8 MB at H=1024)
# + double-buffered f32 wx blocks (2 MB each) + y blocks + state buffers
# stay inside ~16 MB VMEM. Bigger batches become extra grid rows, not
# extra launches.
_MAX_BLOCK_N = 128


def _lstm_step_kernel_cseq(wx_ref, r_ref, h0_ref, c0_ref, y_ref, yc_ref,
                           h_s, c_s):
    """Variant that streams the cell state per timestep too (yc_ref):
    pack-length semantics need (h, c) frozen at each sequence's length,
    which the wrapper gathers from the full sequences."""
    t = pl.program_id(1)
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
    yc_ref[0] = c_new


def _lstm_step_kernel(wx_ref, r_ref, h0_ref, c0_ref, y_ref, ht_ref, ct_ref,
                      h_s, c_s):
    """One grid step = one (batch-block, timestep); h_s/c_s persist
    across the time dimension of the grid (time is the fastest-varying
    grid axis, so each batch block runs its full recurrence before the
    next block starts).

    wx_ref: [1, BN, 4H] this step's input projection (pipelined)
    r_ref:  [H, 4H] bf16, resident in VMEM for the whole grid
    y_ref:  [1, BN, H] this step's output block
    """
    t = pl.program_id(1)
    t_steps = pl.num_programs(1)
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

    N is tiled into blocks of at most _MAX_BLOCK_N; each block is an
    outer grid row sharing the VMEM-resident R (exact: blocks carry
    independent state).
    """
    n, t, g4 = wx.shape
    h = g4 // 4
    bn = min(n, _MAX_BLOCK_N)
    pad = (-n) % bn
    if pad:
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad), (0, 0)))
    nb = (n + pad) // bn
    wx_t = jnp.moveaxis(wx, 1, 0).astype(jnp.float32)  # [T, N, 4H]

    y, ht, ct = pl.pallas_call(
        _lstm_step_kernel,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, bn, g4), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bn, h), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n + pad, h), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, h), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bn, h), jnp.float32),
            pltpu.VMEM((bn, h), jnp.float32),
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
    return jnp.moveaxis(y, 0, 1)[:n], (ht[:n], ct[:n])


def lstm_forward_pallas(x, state, params, *, interpret: bool = False):
    """Drop-in inference fast path matching ops.rnn.lstm_scan semantics
    (no lengths/zoneout — full-sequence encode)."""
    h0, c0 = state
    wx = (
        jnp.dot(x, params.kernel, preferred_element_type=jnp.float32)
        + params.bias
    )
    return lstm_seq_pallas(wx, params.recurrent_kernel, h0, c0, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_seq_pallas_cseq(wx, r, h0, c0, *, interpret: bool = False):
    """Like lstm_seq_pallas but also returns the per-timestep cell state
    [N, T, H] (streamed out of the kernel, not stored in VMEM)."""
    n, t, g4 = wx.shape
    h = g4 // 4
    bn = min(n, _MAX_BLOCK_N)
    pad = (-n) % bn
    if pad:
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad), (0, 0)))
    nb = (n + pad) // bn
    wx_t = jnp.moveaxis(wx, 1, 0).astype(jnp.float32)

    y, yc = pl.pallas_call(
        _lstm_step_kernel_cseq,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, bn, g4), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bn, h), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, h), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n + pad, h), jnp.float32),
            jax.ShapeDtypeStruct((t, n + pad, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bn, h), jnp.float32),
            pltpu.VMEM((bn, h), jnp.float32),
        ],
        interpret=interpret,
    )(
        wx_t,
        r.astype(jnp.bfloat16),
        h0.astype(jnp.float32),
        c0.astype(jnp.float32),
    )
    return jnp.moveaxis(y, 0, 1)[:n], jnp.moveaxis(yc, 0, 1)[:n]


def _lstm_step_kernel_int8(wx_ref, rq_ref, rs_ref, h0_ref, c0_ref,
                           y_ref, yc_ref, h_s, c_s):
    """int8 recurrent matmul variant: R lives in VMEM as int8 (half the
    bf16 residency), h quantizes per row each step, the MXU accumulates
    int8 x int8 -> int32 — the same dynamic-quantization numerics as
    ops.quant.int8_matmul (the serving towers' scan path)."""
    t = pl.program_id(1)
    h = h0_ref.shape[-1]

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    hrow = h_s[:]
    amax = jnp.max(jnp.abs(hrow), axis=-1, keepdims=True)
    hscale = jnp.maximum(amax / 127.0, 1e-12)
    hq = jnp.clip(jnp.round(hrow / hscale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        hq, rq_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    v = acc * hscale * rs_ref[:] + wx_ref[0]
    i = jax.nn.sigmoid(v[:, :h])
    g = jnp.tanh(v[:, h : 2 * h])
    f = jax.nn.sigmoid(v[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(v[:, 3 * h :])
    c_new = f * c_s[:] + i * g
    h_new = o * jnp.tanh(c_new)
    h_s[:] = h_new
    c_s[:] = c_new
    y_ref[0] = h_new
    yc_ref[0] = c_new


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lstm_seq_pallas_int8(wx, rq, rscale, h0, c0, *, interpret: bool = False):
    """Fused sequence kernel over an int8-quantized recurrent matrix.
    rq: int8 [H, 4H]; rscale: f32 [1, 4H]. Returns (y, yc) like the
    cseq variant (both h and c streamed for pack-semantics gathers)."""
    n, t, g4 = wx.shape
    h = g4 // 4
    bn = min(n, _MAX_BLOCK_N)
    pad = (-n) % bn
    if pad:
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad), (0, 0)))
    nb = (n + pad) // bn
    wx_t = jnp.moveaxis(wx, 1, 0).astype(jnp.float32)

    y, yc = pl.pallas_call(
        _lstm_step_kernel_int8,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, bn, g4), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bn, h), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, h), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n + pad, h), jnp.float32),
            jax.ShapeDtypeStruct((t, n + pad, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bn, h), jnp.float32),
            pltpu.VMEM((bn, h), jnp.float32),
        ],
        interpret=interpret,
    )(
        wx_t,
        rq,
        rscale.reshape(1, g4).astype(jnp.float32),
        h0.astype(jnp.float32),
        c0.astype(jnp.float32),
    )
    return jnp.moveaxis(y, 0, 1)[:n], jnp.moveaxis(yc, 0, 1)[:n]


# ---------------------------------------------------------------------------
# training: custom_vjp core with a reverse-time backward kernel
# ---------------------------------------------------------------------------

# forward streams 4 block arrays (wx, y, c, v) next to the 8 MB bf16 R:
# batch blocks of 64 double-buffer inside the ~16 MB VMEM budget
_MAX_BLOCK_N_TRAIN = 64
# backward streams 6 (dy, dc_in, v, c, c_prev, dv) — measured 16.52 MB
# scoped at 64 (536 KB over), so it blocks at 32
_MAX_BLOCK_N_TRAIN_BWD = 32


def _lstm_train_fwd_kernel(wx_ref, r_ref, h0_ref, c0_ref,
                           y_ref, yc_ref, yv_ref, h_s, c_s):
    """Forward variant streaming the pre-activation gates v too — the
    backward recurrence recomputes gate activations from v on the VPU
    instead of re-running the recurrent matmul."""
    t = pl.program_id(1)
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
    yc_ref[0] = c_new
    yv_ref[0] = v


def _lstm_train_bwd_kernel(dy_ref, dcin_ref, v_ref, c_ref, cprev_ref, r_ref,
                           dv_ref, dh0_ref, dc0_ref, dh_s, dc_s):
    """One grid step = one (batch-block, REVERSED timestep): the index
    maps feed blocks in reverse time, so program step 0 is t=T-1. The
    dh/dc recurrence lives in VMEM scratch; R stays resident for the
    dh_{t-1} = dv @ R^T matmul (one HBM read of R for the whole grid —
    the same residency trick as the forward kernel)."""
    p = pl.program_id(1)
    p_steps = pl.num_programs(1)
    h = dy_ref.shape[-1]

    @pl.when(p == 0)
    def _():
        dh_s[:] = jnp.zeros(dh_s.shape, dh_s.dtype)
        dc_s[:] = jnp.zeros(dc_s.shape, dc_s.dtype)

    v = v_ref[0]
    i = jax.nn.sigmoid(v[:, :h])
    g = jnp.tanh(v[:, h : 2 * h])
    f = jax.nn.sigmoid(v[:, 2 * h : 3 * h])
    o = jax.nn.sigmoid(v[:, 3 * h :])
    tc = jnp.tanh(c_ref[0])
    dh = dy_ref[0] + dh_s[:]
    dc = dcin_ref[0] + dc_s[:] + dh * o * (1.0 - tc * tc)
    dv = jnp.concatenate(
        [
            dc * g * i * (1.0 - i),               # d pre-sigmoid(i)
            dc * i * (1.0 - g * g),               # d pre-tanh(g)
            dc * cprev_ref[0] * f * (1.0 - f),    # d pre-sigmoid(f)
            dh * tc * o * (1.0 - o),              # d pre-sigmoid(o)
        ],
        axis=-1,
    )
    dv_ref[0] = dv
    dc_s[:] = dc * f
    # dh_{t-1}: contract dv's gate axis with R's gate axis (R^T matmul
    # without materializing the transpose)
    dh_s[:] = jax.lax.dot_general(
        dv.astype(r_ref.dtype), r_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(p == p_steps - 1)
    def _():
        dh0_ref[:] = dh_s[:]
        dc0_ref[:] = dc_s[:]


def _train_fwd_call(wx, r, h0, c0, interpret):
    n, t, g4 = wx.shape
    h = g4 // 4
    bn = min(n, _MAX_BLOCK_N_TRAIN)
    pad = (-n) % bn
    if pad:
        wx = jnp.pad(wx, ((0, pad), (0, 0), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad), (0, 0)))
    nb = (n + pad) // bn
    wx_t = jnp.moveaxis(wx, 1, 0).astype(jnp.float32)

    y, yc, yv = pl.pallas_call(
        _lstm_train_fwd_kernel,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, bn, g4), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bn, h), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, h), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, g4), lambda b, i: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n + pad, h), jnp.float32),
            jax.ShapeDtypeStruct((t, n + pad, h), jnp.float32),
            jax.ShapeDtypeStruct((t, n + pad, g4), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bn, h), jnp.float32),
            pltpu.VMEM((bn, h), jnp.float32),
        ],
        interpret=interpret,
    )(wx_t, r, h0.astype(jnp.float32), c0.astype(jnp.float32))
    return (
        jnp.moveaxis(y, 0, 1)[:n],
        jnp.moveaxis(yc, 0, 1)[:n],
        jnp.moveaxis(yv, 0, 1)[:n],
    )


def _train_bwd_call(dy, dc_in, v, c_seq, cprev, r, interpret):
    n, t, g4 = v.shape
    h = g4 // 4
    bn = min(n, _MAX_BLOCK_N_TRAIN_BWD)
    pad = (-n) % bn
    if pad:
        z3 = ((0, pad), (0, 0), (0, 0))
        dy, dc_in = jnp.pad(dy, z3), jnp.pad(dc_in, z3)
        v, c_seq, cprev = jnp.pad(v, z3), jnp.pad(c_seq, z3), jnp.pad(cprev, z3)
    nb = (n + pad) // bn
    rev = lambda b, i: (t - 1 - i, b, 0)  # feed blocks newest-first

    dv, dh0, dc0 = pl.pallas_call(
        _lstm_train_bwd_kernel,
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((1, bn, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, g4), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bn, g4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h), lambda b, i: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, n + pad, g4), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, h), jnp.float32),
            jax.ShapeDtypeStruct((n + pad, h), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bn, h), jnp.float32),
            pltpu.VMEM((bn, h), jnp.float32),
        ],
        interpret=interpret,
    )(
        jnp.moveaxis(dy, 1, 0).astype(jnp.float32),
        jnp.moveaxis(dc_in, 1, 0).astype(jnp.float32),
        jnp.moveaxis(v, 1, 0),
        jnp.moveaxis(c_seq, 1, 0),
        jnp.moveaxis(cprev, 1, 0),
        r,
    )
    return jnp.moveaxis(dv, 0, 1)[:n], dh0[:n], dc0[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_train_core(wx, r, h0, c0, interpret=False):
    """Differentiable fused recurrence: (wx, r, h0, c0) -> (y, c_seq).

    The pack/mask/gather length semantics live OUTSIDE this core (plain
    differentiable jnp), so the kernels only ever see the dense
    recurrence. Weight gradients dR / dWx reduce to one large MXU
    matmul / an identity outside the backward kernel — the kernel
    streams dv and carries only the sequential dh/dc recurrence."""
    y, c_seq, _ = _train_fwd_call(wx, r, h0, c0, interpret)
    return y, c_seq


def _train_core_fwd(wx, r, h0, c0, interpret):
    y, c_seq, v = _train_fwd_call(wx, r, h0, c0, interpret)
    return (y, c_seq), (v, c_seq, y, h0, c0, r)


def _train_core_bwd(interpret, res, cts):
    dy, dc_in = cts
    v, c_seq, y, h0, c0, r = res
    cprev = jnp.concatenate([c0[:, None].astype(c_seq.dtype), c_seq[:, :-1]], 1)
    dv, dh0, dc0 = _train_bwd_call(dy, dc_in, v, c_seq, cprev, r, interpret)
    hprev = jnp.concatenate([h0[:, None].astype(y.dtype), y[:, :-1]], 1)
    # dR = sum_t h_{t-1}^T dv_t — one [H, N*T] x [N*T, 4H] MXU matmul
    n, t, g4 = dv.shape
    dr = jax.lax.dot_general(
        hprev.reshape(n * t, -1), dv.reshape(n * t, g4),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dv, dr.astype(r.dtype), dh0.astype(h0.dtype), dc0.astype(c0.dtype)


lstm_train_core.defvjp(_train_core_fwd, _train_core_bwd)


def lstm_pack_train_pallas(
    x, state, params, lengths=None, *, compute_dtype=None,
    interpret: bool = False,
):
    """Training fast path matching ops.rnn.lstm_scan(length_mode="pack",
    zoneout=0, dropconnect=0) — forward AND gradients. The input
    projection and the length semantics are plain differentiable XLA;
    only the recurrence core carries a custom VJP.

    Rolling through padding then masking/gathering is gradient-exact vs
    the scan's frozen-state semantics: rows are independent, outputs
    past each row's length receive zero cotangent, and the final-state
    gather reads exactly the step the scan freezes at."""
    h0, c0 = state
    if compute_dtype is not None:
        wx = jnp.dot(
            x.astype(compute_dtype), params.kernel.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ) + params.bias
        r = params.recurrent_kernel.astype(compute_dtype)
    else:
        wx = jnp.dot(
            x, params.kernel, preferred_element_type=jnp.float32
        ) + params.bias
        r = params.recurrent_kernel
    # Same VMEM-residency budget RNNLayer._pallas_train_eligible
    # enforces before routing here: R lives in VMEM for the whole grid,
    # and an over-budget R fails deep inside Mosaic — direct callers
    # (benches, scripts) get a clear error instead.
    if not interpret and jax.default_backend() == "tpu":
        if r.shape[0] * r.shape[1] * r.dtype.itemsize > 9 * 2**20:
            raise ValueError(
                f"recurrent kernel {r.shape} {r.dtype} exceeds the VMEM "
                f"residency budget for the fused training kernel; pass "
                f"compute_dtype=jnp.bfloat16 or use the scan path"
            )
    # R residency dtype follows the training compute policy: a bf16
    # policy gets bf16 R in VMEM (f32 accumulation; the cast sits
    # outside the custom_vjp so dR accumulates back into f32 params).
    # With no policy (f32 training) R stays f32 — eligibility
    # (models/modules.py:_pallas_train_eligible) only routes here when
    # the f32 R fits the VMEM budget, so f32-policy runs keep f32
    # recurrent numerics instead of silently training in bf16.
    y, yc = lstm_train_core(wx, r, h0, c0, interpret)
    if lengths is None:
        t_last = x.shape[1] - 1
        return y, (y[:, t_last], yc[:, t_last])
    t = x.shape[1]
    valid = (jnp.arange(t)[None, :] < lengths[:, None])      # [N, T]
    y_masked = jnp.where(valid[..., None], y, 0.0)
    idx = jnp.clip(lengths - 1, 0, t - 1)[:, None, None]
    h_last = jnp.take_along_axis(y, idx, axis=1)[:, 0]
    c_last = jnp.take_along_axis(yc, idx, axis=1)[:, 0]
    empty = (lengths == 0)[:, None]
    h_f = jnp.where(empty, h0, h_last)
    c_f = jnp.where(empty, c0, c_last)
    return y_masked, (h_f, c_f)


def lstm_pack_pallas(x, state, params, lengths=None, *, interpret: bool = False):
    """Inference fast path with torch pack_padded semantics, matching
    ops.rnn.lstm_scan(length_mode="pack") exactly: outputs zeroed past
    each sequence's length, returned state frozen at the length.

    Without lengths this is the plain fused kernel; with lengths the
    kernel rolls through the padding (cheap — padding is a small tail)
    and the exact frozen state is gathered from the streamed h/c
    sequences afterwards.

    int8-quantized cells (ops.quant.QuantizedTensor leaves) dispatch to
    the int8 kernel: R resident in VMEM as int8, dynamic per-row
    activation quantization on the MXU — the same numerics as the scan
    towers' int8_matmul serving path.
    """
    from ..quant import QuantizedTensor, int8_matmul

    quantized = isinstance(params.recurrent_kernel, QuantizedTensor)
    if lengths is None and not quantized:
        return lstm_forward_pallas(x, state, params, interpret=interpret)
    h0, c0 = state
    if isinstance(params.kernel, QuantizedTensor):
        wx = int8_matmul(x, params.kernel) + params.bias
    else:
        wx = (
            jnp.dot(x, params.kernel, preferred_element_type=jnp.float32)
            + params.bias
        )
    if quantized:
        y, yc = _lstm_seq_pallas_int8(
            wx, params.recurrent_kernel.q, params.recurrent_kernel.scale,
            h0, c0, interpret=interpret,
        )
    else:
        y, yc = _lstm_seq_pallas_cseq(
            wx, params.recurrent_kernel, h0, c0, interpret=interpret
        )
    if lengths is None:
        t_last = x.shape[1] - 1
        return y, (y[:, t_last], yc[:, t_last])
    t = x.shape[1]
    t_ids = jnp.arange(t)[None, :]
    valid = t_ids < lengths[:, None]                        # [N, T]
    y_masked = jnp.where(valid[..., None], y, 0.0)
    # state frozen at each row's last valid step (length 0 -> initial)
    idx = jnp.clip(lengths - 1, 0, t - 1)[:, None, None]
    h_last = jnp.take_along_axis(y, idx, axis=1)[:, 0]
    c_last = jnp.take_along_axis(yc, idx, axis=1)[:, 0]
    empty = (lengths == 0)[:, None]
    h_f = jnp.where(empty, h0, h_last)
    c_f = jnp.where(empty, c0, c_last)
    return y_masked, (h_f, c_f)
