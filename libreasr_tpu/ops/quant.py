"""Int8 quantization for serving.

The reference int8-quantizes LSTM + Linear weights dynamically for CPU
inference (maybe_quantize, utils.py:197-210; model_utils.py:93). The TPU
equivalent is weight-only / dynamic int8 matmuls on the MXU:

- `quantize(w)`: per-output-channel symmetric int8 (scale = absmax/127)
- `int8_matmul(x, qw)`: dynamic per-row activation quantization, int8 x
  int8 -> int32 accumulation on the MXU, rescale to f32 — the same
  numerics torch's dynamic quantization applies per matmul
- `quantize_tree` / `dequantize_tree`: quantize every wide 2-D kernel of
  a params pytree (for bundle size / HBM footprint)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    q: jax.Array       # int8, same shape as the original
    scale: jax.Array   # f32, per-output-channel (last axis)


def quantize(w: jax.Array) -> QuantizedTensor:
    """Per-last-axis-channel symmetric int8."""
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q, scale.astype(jnp.float32))


def dequantize(qt: QuantizedTensor) -> jax.Array:
    return qt.q.astype(jnp.float32) * qt.scale


def int8_matmul(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """Dynamic-quantized matmul: x [.., I] @ w [I, O] -> [.., O] f32.

    Activations are quantized per row (symmetric int8), the product
    accumulates in int32 on the MXU, and both scales rescale the result.
    """
    x32 = x.astype(jnp.float32)
    x_absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    x_scale = jnp.maximum(x_absmax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, qt.q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return acc * x_scale * qt.scale.reshape(1, -1)


def _is_wide_kernel(path, leaf) -> bool:
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if any(n in ("h0", "embedding") for n in names):
        return False
    return (
        isinstance(leaf, jax.Array | jnp.ndarray)
        and leaf.ndim == 2
        and leaf.dtype in (jnp.float32, jnp.bfloat16)
        and min(leaf.shape) >= 8
    )


def quantize_tree(params):
    """Quantize every wide 2-D kernel; other leaves pass through.
    Returns (quantized_tree, is_quantized_mask_tree)."""
    def f(path, leaf):
        if _is_wide_kernel(path, leaf):
            return quantize(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(
        f, params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def quantize_rnn_cells(variables):
    """int8-quantize the encoder/predictor RNN towers' weight mass: the
    per-layer cell `kernel` and `recurrent_kernel` matrices become
    QuantizedTensor leaves that ops.rnn._mm executes as dynamic int8 MXU
    matmuls. Biases, h0, norms, Dense projections and the embedding stay
    f32 (tiny next to the cells; Dense flows through nn.Dense which owns
    its own dot). The reference quantizes the same set dynamically for
    CPU serving (utils.py:197-210)."""
    def f(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        in_cell = any(n == "cell" for n in names)
        is_kernel = names and names[-1] in ("kernel", "recurrent_kernel")
        if in_cell and is_kernel and getattr(leaf, "ndim", 0) == 2:
            return quantize(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(
        f, variables, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def quantized_bytes(tree) -> tuple[int, int]:
    """(bytes now, bytes if everything were f32) — HBM footprint report."""
    now = full = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        n = leaf.size
        full += n * 4
        now += n * leaf.dtype.itemsize
    return now, full


def dequantize_tree(params):
    def f(leaf):
        if isinstance(leaf, QuantizedTensor):
            return dequantize(leaf)
        return leaf

    return jax.tree_util.tree_map(
        f, params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )
