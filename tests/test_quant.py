"""Int8 quantization tests."""

import numpy as np
import jax
import jax.numpy as jnp

from libreasr_tpu.ops.quant import (
    dequantize, dequantize_tree, int8_matmul, quantize, quantize_tree,
)


def test_quantize_roundtrip_error(rng):
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    qt = quantize(w)
    assert qt.q.dtype == jnp.int8
    err = np.abs(np.asarray(dequantize(qt)) - np.asarray(w)).max()
    # max quantization error is scale/2 per channel
    assert err <= float(qt.scale.max()) * 0.51


def test_int8_matmul_close_to_f32(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    got = np.asarray(int8_matmul(x, quantize(w)))
    want = np.asarray(x @ w)
    # int8 dynamic quantization: ~1% relative error on random gaussians
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    assert rel < 0.05


def test_quantize_tree_selectivity(rng):
    params = {
        "dense": {"kernel": jnp.asarray(rng.standard_normal((32, 16)).astype(np.float32)),
                  "bias": jnp.zeros(16)},
        "embed": {"embedding": jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))},
        "h0": jnp.zeros((2, 1, 16)),
    }
    qt = quantize_tree(params)
    from libreasr_tpu.ops.quant import QuantizedTensor

    assert isinstance(qt["dense"]["kernel"], QuantizedTensor)
    assert not isinstance(qt["embed"]["embedding"], QuantizedTensor)  # kept f32
    assert not isinstance(qt["h0"], QuantizedTensor)
    back = dequantize_tree(qt)
    assert back["dense"]["kernel"].shape == (32, 16)
    np.testing.assert_allclose(
        np.asarray(back["dense"]["kernel"]),
        np.asarray(params["dense"]["kernel"]),
        atol=float(qt["dense"]["kernel"].scale.max()),
    )
