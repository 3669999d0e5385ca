"""Unit tests for utils and mesh helpers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.parallel.mesh import (
    batch_sharding, make_mesh, param_shardings, replicated,
)
from libreasr_tpu.utils import (
    check_finite, make_lengths_mask, n_params, sanitize_str, standardize,
    tensorize,
)


def test_sanitize_str():
    assert sanitize_str("Hello, World!") == "hello world"
    assert sanitize_str("IT'S_A-TEST  42") == "it's a test"
    assert sanitize_str("  multiple   spaces ") == "multiple spaces"


def test_tensorize_roundtrip(rng):
    x = rng.standard_normal(64).astype(np.float32)
    assert np.array_equal(tensorize(x.tobytes()), x)


def test_check_finite_raises():
    check_finite({"a": jnp.ones(3)})
    with pytest.raises(ValueError, match="non-finite"):
        check_finite({"a": jnp.array([1.0, float("nan")])}, "t")


def test_n_params():
    tree = {"w": jnp.zeros((3, 4)), "b": jnp.zeros(4)}
    assert n_params(tree) == 16


def test_standardize(rng):
    x = jnp.asarray(rng.standard_normal(100).astype(np.float32) * 5 + 3)
    y = np.asarray(standardize(x))
    assert abs(y.mean()) < 1e-5 and abs(y.std() - 1) < 1e-3


def test_make_lengths_mask():
    m = np.asarray(make_lengths_mask(jnp.array([2, 4]), 5))
    assert m.tolist() == [
        [True, True, False, False, False],
        [True, True, True, True, False],
    ]


def test_mesh_shapes_and_shardings():
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = {
        "wide": jnp.zeros((64, 128)),   # -> column-sharded on model
        "narrow": jnp.zeros((4, 3)),    # -> replicated (not divisible)
        "h0": jnp.zeros((2, 1, 16)),
        "bias": jnp.zeros(128),
    }
    sh = param_shardings(mesh, params)
    assert "model" in str(sh["wide"].spec)
    assert sh["narrow"].spec == replicated(mesh).spec
    bs = batch_sharding(mesh, ndim=2)
    assert "data" in str(bs.spec)
    with pytest.raises(AssertionError):
        make_mesh(data=7, model=3)  # 21 > 8 devices


def test_mesh_infer_data_axis():
    mesh = make_mesh(data=-1, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
