"""Device mesh + sharding rules (net-new vs the reference, which is
single-process single-GPU — SURVEY.md §2.5/§5.8).

Design: a 2-D ("data", "model") mesh.
- "data": batch dimension of every array in the batch (pure DP; gradient
  all-reduce rides ICI via XLA-inserted psums).
- "model": tensor parallelism over the wide gate/joint matmuls — any
  kernel whose output dim divides the axis is column-sharded; GSPMD
  propagates and inserts the per-step collectives for the recurrent
  contraction.

Everything goes through jit + NamedSharding (GSPMD), not manual
collectives: pick a mesh, annotate, let XLA place psum/all-gather.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, pipe: int = 1, devices=None
) -> Mesh:
    """Build a ("data", "model"[, "pipe"]) mesh. data=-1 infers from the
    device count. pipe > 1 adds a pipeline-parallel axis (GPipe encoder
    stages, parallel/pipeline.py); the axis is appended only when used
    so existing 2-D sharding specs stay valid."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * pipe) == 0, (
            f"{n} devices not divisible by model={model} x pipe={pipe}"
        )
        data = n // (model * pipe)
    assert data * model * pipe <= n, (
        f"mesh {data}x{model}x{pipe} > {n} devices"
    )
    if pipe > 1:
        arr = np.asarray(devices[: data * model * pipe]).reshape(
            data, model, pipe
        )
        return Mesh(arr, ("data", "model", "pipe"))
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def mesh_from_config(conf: dict, devices=None) -> Mesh:
    m = conf.get("mesh", {}) or {}
    return make_mesh(
        data=m.get("data", -1), model=m.get("model", 1),
        pipe=m.get("pipe", 1), devices=devices,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def _leaf_spec(path, leaf, model_size: int) -> P:
    """Tensor-parallel rule: column-shard wide kernels on "model".

    Kernels [I, G*H] (RNN cells), [I, O] (Dense) and biases [G*H] whose
    last dim divides the model axis and is reasonably wide get their last
    axis sharded; everything else is replicated. BatchNorm stats/scales
    and learnable h0 are replicated (tiny).
    """
    if model_size == 1:
        return P()
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if any(n in ("batch_stats",) for n in names):
        return P()
    last = leaf.shape[-1] if leaf.ndim else 1
    wide = last % model_size == 0 and last >= 8 * model_size
    if leaf.ndim >= 2 and wide and "h0" not in names:
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def param_shardings(mesh: Mesh, tree):
    """NamedSharding pytree for a params/variables tree."""
    model_size = mesh.shape["model"]

    def f(path, leaf):
        return NamedSharding(mesh, _leaf_spec(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(f, tree)


def place_state(mesh: Mesh, state):
    """Re-place a (restored) train-state pytree onto the mesh: wide
    kernels TP-sharded, everything else replicated. Multi-process safe
    (every process must hold the same host values)."""
    if jax.process_count() > 1:
        from .distributed import replicate_tree

        return replicate_tree(mesh, state)
    return jax.device_put(state, param_shardings(mesh, state))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, batch axis over "data"."""
    def f(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(f, batch)
