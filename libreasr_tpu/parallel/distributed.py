"""Multi-host runtime: process bootstrap + cross-process array assembly.

The reference has no distributed backend at all (SURVEY.md §5.8). Here
multi-host training = `jax.distributed.initialize` + a mesh spanning all
processes' devices: DP gradients ride ICI within a slice and DCN across
slices, placed automatically by GSPMD from the mesh layout.

Data flow per step:
- every process loads its own batch rows (`local_batch_size` rows of the
  global batch, `process_row_slice` says which);
- `global_batch` assembles them into global jax.Arrays sharded over the
  mesh's "data" axis without any host gather
  (`jax.make_array_from_process_local_data`);
- params/optimizer state are placed with `replicate_tree` /
  `mesh.place_state` (multi-process aware) so every process holds the
  same replicated (or TP-sharded) leaves;
- one `Learner.step` call per process runs the SAME jitted computation;
  XLA inserts the cross-host psums.

Tested end to end by tests/test_distributed.py: two CPU processes x 4
virtual devices each, gloo collectives, loss bit-compared against the
single-process 8-device run.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize the distributed runtime (no-op if single-process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere. On CPU the gloo collectives backend
    is selected so cross-process psums work without TPU/GPU."""
    try:
        # harmless on TPU; required for multi-process CPU
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    try:
        if coordinator:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError) as e:
        # single-process runs (or already initialized)
        print(f"[distributed] single-process mode ({e})")


def global_mesh(model: int = 1):
    """Mesh over every device of every process: data axis spans hosts."""
    from .mesh import make_mesh

    return make_mesh(data=-1, model=model, devices=jax.devices())


# ---------------------------------------------------------------------------
# cross-process array assembly
# ---------------------------------------------------------------------------


def local_batch_size(mesh, global_bs: int) -> int:
    """Rows of the global batch this process must load."""
    assert global_bs % jax.process_count() == 0, (
        f"global batch {global_bs} not divisible by "
        f"{jax.process_count()} processes"
    )
    return global_bs // jax.process_count()


def process_row_slice(mesh, global_bs: int) -> slice:
    """Which rows of the global batch belong to this process (so every
    process can derive its shard from a deterministically-ordered
    dataset without communication)."""
    n = local_batch_size(mesh, global_bs)
    p = jax.process_index()
    return slice(p * n, (p + 1) * n)


def global_batch(mesh, local_tree):
    """Per-process local batch rows -> global jax.Arrays sharded over
    the mesh "data" axis. local leaves: [local_bs, ...] numpy/jax.

    Single-process: equivalent to mesh.shard_batch."""
    from .mesh import batch_sharding

    def f(x):
        x = np.asarray(x)
        s = batch_sharding(mesh, x.ndim)
        if jax.process_count() == 1:
            return jax.device_put(x, s)
        return jax.make_array_from_process_local_data(s, x)

    return jax.tree_util.tree_map(f, local_tree)


def replicate_tree(mesh, tree, shardings=None):
    """Place a host pytree (identical on every process) onto the mesh.

    Works in multi-process runs where `jax.device_put` would reject
    non-addressable shardings: each process serves its addressable
    shards from its own host copy via make_array_from_callback."""
    from .mesh import param_shardings

    if shardings is None:
        shardings = param_shardings(mesh, tree)
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x  # already a global array (e.g. orbax restore)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def all_processes_agree(value: float) -> bool:
    """Cheap cross-process consistency check (e.g. on loss): gathers a
    scalar from every process and compares."""
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.asarray([value], np.float32))
    return bool(np.allclose(arr, arr[0]))
