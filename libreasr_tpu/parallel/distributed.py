"""Multi-host runtime bootstrap.

The reference has no distributed backend at all (SURVEY.md §5.8). Here
multi-host training = `jax.distributed.initialize` + a mesh spanning all
processes' devices: DP gradients ride ICI within a slice and DCN across
slices, placed automatically by GSPMD from the mesh layout.
"""

from __future__ import annotations

import jax


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize the distributed runtime (no-op if single-process).

    On TPU pods the arguments are auto-detected from the environment;
    pass them explicitly elsewhere."""
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
