"""Worker process for tests/test_distributed.py: one of N processes in a
multi-host DP training step over virtual CPU devices.

Each process owns 4 virtual devices (global mesh data=8), contributes
its half of the global batch via parallel.distributed.global_batch, runs
one Learner.step, and prints the loss. Process 0 writes a JSON result.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from libreasr_tpu.parallel import distributed as dist

    dist.initialize(f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert jax.device_count() == 4 * nprocs, jax.device_count()

    mesh = dist.global_mesh(model=1)
    loss, loss_resumed = run_steps_with_checkpoint(
        mesh, dist, os.path.join(os.path.dirname(out_path), "dist_ckpt")
    )

    assert dist.all_processes_agree(loss), "loss differs across processes"
    assert dist.all_processes_agree(loss_resumed), "resumed loss differs"
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(
                {"loss": loss, "loss_resumed": loss_resumed,
                 "devices": jax.device_count()},
                f,
            )
    print(f"[worker {pid}] loss={loss:.6f} resumed={loss_resumed:.6f}")


def make_global_inputs(seed: int = 0, global_bs: int = 8):
    """Deterministic global batch — every process derives the same."""
    import numpy as np

    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((global_bs, 12, 64)).astype(np.float32)
    labels = rng.integers(3, 40, (global_bs, 5)).astype(np.int32)
    xl = np.full((global_bs,), 12, np.int32)
    yl = np.full((global_bs,), 5, np.int32)
    return feats, labels, xl, yl


def build_learner(mesh, place):
    import jax

    from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
    from libreasr_tpu.training.learner import Learner
    from libreasr_tpu.training.optimizers import build_optimizer

    cfg = TransducerConfig(
        feature_sz=64, embed_sz=8, vocab_sz=40, hidden_sz=16,
        out_sz=16, joint_sz=16, enc_num_layers=1, pred_num_layers=1,
        enc_dropout=0.0, pred_dropout=0.0,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    learner = Learner(model, variables, tx, frontend=None, mesh=mesh)
    learner.state = place(mesh, learner.state)
    return learner


def _one_step(learner, mesh, dist):
    import numpy as np

    from libreasr_tpu.training.learner import Batch

    feats, labels, xl, yl = make_global_inputs()
    rows = dist.process_row_slice(mesh, feats.shape[0])
    batch = Batch(
        audio=feats[rows], audio_len=xl[rows],
        labels=labels[rows], label_len=yl[rows],
    )
    gbatch = Batch(*dist.global_batch(mesh, tuple(batch)))
    metrics = learner.step(gbatch)
    loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss)
    return loss


def run_step(mesh, dist):
    """One DP step; returns the loss. Used by both the multi-process
    worker and the single-process oracle (same code path)."""
    from libreasr_tpu.parallel.mesh import place_state

    learner = build_learner(mesh, place_state)
    return _one_step(learner, mesh, dist)


def run_steps_with_checkpoint(mesh, dist, ckpt_path):
    """Step -> collective orbax save -> fresh learner -> restore ->
    re-place on the mesh -> step again. Returns (loss0, resumed loss)."""
    import os

    from libreasr_tpu.parallel.mesh import place_state
    from libreasr_tpu.training.checkpoint import (
        restore_train_state, save_train_state,
    )

    learner = build_learner(mesh, place_state)
    loss0 = _one_step(learner, mesh, dist)
    # every process calls save with the same path (orbax collective)
    save_train_state(os.path.abspath(ckpt_path), learner.state)

    fresh = build_learner(mesh, place_state)
    restored, _ = restore_train_state(os.path.abspath(ckpt_path), fresh.state)
    fresh.state = place_state(mesh, restored)
    loss1 = _one_step(fresh, mesh, dist)
    return loss0, loss1


if __name__ == "__main__":
    main()
