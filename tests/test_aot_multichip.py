"""AOT compile of the FLAGSHIP-shape multi-chip train step (r4 verdict
weak #6/#7): dryrun_multichip proves the sharded program runs at tiny
shapes; this proves the real deployment shape — 70 M params, global
batch 128 x 6 s audio, DP(4) x TP(2) — compiles and fits a v5e chip's
HBM, using jax AOT lowering on the 8-virtual-device CPU mesh. Catches
sharding-induced OOM before multi-chip hardware exists.

CompiledMemoryStats is per-participating-device for SPMD executables,
so the asserted budget is the per-chip footprint.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

V5E_HBM = 16 * 2**30


@pytest.mark.slow
def test_flagship_dp_tp_step_compiles_and_fits_hbm():
    from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
    from libreasr_tpu.ops.frontend import FrontendConfig
    from libreasr_tpu.parallel.mesh import make_mesh, param_shardings
    from libreasr_tpu.training.learner import (
        Batch, Learner, LossConfig, init_carry,
    )
    from libreasr_tpu.training.optimizers import build_optimizer

    mesh = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    cfg = TransducerConfig(compute_dtype=jnp.bfloat16)  # 6-2-1024, vocab 2048
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    variables = jax.device_put(variables, param_shardings(mesh, variables))
    tx = build_optimizer("ranger", 5e-4, weight_decay=0.01, grad_clip=10.0)
    learner = Learner(
        model, variables, tx, frontend=FrontendConfig(),
        loss_cfg=LossConfig(fused=True, t_chunk=16), mesh=mesh,
    )

    N, secs, U, sr = 128, 6.0, 60, 16000

    def dp(shape, dtype):
        spec = P("data", *([None] * (len(shape) - 1)))
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, spec)
        )

    batch = Batch(
        audio=dp((N, int(secs * sr)), jnp.float32),
        audio_len=dp((N,), jnp.int32),
        labels=dp((N, U), jnp.int32),
        label_len=dp((N,), jnp.int32),
    )
    lowered = learner._step_fn.lower(
        learner.state, init_carry(cfg, N), batch, jax.random.PRNGKey(0)
    )
    compiled = lowered.compile()  # ~40 s on CPU; OOM/sharding bugs fail here
    ma = compiled.memory_analysis()
    per_chip = (
        ma.argument_size_in_bytes
        + ma.temp_size_in_bytes
        + ma.output_size_in_bytes
        - ma.alias_size_in_bytes  # donated train state aliases its output
    )
    # leave 20% headroom under the 16 GB v5e HBM for XLA slack and the
    # runtime's own buffers
    assert per_chip < 0.8 * V5E_HBM, (
        f"flagship DP x TP step needs {per_chip / 2**30:.2f} GiB/chip "
        f"(args {ma.argument_size_in_bytes / 2**30:.2f} + temps "
        f"{ma.temp_size_in_bytes / 2**30:.2f})"
    )
    # sanity: the analysis saw a real program, not a trivial one
    assert ma.temp_size_in_bytes > 2**20
