"""Debug/observability tooling tests."""

import numpy as np
import jax
import jax.numpy as jnp

from libreasr_tpu.models.transducer import Transducer, TransducerConfig, init_transducer
from libreasr_tpu.training.debug import activation_stats, param_stats


def test_activation_stats(rng):
    cfg = TransducerConfig(
        feature_sz=12, embed_sz=8, vocab_sz=16, hidden_sz=10, out_sz=10,
        joint_sz=10, enc_num_layers=1, pred_num_layers=1,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 5, 12)).astype(np.float32))
    stats = activation_stats(model, variables, x, method=Transducer.encode)
    assert stats, "no intermediates captured"
    assert any("rnn_stack" in k for k in stats)
    for v in stats.values():
        assert not v["nan"]


def test_param_stats(rng):
    cfg = TransducerConfig(
        feature_sz=12, embed_sz=8, vocab_sz=16, hidden_sz=10, out_sz=10,
        joint_sz=10, enc_num_layers=1, pred_num_layers=1,
    )
    _, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    stats = param_stats(variables["params"])
    assert stats
    any_kernel = next(k for k in stats if "kernel" in k)
    assert stats[any_kernel]["std"] > 0
