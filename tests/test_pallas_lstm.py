"""Pallas LSTM sequence kernel vs the scan reference (interpret mode on
CPU; the real-TPU run happens in bench/integration)."""

import numpy as np
import jax
import jax.numpy as jnp

from libreasr_tpu.ops import rnn as rnn_ops
from libreasr_tpu.ops.pallas.lstm import lstm_forward_pallas, lstm_seq_pallas


def test_pallas_matches_scan(rng):
    n, t, i, h = 4, 12, 16, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(0), i, h)
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32) * 0.1)

    y_ref, (hf_ref, cf_ref) = rnn_ops.lstm_scan(x, (h0, c0), params)
    y, (hf, cf) = lstm_forward_pallas(x, (h0, c0), params, interpret=True)

    # the kernel holds R in bf16 (f32 accumulation) — tolerance reflects
    # that inference precision choice
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_ref), rtol=2e-2, atol=2e-2)


def test_pallas_single_step(rng):
    n, i, h = 2, 8, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(1), i, h)
    x = jnp.asarray(rng.standard_normal((n, 1, i)).astype(np.float32))
    h0 = jnp.zeros((n, h))
    c0 = jnp.zeros((n, h))
    y_ref, _ = rnn_ops.lstm_scan(x, (h0, c0), params)
    y, _ = lstm_forward_pallas(x, (h0, c0), params, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2)
