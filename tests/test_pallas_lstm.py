"""Pallas LSTM sequence kernel vs the scan reference (interpret mode on
CPU; the real-TPU run happens in bench/integration)."""

import numpy as np
import jax
import jax.numpy as jnp

from libreasr_tpu.ops import rnn as rnn_ops
from libreasr_tpu.ops.pallas.lstm import (
    lstm_forward_pallas,
    lstm_pack_pallas,
    lstm_seq_pallas,
)


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


def test_pallas_batch_blocking(rng):
    """Batches wider than one VMEM block tile into extra grid rows —
    results must be identical to the single-block layout."""
    from libreasr_tpu.ops.pallas import lstm as pallas_lstm

    n, t, i, h = 10, 6, 8, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(2), i, h)
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    h0 = jnp.zeros((n, h))
    c0 = jnp.zeros((n, h))
    y_ref, (hf_ref, cf_ref) = lstm_forward_pallas(
        x, (h0, c0), params, interpret=True
    )
    old = pallas_lstm._MAX_BLOCK_N
    try:
        pallas_lstm._MAX_BLOCK_N = 4  # 10 -> 3 blocks of 4 (2 padded rows)
        y, (hf, cf) = lstm_forward_pallas(x, (h0, c0), params, interpret=True)
    finally:
        pallas_lstm._MAX_BLOCK_N = old
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_ref), rtol=1e-5, atol=1e-5)


def test_pallas_pack_lengths(rng):
    """lstm_pack_pallas must reproduce the scan cell's pack semantics
    exactly: zero outputs past lengths, state frozen at lengths."""
    n, t, i, h = 4, 12, 16, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(3), i, h)
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([12, 7, 1, 0])

    y_ref, (hf_ref, cf_ref) = rnn_ops.lstm_scan(
        x, (h0, c0), params, lengths=lengths
    )
    y, (hf, cf) = lstm_pack_pallas(
        x, (h0, c0), params, lengths, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_ref), rtol=2e-2, atol=2e-2)
    # masked region is exactly zero, like the scan path
    mask = np.arange(t)[None, :] >= np.asarray(lengths)[:, None]
    assert (np.asarray(y)[mask] == 0).all()


def test_encoder_integration_forced(rng, monkeypatch):
    """The RNNLayer fast-path branch (models/modules.py), forced on CPU
    via LIBREASR_FORCE_PALLAS (interpret mode): encoder outputs and
    state must match the scan path within bf16-R tolerance."""
    from libreasr_tpu.models.modules import Encoder

    monkeypatch.setenv("LIBREASR_FORCE_PALLAS", "1")
    n, t, f, h = 2, 20, 12, 8
    x = jnp.asarray(rng.standard_normal((n, t, f)).astype(np.float32))
    lengths = jnp.asarray([20, 11])

    def run(use_pallas):
        enc = Encoder(
            feature_sz=f, hidden_sz=h, out_sz=h, num_layers=2,
            dropout=0.0, rnn_type="LSTM", use_pallas=use_pallas,
        )
        vars_ = enc.init(jax.random.PRNGKey(0), x, lengths=lengths)
        return enc.apply(vars_, x, lengths=lengths, train=False)

    y_p, st_p = run(True)
    y_s, st_s = run(False)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_s),
                               rtol=2e-2, atol=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(st_p),
                    jax.tree_util.tree_leaves(st_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


def test_pallas_int8_matches_scan_int8(rng):
    """The int8 kernel variant must match the scan cell running the
    int8 dynamic matmuls (ops.quant) — same quantization numerics, so
    the tolerance is much tighter than bf16."""
    from libreasr_tpu.ops.quant import quantize

    n, t, i, h = 3, 10, 16, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(4), i, h)
    qparams = rnn_ops.LSTMParams(
        kernel=quantize(params.kernel),
        recurrent_kernel=quantize(params.recurrent_kernel),
        bias=params.bias,
    )
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    h0 = jnp.zeros((n, h))
    c0 = jnp.zeros((n, h))
    lengths = jnp.asarray([10, 6, 2])

    y_ref, (hf_ref, cf_ref) = rnn_ops.lstm_scan(
        x, (h0, c0), qparams, lengths=lengths
    )
    y, (hf, cf) = lstm_pack_pallas(
        x, (h0, c0), qparams, lengths, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_int8_no_lengths(rng):
    from libreasr_tpu.ops.quant import quantize

    n, t, i, h = 2, 8, 8, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(5), i, h)
    qparams = rnn_ops.LSTMParams(
        kernel=params.kernel,  # mixed: only R quantized
        recurrent_kernel=quantize(params.recurrent_kernel),
        bias=params.bias,
    )
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    st = (jnp.zeros((n, h)), jnp.zeros((n, h)))
    y_ref, (hf_ref, cf_ref) = rnn_ops.lstm_scan(x, st, qparams)
    y, (hf, cf) = lstm_pack_pallas(x, st, qparams, None, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hf), np.asarray(hf_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(cf_ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_single_step(rng):
    n, i, h = 2, 8, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(1), i, h)
    x = jnp.asarray(rng.standard_normal((n, 1, i)).astype(np.float32))
    h0 = jnp.zeros((n, h))
    c0 = jnp.zeros((n, h))
    y_ref, _ = rnn_ops.lstm_scan(x, (h0, c0), params)
    y, _ = lstm_forward_pallas(x, (h0, c0), params, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2)
