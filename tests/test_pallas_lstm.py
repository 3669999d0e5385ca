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


def test_train_grad_parity(rng):
    """lstm_pack_train_pallas (custom_vjp: reverse-time Pallas backward)
    must match jax.grad through the scan path — loss, all four gradient
    groups (cell params, x, h0, c0), with ragged lengths including a
    zero-length row. Interpret mode keeps R in f32, so the match is at
    float-epsilon level."""
    from libreasr_tpu.ops.pallas.lstm import lstm_pack_train_pallas

    n, t, i, h = 3, 12, 8, 16
    params = rnn_ops.init_lstm(jax.random.PRNGKey(7), i, h)
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([12, 7, 0])
    # a fixed non-uniform cotangent exercises every dy position
    w = jnp.cos(jnp.arange(n * t * h, dtype=jnp.float32).reshape(n, t, h))

    def loss(fn):
        def go(p, x, h0, c0):
            y, (hf, cf) = fn(p, x, h0, c0)
            return jnp.sum(y * w) + jnp.sum(hf * cf)

        return jax.value_and_grad(go, argnums=(0, 1, 2, 3))(params, x, h0, c0)

    v_s, g_s = loss(
        lambda p, x, h0, c0: rnn_ops.lstm_scan(x, (h0, c0), p, lengths=lengths)
    )
    v_p, g_p = loss(
        lambda p, x, h0, c0: lstm_pack_train_pallas(
            x, (h0, c0), p, lengths, interpret=True
        )
    )
    np.testing.assert_allclose(float(v_p), float(v_s), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_s), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_train_grad_parity_batch_blocked(rng):
    """Backward over multiple batch blocks (padded rows) must agree with
    the single-block layout."""
    from libreasr_tpu.ops.pallas import lstm as pallas_lstm
    from libreasr_tpu.ops.pallas.lstm import lstm_pack_train_pallas

    n, t, i, h = 10, 8, 8, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(8), i, h)
    x = jnp.asarray(rng.standard_normal((n, t, i)).astype(np.float32))
    st = (jnp.zeros((n, h)), jnp.zeros((n, h)))

    def go(p):
        y, (hf, cf) = lstm_pack_train_pallas(x, st, p, None, interpret=True)
        return jnp.sum(y**2) + jnp.sum(hf) - jnp.sum(cf)

    ref = jax.grad(go)(params)
    old = (pallas_lstm._MAX_BLOCK_N_TRAIN, pallas_lstm._MAX_BLOCK_N_TRAIN_BWD)
    try:
        # 10 -> 3 blocks (2 padded rows); fwd and bwd block independently
        pallas_lstm._MAX_BLOCK_N_TRAIN = 4
        pallas_lstm._MAX_BLOCK_N_TRAIN_BWD = 3
        blocked = jax.grad(go)(params)
    finally:
        pallas_lstm._MAX_BLOCK_N_TRAIN, pallas_lstm._MAX_BLOCK_N_TRAIN_BWD = old
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(blocked)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


def test_train_encoder_integration_forced(rng, monkeypatch):
    """The RNNLayer training fast path (models/modules.py), forced on
    CPU: encoder loss gradients must match the scan path. compute_dtype
    stays None here so interpret mode runs f32 end-to-end."""
    from libreasr_tpu.models.modules import Encoder

    monkeypatch.setenv("LIBREASR_FORCE_PALLAS", "1")
    n, t, f, h = 2, 20, 12, 8
    x = jnp.asarray(rng.standard_normal((n, t, f)).astype(np.float32))
    lengths = jnp.asarray([20, 11])

    def grads(use_pallas_train):
        enc = Encoder(
            feature_sz=f, hidden_sz=h, out_sz=h, num_layers=2,
            dropout=0.0, rnn_type="LSTM",
            use_pallas_train=use_pallas_train,
        )
        vars_ = enc.init(jax.random.PRNGKey(0), x, lengths=lengths)

        def loss(v):
            (y, _), _ = enc.apply(
                v, x, lengths=lengths, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return jnp.sum(y**2)

        return jax.grad(loss)(vars_)

    g_p = grads(True)
    g_s = grads(False)
    # dR accumulates as one big matmul vs the scan's per-step adds —
    # reassociation noise at float-epsilon scale across 2 layers
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-5)


def test_pallas_single_step(rng):
    n, i, h = 2, 8, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(1), i, h)
    x = jnp.asarray(rng.standard_normal((n, 1, i)).astype(np.float32))
    h0 = jnp.zeros((n, h))
    c0 = jnp.zeros((n, h))
    y_ref, _ = rnn_ops.lstm_scan(x, (h0, c0), params)
    y, _ = lstm_forward_pallas(x, (h0, c0), params, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-2, atol=2e-2)


def test_eligibility_predicates(monkeypatch):
    """Hardware gating: non-lane-aligned widths and f32-policy models
    whose f32 R exceeds the VMEM budget must fall back to the scan path
    on TPU (ADVICE r2: alignment + silent-bf16 findings)."""
    from libreasr_tpu.models.modules import RNNLayer

    def layer(h, **kw):
        return RNNLayer(input_sz=h, hidden_sz=h, use_pallas=True,
                        use_pallas_train=True, **kw)

    params = rnn_ops.init_lstm(jax.random.PRNGKey(0), 128, 128)
    x = jnp.zeros((2, 32, 128))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    # aligned + bf16 policy: both paths eligible (flagship config)
    l_bf16 = layer(1024, compute_dtype=jnp.bfloat16)
    assert l_bf16._pallas_eligible(params, x, train=False)
    assert l_bf16._pallas_train_eligible(params, x, train=True)
    # f32 policy at flagship width: f32 R (16 MB) over budget -> scan
    l_f32 = layer(1024, compute_dtype=None)
    assert l_f32._pallas_eligible(params, x, train=False)  # eval still ok
    assert not l_f32._pallas_train_eligible(params, x, train=True)
    # f32 policy at a small width fits
    assert layer(256, compute_dtype=None)._pallas_train_eligible(
        params, x, train=True
    )
    # non-lane-aligned width: ineligible on hardware, both modes
    l_odd = layer(200, compute_dtype=jnp.bfloat16)
    assert not l_odd._pallas_eligible(params, x, train=False)
    assert not l_odd._pallas_train_eligible(params, x, train=True)
    # off hardware (interpret/forced CI) alignment does not bind
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("LIBREASR_FORCE_PALLAS", "1")
    assert l_odd._pallas_eligible(params, x, train=False)


def test_train_policy_r_dtype(monkeypatch):
    """lstm_pack_train_pallas must hand the recurrence core bf16 R only
    under a bf16 compute policy; with no policy R stays f32 (no silent
    bf16 recurrent-weight training)."""
    from libreasr_tpu.ops.pallas import lstm as pallas_lstm

    seen = {}
    real_core = pallas_lstm.lstm_train_core

    def spy(wx, r, h0, c0, interpret):
        seen["r_dtype"] = r.dtype
        return real_core(wx, r, h0, c0, interpret)

    monkeypatch.setattr(pallas_lstm, "lstm_train_core", spy)
    n, t, i, h = 2, 16, 8, 8
    params = rnn_ops.init_lstm(jax.random.PRNGKey(3), i, h)
    x = jnp.zeros((n, t, i))
    st = (jnp.zeros((n, h)), jnp.zeros((n, h)))

    pallas_lstm.lstm_pack_train_pallas(x, st, params, None, interpret=True)
    assert seen["r_dtype"] == jnp.float32
    pallas_lstm.lstm_pack_train_pallas(
        x, st, params, None, compute_dtype=jnp.bfloat16, interpret=True
    )
    assert seen["r_dtype"] == jnp.bfloat16


def test_train_dropconnect_parity_forced(rng, monkeypatch):
    """DropConnect in the fused train path (r4 verdict #8): the mask
    multiplies R once per call OUTSIDE the custom-VJP core, from the
    same rng stream as the scan path — outputs and gradients must be
    identical between the two paths under one dropout key."""
    from libreasr_tpu.models.modules import Encoder

    monkeypatch.setenv("LIBREASR_FORCE_PALLAS", "1")
    n, t, f, h = 2, 20, 12, 8
    x = jnp.asarray(rng.standard_normal((n, t, f)).astype(np.float32))
    lengths = jnp.asarray([20, 11])

    def grads(use_pallas_train):
        enc = Encoder(
            feature_sz=f, hidden_sz=h, out_sz=h, num_layers=2,
            dropout=0.0, rnn_type="LSTM", dropconnect=0.5,
            use_pallas_train=use_pallas_train,
        )
        vars_ = enc.init(jax.random.PRNGKey(0), x, lengths=lengths)

        def loss(v):
            (y, _), _ = enc.apply(
                v, x, lengths=lengths, train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"],
            )
            return jnp.sum(y**2)

        return jax.grad(loss)(vars_)

    g_p = grads(True)
    g_s = grads(False)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=2e-5)


def test_zoneout_falls_back_loudly(monkeypatch, capsys):
    """Zoneout keeps the scan path (per-timestep state mixing needs
    kernel support) and says so ONCE — the silent 1.3-2x fallback was
    r4 verdict #8."""
    import libreasr_tpu.models.modules as M

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    M._WARNED.discard("pallas-train-zoneout")
    params = rnn_ops.init_lstm(jax.random.PRNGKey(0), 128, 128)
    x = jnp.zeros((2, 32, 128))
    lz = M.RNNLayer(input_sz=128, hidden_sz=128, use_pallas_train=True,
                    zoneout=0.1, compute_dtype=jnp.bfloat16)
    assert not lz._pallas_train_eligible(params, x, train=True)
    assert not lz._pallas_train_eligible(params, x, train=True)
    err = capsys.readouterr().err
    assert err.count("zoneout") == 1  # once, not per call
    # dropconnect alone no longer disqualifies
    ld = M.RNNLayer(input_sz=128, hidden_sz=128, use_pallas_train=True,
                    dropconnect=0.3, compute_dtype=jnp.bfloat16)
    assert ld._pallas_train_eligible(params, x, train=True)
