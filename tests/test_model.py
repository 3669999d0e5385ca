"""Transducer model tests: lattice shapes, state carry equivalence
(streaming == full-sequence), BatchNorm mutation, dropout rng."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.models.transducer import Transducer, TransducerConfig, init_transducer


@pytest.fixture(scope="module")
def tiny():
    cfg = TransducerConfig(
        feature_sz=12,
        embed_sz=8,
        vocab_sz=16,
        hidden_sz=10,
        out_sz=10,
        joint_sz=10,
        enc_num_layers=2,
        pred_num_layers=1,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


def test_lattice_shape(tiny, rng):
    cfg, model, variables = tiny
    n, t, u = 2, 9, 5
    x = jnp.asarray(rng.standard_normal((n, t, cfg.feature_sz)).astype(np.float32))
    y = jnp.asarray(rng.integers(1, cfg.vocab_sz, (n, u)).astype(np.int32))
    logits, _ = model.apply(
        variables, x, y, jnp.array([t, t - 3]), jnp.array([u, u - 2])
    )
    assert logits.shape == (n, t, u + 1, cfg.vocab_sz)
    assert np.isfinite(np.asarray(logits)).all()


def test_streaming_encode_matches_full(tiny, rng):
    """Chunked encode with carried state == full-sequence encode — the
    property the whole streaming runtime depends on (reference keeps the
    same invariant through `state=`, models.py:105-113)."""
    cfg, model, variables = tiny
    t = 12
    x = jnp.asarray(rng.standard_normal((1, t, cfg.feature_sz)).astype(np.float32))
    full, _ = model.apply(variables, x, method=Transducer.encode)
    state = None
    outs = []
    for i in range(0, t, 4):
        out, state = model.apply(
            variables, x[:, i : i + 4], state=state, method=Transducer.encode
        )
        outs.append(out)
    chunked = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(chunked), rtol=1e-4, atol=1e-5
    )


def test_predictor_step_matches_sequence(tiny, rng):
    """One-token steps with carried state == whole-sequence predictor."""
    cfg, model, variables = tiny
    y = jnp.asarray(rng.integers(1, cfg.vocab_sz, (1, 6)).astype(np.int32))
    full, _ = model.apply(variables, y, method=Transducer.predict)
    state = None
    outs = []
    for i in range(6):
        out, state = model.apply(
            variables, y[:, i : i + 1], state=state, method=Transducer.predict
        )
        outs.append(out)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(full), np.asarray(stepped), rtol=1e-4, atol=1e-5
    )


def test_train_mode_mutates_batch_stats(tiny, rng):
    cfg, model, variables = tiny
    n, t, u = 2, 6, 3
    x = jnp.asarray(rng.standard_normal((n, t, cfg.feature_sz)).astype(np.float32))
    y = jnp.asarray(rng.integers(1, cfg.vocab_sz, (n, u)).astype(np.int32))
    logits, updates = model.apply(
        variables,
        x, y, jnp.array([t, t]), jnp.array([u, u]),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    out, _ = logits
    assert out.shape == (n, t, u + 1, cfg.vocab_sz)
    # running stats moved away from init
    flat = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in flat)


def test_joint_broadcast_equals_concat(tiny, rng):
    """pred_proj/enc_proj broadcast-add == Linear(cat(pred, enc))."""
    cfg, model, variables = tiny
    h_pred = jnp.asarray(rng.standard_normal((3, cfg.out_sz)).astype(np.float32))
    h_enc = jnp.asarray(rng.standard_normal((3, cfg.out_sz)).astype(np.float32))
    got = model.apply(variables, h_pred, h_enc, method=Transducer.joint_step)
    jp = variables["params"]["joint"]
    w = np.concatenate(
        [np.asarray(jp["pred_proj"]["kernel"]), np.asarray(jp["enc_proj"]["kernel"])]
    )
    cat = np.concatenate([np.asarray(h_pred), np.asarray(h_enc)], -1)
    hidden = np.tanh(cat @ w + np.asarray(jp["pred_proj"]["bias"]))
    want = hidden @ np.asarray(jp["out"]["kernel"]) + np.asarray(jp["out"]["bias"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_bos_token_override(tiny, rng):
    cfg, model, variables = tiny
    n, t, u = 2, 5, 3
    x = jnp.asarray(rng.standard_normal((n, t, cfg.feature_sz)).astype(np.float32))
    y = jnp.asarray(rng.integers(1, cfg.vocab_sz, (n, u)).astype(np.int32))
    l1, _ = model.apply(variables, x, y)
    l2, _ = model.apply(variables, x, y, bos_tokens=jnp.full((n, 1), 5, jnp.int32))
    assert (np.asarray(l1) != np.asarray(l2)).any()


def test_masked_batchnorm_ignores_padding():
    """Batch statistics come from valid frames only (the reference's BN
    sees packed sequences); eval math and variable names are identical
    to flax nn.BatchNorm so existing checkpoints load unchanged."""
    import flax.linen as fnn

    from libreasr_tpu.models.modules import MaskedBatchNorm

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 6, 8)).astype(np.float32))
    lengths = jnp.array([6, 4, 3, 5])
    # poison the padded region: masked stats must not move
    big = x.at[1, 4:].set(1e3).at[2, 3:].set(-1e3).at[3, 5:].set(1e3)

    m = MaskedBatchNorm()
    v = m.init(jax.random.PRNGKey(0), x, lengths=lengths, train=True)
    y_clean, s1 = m.apply(v, x, lengths=lengths, train=True,
                          mutable=["batch_stats"])
    y_poison, s2 = m.apply(v, big, lengths=lengths, train=True,
                           mutable=["batch_stats"])
    # identical on the valid region regardless of padding content
    mask = np.arange(6)[None, :] < np.asarray(lengths)[:, None]
    np.testing.assert_allclose(
        np.asarray(y_clean)[mask], np.asarray(y_poison)[mask],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s1["batch_stats"]["mean"]),
        np.asarray(s2["batch_stats"]["mean"]), rtol=1e-5, atol=1e-6,
    )

    # eval mode == flax BatchNorm given the same variables
    ref = fnn.BatchNorm(use_running_average=True, momentum=0.9,
                        epsilon=1e-5)
    y_eval = m.apply(v, x, train=False)
    y_ref = ref.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_norm_layer_mode_no_train_eval_gap():
    """norm='layer' swaps the inter-layer BatchNorm for LayerNorm:
    identical outputs in train and eval mode (no batch statistics), so
    synthetic/homogeneous-batch training cannot collapse at eval."""
    from libreasr_tpu.models.transducer import (
        TransducerConfig, init_transducer,
    )

    cfg = TransducerConfig(
        feature_sz=40, embed_sz=8, vocab_sz=16, hidden_sz=16, out_sz=16,
        joint_sz=16, enc_num_layers=2, pred_num_layers=1,
        enc_norm="layer", pred_norm="layer",
        enc_dropout=0.0, pred_dropout=0.0,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    assert not variables.get("batch_stats"), (
        "layer norm mode must not create batch statistics"
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 40)).astype(np.float32))
    lens = jnp.array([6, 4])
    (enc_tr, _), _ = model.apply(
        variables, x, lengths=lens, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"], method=model.encode,
    )
    enc_ev, _ = model.apply(variables, x, lengths=lens, method=model.encode)
    np.testing.assert_allclose(
        np.asarray(enc_tr), np.asarray(enc_ev), rtol=1e-5, atol=1e-6
    )
