"""Batched greedy decode tests, incl. parity with a per-utterance Python
reference loop implementing the reference algorithm (models.py:369-443)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.models.decode import DecoderFns, greedy_decode
from libreasr_tpu.models.transducer import Transducer, TransducerConfig, init_transducer


@pytest.fixture(scope="module")
def setup():
    cfg = TransducerConfig(
        feature_sz=8,
        embed_sz=6,
        vocab_sz=12,
        hidden_sz=8,
        out_sz=8,
        joint_sz=8,
        enc_num_layers=1,
        pred_num_layers=1,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(3))

    def predict_step(y, state):
        return model.apply(variables, y, state=state, method=Transducer.predict)

    def joint_step(h_pred, h_enc):
        return model.apply(variables, h_pred, h_enc, method=Transducer.joint_step)

    fns = DecoderFns(predict_step=predict_step, joint_step=joint_step)
    return cfg, model, variables, fns


def python_greedy(cfg, fns, enc_out_1, max_iters=3):
    """Reference algorithm: per-frame while loop (models.py:405-443)."""
    y_seq = []
    tok = jnp.full((1, 1), cfg.bos, jnp.int32)
    h_pred, state = fns.predict_step(tok, None)
    for t in range(enc_out_1.shape[0]):
        h_enc = enc_out_1[t : t + 1]
        iters = 0
        while iters < max_iters:
            iters += 1
            logits = fns.joint_step(h_pred[:, 0, :], h_enc)
            pred = int(jnp.argmax(logits, -1)[0])
            if pred == cfg.blank:
                break
            y_seq.append(pred)
            tok = jnp.full((1, 1), pred, jnp.int32)
            h_pred, state = fns.predict_step(tok, state)
    return y_seq


def test_batched_matches_python_loop(setup, rng):
    cfg, model, variables, fns = setup
    n, t = 3, 7
    x = jnp.asarray(rng.standard_normal((n, t, cfg.feature_sz)).astype(np.float32))
    enc_out, _ = model.apply(variables, x, method=Transducer.encode)
    lens = jnp.array([t, t, t])
    toks, tok_lens, metrics, _ = greedy_decode(
        fns, enc_out, lens, vocab_sz=cfg.vocab_sz,
        blank=cfg.blank, bos=cfg.bos, max_iters=3, max_tokens=32,
    )
    toks, tok_lens = np.asarray(toks), np.asarray(tok_lens)
    for i in range(n):
        want = python_greedy(cfg, fns, enc_out[i])
        got = list(toks[i, : tok_lens[i]])
        assert got == want, f"stream {i}: {got} != {want}"


def test_respects_enc_lengths(setup, rng):
    cfg, model, variables, fns = setup
    t = 9
    x = jnp.asarray(rng.standard_normal((2, t, cfg.feature_sz)).astype(np.float32))
    enc_out, _ = model.apply(variables, x, method=Transducer.encode)
    # stream 1 truncated to 4 frames == decoding only the first 4 frames
    toks, lens, _, _ = greedy_decode(
        fns, enc_out, jnp.array([t, 4]), vocab_sz=cfg.vocab_sz,
        blank=cfg.blank, bos=cfg.bos, max_tokens=32,
    )
    toks4, lens4, _, _ = greedy_decode(
        fns, enc_out[1:, :4], jnp.array([4]), vocab_sz=cfg.vocab_sz,
        blank=cfg.blank, bos=cfg.bos, max_tokens=32,
    )
    np.testing.assert_array_equal(
        np.asarray(toks)[1, : int(lens[1])], np.asarray(toks4)[0, : int(lens4[0])]
    )


def test_decode_is_jittable(setup, rng):
    cfg, model, variables, fns = setup
    x = jnp.asarray(rng.standard_normal((2, 5, cfg.feature_sz)).astype(np.float32))
    enc_out, _ = model.apply(variables, x, method=Transducer.encode)

    @jax.jit
    def run(eo, lens):
        return greedy_decode(
            fns, eo, lens, vocab_sz=cfg.vocab_sz,
            blank=cfg.blank, bos=cfg.bos, max_tokens=16,
        )[:2]

    toks, lens = run(enc_out, jnp.array([5, 5]))
    assert toks.shape == (2, 16)
    assert (np.asarray(lens) <= 16).all()


def test_alignment_score_range(setup, rng):
    cfg, model, variables, fns = setup
    x = jnp.asarray(rng.standard_normal((2, 6, cfg.feature_sz)).astype(np.float32))
    enc_out, _ = model.apply(variables, x, method=Transducer.encode)
    _, _, metrics, _ = greedy_decode(
        fns, enc_out, jnp.array([6, 6]), vocab_sz=cfg.vocab_sz,
        blank=cfg.blank, bos=cfg.bos, max_tokens=16,
    )
    score = np.asarray(metrics["alignment_score"])
    assert ((score >= 0) & (score <= 1)).all()
