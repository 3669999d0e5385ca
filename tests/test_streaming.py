"""Streaming engine tests: batched slot independence, reset semantics,
windowing cadence."""

import numpy as np
import pytest

from libreasr_tpu.api import ASRBundle
from libreasr_tpu.config import apply_overrides, open_config
from libreasr_tpu.models.streaming import StreamingConfig, StreamingEngine


@pytest.fixture(scope="module")
def bundle():
    conf = open_config("config/base.yaml")
    conf = apply_overrides(conf, ["inference"])
    conf["model"].update(
        feature_sz=1280, embed_sz=8, hidden_sz=16, out_sz=16,
        joint_sz=16, vocab_sz=40,
    )
    conf["model"]["encoder"]["num_layers"] = 1
    conf["model"]["predictor"]["num_layers"] = 1
    conf["lm"]["enable"] = False
    conf["dtypes"]["compute"] = "float32"
    return ASRBundle.from_config(conf)


def test_step_batch_shapes(bundle, rng):
    eng = StreamingEngine(bundle, n_streams=4)
    w = rng.standard_normal(
        (4, 1, eng.scfg.window_samples)
    ).astype(np.float32)
    toks, lens = eng.step_batch(w)
    assert toks.shape == (4, eng.scfg.max_tokens_per_step)
    assert lens.shape == (4,)
    assert (lens <= eng.scfg.max_tokens_per_step).all()


def test_slots_are_independent(bundle, rng):
    """Two slots fed identical audio must produce identical transcripts
    even while other slots process different audio."""
    eng = StreamingEngine(bundle, n_streams=4)
    s1, s2, s3 = eng.open_slot(), eng.open_slot(), eng.open_slot()
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    other = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    step = eng.scfg.chunk_samples
    for i in range(0, 16000 - eng.scfg.window_samples, step):
        eng.feed(s3, other[i : i + step])
        eng.feed(s1, audio[i : i + step])
        eng.feed(s2, audio[i : i + step])
    assert eng.transcript(s1) == eng.transcript(s2)


def test_streaming_continuation_matches_manual(bundle, rng):
    """step_batch over two consecutive windows == carrying encoder and
    decode state manually through bundle.encode + greedy."""
    import jax.numpy as jnp
    from libreasr_tpu.models.decode import greedy_decode
    from libreasr_tpu.ops import frontend as fe

    eng = StreamingEngine(bundle, n_streams=1)
    w = rng.standard_normal((2, eng.scfg.window_samples)).astype(np.float32) * 0.1

    t1, l1 = eng.step_batch(w[None, 0:1])
    t2, l2 = eng.step_batch(w[None, 1:2])
    got = list(t1[0, : l1[0]]) + list(t2[0, : l2[0]])

    # manual: same frontend per window, one continuous encode+decode
    feats = []
    for i in range(2):
        mel = fe.log_mel_spectrogram(jnp.asarray(w[i]))
        mid = fe.stream_postprocess(mel, n_stack=10)
        feats.append(fe.stack_downsample(mid, n_stack=10, downsample=8))
    feats = jnp.stack(feats)[None, :, 0, :]  # [1, 2, F]
    enc_out, _ = bundle.encode(feats, jnp.array([2]))
    fns = bundle.decoder_fns(False)
    toks, lens, _, _ = greedy_decode(
        fns, enc_out, jnp.array([2]), vocab_sz=bundle.cfg.vocab_sz,
        blank=bundle.cfg.blank, bos=bundle.cfg.bos,
        max_iters=eng.scfg.max_iters, max_tokens=32,
    )
    want = list(np.asarray(toks)[0, : int(lens[0])])
    assert got == want


def test_reset_restores_fresh_state(bundle, rng):
    eng = StreamingEngine(bundle, n_streams=2)
    w1 = rng.standard_normal((2, 1, eng.scfg.window_samples)).astype(np.float32)
    w2 = rng.standard_normal((2, 1, eng.scfg.window_samples)).astype(np.float32)
    # stream 0: w1 then w2-with-reset; stream 1: w2 fresh from start
    eng.step_batch(w1)
    toks_a, lens_a = eng.step_batch(
        w2, reset=np.array([True, False])
    )
    eng2 = StreamingEngine(bundle, n_streams=2)
    toks_b, lens_b = eng2.step_batch(w2)
    # stream 0 after reset == stream 0 fresh
    np.testing.assert_array_equal(
        toks_a[0, : lens_a[0]], toks_b[0, : lens_b[0]]
    )
