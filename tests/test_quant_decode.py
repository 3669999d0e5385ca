"""Quantized serving path: the golden trained model must still decode
its training set exactly with the int8 joint (weight error << decision
margins on a converged model)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.api import ASRBundle
from libreasr_tpu.data.audio import read_audio
from libreasr_tpu.models.decode import greedy_decode
from libreasr_tpu.ops.frontend import features_batch

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
TEXTS = [
    "yes", "no", "hello world", "stop now",
    "go left", "turn right", "one two", "three four",
]


def test_int8_joint_decode_exact(tmp_path):
    bundle = ASRBundle.from_bundle(
        os.path.join(FIXTURES, "model.tar.gz"), extract_to=str(tmp_path)
    )
    audio = np.zeros((8, 16000), np.float32)
    for i in range(8):
        pcm, _ = read_audio(os.path.join(FIXTURES, f"s-{i:03d}.wav"))
        audio[i] = pcm[0]

    fns = bundle.decoder_fns(use_lm=False, quantized=True)
    feats, flens = features_batch(
        jnp.asarray(audio), jnp.full((8,), 16000), bundle.frontend
    )
    enc_out, _ = bundle.encode(feats, flens)
    toks, lens, _, _ = greedy_decode(
        fns, enc_out, flens, vocab_sz=bundle.cfg.vocab_sz,
        blank=bundle.cfg.blank, bos=bundle.cfg.bos, max_tokens=64,
    )
    toks, lens = np.asarray(toks), np.asarray(lens)
    got = [
        bundle.lang.denumericalize(list(toks[i, : lens[i]])) for i in range(8)
    ]
    assert got == TEXTS
