"""Tone-corpus generator (scripts/make_tone_corpus.py): the offline
speech stand-in must stay learnable (distinct per-char coding), voiced
(deterministic speaker params), and honestly split (held-out speakers
in dev/test)."""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from make_tone_corpus import SR, main, render, speaker_params


def _dom_freq(pcm):
    spec = np.abs(np.fft.rfft(pcm * np.hanning(len(pcm))))
    return np.fft.rfftfreq(len(pcm), 1 / SR)[int(spec.argmax())]


def test_chars_are_spectrally_distinct():
    rng = np.random.default_rng(0)
    fa = _dom_freq(render("aaaaaa", rng))
    fb = _dom_freq(render("bbbbbb", rng))
    assert abs(fa - 300.0) < 20 and abs(fb - 385.0) < 20


def test_speaker_params_deterministic_and_distinct():
    a, b = speaker_params(1), speaker_params(2)
    assert speaker_params(1) == a
    assert a != b
    assert 0.97 <= a["f0_scale"] <= 1.03


def test_speaker_voice_shifts_frequency():
    rng = np.random.default_rng(0)
    spk = dict(speaker_params(1), h2=0.0, h3=0.0)
    f = _dom_freq(render("mmmmmm", rng, spk=spk, snr_db=40.0))
    want = (300.0 + 85.0 * 12) * spk["f0_scale"]
    assert abs(f - want) < 25


def test_snr_controls_noise_floor():
    rng = np.random.default_rng(0)
    spk = speaker_params(1)
    quiet = render("aaaa", np.random.default_rng(1), spk=spk, snr_db=30.0)
    loud = render("aaaa", np.random.default_rng(1), spk=spk, snr_db=5.0)
    # compare the noise in the trailing silence... there is none; use
    # total power difference instead: lower SNR adds more energy
    assert float(np.mean(loud**2)) > float(np.mean(quiet**2))


def test_corpus_layout_and_heldout_speakers(tmp_path):
    main(["--out", str(tmp_path), "--train", "10", "--valid", "4",
          "--test", "4", "--speakers", "3", "--heldout-speakers", "2"])
    train_spk = {p.split(os.sep)[-3]
                 for p in glob.glob(str(tmp_path / "train-clean-100/*/1/*.wav"))}
    dev_spk = {p.split(os.sep)[-3]
               for p in glob.glob(str(tmp_path / "dev-clean/*/1/*.wav"))}
    assert train_spk == {"1", "2", "3"}
    assert dev_spk == {"4", "5"}
    # transcripts parse through the LibriSpeech extractor
    from libreasr_tpu.data.create_dataset import create_dataset

    create_dataset(str(tmp_path / "train-clean-100"), "librispeech", workers=2)
    assert os.path.exists(tmp_path / "train-clean-100" / "asr-dataset.csv")
