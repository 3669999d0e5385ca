"""Inspection tooling + ASRBundle.from_bundle round-trip."""

import os
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("c3")
    spk = root / "s"
    spk.mkdir()
    rng = np.random.default_rng(2)
    with open(spk / "s.trans.txt", "w") as tf:
        for i, t in enumerate(["alpha beta", "gamma delta", "epsilon zeta", "eta theta"]):
            utt = f"s-{i:03d}"
            pcm = (rng.standard_normal(12000) * 0.1).clip(-1, 1)
            with wave.open(str(spk / f"{utt}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((pcm * 32767).astype(np.int16).tobytes())
            tf.write(f"{utt} {t.upper()}\n")
    from libreasr_tpu.data.create_dataset import create_dataset

    create_dataset(str(root), "librispeech", workers=2)
    return str(root)


def make_dataset(corpus):
    from libreasr_tpu.data.batching import ASRDataset
    from libreasr_tpu.data.language import get_language

    lang, _ = get_language()
    conf = {
        "datasets": ["c"], "dataset_paths": {"c": corpus},
        "apply_limits": False, "pcent": {"train": 1.0},
        "shuffle_builder": {"train": False}, "sr": 16000,
        "transforms": {
            "x": [
                {"name": "OpenAudio"}, {"name": "ChannelCut"},
                {"name": "ChangeVolume", "wrap": True, "args": {"pcent": 0.5}},
                {"name": "PadderCutter"},
            ],
            "y": [{"name": "OpenLabel"}, {"name": "Numericalize"}, {"name": "AddLen"}],
        },
        "buckets": [{"max_samples": 16000, "y_max": 16, "bs": 2}],
        "seed": 0, "shuffle": False,
    }
    return ASRDataset.from_config(conf, lang, "train")


def test_pipeline_statistics(corpus):
    from libreasr_tpu.data.inspect import batch_statistics, pipeline_statistics

    ds = make_dataset(corpus)
    stats = pipeline_statistics(ds, n_items=4)
    assert stats["items"] == 4 and stats["bad"] == 0
    assert stats["audio_samples"]["min"] >= 8000  # PadderCutter floor
    bstats = batch_statistics(ds, n_batches=2)
    assert bstats
    for rec in bstats.values():
        assert 0 < rec["audio_fill"] <= 1.0


def test_augmentation_preview(corpus):
    from libreasr_tpu.data.inspect import augmentation_preview

    ds = make_dataset(corpus)
    prev = augmentation_preview(ds, 0)
    assert prev["changed"]  # ChangeVolume with 50% gain swing
    assert prev["l2_delta"] > 0


def test_from_bundle_roundtrip(tmp_path):
    import jax

    from libreasr_tpu.api import ASRBundle
    from libreasr_tpu.config import apply_overrides, open_config
    from libreasr_tpu.training.checkpoint import save_bundle

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
    src = ASRBundle.from_config(conf)
    path = str(tmp_path / "en.tar.gz")
    save_bundle(path, "en", src.variables, conf)

    loaded = ASRBundle.from_bundle(path, lang_name="en",
                                   extract_to=str(tmp_path / "x"))
    assert loaded.cfg.hidden_sz == 16
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    t1, _ = src.transcribe(audio)
    t2, _ = loaded.transcribe(audio)
    assert t1 == t2
