"""Streamed synthetic tone corpus (libreasr_tpu/data/synth.py).

The infinite-corpus contract that makes flagship convergence runs
meaningful:
- train epochs never repeat sentences, and never contain a reserved
  dev/test sentence or a held-out speaker;
- dev/test are deterministic (identical batches every pass) and use
  held-out speakers;
- the stream plugs into ASRDataset.from_config and trains end-to-end
  through train.py (eval, checkpoint, bundle export).
"""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libreasr_tpu.data.language import get_language
from libreasr_tpu.data.synth import ToneStreamDataset


def _conf(**kw):
    sc = {
        "enabled": True,
        "hours_per_epoch": 0.01,
        "speakers": 4,
        "heldout_speakers": 2,
        "eval_utts": 8,
        "seed": 7,
    }
    sc.update(kw)
    return {"synth_tone": sc, "num_workers": 2,
            "buckets": [{"max_samples": 80000, "y_max": 64, "bs": 4}]}


@pytest.fixture(scope="module")
def lang():
    return get_language()[0]


def test_epochs_are_fresh_and_reject_reserved(lang):
    conf = _conf()
    ds = ToneStreamDataset.from_config(conf, lang, "train")
    e0 = ds._epoch_specs(0)
    e1 = ds._epoch_specs(1)
    t0 = {t for t, _, _ in e0}
    t1 = {t for t, _, _ in e1}
    assert t0 and t1 and t0 != t1
    # fresh sentences: overlap between epochs is at most incidental
    assert len(t0 & t1) < len(t0) // 2
    # reserved eval sentences never appear in training
    assert not (t0 | t1) & ds._reserved
    # train speakers only
    assert {s for _, s, _ in e0} <= set(ds.train_speakers)


def test_eval_split_deterministic_and_heldout(lang):
    conf = _conf()
    va = ToneStreamDataset.from_config(conf, lang, "valid")
    vb = ToneStreamDataset.from_config(conf, lang, "valid")
    ba = list(iter(va))
    bb = list(iter(vb))
    assert len(ba) == len(bb) > 0
    for x, y in zip(ba, bb):
        np.testing.assert_array_equal(x.audio, y.audio)
        np.testing.assert_array_equal(x.labels, y.labels)
    # second pass over the SAME instance is also identical (train.py
    # re-iterates valid_ds at every eval)
    bc = list(iter(va))
    np.testing.assert_array_equal(ba[0].audio, bc[0].audio)
    # held-out speakers, disjoint sentence sets
    specs_v = va._epoch_specs(0)
    assert {s for _, s, _ in specs_v} <= set(va.held_speakers)
    te = ToneStreamDataset.from_config(conf, lang, "test")
    tv = {t for t, _, _ in te._epoch_specs(0)}
    vv = {t for t, _, _ in specs_v}
    assert not tv & vv


def test_ids_match_language(lang):
    ds = ToneStreamDataset.from_config(_conf(), lang, "valid")
    text, spk, seed = ds._epoch_specs(0)[0]
    item = ds._make_item(text, spk, seed)
    assert item["ids"] == lang.numericalize(text)
    assert item["audio"].dtype == np.float32
    assert 8000 < len(item["audio"]) < 80000


def test_from_config_dispatch(lang):
    from libreasr_tpu.data.batching import ASRDataset

    ds = ASRDataset.from_config(_conf(), lang, "train")
    assert isinstance(ds, ToneStreamDataset)
    b = next(iter(ds))
    assert b.audio.ndim == 2 and b.labels.ndim == 2
    assert b.audio.dtype == np.int16  # transfer codec default


def test_sample_lengths_histogram(lang):
    ds = ToneStreamDataset.from_config(_conf(), lang, "train")
    xl, yl = ds.sample_lengths(32)
    assert len(xl) == len(yl) == 32
    assert (xl > 300).all() and (yl > 2).all()


def test_train_cli_on_stream(tmp_path):
    """train.py end to end on the stream: steps run, eval runs, bundle
    exports and transcribes."""
    import train as train_cli

    conf = {
        **_conf(hours_per_epoch=0.01),
        "sr": 16000,
        "melkwargs": {"n_fft": 1024, "n_mels": 128},
        "win_length": 0.025, "hop_length": 0.01, "deltas": 0,
        "mesh": {"data": -1, "model": 1},
        "dtypes": {"param": "float32", "compute": "float32"},
        "model": {
            "name": "Transducer",
            "feature_sz": 1280, "embed_sz": 8, "hidden_sz": 12,
            "out_sz": 12, "joint_sz": 12, "vocab_sz": 40,
            "encoder": {"rnn_type": "LSTM", "num_layers": 1, "dropout": 0.0,
                        "reduction_factor": 1, "use_tmp_state_pcent": 0.0},
            "predictor": {"rnn_type": "NBRC", "num_layers": 1,
                          "dropout": 0.0, "use_tmp_state_pcent": 0.0},
            "joint": {"method": "concat", "dropout": 0.0},
            "use_tmp_bos": False, "use_tmp_bos_pcent": 0.2,
        },
        "training": {"optimizer": "adam", "lr": 1e-3, "wd": 0.0,
                     "epochs": 1, "warmup_pct": 0.1, "grad_clip": 10.0},
        "bs": 4, "accumulate_n_batches": 1, "seed": 3,
        "tensorboard": False, "wandb": False, "tests_per_epoch": 1,
        "lm": {"enable": False},
        "loss": {"type": "rnnt"},
    }
    cpath = tmp_path / "conf.yaml"
    cpath.write_text(yaml.safe_dump(conf))
    bundle_path = str(tmp_path / "bundle.tar.gz")
    train_cli.main([
        "--config", str(cpath), "--steps", "2",
        "--ckpt", str(tmp_path / "ckpt"),
        "--logdir", str(tmp_path / "runs"), "--eval-batches", "1",
        "--bundle-out", bundle_path,
    ])
    assert os.path.exists(bundle_path)

    from libreasr_tpu.api import ASRBundle

    bundle = ASRBundle.from_bundle(
        bundle_path, extract_to=str(tmp_path / "x"))
    text, _ = bundle.transcribe(np.zeros(16000, np.float32))
    assert isinstance(text, str)


def test_train_cli_zero_batch_guard(tmp_path):
    """A loader that yields nothing (drop_last bucket larger than the
    epoch) must fail loudly, not spin through 1e9 empty epochs — found
    live in round 5's first streamed-recipe smoke."""
    import train as train_cli

    conf = {
        **_conf(hours_per_epoch=0.002),  # ~4 utts/epoch
        "drop_last": True,
        "buckets": [{"max_samples": 80000, "y_max": 64, "bs": 64}],
        "sr": 16000,
        "melkwargs": {"n_fft": 1024, "n_mels": 128},
        "win_length": 0.025, "hop_length": 0.01, "deltas": 0,
        "mesh": {"data": -1, "model": 1},
        "dtypes": {"param": "float32", "compute": "float32"},
        "model": {
            "name": "Transducer",
            "feature_sz": 1280, "embed_sz": 8, "hidden_sz": 12,
            "out_sz": 12, "joint_sz": 12, "vocab_sz": 40,
            "encoder": {"rnn_type": "LSTM", "num_layers": 1, "dropout": 0.0,
                        "reduction_factor": 1, "use_tmp_state_pcent": 0.0},
            "predictor": {"rnn_type": "NBRC", "num_layers": 1,
                          "dropout": 0.0, "use_tmp_state_pcent": 0.0},
            "joint": {"method": "concat", "dropout": 0.0},
            "use_tmp_bos": False, "use_tmp_bos_pcent": 0.2,
        },
        "training": {"optimizer": "adam", "lr": 1e-3, "wd": 0.0,
                     "epochs": 1, "warmup_pct": 0.1, "grad_clip": 10.0},
        "bs": 4, "accumulate_n_batches": 1, "seed": 3,
        "tensorboard": False, "wandb": False, "tests_per_epoch": 1,
        "lm": {"enable": False},
        "loss": {"type": "rnnt"},
    }
    cpath = tmp_path / "conf.yaml"
    cpath.write_text(yaml.safe_dump(conf))
    with pytest.raises(SystemExit, match="ZERO batches"):
        train_cli.main([
            "--config", str(cpath), "--steps", "2",
            "--ckpt", str(tmp_path / "ckpt"),
            "--logdir", str(tmp_path / "runs"),
            "--eval-every", "2",  # skips first-epoch materialization
        ])
