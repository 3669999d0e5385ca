"""End-to-end training CLI test: synthetic corpus + tiny config ->
train.py main() for a few steps -> checkpoint resume -> bundle export ->
reload bundle and transcribe."""

import json
import os
import sys
import wave

import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("c2")
    spk = root / "s"
    spk.mkdir()
    rng = np.random.default_rng(1)
    texts = ["yes", "no", "stop", "go", "up", "down", "left", "right"] * 2
    with open(spk / "s.trans.txt", "w") as tf:
        for i, t in enumerate(texts):
            utt = f"s-{i:03d}"
            pcm = (rng.standard_normal(12000) * 0.1).clip(-1, 1)
            with wave.open(str(spk / f"{utt}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((pcm * 32767).astype(np.int16).tobytes())
            tf.write(f"{utt} {t.upper()}\n")
    from libreasr_tpu.data.create_dataset import create_dataset
    from libreasr_tpu.data.split import split_dataset

    create_dataset(str(root), "librispeech", workers=2)
    split_dataset(str(root), valid=0.25, test=0.0)
    return str(root)


@pytest.fixture(scope="module")
def tiny_conf(corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("conf")
    conf = {
        "datasets": ["mini"],
        "dataset_paths": {"mini": corpus},
        "apply_limits": False,
        "pcent": {"train": 1.0, "valid": 1.0},
        "shuffle_builder": {"train": True, "valid": False},
        "sr": 16000,
        "melkwargs": {"n_fft": 1024, "n_mels": 128},
        "win_length": 0.025, "hop_length": 0.01, "deltas": 0,
        "transforms": {
            "x": [
                {"name": "OpenAudio"}, {"name": "ChannelCut"},
                {"name": "Resample"}, {"name": "PadderCutter"},
            ],
            "y": [
                {"name": "OpenLabel"}, {"name": "Numericalize"},
                {"name": "AddLen"},
            ],
        },
        "buckets": [{"max_samples": 16000, "y_max": 12, "bs": 4}],
        "mesh": {"data": -1, "model": 1},
        "dtypes": {"param": "float32", "compute": "float32"},
        "model": {
            "name": "Transducer",
            "feature_sz": 1280, "embed_sz": 8, "hidden_sz": 12,
            "out_sz": 12, "joint_sz": 12, "vocab_sz": 40,
            "encoder": {"rnn_type": "LSTM", "num_layers": 1, "dropout": 0.0,
                        "reduction_factor": 1, "use_tmp_state_pcent": 0.5},
            "predictor": {"rnn_type": "NBRC", "num_layers": 1, "dropout": 0.0,
                          "use_tmp_state_pcent": 0.5},
            "joint": {"method": "concat", "dropout": 0.0},
            "use_tmp_bos": False, "use_tmp_bos_pcent": 0.2,
        },
        "training": {"optimizer": "adam", "lr": 1e-3, "wd": 0.0,
                     "epochs": 1, "warmup_pct": 0.1, "grad_clip": 10.0},
        "bs": 4, "accumulate_n_batches": 1, "seed": 3,
        "tensorboard": False, "wandb": False, "tests_per_epoch": 1,
        "lm": {"enable": False},
        "tokenizer": {"model_file": str(d / "tok.labpe")},
        "loss": {"type": "rnnt"},
    }
    path = d / "conf.yaml"
    path.write_text(yaml.safe_dump(conf))
    return str(path)


def test_train_cli_runs_and_resumes(tiny_conf, tmp_path, capsys):
    import train as train_cli

    ckpt = str(tmp_path / "ckpt")
    bundle_path = str(tmp_path / "bundle.tar.gz")
    train_cli.main([
        "--config", tiny_conf, "--steps", "3", "--ckpt", ckpt,
        "--logdir", str(tmp_path / "runs"), "--eval-batches", "1",
        "--bundle-out", bundle_path,
    ])
    out = capsys.readouterr().out
    assert "[eval]" in out and "wer=" in out
    assert os.path.isdir(ckpt)
    assert os.path.exists(bundle_path)

    # resume: step counter continues; chained dispatch path exercised
    train_cli.main([
        "--config", tiny_conf, "--steps", "5", "--ckpt", ckpt,
        "--logdir", str(tmp_path / "runs2"), "--eval-batches", "1",
        "--chain-steps", "2",
    ])
    out = capsys.readouterr().out
    assert "resumed" in out
    # chained dispatch must stop EXACTLY at --steps (chunks truncate;
    # overshooting would run past the lr schedule end)
    assert "done: step=5" in out


def test_bundle_roundtrip(tiny_conf, tmp_path):
    import jax

    from libreasr_tpu.config import open_config
    from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
    from libreasr_tpu.training.checkpoint import load_bundle, save_bundle

    conf = open_config(tiny_conf)
    cfg = TransducerConfig.from_config(conf)
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "b.tar.gz")
    save_bundle(path, "en", variables, conf)
    restored, tok, lm, conf2 = load_bundle(
        path, "en", variables, extract_to=str(tmp_path / "x")
    )
    a = np.asarray(variables["params"]["joint"]["out"]["kernel"])
    b = np.asarray(restored["params"]["joint"]["out"]["kernel"])
    np.testing.assert_array_equal(a, b)
    assert conf2["model"]["hidden_sz"] == conf["model"]["hidden_sz"]


def test_restore_params_only_across_optimizer_trees(tiny_conf, tmp_path):
    """Bundle export restores a checkpoint written by a run whose
    optimizer tree (schedule counts, MultiSteps wrappers) differs from
    any fresh template — params-only restore must not care (the r5
    flagship best-WER export crashed exactly here)."""
    import jax
    import jax.numpy as jnp

    from libreasr_tpu.config import open_config
    from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
    from libreasr_tpu.training.checkpoint import (
        restore_params_only, save_train_state,
    )
    from libreasr_tpu.training.learner import TrainState
    from libreasr_tpu.training.optimizers import build_optimizer, make_lr_schedule

    conf = open_config(tiny_conf)
    cfg = TransducerConfig.from_config(conf)
    _, variables = init_transducer(cfg, jax.random.PRNGKey(7))
    # the writing run: schedule-wrapped ranger + grad accumulation
    tx = build_optimizer(
        "ranger", make_lr_schedule({"lr": 1e-3, "total_steps": 10}),
        accumulate=2)
    state = TrainState(
        step=jnp.asarray(12, jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    ckpt = str(tmp_path / "ckpt_best")
    save_train_state(ckpt, state)

    # the exporting run: fresh template, NO optimizer state at all
    _, template = init_transducer(cfg, jax.random.PRNGKey(0))
    params, batch_stats, step = restore_params_only(
        ckpt, template["params"], template.get("batch_stats", {}))
    assert step == 12
    a = np.asarray(variables["params"]["joint"]["out"]["kernel"])
    b = np.asarray(params["joint"]["out"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_best_wer_bar_survives_resume(tmp_path, capsys):
    """Crash-resume restores the best-WER bar from <ckpt>_best_wer.json
    so a worse post-resume eval cannot overwrite the best checkpoint
    (observed in the r5 flagship run: best 0.055 lost to 0.074)."""
    from train import _restore_best_wer_bar

    from libreasr_tpu.training.callbacks import TrainLogger

    ckpt = str(tmp_path / "ckpt")
    with open(ckpt + "_best_wer.json", "w") as f:
        json.dump({"wer": 0.055, "cer": 0.03, "step": 12000}, f)

    # fresh start (start_step=0): bar must stay at +inf
    logger = TrainLogger(str(tmp_path / "runs"))
    _restore_best_wer_bar(logger, ckpt, start_step=0)
    assert logger.best_wer == float("inf")

    # resume: bar restored, a worse eval no longer counts as improvement
    _restore_best_wer_bar(logger, ckpt, start_step=14000)
    assert logger.best_wer == pytest.approx(0.055)

    class _R:
        wer, cer, alignment_score, n = 0.074, 0.05, 0.75, 82
        samples = []
        wer_by_length = {}

    assert logger.log_eval(14000, _R()) is False
    _R.wer = 0.051
    assert logger.log_eval(14500, _R()) is True

    # missing meta file: no-op
    logger2 = TrainLogger(str(tmp_path / "runs2"))
    _restore_best_wer_bar(logger2, str(tmp_path / "other"), start_step=5)
    assert logger2.best_wer == float("inf")


def test_metrics():
    from libreasr_tpu.training.metrics import cer, wer

    assert wer("a b c", "a b c") == 0.0
    assert wer("a x c", "a b c") == pytest.approx(1 / 3)
    assert cer("abc", "abc") == 0.0
    assert cer("axc", "abc") == pytest.approx(1 / 3)
    assert cer("ab c", "abc") == 0.0  # spaces stripped
    assert wer("", "a b") == 1.0
