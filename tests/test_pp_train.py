"""Pipeline-parallel TRAINING (train.py --pp N): the dp x pp train step
must match the plain single-device step bit-for-bit-ish (same params,
same rng stream), not just run — pipelining is a schedule, not a model
change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
from libreasr_tpu.parallel.mesh import make_mesh
from libreasr_tpu.training.learner import (
    Batch,
    Learner,
    LossConfig,
    PPConfig,
    make_train_step,
)
from libreasr_tpu.training.optimizers import build_optimizer


def _cfg(**kw):
    base = dict(
        feature_sz=16,
        embed_sz=8,
        vocab_sz=24,
        hidden_sz=16,
        out_sz=16,
        joint_sz=16,
        enc_num_layers=3,
        pred_num_layers=1,
        enc_dropout=0.0,
        pred_dropout=0.0,
        enc_norm="none",
        pred_norm="none",
        enc_use_pallas=False,
        enc_use_pallas_train=False,
        use_tmp_state_pcent=0.0,
        compute_dtype=None,
    )
    base.update(kw)
    return TransducerConfig(**base)


def _batch(rng, n=4, t=12, u=5, f=16):
    return Batch(
        audio=jnp.asarray(rng.standard_normal((n, t, f)).astype(np.float32)),
        audio_len=jnp.full((n,), t, jnp.int32),
        labels=jnp.asarray(rng.integers(3, 24, (n, u)).astype(np.int32)),
        label_len=jnp.full((n,), u, jnp.int32),
    )


def _learner(cfg, mesh, pp_micro=2, seed=0):
    model, variables = init_transducer(cfg, jax.random.PRNGKey(seed))
    # sgd, not adam: adam's first-step update is ~lr*sign(g), which
    # amplifies benign 1e-8 cross-schedule reduction noise into visible
    # param divergence; sgd keeps the comparison proportional
    tx = build_optimizer("sgd", 1e-2)
    return Learner(
        model, variables, tx, frontend=None,
        loss_cfg=LossConfig(fused=True), mesh=mesh, seed=seed,
        pp_micro=pp_micro,
    )


def test_pp_step_matches_plain_step():
    """2-stage pipeline over a (data=2, pipe=2) mesh == single-device
    step: identical loss and identical updated params after 3 steps."""
    cfg = _cfg()
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(3)]

    ref = _learner(cfg, mesh=None)
    pp = _learner(cfg, mesh=make_mesh(data=2, model=1, pipe=2))
    assert pp.pp is not None, "pipe axis must engage pipeline training"

    for b in batches:
        m_ref = ref.step(b)
        m_pp = pp.step(b)
        np.testing.assert_allclose(
            float(m_ref["loss"]), float(m_pp["loss"]), rtol=2e-4
        )
    key = lambda kv: str(kv[0])
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(ref.state.params), key=key),
        sorted(jax.tree_util.tree_leaves_with_path(pp.state.params), key=key),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-5,
            err_msg=f"param diverged: {ka}",
        )


def test_pp_handles_leftover_sequential_layers():
    """L-1 not divisible by the stage count: the remainder head runs
    sequentially, the largest divisible tail pipelines (6 layers over 2
    stages -> 2 sequential [incl. the input layer] + 4 pipelined)."""
    cfg = _cfg(enc_num_layers=6)
    rng = np.random.default_rng(1)
    b = _batch(rng)
    ref = _learner(cfg, mesh=None)
    pp = _learner(cfg, mesh=make_mesh(data=2, model=1, pipe=2))
    m_ref = ref.step(b)
    m_pp = pp.step(b)
    np.testing.assert_allclose(
        float(m_ref["loss"]), float(m_pp["loss"]), rtol=2e-4
    )


def test_pp_validation_rejects_bad_configs():
    mesh = make_mesh(data=2, model=1, pipe=2)
    model, variables = init_transducer(_cfg(), jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)

    with pytest.raises(ValueError, match="fused"):
        make_train_step(model, tx, None, LossConfig(fused=False),
                        pp=PPConfig(mesh=mesh))

    bn_model, _ = init_transducer(_cfg(enc_norm="batch"), jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="norm"):
        make_train_step(bn_model, tx, None, LossConfig(fused=True),
                        pp=PPConfig(mesh=mesh))

    utsp_model, _ = init_transducer(
        _cfg(use_tmp_state_pcent=0.5), jax.random.PRNGKey(0)
    )
    with pytest.raises(ValueError, match="use_tmp_state_pcent"):
        make_train_step(utsp_model, tx, None, LossConfig(fused=True),
                        pp=PPConfig(mesh=mesh))


def test_train_cli_pp_flag(tmp_path, capsys):
    """`train.py --pp 2` end-to-end on the virtual mesh (the wiring the
    VERDICT asked for: CLI flag -> pipe mesh -> pipelined train step),
    on a real synthetic corpus through the full data pipeline."""
    import os
    import sys
    import wave

    import yaml

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train as train_cli
    from libreasr_tpu.data.create_dataset import create_dataset
    from libreasr_tpu.data.split import split_dataset

    root = tmp_path / "corpus"
    spk = root / "s"
    spk.mkdir(parents=True)
    rng = np.random.default_rng(1)
    texts = ["yes", "no", "stop", "go"] * 3
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
    create_dataset(str(root), "librispeech", workers=2)
    split_dataset(str(root), valid=0.25, test=0.0)

    conf = {
        "datasets": ["mini"],
        "dataset_paths": {"mini": str(root)},
        "apply_limits": False,
        "pcent": {"train": 1.0, "valid": 1.0},
        "shuffle_builder": {"train": True, "valid": False},
        "sr": 16000,
        "melkwargs": {"n_fft": 1024, "n_mels": 128},
        "win_length": 0.025, "hop_length": 0.01, "deltas": 0,
        "transforms": {
            "x": [{"name": "OpenAudio"}, {"name": "ChannelCut"},
                  {"name": "Resample"}, {"name": "PadderCutter"}],
            "y": [{"name": "OpenLabel"}, {"name": "Numericalize"},
                  {"name": "AddLen"}],
        },
        "buckets": [{"max_samples": 16000, "y_max": 12, "bs": 4}],
        "mesh": {"data": 2, "model": 1},
        "dtypes": {"param": "float32", "compute": "float32"},
        "model": {
            "name": "Transducer",
            "feature_sz": 1280, "embed_sz": 8, "hidden_sz": 12,
            "out_sz": 12, "joint_sz": 12, "vocab_sz": 40,
            "encoder": {"rnn_type": "LSTM", "num_layers": 3, "dropout": 0.0,
                        "reduction_factor": 1, "use_tmp_state_pcent": 0.5,
                        "use_pallas": False, "use_pallas_train": False},
            "predictor": {"rnn_type": "NBRC", "num_layers": 1,
                          "dropout": 0.0, "use_tmp_state_pcent": 0.5},
            "joint": {"method": "concat", "dropout": 0.0},
            "use_tmp_bos": False, "use_tmp_bos_pcent": 0.2,
        },
        "training": {"optimizer": "adam", "lr": 1e-3, "wd": 0.0,
                     "epochs": 1, "warmup_pct": 0.1, "grad_clip": 10.0},
        "bs": 4, "accumulate_n_batches": 1, "seed": 3,
        "tensorboard": False, "wandb": False, "tests_per_epoch": 1,
        "lm": {"enable": False},
        "tokenizer": {"model_file": str(tmp_path / "tok.labpe")},
        "loss": {"type": "rnnt"},
    }
    conf_path = tmp_path / "conf.yaml"
    conf_path.write_text(yaml.safe_dump(conf))

    train_cli.main([
        "--config", str(conf_path), "--steps", "2",
        "--pp", "2", "--pp-micro", "2",
        "--ckpt", str(tmp_path / "ckpt"),
        "--logdir", str(tmp_path / "runs"), "--eval-batches", "1",
    ])
    out = capsys.readouterr().out
    assert "pipeline parallelism: 2 stages" in out
    assert "done: step=2" in out
