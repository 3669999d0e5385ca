"""CTC model family + LM trainer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.models.ctc import (
    CTCConfig, CTCModel, ctc_decode_greedy, ctc_loss, init_ctc,
)


@pytest.fixture(scope="module")
def ctc():
    cfg = CTCConfig(feature_sz=16, d_model=16, n_heads=2, n_layers=2, vocab_sz=10)
    model, variables = init_ctc(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


def test_ctc_forward_shapes(ctc, rng):
    cfg, model, variables = ctc
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    logp = model.apply(variables, x, jnp.array([12, 8]))
    assert logp.shape == (2, 12, 10)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-4
    )


def test_ctc_loss_decreases(ctc, rng):
    import optax

    cfg, model, variables = ctc
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 10, (2, 4)).astype(np.int32))
    fl = jnp.array([12, 12])
    ll = jnp.array([4, 3])
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    def loss_fn(p):
        logp = model.apply({"params": p}, x, fl)
        return ctc_loss(logp, labels, fl, ll).mean()

    l0 = float(loss_fn(params))
    for _ in range(10):
        g = jax.grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, u)
    assert float(loss_fn(params)) < l0


def test_ctc_greedy_decode():
    # hand-crafted log-probs: blank, A, A, blank, B, B, B -> [A, B]
    v = 4
    seq = [0, 1, 1, 0, 2, 2, 2]
    logp = np.full((1, len(seq), v), -10.0, np.float32)
    for t, s in enumerate(seq):
        logp[0, t, s] = 0.0
    toks, lens = ctc_decode_greedy(jnp.asarray(logp), jnp.array([len(seq)]))
    assert list(np.asarray(toks)[0, : int(lens[0])]) == [1, 2]
    # repeated token after blank is kept: A blank A -> [A, A]
    seq2 = [1, 0, 1]
    logp2 = np.full((1, 3, v), -10.0, np.float32)
    for t, s in enumerate(seq2):
        logp2[0, t, s] = 0.0
    toks, lens = ctc_decode_greedy(jnp.asarray(logp2), jnp.array([3]))
    assert list(np.asarray(toks)[0, : int(lens[0])]) == [1, 1]


def test_ctc_train_cli(tmp_path, capsys):
    """train.py with model.name=CTCModel trains and evaluates."""
    import os
    import sys
    import wave

    import yaml

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train as train_cli
    from libreasr_tpu.data.create_dataset import create_dataset
    from libreasr_tpu.data.split import split_dataset

    rng = np.random.default_rng(3)
    spk = tmp_path / "s"
    spk.mkdir()
    with open(spk / "s.trans.txt", "w") as tf:
        for i, t in enumerate(["yes", "no", "up", "down"] * 2):
            utt = f"s-{i:03d}"
            pcm = (rng.standard_normal(10000) * 0.1).clip(-1, 1)
            with wave.open(str(spk / f"{utt}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((pcm * 32767).astype(np.int16).tobytes())
            tf.write(f"{utt} {t.upper()}\n")
    create_dataset(str(tmp_path), "librispeech", workers=1)
    split_dataset(str(tmp_path), valid=0.25, test=0.0)

    conf = {
        "datasets": ["c"], "dataset_paths": {"c": str(tmp_path)},
        "apply_limits": False, "pcent": {"train": 1.0, "valid": 1.0},
        "shuffle_builder": {"train": False, "valid": False}, "sr": 16000,
        "melkwargs": {"n_fft": 1024, "n_mels": 128},
        "win_length": 0.025, "hop_length": 0.01, "deltas": 0,
        "transforms": {
            "x": [{"name": "OpenAudio"}, {"name": "ChannelCut"}, {"name": "PadderCutter"}],
            "y": [{"name": "OpenLabel"}, {"name": "Numericalize"}, {"name": "AddLen"}],
        },
        "buckets": [{"max_samples": 16000, "y_max": 8, "bs": 4}],
        "mesh": {"data": 1, "model": 1},
        "dtypes": {"compute": "float32"},
        "model": {
            "name": "CTCModel", "feature_sz": 1280, "vocab_sz": 40,
            "ctc": {"d_model": 16, "n_heads": 2, "n_layers": 1, "dropout": 0.0},
            "embed_sz": 8, "hidden_sz": 8, "out_sz": 8, "joint_sz": 8,
            "encoder": {"rnn_type": "LSTM", "num_layers": 1, "dropout": 0.0},
            "predictor": {"rnn_type": "NBRC", "num_layers": 1, "dropout": 0.0},
            "joint": {"method": "concat", "dropout": 0.0},
        },
        "training": {"optimizer": "adamw", "lr": 1e-3, "epochs": 1},
        "bs": 4, "accumulate_n_batches": 1, "seed": 0,
        "lm": {"enable": False},
        "tokenizer": {"model_file": ""},
    }
    conf_path = tmp_path / "ctc.yaml"
    conf_path.write_text(yaml.safe_dump(conf))
    train_cli.main([
        "--config", str(conf_path), "--steps", "2",
        "--ckpt", str(tmp_path / "ck"), "--eval-batches", "1",
        "--logdir", str(tmp_path / "runs"),
    ])
    out = capsys.readouterr().out
    assert "[ctc]" in out and "wer=" in out


def test_lm_trainer_smoke(tmp_path, capsys):
    import train_lm

    corpus = tmp_path / "c.txt"
    corpus.write_text("the cat sat on the mat\n" * 200)
    out = tmp_path / "lm.msgpack"
    train_lm.main([
        "--corpus", str(corpus), "--bs", "8", "--seq-len", "16",
        "--steps", "30", "--eval-every", "15",
        "--embed-sz", "16", "--hidden-sz", "16", "--num-layers", "1",
        "--out", str(out),
    ])
    assert out.exists()
    printed = capsys.readouterr().out
    assert "ppl=" in printed
