"""Data layer integration: synthetic librispeech-style corpus ->
create_dataset -> split -> builder -> pipeline -> bucketed batches ->
one train step. The full training slice minus real speech."""

import os
import wave

import numpy as np
import pytest

from libreasr_tpu.data.batching import (
    ASRDataset, Bucket, BucketBatcher, buckets_from_config, pick_bucket,
)
from libreasr_tpu.data.builder import ASRDatasetBuilder
from libreasr_tpu.data.create_dataset import create_dataset, parse_vtt
from libreasr_tpu.data.language import get_language
from libreasr_tpu.data.split import split_dataset
from libreasr_tpu.data.transforms import Pipeline, parse_stages


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """12 wav files with librispeech-style trans.txt labels."""
    root = tmp_path_factory.mktemp("corpus")
    spk = root / "19" / "198"
    spk.mkdir(parents=True)
    rng = np.random.default_rng(0)
    texts = [
        "hello world", "the cat sat", "on the mat", "speech is fun",
        "jax on tpu", "one two three", "four five six", "testing audio",
        "more data here", "almost done now", "last utterance", "bye bye",
    ]
    with open(spk / "19-198.trans.txt", "w") as tf:
        for i, text in enumerate(texts):
            utt = f"19-198-{i:04d}"
            dur = rng.integers(12000, 32000)
            pcm = (rng.standard_normal(dur) * 0.1).clip(-1, 1)
            with wave.open(str(spk / f"{utt}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(16000)
                w.writeframes((pcm * 32767).astype(np.int16).tobytes())
            tf.write(f"{utt} {text.upper()}\n")
    return str(root)


def test_create_and_split(corpus):
    df = create_dataset(corpus, "librispeech", workers=2)
    assert len(df) == 12
    assert not df["bad"].any()
    assert (df["sr"] == 16000).all()
    assert df["label"].str.islower().all()
    parts = split_dataset(corpus, valid=0.25, test=0.0)
    assert len(parts["train"]) == 9 and len(parts["valid"]) == 3
    assert os.path.exists(os.path.join(corpus, "asr-dataset-train.csv"))


def test_builder_limits(corpus):
    conf = {
        "datasets": ["mini"],
        "dataset_paths": {"mini": corpus},
        "apply_limits": True,
        "almins": 0.5, "almaxs": 6.0, "y_min": 1, "y_max": 60,
        "y_max_words": 100, "pcent": {"train": 1.0},
        "shuffle_builder": {"train": True}, "seed": 1,
    }
    b = ASRDatasetBuilder.from_config(conf, "train")
    assert 0 < len(b) <= 9
    stats = b.stats()
    assert stats["utts"] == len(b)
    assert stats["hours"] > 0


def test_pipeline_and_batcher(corpus):
    lang, vocab = get_language()
    conf = {
        "datasets": ["mini"], "dataset_paths": {"mini": corpus},
        "apply_limits": False, "pcent": {"train": 1.0},
        "shuffle_builder": {"train": False}, "sr": 16000,
        "transforms": {
            "x": [
                {"name": "OpenAudio"}, {"name": "ChannelCut"},
                {"name": "Resample"},
                {"name": "ChangeVolume", "wrap": True, "args": {"pcent": 0.03}},
                {"name": "PadderCutter"},
            ],
            "y": [
                {"name": "OpenLabel"}, {"name": "PadCutLabel"},
                {"name": "Numericalize"}, {"name": "AddLen"},
            ],
        },
        "buckets": [
            {"max_samples": 16000, "y_max": 24, "bs": 2},
            {"max_samples": 32000, "y_max": 24, "bs": 2},
        ],
        "seed": 0, "shuffle": True,
    }
    ds = ASRDataset.from_config(conf, lang, "train")
    batches = list(ds)
    assert batches, "no batches produced"
    for b in batches:
        assert b.audio.shape[0] >= 2
        assert b.audio.shape[1] in (16000, 32000)
        assert b.labels.shape[1] == 24
        assert (b.label_len > 0).all()
        assert (b.audio_len <= b.audio.shape[1]).all()
    # the earlier split test leaves 9 train rows; at most one bs==1
    # leftover per bucket may be dropped
    assert sum(b.audio.shape[0] for b in batches) >= 7


def test_batch_trains(corpus):
    import jax
    from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
    from libreasr_tpu.ops.frontend import FrontendConfig
    from libreasr_tpu.training.learner import Learner
    from libreasr_tpu.training.optimizers import build_optimizer

    lang, vocab = get_language()
    conf = {
        "datasets": ["mini"], "dataset_paths": {"mini": corpus},
        "apply_limits": False, "pcent": {"train": 1.0},
        "shuffle_builder": {"train": False}, "sr": 16000,
        "transforms": {
            "x": [{"name": "OpenAudio"}, {"name": "ChannelCut"}, {"name": "PadderCutter"}],
            "y": [{"name": "OpenLabel"}, {"name": "Numericalize"}, {"name": "AddLen"}],
        },
        "buckets": [{"max_samples": 32000, "y_max": 20, "bs": 4}],
        "seed": 0, "shuffle": False,
    }
    ds = ASRDataset.from_config(conf, lang, "train")
    cfg = TransducerConfig(
        feature_sz=1280, embed_sz=8, vocab_sz=vocab, hidden_sz=12,
        out_sz=12, joint_sz=12, enc_num_layers=1, pred_num_layers=1,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    learner = Learner(
        model, variables, build_optimizer("adam", 1e-3),
        frontend=FrontendConfig(),
    )
    n_batches = 0
    for batch in ds:
        m = learner.step(batch)
        assert np.isfinite(m["loss"]) and bool(m["finite"])
        n_batches += 1
    assert n_batches >= 2


def test_threaded_pipeline_matches_sequential(corpus):
    lang, _ = get_language()
    conf = {
        "datasets": ["mini"], "dataset_paths": {"mini": corpus},
        "apply_limits": False, "pcent": {"train": 1.0},
        "shuffle_builder": {"train": False}, "sr": 16000,
        "transforms": {
            "x": [{"name": "OpenAudio"}, {"name": "ChannelCut"}, {"name": "PadderCutter"}],
            "y": [{"name": "OpenLabel"}, {"name": "Numericalize"}, {"name": "AddLen"}],
        },
        "buckets": [{"max_samples": 32000, "y_max": 24, "bs": 2}],
        "seed": 0, "shuffle": False,
    }
    seq = ASRDataset.from_config(conf, lang, "train")
    par = ASRDataset.from_config({**conf, "num_workers": 4}, lang, "train")
    items_seq = list(seq._items())
    items_par = list(par._items())
    assert len(items_seq) == len(items_par)
    # FIFO prefetch preserves order; deterministic stages -> same data
    for a, b in zip(items_seq, items_par):
        np.testing.assert_array_equal(a["audio"], b["audio"])
        assert a["ids"] == b["ids"]


def test_pick_bucket():
    bl = [Bucket(100, 10, 4), Bucket(200, 20, 2)]
    assert pick_bucket(bl, 50, 5) == bl[0]
    assert pick_bucket(bl, 150, 5) == bl[1]
    assert pick_bucket(bl, 50, 15) == bl[1]
    assert pick_bucket(bl, 500, 5) is None


def test_buckets_from_config_frames():
    conf = {"sr": 16000, "hop_length": 0.01,
            "buckets": [{"x_max": 200, "y_max": 24, "bs": 32}]}
    b = buckets_from_config(conf)[0]
    assert b.max_samples == 200 * 160
    assert b.bs == 32


def test_parse_vtt(tmp_path):
    p = tmp_path / "a.vtt"
    p.write_text(
        "WEBVTT\n\n00:00:01.000 --> 00:00:02.500\nHello <i>there</i>\n\n"
        "00:01:00.000 --> 00:01:03.000\nSecond cue\ntwo lines\n"
    )
    cues = parse_vtt(str(p))
    assert cues[0] == (1000, 2500, "hello there")
    assert cues[1][2] == "second cue two lines"


def test_common_voice_mp3_tree(tmp_path):
    """Mock CommonVoice tree (clips/*.mp3 + validated.tsv) ingested
    end-to-end by create_dataset — the reference gets this via sox
    (transforms.py:68); here the native facade decodes mp3 through the
    host codec (VERDICT r2 #2 done-criterion)."""
    from libreasr_tpu.data.audio import have_mp3, write_mp3

    if not have_mp3():
        pytest.skip("host has no libmpg123/libmp3lame")
    root = tmp_path / "cv"
    clips = root / "clips"
    clips.mkdir(parents=True)
    rng = np.random.default_rng(1)
    rows = []
    for i, text in enumerate(["common voice one", "number two", "third clip"]):
        name = f"clip_{i:03d}"
        dur = int(rng.integers(16000, 32000))
        pcm = (rng.standard_normal(dur) * 0.1).clip(-1, 1).astype(np.float32)
        write_mp3(str(clips / f"{name}.mp3"), pcm, 16000)
        rows.append((f"{name}.mp3", text))
    with open(root / "validated.tsv", "w") as f:
        f.write("path\tsentence\n")
        for p, s in rows:
            f.write(f"{p}\t{s}\n")

    df = create_dataset(str(root), "common-voice", workers=1)
    assert len(df) == 3
    assert not df["bad"].any()
    assert sorted(df["label"]) == ["common voice one", "number two", "third clip"]
    assert (df["sr"] == 16000).all()
    # durations within mp3 frame-padding slack of the encoded signal
    assert (df["xlen"] > 900).all() and (df["xlen"] < 2400).all()


def test_batcher_leftovers_power_of_two(rng):
    """Ragged bucket leftovers must come out in power-of-two sub-batches
    (bounded compiled-shape set): an epoch-varying remainder size would
    recompile the train step every epoch."""
    bucket = Bucket(max_samples=800, max_tokens=8, bs=16)
    items = [
        {"audio": np.zeros(700, np.float32), "ids": [1, 2, 3]}
        for _ in range(27)  # 16 + ragged 11 -> 8 + 2 (+1 dropped)
    ]
    bb = BucketBatcher([bucket], shuffle=False, drop_last=False)
    sizes = [b.audio.shape[0] for b in bb.batches(iter(items))]
    assert sizes == [16, 8, 2]
    bb = BucketBatcher([bucket], shuffle=False, drop_last=True)
    sizes = [b.audio.shape[0] for b in bb.batches(iter(items))]
    assert sizes == [16]


def test_int16_transfer_codec_lossless(rng):
    """int16 training transfer (batching.py transfer_dtype): the host
    quantization is the exact inverse of the device decode in
    features_batch, so 16-bit-sourced audio round-trips bit-for-bit and
    the frontend features are identical to the float32 path."""
    import jax.numpy as jnp

    from libreasr_tpu.ops.frontend import FrontendConfig, features_batch

    # pcm as decoded from an int16 wav: v / 32768
    v = rng.integers(-32768, 32768, size=4000, dtype=np.int64)
    pcm = (v / 32768.0).astype(np.float32)
    bucket = Bucket(max_samples=4096, max_tokens=8, bs=2)
    items = [{"audio": pcm, "ids": [1, 2]} for _ in range(2)]
    b16 = next(iter(BucketBatcher(
        [bucket], shuffle=False, transfer_dtype="int16").batches(iter(items))))
    bf = next(iter(BucketBatcher(
        [bucket], shuffle=False).batches(iter(items))))
    assert b16.audio.dtype == np.int16
    np.testing.assert_array_equal(
        b16.audio[:, :4000].astype(np.int64), v[None].repeat(2, 0))
    cfg = FrontendConfig()
    f16, l16 = features_batch(jnp.asarray(b16.audio),
                              jnp.asarray(b16.audio_len), cfg)
    ff, lf = features_batch(jnp.asarray(bf.audio),
                            jnp.asarray(bf.audio_len), cfg)
    np.testing.assert_array_equal(np.asarray(l16), np.asarray(lf))
    np.testing.assert_array_equal(np.asarray(f16), np.asarray(ff))


def test_create_dataset_crash_resume(corpus, tmp_path):
    """Incremental save/restore (reference create-asr-dataset.py:
    137-141,331-347): a run interrupted mid-corpus restores from the
    partial CSV and the final file is byte-identical to an
    uninterrupted run — including a torn final line."""
    full_out = str(tmp_path / "full.csv")
    create_dataset(corpus, "librispeech", workers=2, out=full_out,
                   pool="thread", flush_every=4)
    want = open(full_out, "rb").read()

    # simulate a kill after ~half the corpus, with the last line torn
    resumed_out = str(tmp_path / "resumed.csv")
    partial = resumed_out + ".partial"
    lines = open(full_out).read().splitlines(keepends=True)
    torn = lines[: 1 + 7] + [lines[8][: len(lines[8]) // 2]]
    open(partial, "w").write("".join(torn))

    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        create_dataset(corpus, "librispeech", workers=2, out=resumed_out,
                       pool="thread", flush_every=4)
    assert "resuming:" in buf.getvalue()
    got = open(resumed_out, "rb").read()
    assert got == want
    assert not os.path.exists(partial)  # cleaned up on success


def test_create_dataset_process_pool(corpus, tmp_path):
    """The default process pool (reference :304-310) produces the same
    CSV as the thread pool."""
    a = str(tmp_path / "proc.csv")
    b = str(tmp_path / "thr.csv")
    create_dataset(corpus, "librispeech", workers=2, out=a, pool="process")
    create_dataset(corpus, "librispeech", workers=2, out=b, pool="thread")
    assert open(a, "rb").read() == open(b, "rb").read()
