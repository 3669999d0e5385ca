"""Turn-key LibriSpeech-960 training recipe (BASELINE config #5).

One command drives the whole path the reference spreads over
download-corpora.py + create-asr-dataset.py + split.py + the
libreasr.ipynb notebook + `make train`'s 1000x crash-resume loop
(reference Makefile:1-4):

  download (optional) -> per-split create_dataset -> train/valid/test
  CSVs -> BPE tokenizer training -> bucket ladder derived from the
  corpus length histogram -> train.py (crash-resume, periodic eval,
  best-WER checkpoint, bundle export) -> final WER report.

Usage:
  python scripts/train_960.py --root /data/LibriSpeech [--download]
      [--out tmp/ls960] [--steps N] [--config config/base.yaml]
      [--retries 100]

The same entry point runs the mock end-to-end validation in
tests/test_train_960.py: a synthetic LibriSpeech-shaped tree on disk,
a tiny model config, a few dozen steps — so the real 960 h run is a
data-availability event, not an engineering one.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_SPLITS = ("train-clean-100", "train-clean-360", "train-other-500")
VALID_SPLIT = "dev-clean"
TEST_SPLIT = "test-clean"


def find_split_dirs(root: str):
    """LibriSpeech layouts: <root>/<split> or <root>/LibriSpeech/<split>."""
    bases = [root, os.path.join(root, "LibriSpeech")]
    found = {}
    for b in bases:
        if not os.path.isdir(b):
            continue
        for split in TRAIN_SPLITS + (VALID_SPLIT, TEST_SPLIT):
            p = os.path.join(b, split)
            if os.path.isdir(p) and split not in found:
                found[split] = p
    return found


def build_csvs(splits: dict, out_dir: str, workers: int = 8):
    """create_dataset per split dir -> merged absolute-path CSVs in
    out_dir (asr-dataset-{train,valid,test}.csv). Falls back to a random
    split when the corpus has no dev/test dirs."""
    import pandas as pd

    from libreasr_tpu.data.create_dataset import create_dataset

    os.makedirs(out_dir, exist_ok=True)

    def split_df(split):
        path = splits[split]
        csv = os.path.join(path, "asr-dataset.csv")
        if not os.path.exists(csv):
            create_dataset(path, "librispeech", workers=workers)
        df = pd.read_csv(csv)
        df = df[~df["bad"].astype(bool)].copy()

        from libreasr_tpu.data.builder import resolve_audio_paths

        return resolve_audio_paths(df, path, absolute=True)

    train_parts = [split_df(s) for s in TRAIN_SPLITS if s in splits]
    if not train_parts:
        raise SystemExit(f"no train-* split dirs found under the corpus root")
    train = pd.concat(train_parts, ignore_index=True)

    if VALID_SPLIT in splits:
        valid = split_df(VALID_SPLIT)
    else:  # carve 5% off train
        valid = train.sample(frac=0.05, random_state=42)
        train = train.drop(valid.index)
    test = split_df(TEST_SPLIT) if TEST_SPLIT in splits else valid

    for name, df in (("train", train), ("valid", valid), ("test", test)):
        p = os.path.join(out_dir, f"asr-dataset-{name}.csv")
        df.to_csv(p, index=False)
        hours = df["xlen"].sum() / 3_600_000.0
        print(f"[train-960] {name}: {len(df)} utts, {hours:.1f} h -> {p}")
    missing = [p for p in train["file"].head(20) if not os.path.exists(p)]
    if missing:
        raise SystemExit(f"[train-960] resolved audio paths missing: {missing[:3]}")
    return train


def derive_buckets(conf, n_buckets: int, data_axis: int):
    """Bucket ladder from the histogram of what the loader will
    actually yield: the builder's training-time limits
    (almins/almaxs/y_min/y_max, reference config:166-172) are applied
    first — deriving from the raw CSV would size edges for utterances
    the limits discard — and label lengths are measured in BPE tokens
    (what Bucket.max_tokens compares against at batch time), not the
    CSV's character counts."""
    from libreasr_tpu.data.batching import buckets_from_histogram
    from libreasr_tpu.data.builder import ASRDatasetBuilder
    from libreasr_tpu.data.language import get_language

    b = ASRDatasetBuilder.from_config(conf, "train")
    lang, _ = get_language(model_file=conf["tokenizer"]["model_file"])
    ylen_tok = [
        len(lang.numericalize(t)) for t in b.df["label"].astype(str)
    ]
    print(f"[train-960] post-limit corpus: {len(b.df)} utts, "
          f"{b.df['xlen'].sum() / 3_600_000.0:.1f} h "
          f"(almaxs {conf.get('almaxs', 6.0)} s, "
          f"y_max {conf.get('y_max', 60)} chars)")

    buckets = buckets_from_histogram(
        b.df["xlen"], ylen_tok, sr=conf.get("sr", 16000),
        n_buckets=n_buckets, data_axis=data_axis,
    )
    print(f"[train-960] bucket ladder from length histogram:")
    for b in buckets:
        print(f"  max {b.max_samples / conf.get('sr', 16000):5.1f} s  "
              f"y_max {b.max_tokens:3d}  bs {b.bs}")
    return [
        {"max_samples": b.max_samples, "y_max": b.max_tokens, "bs": b.bs}
        for b in buckets
    ]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True, help="LibriSpeech corpus root")
    p.add_argument("--out", default="tmp/ls960", help="work dir (CSVs, "
                   "tokenizer, checkpoints, bundle)")
    p.add_argument("--config", default="config/base.yaml")
    p.add_argument("--download", action="store_true",
                   help="download missing LibriSpeech splits first")
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--retries", type=int, default=100,
                   help="crash-resume relaunches (reference Makefile:1-4)")
    p.add_argument("--n-buckets", type=int, default=4)
    p.add_argument("--vocab-sz", type=int, default=0,
                   help="BPE vocab (default: config wanted_vocab_sz)")
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--eval-every", type=int, default=250,
                   help="eval cadence in steps (small corpora make the "
                        "reference's tests-per-epoch cadence pathological)")
    p.add_argument("--skip-final-eval", action="store_true")
    p.add_argument("--chain-steps", type=int, default=8,
                   help="fuse up to K same-bucket train steps into one "
                        "device program (see train.py --chain-steps)")
    p.add_argument("--ckpt-every-s", type=float, default=600.0)
    p.add_argument("--accumulate", type=int, default=0,
                   help="override accumulate_n_batches (0 = keep config; "
                        "small corpora want 1 — the flagship default of "
                        "10 makes 10 loader steps per optimizer update)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="dotted config override, e.g. "
                        "model.encoder.use_tmp_state_pcent=0.25 "
                        "(YAML-parsed value; repeatable)")
    p.add_argument("--no-augment", action="store_true",
                   help="strip the randomized augmentation stages (speed "
                        "perturb, SpecAugment masks/cuts, noise, shifts); "
                        "frequency-coded synthetic corpora are corrupted "
                        "by speed/mask augmentation")
    a = p.parse_args(argv)

    import yaml

    from libreasr_tpu.config import open_config
    from libreasr_tpu.data.builder import ASRDatasetBuilder

    if a.download:
        from scripts.download_corpora import CORPORA, download

        for name in CORPORA:
            if name.startswith("librispeech"):
                download(name, a.root)

    splits = find_split_dirs(a.root)
    if not splits:
        raise SystemExit(f"no LibriSpeech split dirs under {a.root}")
    print(f"[train-960] splits: {sorted(splits)}")

    out = a.out
    os.makedirs(out, exist_ok=True)
    conf = open_config(a.config)
    build_csvs(splits, out, workers=a.workers)

    # dataset + tokenizer wiring
    conf["datasets"] = ["ls960"]
    conf["dataset_paths"] = {"ls960": out}
    # the host pipeline must keep the chip fed — the config default
    # (3 workers, reference num_workers) starves a 26 ms step
    conf["num_workers"] = max(int(conf.get("num_workers", 3)), a.workers)
    # full-shape batches only: ragged tails cost compiled programs and
    # the shuffled spill trains on everything across epochs anyway
    conf["drop_last"] = True
    if a.accumulate:
        conf["accumulate_n_batches"] = a.accumulate
    tok_file = os.path.join(out, "tokenizer.bpe-model")
    conf.setdefault("tokenizer", {})["model_file"] = tok_file
    conf["train_tokenizer"] = False
    if not os.path.exists(tok_file):
        vocab = a.vocab_sz or conf.get("wanted_vocab_sz", 2048)
        print(f"[train-960] training BPE tokenizer (vocab {vocab}) ...")
        builder = ASRDatasetBuilder.from_config(conf, "train")
        builder.train_tokenizer(tok_file, vocab)

    # bucket ladder from the corpus histogram
    import jax

    data_axis = max(len(jax.devices()), 1)
    if (conf.get("mesh", {}) or {}).get("model", 1) > 1:
        data_axis = max(data_axis // conf["mesh"]["model"], 1)
    conf["buckets"] = derive_buckets(conf, a.n_buckets, data_axis)

    if a.no_augment:
        tf = conf.get("transforms") or {}
        for k, stages in tf.items():
            if isinstance(stages, list):
                tf[k] = [s for s in stages if not (s or {}).get("wrap")]
        print("[train-960] randomized augmentation stages stripped")

    for kv in a.set:
        key, _, val = kv.partition("=")
        if not _:
            raise SystemExit(f"--set expects K=V, got {kv!r}")
        d = conf
        *parents, leaf = key.split(".")
        for part in parents:
            d = d.setdefault(part, {})
        d[leaf] = yaml.safe_load(val)
        print(f"[train-960] override {key} = {d[leaf]!r}")

    gen_conf = os.path.join(out, "train960.yaml")
    with open(gen_conf, "w") as f:
        yaml.safe_dump(conf, f, sort_keys=False)
    print(f"[train-960] config -> {gen_conf}")

    # train with crash-resume (the reference loops the notebook 1000x)
    from train import main as train_main

    bundle_out = os.path.join(out, "model.tar.gz")
    ckpt = os.path.join(out, "ckpt")
    args = [
        "--config", gen_conf, "--ckpt", ckpt, "--bundle-out", bundle_out,
        "--logdir", os.path.join(out, "runs"),
        "--eval-batches", str(a.eval_batches),
        "--eval-every", str(a.eval_every),
        "--chain-steps", str(a.chain_steps),
        "--ckpt-every-s", str(a.ckpt_every_s),
    ]
    if a.steps:
        args += ["--steps", str(a.steps)]
    for attempt in range(a.retries):
        try:
            train_main(args)
            break
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — crash-resume semantics
            print(f"[train-960] run crashed ({type(e).__name__}: {e}); "
                  f"resuming from {ckpt} ({attempt + 1}/{a.retries})")
    else:
        raise SystemExit("train-960: out of retries")

    if not a.skip_final_eval:
        from scripts.evaluate_wer import main as eval_main

        print("[train-960] final test-split WER:")
        eval_main([
            "--dataset", out, "--split", "test", "--bundle", bundle_out,
            "--config", gen_conf,
        ])
    print(f"[train-960] done: bundle at {bundle_out}")


if __name__ == "__main__":
    main()
