"""WER/CER evaluation CLI — decode a dataset and score it
(BASELINE configs #2/#3: LibriSpeech dev/test-clean with greedy or
beam+LM decoding; the reference's full-dev decode lived in
libreasr.ipynb cells 34-44).

Usage:
  python scripts/evaluate_wer.py --dataset /data/LibriSpeech/dev-clean \
      [--bundle tmp/en.tar.gz] [--beam 4] [--use-lm] [--bs 16] [--max-utts N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True, help="dir with asr-dataset*.csv")
    p.add_argument("--bundle", default="", help="release tar.gz (default: random init)")
    p.add_argument("--config", default="config/base.yaml")
    p.add_argument("--split", default="test")
    p.add_argument("--beam", type=int, default=0)
    p.add_argument("--use-lm", action="store_true")
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--max-utts", type=int, default=0)
    p.add_argument("--max-secs", type=float, default=20.0)
    a = p.parse_args(argv)

    from libreasr_tpu.api import ASRBundle
    from libreasr_tpu.config import parse_and_apply_config
    from libreasr_tpu.data.batching import ASRDataset
    from libreasr_tpu.training.evaluate import evaluate
    from libreasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if a.bundle:
        bundle = ASRBundle.from_bundle(a.bundle)
        conf = dict(bundle.conf)
    else:
        conf = parse_and_apply_config(inference=True, path=a.config)
        bundle = ASRBundle.from_config(conf)

    conf.update(
        datasets=["eval"],
        dataset_paths={"eval": a.dataset},
        apply_limits=False,
        shuffle=False,
        shuffle_builder={a.split: False},
        pcent={a.split: 1.0},
        transforms={
            "x": [
                {"name": "OpenAudio"}, {"name": "ChannelCut"},
                {"name": "Resample"},
            ],
            "y": [
                {"name": "OpenLabel"}, {"name": "Numericalize"},
                {"name": "AddLen"},
            ],
        },
        buckets=[
            {"max_samples": int(a.max_secs * conf.get("sr", 16000)),
             "y_max": 256, "bs": a.bs}
        ],
    )
    ds = ASRDataset.from_config(conf, bundle.lang, a.split)
    if a.max_utts:
        ds.builder.df = ds.builder.df.iloc[: a.max_utts]
    print(f"[eval] {ds.builder.stats()}")

    t0 = time.time()
    result = evaluate(bundle, iter(ds), beam_width=a.beam, keep_samples=5)
    dt = time.time() - t0
    hours = ds.builder.stats().get("hours", 0)
    print(
        f"[eval] n={result.n} WER={result.wer:.4f} CER={result.cer:.4f} "
        f"align={result.alignment_score:.2f} "
        f"({dt:.0f}s, {hours * 3600 / max(dt, 1e-9):.0f}x realtime)"
    )
    for label, rec in result.by_length.items():
        print(f"  WER[{label}] = {rec['wer']:.4f} (n={rec['n']})")
    for s in result.samples:
        print(f"  pred:   {s['pred']!r}\n  target: {s['target']!r}")


if __name__ == "__main__":
    main()
