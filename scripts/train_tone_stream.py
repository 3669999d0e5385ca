"""Flagship convergence recipe on the STREAMED tone corpus.

Round-4 verdict #1: at any materialized corpus size the 70 M flagship
is data-bound (it memorizes 0.7 h outright). This recipe trains on
`libreasr_tpu/data/synth.py`'s infinite stream — every epoch is freshly
generated multi-speaker tone speech the model has never seen, so the
train/dev gap measures generalization, not memorization, and dev WER
can converge instead of diverging.

Same turn-key shape as scripts/train_960.py (tokenizer -> bucket ladder
from a sampled histogram -> train.py with crash-resume, periodic eval,
best-WER checkpoint, bundle export -> final held-out-split WER), minus
the disk corpus: nothing is materialized but the tokenizer text sample.

Usage:
  python scripts/train_tone_stream.py --out tmp/flagship_stream \
      [--steps 20000] [--hours-per-epoch 0.5] [--speakers 16] \
      [--vocab-sz 64] [--config config/base.yaml] [--set K=V ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="tmp/flagship_stream")
    p.add_argument("--config", default="config/base.yaml")
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--hours-per-epoch", type=float, default=0.5)
    p.add_argument("--speakers", type=int, default=16)
    p.add_argument("--heldout-speakers", type=int, default=4)
    p.add_argument("--eval-utts", type=int, default=96)
    p.add_argument("--vocab-sz", type=int, default=64,
                   help="BPE vocab (near-char subwords generalize on "
                        "this task; whole-word tokens memorize)")
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--eval-batches", type=int, default=8)
    p.add_argument("--chain-steps", type=int, default=8)
    p.add_argument("--retries", type=int, default=50)
    p.add_argument("--num-workers", type=int, default=6)
    p.add_argument("--ckpt-every-s", type=float, default=600.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--bs-max", type=int, default=16,
                   help="bucket batch-size cap (the tunneled chip in "
                        "this environment rejects >16-utt float32 "
                        "uploads; int16 transfer may admit 32)")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="dotted config override (YAML value; repeatable)")
    p.add_argument("--skip-final-eval", action="store_true")
    p.add_argument("--export-only", action="store_true",
                   help="skip training; re-export the best-dev-WER "
                        "bundle from an existing --out tree and run "
                        "the held-out TEST eval")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. cpu) — env vars "
                        "alone cannot override a pinned hardware plugin")
    a = p.parse_args(argv)

    if a.platform:
        import jax

        jax.config.update("jax_platforms", a.platform)

    import numpy as np
    import yaml

    from libreasr_tpu.config import open_config
    from libreasr_tpu.data.bpe import train_bpe
    from libreasr_tpu.data.synth import sentences

    out = a.out
    os.makedirs(out, exist_ok=True)

    if a.export_only:
        gen_conf = os.path.join(out, "tone_stream.yaml")
        tok_file = os.path.join(out, "tokenizer.bpe-model")
        bundle_out = os.path.join(out, "model.tar.gz")
        if not os.path.exists(gen_conf):
            raise SystemExit(f"--export-only: no run config at {gen_conf}")
        export_best_bundle(out, gen_conf, tok_file,
                           os.path.join(out, "ckpt"), bundle_out)
        if not a.skip_final_eval:
            final_test_eval(out, open_config(gen_conf), bundle_out)
        print(f"[tone-stream] done: bundle at {bundle_out}")
        return

    conf = open_config(a.config)

    # --- tokenizer: trained on a generated text sample (never audio) ----
    tok_file = os.path.join(out, "tokenizer.bpe-model")
    if not os.path.exists(tok_file):
        corpus = os.path.join(out, "tokenizer_corpus.txt")
        r = np.random.default_rng([a.seed, 6])
        with open(corpus, "w") as f:
            for s in sentences(r, 8000):
                f.write(s + "\n")
        print(f"[tone-stream] training BPE tokenizer (vocab {a.vocab_sz})")
        train_bpe(corpus, tok_file, a.vocab_sz)
    conf.setdefault("tokenizer", {})["model_file"] = tok_file
    conf["train_tokenizer"] = False

    # --- dataset: the stream -------------------------------------------
    conf["synth_tone"] = {
        "enabled": True,
        "hours_per_epoch": a.hours_per_epoch,
        "speakers": a.speakers,
        "heldout_speakers": a.heldout_speakers,
        "eval_utts": a.eval_utts,
        "seed": a.seed,
    }
    conf["num_workers"] = a.num_workers
    conf["drop_last"] = True
    conf["accumulate_n_batches"] = 1

    # frequency-coded audio is corrupted by speed/mask augmentation
    # (train_960 --no-augment lesson); strip every randomized stage
    tf = conf.get("transforms") or {}
    for k, stages in tf.items():
        if isinstance(stages, list):
            tf[k] = [s for s in stages if not (s or {}).get("wrap")]

    # tone-recipe model settings (Makefile train-tone-flagship lineage)
    conf["model"]["encoder"]["use_tmp_state_pcent"] = 0.25
    conf["model"]["predictor"]["use_tmp_state_pcent"] = 0.25
    conf["model"]["encoder"]["norm"] = "layer"
    conf["model"]["predictor"]["norm"] = "layer"

    for kv in a.set:
        key, sep, val = kv.partition("=")
        if not sep:
            raise SystemExit(f"--set expects K=V, got {kv!r}")
        d = conf
        *parents, leaf = key.split(".")
        for part in parents:
            d = d.setdefault(part, {})
        d[leaf] = yaml.safe_load(val)
        print(f"[tone-stream] override {key} = {d[leaf]!r}")

    # --- bucket ladder from a sampled histogram -------------------------
    from libreasr_tpu.data.batching import buckets_from_histogram
    from libreasr_tpu.data.language import get_language
    from libreasr_tpu.data.synth import ToneStreamDataset

    lang, _ = get_language(model_file=tok_file)
    probe = ToneStreamDataset.from_config(conf, lang, "train")
    xl, yl = probe.sample_lengths(512)
    import jax

    data_axis = max(len(jax.devices()), 1)
    if (conf.get("mesh", {}) or {}).get("model", 1) > 1:
        data_axis = max(data_axis // conf["mesh"]["model"], 1)
    buckets = buckets_from_histogram(
        xl, yl, sr=conf.get("sr", 16000), n_buckets=3, data_axis=data_axis,
        bs_max=a.bs_max,
    )
    # under drop_last a bucket larger than the epoch's share never
    # fills — the loader would yield zero batches forever
    per_epoch = int(a.hours_per_epoch * 3600 / 1.6)
    need = sum(b.bs for b in buckets) * 2
    if per_epoch < need:
        raise SystemExit(
            f"[tone-stream] --hours-per-epoch {a.hours_per_epoch} gives "
            f"~{per_epoch} utts/epoch but the bucket ladder needs "
            f">={need} to fill reliably under drop_last; raise it")
    print("[tone-stream] bucket ladder:")
    for b in buckets:
        print(f"  max {b.max_samples / conf.get('sr', 16000):5.1f} s  "
              f"y_max {b.max_tokens:3d}  bs {b.bs}")
    conf["buckets"] = [
        {"max_samples": b.max_samples, "y_max": b.max_tokens, "bs": b.bs}
        for b in buckets
    ]

    gen_conf = os.path.join(out, "tone_stream.yaml")
    with open(gen_conf, "w") as f:
        yaml.safe_dump(conf, f, sort_keys=False)
    print(f"[tone-stream] config -> {gen_conf}")

    # --- train with crash-resume ----------------------------------------
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
        "--steps", str(a.steps),
    ]
    if a.platform:
        args += ["--platform", a.platform]
    for attempt in range(a.retries):
        try:
            train_main(args)
            break
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — crash-resume semantics
            print(f"[tone-stream] run crashed ({type(e).__name__}: {e}); "
                  f"resuming from {ckpt} ({attempt + 1}/{a.retries})")
    else:
        raise SystemExit("tone-stream: out of retries")

    export_best_bundle(out, gen_conf, tok_file, ckpt, bundle_out)

    # --- final held-out TEST split (held-out speakers + sentences) -------
    if not a.skip_final_eval:
        final_test_eval(out, conf, bundle_out)
    print(f"[tone-stream] done: bundle at {bundle_out}")


def export_best_bundle(out, gen_conf, tok_file, ckpt, bundle_out):
    """Re-export the BEST-dev-WER checkpoint as the primary bundle.

    train.py saves it to <ckpt>_best_wer at every improvement; the
    final-step params go to model_final.tar.gz for reference. Restores
    params-only: the checkpoint's opt_state tree depends on the run's
    schedule/accumulation wrappers and is irrelevant for a bundle.
    """
    best_ckpt = ckpt + "_best_wer"
    if not os.path.isdir(best_ckpt):
        return
    import jax

    from libreasr_tpu.config import open_config as _oc
    from libreasr_tpu.data.language import get_language as _gl
    from libreasr_tpu.models.transducer import (
        TransducerConfig, init_transducer,
    )
    from libreasr_tpu.training.checkpoint import (
        restore_params_only, save_bundle,
    )

    conf2 = _oc(gen_conf)
    # vocab may have been widened by train.py (max of config and
    # tokenizer); rebuild the template at the trained width
    _, tok_vocab = _gl(model_file=tok_file)
    conf2["model"]["vocab_sz"] = max(conf2["model"]["vocab_sz"], tok_vocab)
    cfg2 = TransducerConfig.from_config(conf2)
    _, template = init_transducer(cfg2, jax.random.PRNGKey(0))
    params, batch_stats, step = restore_params_only(
        best_ckpt, template["params"], template.get("batch_stats", {}))
    if os.path.exists(bundle_out):
        os.replace(bundle_out, os.path.join(out, "model_final.tar.gz"))
    save_bundle(
        bundle_out, "en",
        {"params": params, "batch_stats": batch_stats},
        conf2, tokenizer_file=tok_file,
    )
    print(f"[tone-stream] best-dev-WER checkpoint (step {step}) "
          f"-> {bundle_out}")


def final_test_eval(out, conf, bundle_out):
    from libreasr_tpu.api import ASRBundle
    from libreasr_tpu.data.synth import ToneStreamDataset
    from libreasr_tpu.training.evaluate import evaluate

    bundle = ASRBundle.from_bundle(
        bundle_out, extract_to=os.path.join(out, "bundle_x"))
    test_ds = ToneStreamDataset.from_config(conf, bundle.lang, "test")
    res = evaluate(bundle, iter(test_ds), keep_samples=5)
    print(f"[tone-stream] TEST (held-out speakers+sentences): "
          f"wer={res.wer:.3f} cer={res.cer:.3f} n={res.n}")
    for s in res.samples:
        print(f"  pred={s['pred']!r} target={s['target']!r}")
    return res


if __name__ == "__main__":
    main()
