"""Training CLI — the notebook-free equivalent of the reference's
`make train` -> libreasr.ipynb loop (Makefile:1-4): builds everything
from the YAML config, trains with periodic in-training eval, tracks
best WER, checkpoints with optimizer state, and crash-resumes from the
last checkpoint on restart.

Usage:
  python train.py --config config/base.yaml [--lang en] [--steps N]
                  [--ckpt tmp/ckpt] [--mesh-model 1]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config/base.yaml")
    p.add_argument("--lang", default="")
    p.add_argument("--steps", type=int, default=0, help="stop after N steps (0=epochs from config)")
    p.add_argument("--ckpt", default="tmp/ckpt")
    p.add_argument("--bundle-out", default="")
    p.add_argument("--logdir", default="runs/libreasr")
    p.add_argument("--mesh-model", type=int, default=0, help="override TP axis size")
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline-parallel stages for the encoder stack "
                        "(mesh gains a 'pipe' axis; requires loss.fused, "
                        "encoder norm 'none' and use_tmp_state_pcent 0 — "
                        "see training/learner.py::PPConfig)")
    p.add_argument("--pp-micro", type=int, default=4,
                   help="GPipe microbatches per --pp step")
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--eval-every", type=int, default=0,
                   help="eval every N steps (0 = tests_per_epoch auto)")
    p.add_argument("--chain-steps", type=int, default=1,
                   help="run up to K same-bucket train steps as ONE "
                        "device program (amortizes the per-step dispatch "
                        "round-trip on remote/tunneled chips; numerics "
                        "identical to K sequential steps)")
    p.add_argument("--ckpt-every-s", type=float, default=600.0,
                   help="min seconds between epoch-end checkpoints (a "
                        "full orbax save streams the whole train state "
                        "off the device — per-epoch saves dominate wall "
                        "time on small corpora)")
    p.add_argument("--dist-coordinator", default="",
                   help="host:port for multi-host training (every process "
                        "runs this CLI with the same args + its --dist-pid)")
    p.add_argument("--dist-procs", type=int, default=0)
    p.add_argument("--dist-pid", type=int, default=0)
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. cpu) — env vars alone "
                        "cannot override a pinned hardware plugin")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from libreasr_tpu.utils import enable_compilation_cache

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.dist_coordinator:
        from libreasr_tpu.parallel import distributed as dist

        dist.initialize(
            args.dist_coordinator, num_processes=args.dist_procs,
            process_id=args.dist_pid,
        )
    enable_compilation_cache()

    from libreasr_tpu.api import ASRBundle
    from libreasr_tpu.config import parse_and_apply_config
    from libreasr_tpu.data.batching import ASRDataset
    from libreasr_tpu.data.builder import ASRDatasetBuilder
    from libreasr_tpu.data.language import get_language
    from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
    from libreasr_tpu.ops.frontend import FrontendConfig
    from libreasr_tpu.parallel.mesh import mesh_from_config, param_shardings
    from libreasr_tpu.training.callbacks import TrainLogger
    from libreasr_tpu.training.checkpoint import (
        restore_train_state, save_bundle, save_train_state,
    )
    from libreasr_tpu.training.evaluate import evaluate
    from libreasr_tpu.training.learner import Learner, LossConfig
    from libreasr_tpu.training.optimizers import build_optimizer, make_lr_schedule

    conf = parse_and_apply_config(lang=args.lang, path=args.config)
    if args.mesh_model:
        conf.setdefault("mesh", {})["model"] = args.mesh_model
    if args.pp > 1:
        conf.setdefault("mesh", {})["pipe"] = args.pp
        # the pipeline kernel's exactness constraints (PPConfig): the
        # encoder carry and inter-layer norm settings must be pp-legal
        conf["model"]["encoder"]["norm"] = "none"
        conf["model"]["encoder"]["use_tmp_state_pcent"] = 0.0
        conf.setdefault("loss", {})["fused"] = True
    seed = conf.get("seed", 42)

    # tokenizer / language
    tok_file = (conf.get("tokenizer", {}) or {}).get("model_file")
    if conf.get("train_tokenizer") and tok_file:
        builder = ASRDatasetBuilder.from_config(conf, "train")
        builder.train_tokenizer(tok_file, conf.get("wanted_vocab_sz", 2048))
    use_bpe = bool(tok_file and os.path.exists(tok_file))
    lang, vocab_sz = get_language(model_file=tok_file if use_bpe else None)
    conf["model"]["vocab_sz"] = max(conf["model"]["vocab_sz"], vocab_sz)

    # mesh first — batch shapes must divide the data axis
    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_from_config(conf)
        data_ax = mesh.shape["data"]
        for b in conf.get("buckets", []) or []:
            if b["bs"] % data_ax:
                b["bs"] = -(-b["bs"] // data_ax) * data_ax
                print(f"[train] bucket bs rounded to {b['bs']} (data axis {data_ax})")
        conf["drop_last"] = True  # ragged leftovers don't shard
        print(f"[train] mesh: {dict(mesh.shape)}")

    # data
    train_ds = ASRDataset.from_config(conf, lang, "train")
    valid_conf = dict(conf)
    valid_conf["drop_last"] = False  # eval runs unsharded
    valid_ds = ASRDataset.from_config(valid_conf, lang, "valid")
    print(f"[train] train={train_ds.builder.stats()} valid={len(valid_ds.builder)}")

    # model family dispatch (reference selects by model.name)
    if conf["model"].get("name", "Transducer") == "CTCModel":
        return _train_ctc(args, conf, lang, train_ds, valid_ds, mesh, seed)

    # model + optimizer
    cfg = TransducerConfig.from_config(conf)
    model, variables = init_transducer(cfg, jax.random.PRNGKey(seed))
    if mesh is not None:
        from libreasr_tpu.parallel.mesh import place_state

        variables = place_state(mesh, variables)  # multi-process safe

    tconf = conf.get("training", {})
    schedule = make_lr_schedule(
        {**tconf, "total_steps": args.steps or tconf.get("total_steps", 100_000)}
    )
    plateau = bool(tconf.get("reduce_on_plateau", False))
    tx = build_optimizer(
        tconf.get("optimizer", "ranger"),
        schedule,
        weight_decay=tconf.get("wd", 0.01),
        grad_clip=tconf.get("grad_clip", 10.0),
        accumulate=conf.get("accumulate_n_batches", 1),
        reduce_on_plateau=plateau,
    )
    learner = Learner(
        model, variables, tx,
        frontend=FrontendConfig.from_config(conf),
        loss_cfg=LossConfig.from_config(conf),
        mesh=mesh, seed=seed,
        hutchinson=tconf.get("optimizer", "").lower() == "adahessian",
        pass_loss_value=plateau,
        pp_micro=args.pp_micro,
    )
    if learner.pp is not None:
        print(f"[train] pipeline parallelism: {args.pp} stages x "
              f"{args.pp_micro} microbatches")

    # crash-resume (reference Makefile:1-4 + ipynb cell 21 try/except)
    start_step = 0
    if os.path.isdir(args.ckpt):
        try:
            learner.state, _ = restore_train_state(args.ckpt, learner.state)
            if mesh is not None:
                from libreasr_tpu.parallel.mesh import place_state

                learner.state = place_state(mesh, learner.state)
            start_step = int(learner.state.step)
            print(f"[train] resumed from {args.ckpt} at step {start_step}")
        except Exception as e:
            print(f"[train] resume failed ({e}); starting fresh")

    # inference bundle view for eval (shares params via variables swap)
    bundle = ASRBundle(conf, model, dict(variables), lang)
    logger = TrainLogger(args.logdir, use_wandb=conf.get("wandb", False), conf=conf)
    _restore_best_wer_bar(logger, args.ckpt, start_step)

    # --steps is the stop condition when given; epoch count must not
    # truncate it first (small corpora have tiny epochs)
    epochs = 10**9 if args.steps else tconf.get("epochs", 20)
    tests_per_epoch = conf.get("tests_per_epoch", 8)
    step = start_step
    metrics = {"loss": float("nan")}
    t0 = time.time()
    # an explicit cadence skips the first-epoch materialization below
    # (streamed datasets have large generated epochs; list() would hold
    # a whole epoch of audio on the host just to count batches)
    eval_every = args.eval_every if args.eval_every > 0 else None

    # multi-host: every process iterates the same deterministic loader
    # and contributes its row slice of each global batch; in-training
    # eval (single-program decode) runs on process 0's final pass only
    multiproc = jax.process_count() > 1
    rank0 = jax.process_index() == 0
    if multiproc:
        from libreasr_tpu.parallel import distributed as dist
        from libreasr_tpu.training.learner import Batch as _Batch

        def to_global(b):
            rows = dist.process_row_slice(mesh, b.audio.shape[0])
            local = _Batch(*(np.asarray(x)[rows] for x in b))
            return _Batch(*dist.global_batch(mesh, tuple(local)))

        print(f"[train] multi-host: {jax.process_count()} processes, "
              f"mesh {dict(mesh.shape)}")

    # chain K same-bucket steps into one device program (lax.scan in
    # Learner.step_chained); multi-host keeps per-step global batches
    chain_k = max(args.chain_steps, 1) if not multiproc else 1
    last_save = time.time()
    pending: dict = {}  # bucket shape -> batches awaiting a full chain

    def run_chunk(chunk):
        nonlocal step, metrics
        if args.steps and len(chunk) > args.steps - step:
            chunk = chunk[: args.steps - step]  # don't overshoot --steps
        if not chunk:  # resumed at/past --steps: nothing left to run
            raise StopIteration
        # exactly-K chunks use the chained program; anything shorter
        # (stop-truncation, final flush) steps singly — a variable chain
        # length would compile a separate full-step program per length
        if chain_k > 1 and len(chunk) == chain_k:
            metrics = learner.step_chained(chunk)
        else:
            for b in chunk:
                metrics = learner.step(to_global(b) if multiproc else b)
        prev = step
        # host-side step counter: int(learner.state.step) would
        # synchronize with the device every step
        step += len(chunk)
        if rank0:
            # chains stride the counter by K, so the logger gets the
            # stride to fire on cadence crossings and scale its EMA
            logger.log_step(step, metrics, chunk[-1], prev_step=prev)
        # global-step cadence: epochs can be shorter than the interval
        # (small corpora) and chains can stride past the exact multiple
        if (eval_every and not multiproc
                and step // eval_every > prev // eval_every):
            _run_eval(bundle, learner, valid_ds, logger, step,
                      args.eval_batches, args.ckpt)
        if args.steps and step >= args.steps:
            raise StopIteration

    try:
        if args.steps and step >= args.steps:
            raise StopIteration  # resumed at/past the budget
        for epoch in range(epochs):
            batches = list(train_ds) if eval_every is None else train_ds
            if eval_every is None and hasattr(batches, "__len__"):
                if not batches:
                    raise SystemExit(
                        "[train] the loader produced ZERO batches — check "
                        "dataset paths, bucket ladder (max_samples/y_max), "
                        "and that utterances survive the transform pipeline"
                    )
                eval_every = (
                    args.eval_every
                    if args.eval_every > 0
                    else max(len(batches) // max(tests_per_epoch, 1), 1)
                )
            # per-shape pending buffers dispatch EXACT-K chains only
            # (variable chain lengths would compile a separate full-step
            # program per (K, bucket) pair); buffers persist across
            # epoch boundaries — small epochs rarely fill K within one —
            # and leftovers flush as single steps after the last epoch
            saw_batch = False
            for batch in batches:
                saw_batch = True
                if chain_k <= 1:
                    run_chunk([batch])
                    continue
                # buckets can share an audio shape but differ in label
                # padding — the chain stacks every Batch field, so the
                # key must cover them all
                key = (batch.audio.shape, batch.labels.shape)
                buf = pending.setdefault(key, [])
                buf.append(batch)
                if len(buf) >= chain_k:
                    chunk, pending[key] = buf, []
                    run_chunk(chunk)
            if not saw_batch:
                # also reachable when --eval-every skips the first-epoch
                # materialization: without it a zero-yield loader (e.g.
                # drop_last buckets larger than a streamed epoch) spins
                # through 1e9 empty epochs instead of failing
                raise SystemExit(
                    "[train] the loader produced ZERO batches — check "
                    "dataset paths, bucket ladder (max_samples/y_max/bs "
                    "vs corpus size under drop_last), and that utterances "
                    "survive the transform pipeline"
                )
            if rank0:
                loss_s = (
                    f"{float(metrics['loss']):.3f}"
                    if step > start_step else "n/a (no chain filled yet)"
                )
                print(
                    f"[train] epoch {epoch} done step={step} "
                    f"loss={loss_s} ({time.time()-t0:.0f}s)"
                )
            # a full orbax save streams the whole train state off the
            # device — throttle to every ckpt_every_s (final save below)
            if time.time() - last_save >= args.ckpt_every_s:
                save_train_state(os.path.abspath(args.ckpt), learner.state)
                last_save = time.time()
        # epochs exhausted: flush chain leftovers as single steps
        for buf in pending.values():
            for b in buf:
                run_chunk([b])
    except (StopIteration, KeyboardInterrupt):
        pass

    save_train_state(os.path.abspath(args.ckpt), learner.state)
    if multiproc:
        # eval decode is a single-program path; report rank-0 loss and
        # leave WER evaluation to a single-process run on the checkpoint
        logger.close()
        if rank0:
            print(f"[train] done (multi-host): step={step} "
                  f"loss={float(metrics['loss']):.3f}")
        return
    result = _run_eval(bundle, learner, valid_ds, logger, step,
                       args.eval_batches, args.ckpt)
    if args.bundle_out:
        save_bundle(
            args.bundle_out, args.lang or "en",
            {"params": learner.state.params, "batch_stats": learner.state.batch_stats},
            conf, tokenizer_file=tok_file if use_bpe else None,
        )
        print(f"[train] bundle -> {args.bundle_out}")
    logger.close()
    print(f"[train] done: step={step} wer={result.wer:.3f} cer={result.cer:.3f}")


def _train_ctc(args, conf, lang, train_ds, valid_ds, mesh, seed):
    import jax

    from libreasr_tpu.models.ctc import CTCConfig, init_ctc
    from libreasr_tpu.ops.frontend import FrontendConfig
    from libreasr_tpu.training.ctc_learner import CTCLearner
    from libreasr_tpu.training.optimizers import build_optimizer, make_lr_schedule

    tconf = conf.get("training", {})
    cfg = CTCConfig.from_config(conf)
    model, variables = init_ctc(cfg, jax.random.PRNGKey(seed))
    schedule = make_lr_schedule(
        {**tconf, "total_steps": args.steps or tconf.get("total_steps", 100_000)}
    )
    tx = build_optimizer(
        tconf.get("optimizer", "adamw"), schedule,
        weight_decay=tconf.get("wd", 0.01),
        grad_clip=tconf.get("grad_clip", 10.0),
        accumulate=conf.get("accumulate_n_batches", 1),
    )
    learner = CTCLearner(
        model, variables, tx, frontend=FrontendConfig.from_config(conf), seed=seed
    )
    step = 0
    for epoch in range(tconf.get("epochs", 20)):
        for batch in train_ds:
            m = learner.step(batch)
            step += 1  # host counter: avoid per-step device sync
            if args.steps and step >= args.steps:
                break
        res = learner.evaluate(iter(valid_ds), lang, max_batches=args.eval_batches)
        print(f"[ctc] epoch {epoch} step={step} loss={float(m['loss']):.3f} "
              f"wer={res['wer']:.3f} cer={res['cer']:.3f}")
        if args.steps and step >= args.steps:
            break
    print(f"[train] done: step={step} wer={res['wer']:.3f} cer={res['cer']:.3f}")


def _restore_best_wer_bar(logger, ckpt, start_step):
    """Crash-resume must not reset the best-WER bar.

    A post-resume eval that is worse than the pre-crash best would
    otherwise overwrite the best checkpoint (r5 flagship run: best
    0.055@12k lost to a 0.074@14k "improvement" after a resume).
    _run_eval writes <ckpt>_best_wer.json alongside the checkpoint.
    """
    if not (start_step and ckpt):
        return
    best_meta = os.path.abspath(ckpt) + "_best_wer.json"
    if not os.path.exists(best_meta):
        return
    import json as _json

    with open(best_meta) as f:
        prev = _json.load(f)
    logger.best_wer = float(prev.get("wer", float("inf")))
    print(f"[train] best-WER bar restored: {logger.best_wer:.3f} "
          f"(step {prev.get('step')})")


def _run_eval(bundle, learner, valid_ds, logger, step, max_batches, ckpt):
    from libreasr_tpu.training.checkpoint import save_train_state
    from libreasr_tpu.training.evaluate import evaluate

    variables = {
        "params": learner.state.params,
        "batch_stats": learner.state.batch_stats,
    }
    result = evaluate(bundle, iter(valid_ds), variables=variables,
                      max_batches=max_batches)
    improved = logger.log_eval(step, result)
    print(
        f"[eval] step={step} wer={result.wer:.3f} cer={result.cer:.3f} "
        f"align={result.alignment_score:.2f} n={result.n}"
        + (" *best*" if improved else "")
    )
    if improved:
        import json as _json

        save_train_state(os.path.abspath(ckpt) + "_best_wer", learner.state)
        with open(os.path.abspath(ckpt) + "_best_wer.json", "w") as f:
            _json.dump({"wer": result.wer, "cer": result.cer,
                        "step": step}, f)
    return result


if __name__ == "__main__":
    main()
