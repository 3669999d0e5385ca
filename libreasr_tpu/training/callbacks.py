"""Training observability: tensorboard scalars/text + best-WER tracking.

Equivalent of the reference's Tensorboard callback (callbacks.py:15-123):
train smooth loss / seq lens / batch size every few steps, periodic
in-training eval with WER/CER + transcript samples, best-WER checkpoint.
wandb mirroring is gated on the package being importable (callbacks.py:43).
"""

from __future__ import annotations

import os
from typing import Any


class TrainLogger:
    def __init__(self, logdir: str = "runs/libreasr", every: int = 4,
                 use_wandb: bool = False, conf: dict | None = None):
        self.every = every
        self.writer = None
        self.wandb = None
        try:
            from tensorboardX import SummaryWriter

            os.makedirs(logdir, exist_ok=True)
            self.writer = SummaryWriter(logdir)
        except Exception:
            pass
        if use_wandb:
            try:
                import wandb

                wandb.init(project="libreasr-tpu", config=conf or {})
                self.wandb = wandb
            except Exception:
                self.wandb = None
        self.best_wer = float("inf")
        self._ema_loss = None
        self._ema_step = None

    def log_step(self, step: int, metrics: dict[str, Any], batch=None,
                 prev_step: int | None = None):
        # materialize device metrics only at logging cadence — a float()
        # every step would synchronize with the device per step.
        # Chained dispatch strides the counter by K (prev_step given):
        # fire on cadence *crossings* so strides not aligned with
        # `every` still log.
        if self.writer is None:
            return
        if prev_step is not None:
            if step // self.every <= prev_step // self.every:
                return
        elif step % self.every != 0:
            return
        # the chain mean (when present) feeds the EMA so intra-chain
        # losses aren't dropped; train/loss stays the last-step value
        loss = float(metrics["loss"])
        ema_in = float(metrics.get("loss_mean", metrics["loss"]))
        # EMA over sampled (logged) losses. The reference smooths with
        # per-step decay 0.98 (fastai smooth_loss); sampling every N
        # steps, decay 0.98**N per sample gives the same time constant,
        # so train/smooth_loss curves stay comparable across logging
        # intervals (and to reference runs)
        interval = (
            step - self._ema_step if self._ema_step is not None else self.every
        )
        decay = 0.98 ** max(interval, 1)
        self._ema_loss = (
            ema_in
            if self._ema_loss is None
            else decay * self._ema_loss + (1.0 - decay) * ema_in
        )
        self._ema_step = step
        w = self.writer
        w.add_scalar("train/loss", loss, step)
        w.add_scalar("train/smooth_loss", self._ema_loss, step)
        w.add_scalar("train/grad_norm", float(metrics.get("grad_norm", 0)), step)
        if "frames" in metrics:
            w.add_scalar("train/frames", int(metrics["frames"]), step)
        if "tokens" in metrics:
            w.add_scalar("train/tokens", int(metrics["tokens"]), step)
        if batch is not None:
            w.add_scalar("train/batch_size", len(batch.audio), step)
        if self.wandb:
            self.wandb.log({"loss": loss, "step": step})

    def log_eval(self, step: int, result) -> bool:
        """Log an EvalResult; returns True when WER improved
        (best-WER checkpointing hook, patches.py:89-97)."""
        improved = result.wer < self.best_wer
        if improved:
            self.best_wer = result.wer
        if self.writer is not None:
            self.writer.add_scalar("eval/wer", result.wer, step)
            self.writer.add_scalar("eval/cer", result.cer, step)
            self.writer.add_scalar(
                "eval/alignment_score", result.alignment_score, step
            )
            for i, s in enumerate(result.samples[:4]):
                self.writer.add_text(
                    f"eval/sample{i}", f"pred: {s['pred']}\n\ntarget: {s['target']}",
                    step,
                )
        if self.wandb:
            self.wandb.log({"wer": result.wer, "cer": result.cer, "step": step})
        return improved

    def close(self):
        if self.writer is not None:
            self.writer.close()
