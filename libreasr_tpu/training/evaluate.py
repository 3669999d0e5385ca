"""Eval harness: decode the valid set, compute WER/CER, track best.

Equivalent of the reference's patched `Learner.test()` (patches.py:22-120)
— per-utterance greedy decode + cer/wer + best-WER checkpoint — but
decoding whole batches on device instead of one utterance at a time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decode import greedy_decode
from ..ops.frontend import features_batch
from .metrics import cer, wer


@dataclass
class EvalResult:
    wer: float
    cer: float
    alignment_score: float
    n: int
    samples: list = field(default_factory=list)
    by_length: dict = field(default_factory=dict)


def make_eval_step(
    bundle, max_iters: int = 3, max_tokens: int = 128, beam_width: int = 0
):
    """Jitted batch decode: (variables, audio, lengths) -> tokens.
    beam_width > 1 switches to beam search."""

    @jax.jit
    def run(variables, audio, lengths):
        fns = bundle.decoder_fns(use_lm=False, variables=variables)
        feats, flens = features_batch(audio, lengths, bundle.frontend)
        enc_out, _ = bundle.encode(feats, flens, variables=variables)
        if beam_width > 1:
            from ..models.beam import beam_decode

            toks, tok_lens, scores = beam_decode(
                fns, enc_out, flens,
                vocab_sz=bundle.cfg.vocab_sz, beam_width=beam_width,
                blank=bundle.cfg.blank, bos=bundle.cfg.bos,
                max_expand=max_iters, max_tokens=max_tokens,
            )
            metrics = {"alignment_score": jnp.zeros_like(scores)}
        else:
            toks, tok_lens, metrics, _ = greedy_decode(
                fns, enc_out, flens,
                vocab_sz=bundle.cfg.vocab_sz, blank=bundle.cfg.blank,
                bos=bundle.cfg.bos, max_iters=max_iters, max_tokens=max_tokens,
            )
        return toks, tok_lens, metrics

    return run


def evaluate(
    bundle,
    batches,
    *,
    variables=None,
    max_batches: int | None = None,
    keep_samples: int = 8,
    beam_width: int = 0,
) -> EvalResult:
    """Decode `batches` (training Batch tuples with raw audio + label
    ids) and score against the references."""
    variables = variables if variables is not None else bundle.variables
    run = make_eval_step(bundle, beam_width=beam_width)
    lang = bundle.lang
    wers, cers, aligns, samples, secs = [], [], [], [], []
    sr = bundle.frontend.sr
    for bi, batch in enumerate(batches):
        if max_batches is not None and bi >= max_batches:
            break
        toks, lens, metrics = run(
            variables, jnp.asarray(batch.audio), jnp.asarray(batch.audio_len)
        )
        toks, lens = np.asarray(toks), np.asarray(lens)
        align = np.asarray(metrics["alignment_score"])
        for i in range(len(toks)):
            pred = lang.denumericalize(list(toks[i, : lens[i]]))
            target = lang.denumericalize(
                list(np.asarray(batch.labels)[i, : batch.label_len[i]])
            )
            wers.append(wer(pred, target))
            cers.append(cer(pred, target))
            aligns.append(float(align[i]))
            secs.append(float(batch.audio_len[i]) / sr)
            if len(samples) < keep_samples:
                samples.append({"pred": pred, "target": target})
    n = len(wers)
    if n == 0:
        return EvalResult(1.0, 1.0, 0.0, 0)
    return EvalResult(
        wer=float(np.mean(wers)),
        cer=float(np.mean(cers)),
        alignment_score=float(np.mean(aligns)),
        n=n,
        samples=samples,
        by_length=wer_by_length(secs, wers),
    )


def wer_by_length(secs, wers, edges=(2, 4, 6, 10, 20)) -> dict:
    """WER bucketed by utterance duration (the reference's WER-vs-length
    analysis, libreasr.ipynb cells 34-44)."""
    out = {}
    lo = 0.0
    for hi in list(edges) + [float("inf")]:
        sel = [w for s, w in zip(secs, wers) if lo <= s < hi]
        if sel:
            label = f"{lo:g}-{hi:g}s" if hi != float("inf") else f">{lo:g}s"
            out[label] = {"wer": float(np.mean(sel)), "n": len(sel)}
        lo = hi
    return out
