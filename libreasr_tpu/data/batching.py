"""Bucketed batching: variable-length utterances -> static XLA shapes.

The reference's DynamicBucketingDL packs arbitrary-size batches under
frame/token caps (data.py:139-215) — free under eager torch, poison for
XLA (every new shape recompiles). Here each batch snaps to a fixed
bucket shape (max_samples, max_tokens, bs) from a ladder, so the whole
run compiles a handful of programs:

- utterances are binned by (audio samples, token count) into the
  smallest bucket that fits;
- within a bucket, a shuffled window is sorted by length before packing
  (the reference's sortish semantics, data.py:71-112) to minimize pad
  waste;
- bs==1 batches are dropped (BatchNorm constraint, data.py:198).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..training.learner import Batch


@dataclass(frozen=True)
class Bucket:
    max_samples: int   # padded audio samples
    max_tokens: int    # padded label length
    bs: int

    @property
    def key(self):
        return (self.max_samples, self.max_tokens, self.bs)


def buckets_from_histogram(
    xlen_ms,
    ylen,
    sr: int = 16000,
    n_buckets: int = 4,
    frame_budget: int = 72_000,
    bs_max: int = 32,
    data_axis: int = 1,
) -> list[Bucket]:
    """Derive a bucket ladder from a corpus length histogram (the
    turn-key recipe's analog of hand-tuning config buckets; plays the
    role of the reference's DynamicBucketingDL caps, data.py:44-54:
    X_MAX = 8*9000 frames, BS_MAX = 32).

    xlen_ms/ylen: per-utterance audio length (ms) and token count.
    Buckets split at audio-length quantiles; each bucket's y_max is the
    98th percentile of its members' label lengths (+2 for EOS/BOS) and
    its batch size fills `frame_budget` total 10 ms mel frames, capped
    at bs_max, rounded down to a multiple of `data_axis` (mesh-ready).
    """
    xlen_ms = np.asarray(xlen_ms, np.float64)
    ylen = np.asarray(ylen, np.int64)
    qs = np.linspace(0, 1, n_buckets + 1)[1:]
    edges = np.unique(np.quantile(xlen_ms, qs))
    out = []
    lo = -np.inf
    for edge in edges:
        in_b = (xlen_ms > lo) & (xlen_ms <= edge)
        lo = edge
        if not in_b.any():
            continue
        mel_frames = int(np.ceil(edge / 10.0))  # 10 ms hop
        y_max = int(np.quantile(ylen[in_b], 0.98)) + 2
        bs = max(min(frame_budget // max(mel_frames, 1), bs_max), data_axis)
        # never exceed the bucket's population: with drop_last (mesh
        # training) an oversized bs would yield zero batches and the
        # bucket's members would silently never train. A bucket too
        # small to fill one mesh-divisible batch is skipped entirely —
        # pick_bucket then routes its members into the next-larger
        # bucket (only the longest bucket's members are dropped, which
        # matches the limits semantics for over-long utterances).
        bs = (min(bs, int(in_b.sum())) // data_axis) * data_axis
        if bs < 2:  # bs==1 batches are dropped (BatchNorm)
            continue
        samples = mel_frames * int(sr * 0.01)
        out.append(Bucket(samples, y_max, bs))
    return sorted(out, key=lambda b: b.max_samples)


def buckets_from_config(conf: dict) -> list[Bucket]:
    """Config buckets use x_max in *stacked encoder frames* (80 ms each);
    convert to samples: frames * downsample * hop + window slack."""
    sr = conf.get("sr", 16000)
    hop = int(conf.get("hop_length", 0.01) * sr)
    out = []
    for b in conf.get("buckets", []) or []:
        if "max_samples" in b:
            samples = int(b["max_samples"])
        else:
            samples = int(b["x_max"]) * hop  # x_max mel frames
        out.append(Bucket(samples, int(b["y_max"]), int(b["bs"])))
    if not out:
        out = [Bucket(int(conf.get("almaxs", 6.0) * sr), conf.get("y_max", 60) + 2,
                      conf.get("bs", 8))]
    return sorted(out, key=lambda b: b.max_samples)


def pick_bucket(buckets: list[Bucket], n_samples: int, n_tokens: int):
    for b in buckets:
        if n_samples <= b.max_samples and n_tokens <= b.max_tokens:
            return b
    return None  # too long — dropped (limits should prevent this)


class BucketBatcher:
    """Groups pipeline items into fixed-shape Batches.

    Items are dicts with `audio` [S] float32 and `ids` list[int].
    """

    def __init__(
        self,
        buckets: list[Bucket],
        *,
        shuffle: bool = True,
        seed: int = 42,
        window: int = 1024,
        drop_last: bool = False,
        transfer_dtype: str = "float32",
    ):
        self.buckets = buckets
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.window = window
        self.drop_last = drop_last
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(f"transfer_dtype must be float32|int16, "
                             f"got {transfer_dtype!r}")
        self.transfer_dtype = transfer_dtype

    def _emit(self, bucket: Bucket, items: list[dict]) -> Batch:
        n = len(items)
        int16 = self.transfer_dtype == "int16"
        audio = np.zeros((n, bucket.max_samples),
                         np.int16 if int16 else np.float32)
        audio_len = np.zeros(n, np.int32)
        labels = np.zeros((n, bucket.max_tokens), np.int32)
        label_len = np.zeros(n, np.int32)
        for i, it in enumerate(items):
            a = np.asarray(it["audio"], np.float32)[: bucket.max_samples]
            if int16:
                # exact inverse of the device decode (x * 1/32768):
                # int16-sourced audio round-trips bit-for-bit, so the
                # half-width upload is lossless for 16-bit capture
                a = np.clip(np.round(a * 32768.0), -32768, 32767)
            audio[i, : len(a)] = a
            audio_len[i] = len(a)
            ids = list(it["ids"])[: bucket.max_tokens]
            labels[i, : len(ids)] = ids
            label_len[i] = len(ids)
        return Batch(audio, audio_len, labels, label_len)

    def batches(self, items: Iterator[dict]) -> Iterator[Batch]:
        pending: dict = {b.key: [] for b in self.buckets}
        window: list[dict] = []

        def flush_window():
            w = window.copy()
            window.clear()
            if self.shuffle:
                self.rng.shuffle(w)
            w.sort(key=lambda it: len(it["audio"]))
            for it in w:
                b = pick_bucket(self.buckets, len(it["audio"]), len(it["ids"]))
                if b is None:
                    continue
                pending[b.key].append(it)
                if len(pending[b.key]) == b.bs:
                    yield self._emit(b, pending[b.key])
                    pending[b.key] = []

        for it in items:
            window.append(it)
            if len(window) >= self.window:
                yield from flush_window()
        yield from flush_window()
        if not self.drop_last:
            for b in self.buckets:
                rest = pending[b.key]
                # ragged leftovers are emitted in power-of-two sub-batches:
                # an arbitrary remainder size would be a NEW compiled
                # program shape every epoch (the remainder varies with
                # shuffling/augmentation), silently costing a full
                # train-step recompile per epoch — the exact dynamic-shape
                # poison this batcher exists to prevent. Power-of-two
                # chunks bound the shape set to log2(bs) per bucket.
                # bs==1 leftovers are dropped (BatchNorm needs n>1,
                # reference data.py:198).
                while len(rest) > 1:
                    k = 1 << (len(rest).bit_length() - 1)  # largest 2^m <= n
                    yield self._emit(b, rest[:k])
                    rest = rest[k:]


class ASRDataset:
    """Builder + pipeline + batcher = iterable of Batches (the
    ASRDatabunch equivalent, data.py:470).

    The host pipeline (file I/O, resampling, augs) runs in a thread pool
    (the reference's DataLoader `num_workers`; threads suffice here
    because audio decode/resample are GIL-releasing ctypes calls into
    the native library), with a bounded prefetch window.
    """

    def __init__(self, builder, pipeline, batcher, num_workers: int = 0,
                 prefetch: int = 64):
        self.builder = builder
        self.pipeline = pipeline
        self.batcher = batcher
        self.num_workers = num_workers
        self.prefetch = prefetch

    def _items(self):
        if self.num_workers <= 1:
            for i in range(len(self.builder)):
                item = self.pipeline(self.builder.get(i))
                if item.get("bad"):
                    continue
                yield item
            return
        import concurrent.futures as cf
        from collections import deque

        with cf.ThreadPoolExecutor(self.num_workers) as ex:
            pending: deque = deque()
            idx = 0
            n = len(self.builder)
            while idx < n or pending:
                while idx < n and len(pending) < self.prefetch:
                    pending.append(
                        ex.submit(self.pipeline, self.builder.get(idx))
                    )
                    idx += 1
                item = pending.popleft().result()
                if not item.get("bad"):
                    yield item

    def __iter__(self) -> Iterator[Batch]:
        return self.batcher.batches(self._items())

    @classmethod
    def from_config(cls, conf: dict, lang, mode: str = "train"):
        if (conf.get("synth_tone") or {}).get("enabled"):
            # streamed synthetic corpus (data/synth.py): generated on
            # the fly, no disk tree — same iterable contract
            from .synth import ToneStreamDataset

            return ToneStreamDataset.from_config(conf, lang, mode)
        from .builder import ASRDatasetBuilder
        from .transforms import Pipeline, parse_stages

        builder = ASRDatasetBuilder.from_config(conf, mode)
        tf = conf.get("transforms", {}) or {}
        stages = parse_stages(tf.get("x", []), conf, lang) + parse_stages(
            tf.get("y", []), conf, lang
        )
        pipeline = Pipeline(stages, training=mode == "train")
        batcher = BucketBatcher(
            buckets_from_config(conf),
            shuffle=conf.get("shuffle", True) and mode == "train",
            seed=conf.get("seed", 42),
            drop_last=conf.get("drop_last", False),
            # int16 host->device transfer by default (the serving
            # engine's codec, applied to training): the frontend decodes
            # on device, halving the per-step upload — the wall-clock
            # bottleneck on a tunneled chip (docs/performance.md)
            transfer_dtype=conf.get("transfer_dtype", "int16"),
        )
        return cls(
            builder, pipeline, batcher,
            num_workers=conf.get("num_workers", 0),
        )
