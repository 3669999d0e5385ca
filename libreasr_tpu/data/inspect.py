"""Dataset/pipeline inspection tooling.

Equivalent of the reference's debug surface: `db.statistics` / `db.aug`
pipeline inspection (data.py:368-465) and `builder.print/plot`
(builder.py:145-212) — here as functions returning dicts so they work in
scripts, notebooks and tests alike.
"""

from __future__ import annotations

import numpy as np


def pipeline_statistics(dataset, n_items: int = 32) -> dict:
    """Run n items through the host pipeline and summarize shapes/stats
    (reference db.statistics)."""
    lens, ylens, rms = [], [], []
    bad = 0
    for i, item in enumerate(dataset._items()):
        if i >= n_items:
            break
        a = np.asarray(item["audio"])
        lens.append(len(a))
        ylens.append(len(item.get("ids", [])))
        rms.append(float(np.sqrt((a**2).mean() + 1e-12)))
        if item.get("bad"):
            bad += 1
    if not lens:
        return {"items": 0}
    return {
        "items": len(lens),
        "bad": bad,
        "audio_samples": {
            "min": int(np.min(lens)), "max": int(np.max(lens)),
            "mean": float(np.mean(lens)),
        },
        "label_tokens": {
            "min": int(np.min(ylens)), "max": int(np.max(ylens)),
            "mean": float(np.mean(ylens)),
        },
        "rms": {"mean": float(np.mean(rms)), "max": float(np.max(rms))},
    }


def batch_statistics(dataset, n_batches: int = 8) -> dict:
    """Padding-waste stats per bucket (reference PRINT_BATCH_STATS,
    data.py:64,244-249)."""
    out: dict = {}
    for i, b in enumerate(dataset):
        if i >= n_batches:
            break
        key = tuple(b.audio.shape[1:2]) + tuple(b.labels.shape[1:2])
        audio_fill = float(np.mean(b.audio_len / b.audio.shape[1]))
        label_fill = float(np.mean(b.label_len / b.labels.shape[1]))
        rec = out.setdefault(
            str(key), {"batches": 0, "audio_fill": 0.0, "label_fill": 0.0}
        )
        rec["batches"] += 1
        rec["audio_fill"] += audio_fill
        rec["label_fill"] += label_fill
    for rec in out.values():
        rec["audio_fill"] /= rec["batches"]
        rec["label_fill"] /= rec["batches"]
    return out


def augmentation_preview(dataset, item_idx: int = 0) -> dict:
    """Run the same item with and without augmentation and report the
    difference (reference db.aug)."""
    raw = dataset.builder.get(item_idx)
    aug_item = dataset.pipeline(dict(raw))
    dataset.pipeline.training = False
    try:
        clean_item = dataset.pipeline(dict(raw))
    finally:
        dataset.pipeline.training = True
    a, c = np.asarray(aug_item["audio"]), np.asarray(clean_item["audio"])
    m = min(len(a), len(c))
    return {
        "clean_samples": len(c),
        "aug_samples": len(a),
        "l2_delta": float(np.linalg.norm(a[:m] - c[:m])),
        "changed": bool(len(a) != len(c) or np.abs(a[:m] - c[:m]).max() > 0),
    }
