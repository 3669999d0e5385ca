"""Quality metrics: CER / WER (reference metrics.py:9,30).

cer: char-level Levenshtein over space-stripped strings, normalized by
target length. wer: word-level Levenshtein normalized by target word
count (the reference delegates to jiwer; same definition).
Distances run through the native C++ kernel (data/audio.py binding).
"""

from __future__ import annotations

from ..data.audio import edit_distance


def cer(pred: str, target: str) -> float:
    """Character error rate; spaces stripped (metrics.py:9-27)."""
    p = pred.replace(" ", "")
    t = target.replace(" ", "")
    if len(t) == 0:
        return 0.0 if len(p) == 0 else 1.0
    return edit_distance(list(p), list(t)) / len(t)


def wer(pred: str, target: str) -> float:
    """Word error rate (metrics.py:30-48)."""
    p = pred.split()
    t = target.split()
    if len(t) == 0:
        return 0.0 if len(p) == 0 else 1.0
    vocab = {w: i for i, w in enumerate(set(p) | set(t))}
    return edit_distance([vocab[w] for w in p], [vocab[w] for w in t]) / len(t)
