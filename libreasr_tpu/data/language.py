"""Tokenization: char-level vocabulary and BPE-backed language.

Mirrors the reference contract (libreasr/lib/language.py):
- id 0 = <BLK> (blank/pad), 1 = <s> (SOS), 2 = </s> (EOS/BOS for the
  predictor, models.py:227), 3 = <UNK>, then punctuation and a-z
  (language.py:158-175)
- `TokenizedLanguage` wraps a trained BPE model with vocab 2048
  (language.py:115-155); here the BPE lives in data/bpe.py with a C++
  fast path (native/bpe.cpp).
"""

from __future__ import annotations

import string

DEFAULT_TOKENS = ["<BLK>", "<s>", "</s>", "<UNK>", " ", ".", "!", "?", ",", "'", "-"]


class CharLanguage:
    """Character-level vocabulary (reference Language, language.py:18-113)."""

    def __init__(self, tokens: dict[str, int]):
        self.t2i = dict(tokens)
        self.i2t = {i: t for t, i in tokens.items()}
        self.token_list = list(tokens.keys())

    @property
    def blank(self) -> int:
        return 0

    @property
    def sos(self) -> int:
        return 1

    @property
    def eos(self) -> int:
        return 2

    def numericalize(self, text: str, sos: bool = False) -> list[int]:
        text = text.lower().strip()
        out = [self.sos] if sos else []
        for c in text:
            idx = self.t2i.get(c)
            if idx is not None:
                out.append(idx)
        return out + [self.eos]

    def denumericalize(self, ids, strip_special: bool = True,
                       stop_at_eos: bool = True) -> str:
        if not isinstance(ids, (list, tuple)):
            ids = [int(ids)]
        chars = []
        for i in ids:
            i = int(i)
            if stop_at_eos and i == self.eos:
                # EOS ends the utterance — tokens a decoder emits past it
                # are post-terminal drift
                break
            if strip_special and i in (self.blank, self.sos, self.eos, 3):
                continue
            tok = self.i2t.get(i)
            if tok is not None and not tok.startswith("<"):
                chars.append(tok)
        return "".join(chars)

    @property
    def replaceable(self) -> list[int]:
        """Ids safe to substitute during label noising — everything after
        the specials/punctuation block (reference language.py:90-93)."""
        return list(self.t2i.values())[11:]

    def randomize(self, ids, p: float, rng=None):
        """Randomly replace tokens with other replaceable ids with prob p
        (reference Language.randomize, language.py:95-101) — label-noise
        regularization."""
        import numpy as np

        rng = rng or np.random.default_rng()
        ids = np.asarray(ids).copy()
        rpl = self.replaceable
        mask = rng.random(ids.shape) < p
        ids[mask] = rng.integers(min(rpl), max(rpl) + 1, mask.sum())
        return ids

    def __len__(self) -> int:
        return len(self.t2i)


def get_language(tokens=None, model_file: str | None = None):
    """Build the language; BPE-backed when model_file is given, else
    char-level (reference get_language, language.py:158-175).
    Returns (lang, vocab_sz)."""
    tokens = tokens or DEFAULT_TOKENS
    vocab = dict(zip(tokens, range(len(tokens))))
    for i, c in enumerate(string.ascii_lowercase):
        vocab[c] = len(tokens) + i
    if model_file:
        from .bpe import BPELanguage

        lang = BPELanguage(model_file)
    else:
        lang = CharLanguage(vocab)
    return lang, len(lang)
