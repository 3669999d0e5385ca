"""BPE tokenizer binding (C++ fast path, pure-Python fallback).

Replaces youtokentome (reference language.py:9,121; builder trains the
tokenizer at builder.py:162-191). Same id contract: 0=<PAD>(blank),
1=<UNK>, 2=<BOS>, 3=<EOS>. Model format is LABPE1 (see native/bpe.cpp).
"""

from __future__ import annotations

import ctypes
import os
from collections import Counter

from ..native import bpe_lib

META = "▁"
SPECIALS = ["<PAD>", "<UNK>", "<BOS>", "<EOS>"]


def _configure(lib):
    if getattr(lib, "_bpe_configured", False):
        return lib
    lib.bpe_train.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
    lib.bpe_load.argtypes = [ctypes.c_char_p]
    lib.bpe_load.restype = ctypes.c_void_p
    lib.bpe_free_model.argtypes = [ctypes.c_void_p]
    lib.bpe_vocab_size.argtypes = [ctypes.c_void_p]
    lib.bpe_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.bpe_encode_dropout.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_double, ctypes.c_uint,
    ]
    lib.bpe_decode.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.bpe_id_to_token.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib._bpe_configured = True
    return lib


def train_bpe(corpus_path: str, model_path: str, vocab_size: int = 2048):
    """Train a BPE model on a text corpus (one utterance per line)."""
    lib = bpe_lib()
    if lib is not None:
        _configure(lib)
        rc = lib.bpe_train(corpus_path.encode(), model_path.encode(), vocab_size)
        if rc != 0:
            raise RuntimeError(f"bpe_train failed rc={rc}")
        return
    _train_bpe_py(corpus_path, model_path, vocab_size)


def _train_bpe_py(corpus_path: str, model_path: str, vocab_size: int):
    """Pure-Python trainer producing the same LABPE1 format."""
    wfreq: Counter = Counter()
    with open(corpus_path) as f:
        for line in f:
            wfreq.update(line.lower().split())
    words = []
    alphabet: dict[str, int] = {}

    def sym(s):
        if s not in alphabet:
            alphabet[s] = len(alphabet)
        return s

    for w, c in wfreq.items():
        chars = [META + w[0]] + list(w[1:])
        for ch in chars:
            sym(ch)
        words.append((chars, c))
    merges = []
    target = vocab_size - 4 - len(alphabet)
    for _ in range(max(target, 0)):
        pairs: Counter = Counter()
        for chars, c in words:
            for i in range(len(chars) - 1):
                pairs[(chars[i], chars[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = pairs.most_common(1)[0]
        if cnt < 2:
            break
        merges.append((a, b))
        sym(a + b)
        new_words = []
        for chars, c in words:
            out, i = [], 0
            while i < len(chars):
                if i + 1 < len(chars) and chars[i] == a and chars[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(chars[i])
                    i += 1
            new_words.append((out, c))
        words = new_words
    with open(model_path, "w") as f:
        f.write(f"LABPE1\n{4 + len(alphabet)}\n{len(merges)}\n")
        for s in SPECIALS:
            f.write(s + "\n")
        for s in alphabet:
            f.write(s + "\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


class _PyBPE:
    """Pure-Python LABPE1 encoder/decoder."""

    def __init__(self, model_file: str):
        with open(model_file) as f:
            assert f.readline().strip() == "LABPE1"
            vocab_sz = int(f.readline())
            n_merges = int(f.readline())
            self.vocab = [f.readline().rstrip("\n") for _ in range(vocab_sz)]
            self.t2i = {t: i for i, t in enumerate(self.vocab)}
            self.rank = {}
            for r in range(n_merges):
                self.rank[f.readline().rstrip("\n")] = r
        # yttm-converted models (compat/yttm_import.py) keep the word
        # marker as its own symbol; native LABPE1 fuses it with the
        # first char. Mirror of the detection in native/bpe.cpp.
        self.meta_standalone = META in self.t2i

    def vocab_size(self):
        return len(self.vocab)

    def encode(self, text: str, dropout: float = 0.0, seed: int = 0) -> list[int]:
        import random as _random

        rng = _random.Random(seed or 12345)
        ids = []
        for w in text.lower().split():
            if self.meta_standalone:
                syms = [META] + list(w)
            else:
                syms = [META + w[0]] + list(w[1:])
            while len(syms) > 1:
                best, bi = None, -1
                for i in range(len(syms) - 1):
                    r = self.rank.get(syms[i] + " " + syms[i + 1])
                    if r is not None and (best is None or r < best):
                        if dropout > 0 and rng.random() < dropout:
                            continue  # BPE-dropout: skip this merge
                        best, bi = r, i
                if bi < 0:
                    break
                syms[bi : bi + 2] = [syms[bi] + syms[bi + 1]]
            ids.extend(self.t2i.get(s, 1) for s in syms)
        return ids

    def decode(self, ids, ignore=(0,)) -> str:
        s = "".join(
            self.vocab[i]
            for i in ids
            if 0 <= i < len(self.vocab)
            and i not in ignore
            and not self.vocab[i].startswith("<")
        )
        return s.replace(META, " ").strip()


class BPELanguage:
    """Language facade over a trained BPE model (reference
    TokenizedLanguage, language.py:115-155)."""

    blank = 0
    sos = 2  # <BOS> doubles as the predictor BOS (models.py:227)
    eos = 3

    def __init__(self, model_file: str):
        if not os.path.exists(model_file):
            raise FileNotFoundError(model_file)
        self.model_file = model_file  # bundles re-export the tokenizer
        self._lib = bpe_lib()
        if self._lib is not None:
            _configure(self._lib)
            self._h = self._lib.bpe_load(model_file.encode())
            if not self._h:
                raise RuntimeError(f"failed to load BPE model {model_file}")
            self._py = None
        else:
            self._h = None
            self._py = _PyBPE(model_file)

    def numericalize(
        self,
        text: str,
        sos: bool = False,
        dropout: float = 0.0,
        seed: int = 0,
        append_eos: bool = True,
    ) -> list[int]:
        """dropout: BPE-dropout probability (yttm dropout_prob,
        reference language.py:121-131) — segmentation noise as a
        training-time regularizer.

        append_eos: terminate with <EOS> (divergence from yttm, which
        has no terminal — training with EOS gives the decoder a learned
        endpoint and stops post-terminal drift; pass False for strict
        reference parity)."""
        text = text.lower().strip()
        if self._py is not None:
            ids = self._py.encode(text, dropout=dropout, seed=seed)
        else:
            buf = (ctypes.c_int32 * (4 * len(text) + 8))()
            n = self._lib.bpe_encode_dropout(
                self._h, text.encode(), buf, len(buf), float(dropout),
                int(seed) & 0xFFFFFFFF,
            )
            ids = list(buf[: min(n, len(buf))])
        if append_eos:
            ids = ids + [self.eos]
        return ([self.sos] if sos else []) + ids

    def denumericalize(self, ids, strip_special: bool = True,
                       stop_at_eos: bool = True) -> str:
        if not isinstance(ids, (list, tuple)):
            ids = [int(ids)]
        ids = [int(i) for i in ids]
        if stop_at_eos and self.eos in ids:
            ids = ids[: ids.index(self.eos)]
        if self._py is not None:
            return self._py.decode(ids, ignore=(0,))
        arr = (ctypes.c_int32 * max(len(ids), 1))(*ids)
        ign = (ctypes.c_int32 * 1)(0)
        out = ctypes.create_string_buffer(8 * len(ids) + 16)
        self._lib.bpe_decode(self._h, arr, len(ids), out, len(out), ign, 1)
        return out.value.decode("utf-8", errors="replace")

    def __len__(self) -> int:
        if self._py is not None:
            return self._py.vocab_size()
        return int(self._lib.bpe_vocab_size(self._h))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.bpe_free_model(self._h)
