"""Dataset builder: per-corpus CSVs -> one filtered dataframe.

Mirrors the reference's ASRDatabunchBuilder (libreasr/lib/builder.py):
- reads `asr-dataset-{train,valid,test}.csv` per selected dataset with
  columns file,xstart,xlen,label,ylen,sr,bad (create-asr-dataset.py:128)
- applies audio-length / label-length / word-count limits
  (builder.py:93-112)
- percentage subsampling + shuffling
- dumps labels / trains the BPE tokenizer on demand (builder.py:153-191)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd

CSV_COLUMNS = ["file", "xstart", "xlen", "label", "ylen", "sr", "bad"]


def resolve_audio_paths(df: pd.DataFrame, root: str, absolute: bool = False):
    """Resolve the CSV `file` column against the dataset dir `root`.

    Relative paths are joined unless they already resolve — the
    create_dataset CLI writes root-prefixed relative paths when invoked
    with a relative root, and joining those again would double the
    prefix. `absolute=True` additionally pins every path with abspath
    (the 960 recipe merges per-split CSVs into one out dir, where
    relative paths must not survive)."""

    def _resolve(p):
        p = str(p)
        if not (os.path.isabs(p) or os.path.exists(p)):
            p = os.path.join(root, p)
        return os.path.abspath(p) if absolute else p

    df["file"] = df["file"].map(_resolve)
    return df


@dataclass
class ASRDatasetBuilder:
    df: pd.DataFrame
    mode: str = "train"
    config: dict = field(default_factory=dict)

    @classmethod
    def from_config(cls, conf: dict, mode: str = "train") -> "ASRDatasetBuilder":
        frames = []
        for name in conf.get("datasets", []) or []:
            path = conf["dataset_paths"][name]
            csv = os.path.join(path, f"asr-dataset-{mode}.csv")
            if not os.path.exists(csv):
                csv = os.path.join(path, "asr-dataset.csv")
            df = pd.read_csv(csv)

            frames.append(resolve_audio_paths(df, path))
        if not frames:
            df = pd.DataFrame(columns=CSV_COLUMNS)
        else:
            df = pd.concat(frames, ignore_index=True)
        b = cls(df=df, mode=mode, config=conf)
        if conf.get("apply_limits", True):
            b.apply_limits()
        b.subsample(conf.get("pcent", {}).get(mode, 1.0))
        if (conf.get("shuffle_builder", {}) or {}).get(mode, True):
            b.shuffle(conf.get("seed", 42))
        return b

    def apply_limits(self):
        """Audio len [almins, almaxs] s, label len [y_min, y_max] chars,
        word count <= y_max_words (builder.py:93-112)."""
        c = self.config
        df = self.df
        if "bad" in df.columns:
            df = df[df["bad"] != True]  # noqa: E712
        almins = c.get("almins", 0.5) * 1000.0
        almaxs = c.get("almaxs", 6.0) * 1000.0
        df = df[(df["xlen"] >= almins) & (df["xlen"] <= almaxs)]
        df = df[
            (df["ylen"] >= c.get("y_min", 1)) & (df["ylen"] <= c.get("y_max", 60))
        ]
        max_words = c.get("y_max_words", 100)
        df = df[df["label"].astype(str).str.split().str.len() <= max_words]
        self.df = df.reset_index(drop=True)
        return self

    def subsample(self, pcent: float):
        if pcent < 1.0:
            n = max(int(len(self.df) * pcent), 1)
            self.df = self.df.iloc[:n].reset_index(drop=True)
        return self

    def shuffle(self, seed: int = 42):
        self.df = self.df.sample(frac=1.0, random_state=seed).reset_index(
            drop=True
        )
        return self

    def __len__(self) -> int:
        return len(self.df)

    def get(self, idx: int) -> dict:
        return self.df.iloc[idx].to_dict()

    def dump_labels(self, path: str):
        """Write all labels (one per line) for tokenizer training
        (builder.py:153-160)."""
        with open(path, "w") as f:
            for label in self.df["label"].astype(str):
                f.write(label.lower().strip() + "\n")
        return path

    def train_tokenizer(self, model_file: str, vocab_sz: int = 2048):
        """Dump labels and train the BPE model (builder.py:162-191)."""
        from .bpe import train_bpe

        tmp = model_file + ".labels.txt"
        self.dump_labels(tmp)
        os.makedirs(os.path.dirname(model_file) or ".", exist_ok=True)
        train_bpe(tmp, model_file, vocab_sz)
        os.remove(tmp)
        return model_file

    def stats(self) -> dict:
        """Summary stats (the builder.print/plot inspection equivalent,
        builder.py:145-212)."""
        if len(self.df) == 0:
            return {"utts": 0}
        return {
            "utts": len(self.df),
            "hours": float(self.df["xlen"].sum()) / 3.6e6,
            "xlen_ms_mean": float(self.df["xlen"].mean()),
            "ylen_mean": float(self.df["ylen"].mean()),
        }
