"""Split asr-dataset.csv into train/valid/test (reference split.py:
5% valid, 5% test).

Usage: python -m libreasr_tpu.data.split <dataset-dir> [--valid 0.05] [--test 0.05]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd


def split_dataset(path: str, valid: float = 0.05, test: float = 0.05, seed: int = 42):
    csv = os.path.join(path, "asr-dataset.csv") if os.path.isdir(path) else path
    base = os.path.dirname(csv)
    df = pd.read_csv(csv)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(df))
    n_test = int(len(df) * test)
    n_valid = int(len(df) * valid)
    parts = {
        "test": df.iloc[idx[:n_test]],
        "valid": df.iloc[idx[n_test : n_test + n_valid]],
        "train": df.iloc[idx[n_test + n_valid :]],
    }
    for name, part in parts.items():
        out = os.path.join(base, f"asr-dataset-{name}.csv")
        part.to_csv(out, index=False)
        print(f"{name}: {len(part)} rows -> {out}")
    return parts


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("--valid", type=float, default=0.05)
    p.add_argument("--test", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args(argv)
    split_dataset(a.path, a.valid, a.test, a.seed)


if __name__ == "__main__":
    main()
