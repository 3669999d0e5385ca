"""Build an English text corpus from material available offline.

The reference trained its LMs on scraped text corpora (libreasr-lm.ipynb
cell 3 loads a prepared `text.txt`); this environment has no network, so
the closest reproducible stand-in is the natural-language prose embedded
in the installed Python ecosystem: docstrings from large packages
(numpy, jax, torch, transformers, ...) plus the Debian copyright/README
prose under /usr/share/doc. The output is normalized the way ASR LM
corpora are (lowercase, apostrophes kept, everything else mapped to
space) so the ASR tokenizer can consume it directly.

Usage:
  python scripts/make_text_corpus.py --out tmp/lm_corpus.txt [--max-mb 50]
"""

from __future__ import annotations

import argparse
import ast
import gzip
import os
import re
import sys

PACKAGES = [
    "numpy", "jax", "jaxlib", "torch", "transformers", "flax", "optax",
    "scipy", "pandas", "sklearn", "chex", "orbax", "grpc", "yaml",
    "einops", "haiku", "absl", "rich", "requests", "urllib3", "attr",
    "matplotlib", "PIL", "sympy",
]

_DOC_DIRS = ["/usr/share/doc"]

# prose filter: a docstring line counts as prose if it's mostly words
_WORD = re.compile(r"[A-Za-z']+")
_CODEY = re.compile(
    r"(>>>|\.\.\.|`{2,}|[{}\[\]=<>|\\]|::|def |class |import |self\.)"
)
_NORM_DROP = re.compile(r"[^a-z' ]+")


def prose_lines(text: str):
    for raw in text.splitlines():
        line = raw.strip()
        if len(line) < 24 or _CODEY.search(line):
            continue
        words = _WORD.findall(line)
        # mostly alphabetic words, not a parameter table or signature
        if len(words) >= 5 and sum(len(w) for w in words) >= 0.7 * len(
            line.replace(" ", "")
        ):
            yield " ".join(words)


def docstrings_from_file(path: str):
    try:
        with open(path, "r", encoding="utf-8", errors="ignore") as f:
            tree = ast.parse(f.read())
    except (SyntaxError, ValueError, OSError, RecursionError):
        return
    for node in ast.walk(tree):
        if isinstance(
            node, (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            ds = ast.get_docstring(node, clean=True)
            if ds:
                yield from prose_lines(ds)


def package_dirs():
    for name in PACKAGES:
        try:
            mod = __import__(name)
        except Exception:  # noqa: BLE001 - optional corpus source
            continue
        f = getattr(mod, "__file__", None)
        if f:
            yield os.path.dirname(f)


def doc_files():
    for root_dir in _DOC_DIRS:
        for root, _, files in os.walk(root_dir):
            for fn in files:
                if fn.endswith((".html", ".png", ".pdf")):
                    continue
                yield os.path.join(root, fn)


def normalize(line: str) -> str:
    line = _NORM_DROP.sub(" ", line.lower())
    return " ".join(line.split())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tmp/lm_corpus.txt")
    ap.add_argument("--max-mb", type=float, default=50.0)
    ap.add_argument("--valid-out", default="")
    ap.add_argument("--valid-frac", type=float, default=0.02)
    args = ap.parse_args(argv)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    budget = int(args.max_mb * 1e6)
    seen: set[int] = set()
    lines: list[str] = []
    total = 0

    def add(line: str) -> bool:
        nonlocal total
        norm = normalize(line)
        if len(norm) < 24:
            return True
        key = hash(norm)
        if key in seen:
            return True
        seen.add(key)
        lines.append(norm)
        total += len(norm) + 1
        return total < budget

    # 1. package docstrings
    for pkg_dir in package_dirs():
        for root, _, files in os.walk(pkg_dir):
            if "test" in root or "_vendor" in root:
                continue
            for fn in files:
                if not fn.endswith(".py"):
                    continue
                for line in docstrings_from_file(os.path.join(root, fn)):
                    if not add(line):
                        break

    # 2. /usr/share/doc prose
    if total < budget:
        for path in doc_files():
            try:
                opener = gzip.open if path.endswith(".gz") else open
                with opener(path, "rt", encoding="utf-8", errors="ignore") as f:
                    text = f.read(2_000_000)
            except OSError:
                continue
            for line in prose_lines(text):
                if not add(line):
                    break

    # deterministic shuffle so train/valid are same-distribution
    import random

    random.Random(0).shuffle(lines)
    n_valid = int(len(lines) * args.valid_frac) if args.valid_out else 0
    with open(args.out, "w") as f:
        f.write("\n".join(lines[n_valid:]))
    if args.valid_out:
        with open(args.valid_out, "w") as f:
            f.write("\n".join(lines[:n_valid]))
    print(
        f"corpus: {len(lines) - n_valid} train / {n_valid} valid lines, "
        f"{total / 1e6:.1f} MB -> {args.out}"
    )


if __name__ == "__main__":
    sys.exit(main())
