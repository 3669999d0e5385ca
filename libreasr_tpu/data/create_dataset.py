"""Dataset creation CLI: corpus directory -> asr-dataset.csv.

Equivalent of the reference's create-asr-dataset.py (347 LoC): walks a
corpus, extracts (file, xstart, xlen, label, ylen, sr, bad) rows with
per-format label extractors:
- librispeech: `<id>.trans.txt` next to the flacs (:182-205)
- common-voice: `validated.tsv` (path, sentence columns) (:155-161)
- tatoeba: `<name>.csv` sentence list (:163-172)
- tf-speech: label = parent directory name (:174-180)
- yt: `.vtt` subtitles with span timestamps (:207-302) — parsed with a
  built-in WebVTT reader (the webvtt package isn't in the image)

Usage: python -m libreasr_tpu.data.create_dataset <path> --format librispeech
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import re
import sys

import pandas as pd

from ..utils import sanitize_str
from . import audio as audio_io

AUDIO_EXTS = (".flac", ".wav", ".mp3", ".ogg", ".oga")


def audio_files(path: str):
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.lower().endswith(AUDIO_EXTS):
                yield os.path.join(root, f)


def probe(path: str):
    """-> (duration_ms, sr) or None on failure."""
    try:
        pcm, sr = audio_io.read_audio(path)
        return pcm.shape[-1] / sr * 1000.0, sr
    except Exception:
        return None


# ---- label extractors ------------------------------------------------------


def labels_librispeech(path: str) -> dict[str, str]:
    """Collect `<utt-id> <TRANSCRIPT>` lines from *.trans.txt files."""
    out = {}
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".trans.txt"):
                with open(os.path.join(root, f)) as fh:
                    for line in fh:
                        utt, _, text = line.strip().partition(" ")
                        out[utt] = sanitize_str(text)
    return out


def labels_common_voice(path: str) -> dict[str, str]:
    out = {}
    for tsv in ("validated.tsv", "train.tsv", "dev.tsv", "test.tsv"):
        p = os.path.join(path, tsv)
        if os.path.exists(p):
            df = pd.read_csv(p, sep="\t", usecols=["path", "sentence"])
            for _, row in df.iterrows():
                key = os.path.splitext(os.path.basename(str(row["path"])))[0]
                out[key] = sanitize_str(str(row["sentence"]))
    return out


def labels_tatoeba(path: str) -> dict[str, str]:
    out = {}
    for f in os.listdir(path):
        if f.endswith(".csv"):
            try:
                df = pd.read_csv(os.path.join(path, f), sep="\t", header=None)
                for _, row in df.iterrows():
                    out[str(row[0])] = sanitize_str(str(row.iloc[-1]))
            except Exception:
                continue
    return out


_VTT_TS = re.compile(
    r"(?:(\d+):)?(\d{2}):(\d{2})[.,](\d{3})\s*-->\s*(?:(\d+):)?(\d{2}):(\d{2})[.,](\d{3})"
)


def parse_vtt(path: str):
    """Minimal WebVTT parser -> [(start_ms, end_ms, text)]."""
    cues = []
    with open(path, errors="replace") as f:
        block: list[str] = []
        for raw in list(f) + ["\n"]:
            line = raw.strip()
            if line:
                block.append(line)
                continue
            ts = None
            texts = []
            for b in block:
                m = _VTT_TS.search(b)
                if m:
                    g = m.groups()
                    start = (
                        int(g[0] or 0) * 3600000 + int(g[1]) * 60000
                        + int(g[2]) * 1000 + int(g[3])
                    )
                    end = (
                        int(g[4] or 0) * 3600000 + int(g[5]) * 60000
                        + int(g[6]) * 1000 + int(g[7])
                    )
                    ts = (start, end)
                elif ts is not None:
                    texts.append(re.sub(r"<[^>]+>", "", b))
            if ts and texts:
                cues.append((ts[0], ts[1], sanitize_str(" ".join(texts))))
            block = []
    return cues


# ---- row builders -----------------------------------------------------------


def rows_for_file(path: str, fmt: str, label_map: dict[str, str]):
    info = probe(path)
    if info is None:
        return [dict(file=path, xstart=0, xlen=0, label="", ylen=0, sr=0, bad=True)]
    dur_ms, sr = info
    rows = []
    if fmt == "yt":
        vtt = os.path.splitext(path)[0] + ".vtt"
        if os.path.exists(vtt):
            for start, end, text in parse_vtt(vtt):
                if not text:
                    continue
                rows.append(
                    dict(file=path, xstart=start, xlen=end - start,
                         label=text, ylen=len(text), sr=sr, bad=False)
                )
        return rows
    if fmt == "tf-speech":
        label = sanitize_str(os.path.basename(os.path.dirname(path)))
    else:
        key = os.path.splitext(os.path.basename(path))[0]
        label = label_map.get(key, "")
    bad = not label
    rows.append(
        dict(file=path, xstart=0, xlen=dur_ms, label=label,
             ylen=len(label), sr=sr, bad=bad)
    )
    return rows


LABELERS = {
    "librispeech": labels_librispeech,
    "common-voice": labels_common_voice,
    "tatoeba": labels_tatoeba,
    "tf-speech": lambda path: {},
    "yt": lambda path: {},
}


COLUMNS = ["file", "xstart", "xlen", "label", "ylen", "sr", "bad"]

# process-pool worker state: the label map is built once per worker
# (initializer) instead of pickled with every task
_W: dict = {}


def _pool_init(path: str, fmt: str):
    _W["fmt"] = fmt
    _W["labels"] = LABELERS[fmt](path)


def _pool_rows(file: str):
    return rows_for_file(file, _W["fmt"], _W["labels"])


def _restore_partial(partial: str, files: list[str]) -> tuple[list, int]:
    """Crash-resume (reference create-asr-dataset.py:137-141,331-347):
    read the interrupted run's partial CSV and return (rows, resume_idx)
    — rows for files [0, resume_idx) in order, the rest reprocessed.

    The LAST file's rows are always dropped and reprocessed: a kill can
    truncate the final line mid-write, and multi-row formats (yt) can be
    split across a flush boundary. Everything before it is trusted, so
    the final CSV is byte-identical to an uninterrupted run."""
    try:
        # a kill can tear the final line mid-write; drop anything after
        # the last newline BEFORE parsing, or the malformed tail NaN-
        # fills a column and floats the int dtypes (the restored CSV
        # would no longer be byte-identical to an uninterrupted run)
        import io

        text = open(partial, "r", errors="replace").read()
        text = text[: text.rfind("\n") + 1]
        df = pd.read_csv(io.StringIO(text), on_bad_lines="skip")
    except Exception:
        return [], 0
    if df.empty or list(df.columns) != COLUMNS:
        return [], 0
    done = list(dict.fromkeys(df["file"].astype(str)))  # unique, in order
    order = {f: i for i, f in enumerate(files)}
    # trust only a prefix of the deterministic file order
    prefix = 0
    for f in done:
        if order.get(f) == prefix:
            prefix += 1
        else:
            break
    prefix = max(prefix - 1, 0)  # drop the last (possibly torn) file
    keep = set(files[:prefix])
    rows = df[df["file"].isin(keep)].to_dict("records")
    return rows, prefix


def create_dataset(path: str, fmt: str, workers: int = 4,
                   out: str | None = None, pool: str = "process",
                   flush_every: int = 64):
    """Corpus dir -> asr-dataset.csv with crash-resume: rows append to
    `<out>.partial` every `flush_every` files, an interrupted run
    restores from it (same final bytes), and the finished CSV is an
    atomic rename. Probing is native-code CPU work, so the default pool
    is processes (reference create-asr-dataset.py:304-310); pass
    pool="thread" to stay in-process (tests, tiny corpora)."""
    files = list(audio_files(path))
    out = out or os.path.join(path, "asr-dataset.csv")
    partial = out + ".partial"

    rows: list = []
    start = 0
    if os.path.exists(partial):
        rows, start = _restore_partial(partial, files)
        if start:
            print(f"resuming: {start}/{len(files)} files restored "
                  f"from {partial}")

    header_needed = True
    if rows:
        pd.DataFrame(rows, columns=COLUMNS).to_csv(partial, index=False)
        header_needed = False
    elif os.path.exists(partial):
        os.remove(partial)  # nothing trustworthy in it

    todo = files[start:]
    buf: list = []

    def flush():
        nonlocal header_needed
        if not buf:
            return
        pd.DataFrame(buf, columns=COLUMNS).to_csv(
            partial, index=False, mode="a", header=header_needed
        )
        header_needed = False
        rows.extend(buf)
        buf.clear()

    if pool == "process" and todo:
        # spawn, not fork: the caller may hold a live JAX/XLA runtime
        # whose threads make fork() unsafe. Workers import the package
        # fresh (a one-time ~1s each) and build the label map once via
        # the initializer instead of pickling it per task.
        import multiprocessing as mp

        ex = cf.ProcessPoolExecutor(
            workers, mp_context=mp.get_context("spawn"),
            initializer=_pool_init, initargs=(path, fmt),
        )
        mapped = ex.map(_pool_rows, todo, chunksize=16)
    elif todo:
        label_map = LABELERS[fmt](path)
        ex = cf.ThreadPoolExecutor(workers)
        mapped = ex.map(lambda f: rows_for_file(f, fmt, label_map), todo)
    else:
        ex, mapped = None, []
    try:
        done_files = 0
        for rs in mapped:  # ex.map preserves submission order
            buf.extend(rs)
            done_files += 1
            if done_files % flush_every == 0:
                flush()
        flush()
    finally:
        if ex is not None:
            ex.shutdown()

    df = pd.DataFrame(rows, columns=COLUMNS)
    df.to_csv(out, index=False)
    if os.path.exists(partial):
        os.remove(partial)
    print(f"wrote {len(df)} rows ({int(df['bad'].sum())} bad) -> {out}")
    return df


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("--format", required=True, choices=sorted(LABELERS))
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--out")
    p.add_argument("--pool", choices=("process", "thread"),
                   default="process")
    a = p.parse_args(argv)
    create_dataset(a.path, a.format, a.workers, a.out, pool=a.pool)


if __name__ == "__main__":
    main(sys.argv[1:])
