"""Batch audio conversion to 16 kHz mono WAV (reference
scripts/convert.sh, which shells out to ffmpeg).

Decodes WAV/FLAC with the in-repo C++ audio library (mp3/ogg via the
host codec libraries, libmpg123/libvorbisfile, behind the same native facade — the
architecture the reference uses through sox), resamples with the
polyphase sinc kernel, writes PCM16 WAV.

Usage: python scripts/convert.py <dir> [--sr 16000]
"""

from __future__ import annotations

import argparse
import os
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libreasr_tpu.data.audio import read_audio, resample  # noqa: E402


def convert_file(path: str, sr: int):
    pcm, file_sr = read_audio(path)
    mono = pcm[0] if pcm.ndim == 2 else pcm
    if file_sr != sr:
        mono = resample(mono, file_sr, sr)
    out = os.path.splitext(path)[0] + f".{sr // 1000}k.wav"
    ints = np.clip(np.round(mono * 32767), -32768, 32767).astype(np.int16)
    with wave.open(out, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(ints.tobytes())
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path")
    p.add_argument("--sr", type=int, default=16000)
    a = p.parse_args()
    n = 0
    for root, _, files in os.walk(a.path):
        for f in files:
            if f.lower().endswith((".flac", ".wav", ".mp3", ".ogg", ".oga")) and ".16k." not in f:
                out = convert_file(os.path.join(root, f), a.sr)
                n += 1
                if n % 100 == 0:
                    print(f"{n} converted (last: {out})")
    print(f"converted {n} files")


if __name__ == "__main__":
    main()
