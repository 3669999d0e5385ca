"""Audio I/O facade: C++ fast path with Python fallbacks.

Replaces the reference's torchaudio/libsox dependency
(transforms.py:68,100,143). `read_audio` decodes WAV/FLAC via the native
library; `resample` is the Kaiser windowed-sinc polyphase resampler.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import wave as wave_mod

import numpy as np

from ..native import audio_lib


class AudioReadError(RuntimeError):
    pass


def _from_native(lib, fn, path: str, want_md5: bool = False):
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    args = [path.encode(), ctypes.byref(out), ctypes.byref(n),
            ctypes.byref(sr), ctypes.byref(ch)]
    md5 = None
    if want_md5:
        md5 = ctypes.create_string_buffer(16)
        args.append(md5)
    rc = fn(*args)
    if rc != 0:
        raise AudioReadError(f"native decode failed rc={rc}: {path}")
    total = n.value * ch.value
    data = np.ctypeslib.as_array(out, shape=(total,)).copy()
    lib.la_free(out)
    pcm = data.reshape(n.value, ch.value).T  # [C, T]
    return pcm, sr.value, (md5.raw if md5 else None)


def read_wav_py(path: str):
    """Pure-Python WAV fallback (stdlib wave, PCM16 only)."""
    with wave_mod.open(path, "rb") as w:
        ch = w.getnchannels()
        sr = w.getframerate()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw != 2:
        raise AudioReadError(f"unsupported wav sample width {sw}")
    data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    return data.reshape(-1, ch).T, sr


def read_audio(path: str, return_md5: bool = False):
    """-> (pcm [C, T] float32, sr). FLAC or WAV by extension."""
    ext = os.path.splitext(path)[1].lower()
    lib = audio_lib()
    if ext == ".flac":
        if lib is None:
            raise AudioReadError("native audio lib unavailable for FLAC")
        lib.la_read_flac.restype = ctypes.c_int32
        pcm, sr, md5 = _from_native(lib, lib.la_read_flac, path, want_md5=True)
        if return_md5:
            return pcm, sr, md5
        return pcm, sr
    if ext == ".wav":
        if lib is not None:
            pcm, sr, _ = _from_native(lib, lib.la_read_wav, path)
            return (pcm, sr, None) if return_md5 else (pcm, sr)
        pcm, sr = read_wav_py(path)
        return (pcm, sr, None) if return_md5 else (pcm, sr)
    if ext in (".mp3", ".ogg", ".oga"):
        # decoded by the HOST codec libraries (libmpg123 / libvorbisfile)
        # behind the native lib — the same architecture as the
        # reference's torchaudio -> libsox -> system codec path
        # (transforms.py:68)
        if lib is None:
            raise AudioReadError(f"native audio lib unavailable for {ext}")
        fn = lib.la_read_mp3 if ext == ".mp3" else lib.la_read_ogg
        pcm, sr, _ = _from_native(lib, fn, path)
        return (pcm, sr, None) if return_md5 else (pcm, sr)
    raise AudioReadError(f"unsupported audio format: {path}")


def write_mp3(path: str, pcm: np.ndarray, sr: int, kbps: int = 64) -> None:
    """Encode mono float32 pcm to mp3 via the host's libmp3lame (used
    by convert roundtrips and fixture synthesis in tests)."""
    lib = audio_lib()
    if lib is None:
        raise AudioReadError("native audio lib unavailable")
    row = np.ascontiguousarray(np.asarray(pcm, np.float32).reshape(-1))
    rc = lib.la_write_mp3(
        path.encode(), row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(row), int(sr), int(kbps),
    )
    if rc != 0:
        raise AudioReadError(f"mp3 encode failed rc={rc} (host lame missing?)")


def write_ogg(path: str, pcm: np.ndarray, sr: int, quality: float = 0.4) -> None:
    """Encode mono float32 pcm to Ogg/Vorbis via the host's libvorbis."""
    lib = audio_lib()
    if lib is None:
        raise AudioReadError("native audio lib unavailable")
    row = np.ascontiguousarray(np.asarray(pcm, np.float32).reshape(-1))
    rc = lib.la_write_ogg(
        path.encode(), row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(row), int(sr), ctypes.c_float(quality),
    )
    if rc != 0:
        raise AudioReadError(f"ogg encode failed rc={rc} (host libvorbis missing?)")


def have_ogg() -> bool:
    """True when the host vorbis libraries back BOTH the ogg decode and
    encode paths. The encoder matters because every caller of this gate
    (tests, fixture synthesis) writes its own ogg first — a host with
    vorbisfile but no libvorbisenc must skip, not fail mid-test.
    Delegates to the native la_have_ogg probe, which exercises the same
    dlopen loaders the decode/encode paths use (single source of
    truth)."""
    lib = audio_lib()
    return lib is not None and bool(lib.la_have_ogg())


def have_mp3() -> bool:
    """True when the host codec libraries back BOTH mp3 decode
    (libmpg123) and encode (libmp3lame) — see have_ogg on why the
    encoder is part of the gate and where the truth lives."""
    lib = audio_lib()
    return lib is not None and bool(lib.la_have_mp3())


def verify_flac_md5(path: str) -> bool:
    """Check the decoded PCM against the STREAMINFO MD5 (the FLAC
    format's own integrity hash) — our decoder's self-test."""
    pcm, sr, md5 = read_audio(path, return_md5=True)
    ints = np.clip(np.round(pcm.T.reshape(-1) * 32768.0), -32768, 32767)
    h = hashlib.md5(ints.astype("<i2").tobytes()).digest()
    return h == md5


def resample(pcm: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """[T] or [C, T] float32 -> resampled. C++ polyphase sinc kernel."""
    if sr_in == sr_out:
        return pcm
    lib = audio_lib()
    single = pcm.ndim == 1
    x = pcm[None] if single else pcm
    outs = []
    for c in range(x.shape[0]):
        row = np.ascontiguousarray(x[c], np.float32)
        if lib is not None:
            out = ctypes.POINTER(ctypes.c_float)()
            n_out = ctypes.c_int64()
            rc = lib.la_resample(
                row.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(row), sr_in, sr_out, ctypes.byref(out), ctypes.byref(n_out),
            )
            if rc != 0:
                raise AudioReadError(f"resample failed rc={rc}")
            y = np.ctypeslib.as_array(out, shape=(n_out.value,)).copy()
            lib.la_free(out)
        else:  # scipy fallback
            from scipy.signal import resample_poly
            from math import gcd

            g = gcd(sr_in, sr_out)
            y = resample_poly(row, sr_out // g, sr_in // g).astype(np.float32)
        outs.append(y)
    y = np.stack(outs)
    return y[0] if single else y


def edit_distance(a, b) -> int:
    """Levenshtein distance between two token/char sequences (reference
    uses the editdistance C++ ext, metrics.py:6)."""
    lib = audio_lib()
    aa = np.asarray([ord(c) if isinstance(c, str) else int(c) for c in a], np.int32)
    bb = np.asarray([ord(c) if isinstance(c, str) else int(c) for c in b], np.int32)
    if lib is not None:
        return int(
            lib.la_edit_distance(
                aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
                bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb),
            )
        )
    # numpy DP fallback
    prev = np.arange(len(bb) + 1)
    for i in range(1, len(aa) + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        for j in range(1, len(bb) + 1):
            cur[j] = min(
                prev[j - 1] + (aa[i - 1] != bb[j - 1]), prev[j] + 1, cur[j - 1] + 1
            )
        prev = cur
    return int(prev[-1])
