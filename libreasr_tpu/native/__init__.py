"""ctypes bindings for the native C++ runtime components.

The .so files are built on demand with `make` (g++ is in the image;
pybind11 is not, hence the plain C ABI). Each binding has a pure-Python
fallback where feasible so the framework degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(__file__)
_BUILD = os.path.join(_DIR, "build")
_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL | None] = {}


def _load(name: str) -> ctypes.CDLL | None:
    """Load lib<name>.so, building via make on first miss."""
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        path = os.path.join(_BUILD, f"lib{name}.so")
        # always run make: a no-op when the .so is fresh (ms), a rebuild
        # when the C++ source changed — a stale binary silently missing
        # newer symbols is worse than the stat calls. The _LOCK above
        # serializes threads; the flock serializes PROCESSES (parallel
        # tests / dataloader processes), since make writes the .so
        # non-atomically and a concurrent dlopen would see a torn ELF.
        try:
            os.makedirs(_BUILD, exist_ok=True)
            import fcntl

            with open(os.path.join(_BUILD, f".lib{name}.lock"), "w") as lf:
                fcntl.flock(lf, fcntl.LOCK_EX)
                try:
                    subprocess.run(
                        ["make", "-C", _DIR, f"build/lib{name}.so"],
                        check=True,
                        capture_output=True,
                    )
                finally:
                    fcntl.flock(lf, fcntl.LOCK_UN)
        except Exception:
            if not os.path.exists(path):
                _LIBS[name] = None
                return None
        try:
            _LIBS[name] = ctypes.CDLL(path)
        except OSError:
            _LIBS[name] = None
        return _LIBS[name]


def audio_lib() -> ctypes.CDLL | None:
    lib = _load("la_audio")
    if lib is not None and not getattr(lib, "_la_configured", False):
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        fpp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        lib.la_read_wav.argtypes = [
            ctypes.c_char_p, fpp, i64p, i32p, i32p,
        ]
        lib.la_read_flac.argtypes = [
            ctypes.c_char_p, fpp, i64p, i32p, i32p, ctypes.c_char_p,
        ]
        lib.la_read_mp3.argtypes = [
            ctypes.c_char_p, fpp, i64p, i32p, i32p,
        ]
        lib.la_write_mp3.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.la_read_ogg.argtypes = [
            ctypes.c_char_p, fpp, i64p, i32p, i32p,
        ]
        lib.la_write_ogg.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
        ]
        lib.la_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, fpp, i64p,
        ]
        lib.la_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.la_edit_distance.argtypes = [
            i32p, ctypes.c_int64, i32p, ctypes.c_int64,
        ]
        lib.la_edit_distance.restype = ctypes.c_int64
        lib.la_have_mp3.argtypes = []
        lib.la_have_mp3.restype = ctypes.c_int32
        lib.la_have_ogg.argtypes = []
        lib.la_have_ogg.restype = ctypes.c_int32
        lib._la_configured = True
    return lib


def bpe_lib() -> ctypes.CDLL | None:
    return _load("la_bpe")
