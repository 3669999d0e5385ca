"""Host-build verification of the ESP32 firmware's protocol logic.

The firmware (apps/esp32/main/libreasr_client.c) can't be flashed or
IDF-built in this environment, but its protocol behavior is pure C:
apps/esp32/hosttest compiles it against stub IDF headers and asserts
the WS wire framing ([4B lang][4B f32 sr][f32 pcm], reference
apps/esp32/main/libreasr.c framing), the int16 -> float scaling, the
voice-command language switch (reference :105-141), and short-read
handling. This test builds and runs that harness with the host gcc.
"""

import os
import shutil
import subprocess

import pytest

HOSTTEST = os.path.join(
    os.path.dirname(__file__), "..", "apps", "esp32", "hosttest"
)


def test_esp32_firmware_host_harness(tmp_path):
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no host C compiler")
    exe = str(tmp_path / "esp32_host")
    subprocess.run(
        [cc, "-std=c11", "-Wall", "-Wextra", "-Wno-unused-parameter",
         "-Werror", "-I", "shim", "host_harness.c", "-o", exe, "-lm"],
        cwd=HOSTTEST, check=True, capture_output=True, text=True,
    )
    out = subprocess.run(
        [exe], check=True, capture_output=True, text=True
    )
    assert "all assertions passed" in out.stdout
    assert "resampler: dc/passband/stopband/streaming ok" in out.stdout


def test_esp32_16k_variant_compiles():
    """The LIBREASR_CAPTURE_16K build (direct 16 kHz mono capture, no
    resampler pipeline) must stay compilable — it is the MEMS-mic
    variant users flash when their mic clocks at 16 kHz."""
    cc = shutil.which("gcc") or shutil.which("cc")
    if cc is None:
        pytest.skip("no host C compiler")
    subprocess.run(
        [cc, "-std=c11", "-Wall", "-Wextra", "-Wno-unused-parameter",
         "-Wno-unused-function", "-Werror", "-fsyntax-only",
         "-DLIBREASR_CAPTURE_16K", "-I", "shim",
         os.path.join("..", "main", "libreasr_client.c")],
        cwd=HOSTTEST, check=True, capture_output=True, text=True,
    )
