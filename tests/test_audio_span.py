"""Span-based audio reads (yt/vtt rows carry xstart/xlen in ms —
reference OpenAudioSpan, transforms.py:104-119)."""

import wave

import numpy as np

from libreasr_tpu.data.transforms import ChannelCut, OpenAudio


def test_open_audio_span(tmp_path, rng):
    sr = 16000
    pcm = (rng.standard_normal(sr * 2) * 0.3).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "a.wav")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((pcm * 32767).astype(np.int16).tobytes())

    stage = OpenAudio()
    cut = ChannelCut()
    item = cut(stage({"file": path, "xstart": 500, "xlen": 750}))
    assert not item.get("bad")
    assert item["sr"] == sr
    # 750 ms at 16 kHz = 12000 samples starting at sample 8000
    assert len(item["audio"]) == 12000
    want = (pcm[8000:20000] * 32767).astype(np.int16) / 32768.0
    np.testing.assert_allclose(item["audio"], want, atol=1e-4)

    # full read when xlen missing/zero
    item2 = cut(stage({"file": path, "xstart": 0, "xlen": 0}))
    assert len(item2["audio"]) == sr * 2

    # unreadable file -> DUMMY_AUDIO masking (transforms.py:112-119)
    item3 = stage({"file": str(tmp_path / "missing.wav")})
    assert item3["bad"] and item3["audio"].shape == (1, 16000)
