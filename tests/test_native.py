"""Native component tests: FLAC decode (MD5 self-check against
STREAMINFO), WAV round-trip, resampler, edit distance, BPE train/encode/
decode round-trips (C++ and Python fallback parity)."""

import os
import struct
import wave

import numpy as np
import pytest

from libreasr_tpu.data.audio import (
    edit_distance, read_audio, resample, verify_flac_md5,
)
from libreasr_tpu.data.bpe import BPELanguage, _PyBPE, train_bpe
from libreasr_tpu.native import audio_lib, bpe_lib

DEMO = "/root/reference/demo/3729-6852-0035.flac"


def test_native_libs_build():
    assert audio_lib() is not None
    assert bpe_lib() is not None


def test_flac_decode_md5():
    """The decoder's output must hash to the STREAMINFO MD5 — bit-exact
    decode of the reference's golden fixture (api-client.py:13)."""
    assert os.path.exists(DEMO)
    assert verify_flac_md5(DEMO)
    pcm, sr = read_audio(DEMO)
    assert sr == 16000
    assert pcm.shape[0] == 1
    assert 20.0 < pcm.shape[1] / sr < 21.0
    assert np.abs(pcm).max() <= 1.0


def test_wav_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.wav")
    pcm = (rng.standard_normal(8000) * 0.2).clip(-1, 1).astype(np.float32)
    ints = (pcm * 32767).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(ints.tobytes())
    out, sr = read_audio(path)
    assert sr == 16000
    np.testing.assert_allclose(out[0], ints / 32768.0, atol=1e-4)


def test_resample_preserves_tone():
    t = np.arange(48000) / 48000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, 48000, 16000)
    assert abs(len(y) - 16000) <= 2
    # dominant frequency via FFT
    spec = np.abs(np.fft.rfft(y[200:-200]))
    freq = np.fft.rfftfreq(len(y[200:-200]), 1 / 16000)[spec.argmax()]
    assert abs(freq - 440) < 5
    # amplitude roughly preserved
    assert 0.9 < np.abs(y[200:-200]).max() < 1.1


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([1, 2, 3], [1, 3]) == 1
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0


@pytest.fixture(scope="module")
def bpe_model(tmp_path_factory):
    corpus = tmp_path_factory.mktemp("bpe") / "corpus.txt"
    lines = [
        "the quick brown fox jumps over the lazy dog",
        "the dog barks at the quick fox",
        "a lazy brown dog sleeps all day",
        "quick quick quick the the the",
    ] * 50
    corpus.write_text("\n".join(lines))
    model = str(tmp_path_factory.mktemp("bpe") / "model.labpe")
    train_bpe(str(corpus), model, vocab_size=80)
    return model


def test_bpe_roundtrip(bpe_model):
    lang = BPELanguage(bpe_model)
    assert len(lang) <= 80
    ids = lang.numericalize("the quick brown fox")
    assert len(ids) > 1
    assert ids[-1] == lang.eos  # terminal appended by default
    assert all(i >= 4 for i in ids[:-1])  # no specials/unk for in-vocab text
    assert lang.denumericalize(ids) == "the quick brown fox"


def test_bpe_blank_ignored(bpe_model):
    lang = BPELanguage(bpe_model)
    ids = lang.numericalize("lazy dog")
    assert lang.denumericalize([0] + ids + [0, 0]) == "lazy dog"


def test_bpe_python_fallback_parity(bpe_model):
    """The pure-Python encoder must agree with the C++ one."""
    lang = BPELanguage(bpe_model)
    py = _PyBPE(bpe_model)
    for text in ["the quick brown fox", "lazy dog day", "barks at the dog"]:
        assert lang.numericalize(text, append_eos=False) == py.encode(text)
        assert lang.denumericalize(py.encode(text)) == py.decode(py.encode(text))


def test_bpe_merges_frequent_words(bpe_model):
    lang = BPELanguage(bpe_model)
    # "the" is the most frequent word: must encode to a single token
    assert len(lang.numericalize("the", append_eos=False)) == 1


def test_bpe_dropout(bpe_model):
    """BPE-dropout yields a longer (finer) segmentation that decodes to
    the same text (yttm dropout_prob parity)."""
    lang = BPELanguage(bpe_model)
    text = "the quick brown fox"
    plain = lang.numericalize(text, append_eos=False)
    dropped = lang.numericalize(text, dropout=0.9, seed=7, append_eos=False)
    assert len(dropped) >= len(plain)
    assert lang.denumericalize(dropped) == text
    # deterministic under a fixed seed
    assert dropped == lang.numericalize(text, dropout=0.9, seed=7, append_eos=False)


def test_mp3_decode_vs_wav_twin(tmp_path):
    """mp3 decode (host codec via the native facade) must match the wav
    twin of the same signal within lossy-codec tolerance (VERDICT r2 #2:
    three of five corpus formats are mp3 — CommonVoice, Tatoeba, YT)."""
    from libreasr_tpu.data.audio import have_mp3, write_mp3

    if not have_mp3():
        pytest.skip("host has no libmpg123/libmp3lame")
    sr = 16000
    t = np.arange(sr * 2) / sr
    # band-limited multi-tone (mp3 kills content near Nyquist)
    ref = (
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t)
    ).astype(np.float32)
    wav_path = str(tmp_path / "twin.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((ref * 32767).astype(np.int16).tobytes())
    mp3_path = str(tmp_path / "twin.mp3")
    write_mp3(mp3_path, ref, sr, kbps=64)

    wav_pcm, wav_sr = read_audio(wav_path)
    mp3_pcm, mp3_sr = read_audio(mp3_path)
    assert mp3_sr == wav_sr == sr
    # align: mp3 adds a fixed encoder+decoder delay
    d, r = mp3_pcm[0], wav_pcm[0]
    delay = int(np.argmax(np.correlate(d[:4000], r[:2000])))
    seg_d, seg_r = d[delay : delay + 8000], r[:8000]
    rmse = float(np.sqrt(np.mean((seg_d - seg_r) ** 2)))
    assert rmse < 0.05, rmse
    # energy match too (no silent decode)
    assert abs(float(np.std(seg_d)) - float(np.std(seg_r))) < 0.05


def test_ogg_decode_vs_wav_twin(tmp_path):
    """ogg decode (host vorbis via the native facade) vs the wav twin —
    same contract as the mp3 test; vorbis has no codec delay so the
    decode is sample-aligned."""
    from libreasr_tpu.data.audio import have_ogg, write_ogg

    if not have_ogg():
        pytest.skip("host has no libvorbis")
    sr = 16000
    t = np.arange(sr * 2) / sr
    ref = (
        0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1330 * t)
    ).astype(np.float32)
    ogg_path = str(tmp_path / "twin.ogg")
    write_ogg(ogg_path, ref, sr)
    pcm, got_sr = read_audio(ogg_path)
    assert got_sr == sr and pcm.shape[0] == 1
    assert abs(pcm.shape[1] - len(ref)) <= 1024
    m = min(pcm.shape[1], len(ref))
    rmse = float(np.sqrt(np.mean((pcm[0][:m] - ref[:m]) ** 2)))
    assert rmse < 0.02, rmse


def test_oga_extension_routes_to_ogg_decoder(tmp_path):
    """CommonVoice ships `.oga` files; the facade must route them to the
    Vorbis decoder exactly like `.ogg` (create_dataset AUDIO_EXTS)."""
    from libreasr_tpu.data.audio import have_ogg, write_ogg

    if not have_ogg():
        pytest.skip("host has no libvorbis")
    sr = 16000
    ref = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.float32
    )
    ogg = str(tmp_path / "clip.ogg")
    write_ogg(ogg, ref, sr)
    oga = str(tmp_path / "clip.oga")
    os.rename(ogg, oga)
    pcm, got_sr = read_audio(oga)
    assert got_sr == sr and pcm.shape[0] == 1 and pcm.shape[1] > sr // 2


@pytest.mark.parametrize("ext", [".mp3", ".ogg"])
def test_garbage_compressed_file_raises(tmp_path, ext):
    """Corrupt/garbage compressed input must raise AudioReadError — not
    crash the process or silently return empty PCM (create_dataset marks
    such rows bad via the exception path)."""
    from libreasr_tpu.data.audio import AudioReadError, have_mp3, have_ogg

    if ext == ".mp3" and not have_mp3():
        pytest.skip("host has no libmpg123")
    if ext == ".ogg" and not have_ogg():
        pytest.skip("host has no libvorbis")
    p = str(tmp_path / f"garbage{ext}")
    with open(p, "wb") as f:
        f.write(b"\x00\x01garbage-not-audio" * 64)
    with pytest.raises(AudioReadError):
        read_audio(p)


def test_truncated_ogg_raises_or_decodes_prefix(tmp_path):
    """An ogg cut mid-stream must either raise cleanly or yield a PCM
    prefix — never crash, never return data past the truncation point."""
    from libreasr_tpu.data.audio import AudioReadError, have_ogg, write_ogg

    if not have_ogg():
        pytest.skip("host has no libvorbis")
    sr = 16000
    ref = (0.3 * np.sin(2 * np.pi * 440 * np.arange(2 * sr) / sr)).astype(
        np.float32
    )
    p = str(tmp_path / "whole.ogg")
    write_ogg(p, ref, sr)
    raw = open(p, "rb").read()
    cut = str(tmp_path / "cut.ogg")
    with open(cut, "wb") as f:
        f.write(raw[: len(raw) // 2])
    try:
        pcm, got_sr = read_audio(cut)
    except AudioReadError:
        return  # clean refusal is acceptable
    assert got_sr == sr
    assert pcm.shape[1] <= len(ref)


def test_chained_ogg_same_format_decodes_whole(tmp_path):
    """Concatenating two complete ogg files yields a CHAINED bitstream
    (multiple logical streams — icecast dumps, `cat`-ed files). When the
    links share channels/rate the decoder must decode across the link
    boundary instead of stopping at the first stream's EOF."""
    from libreasr_tpu.data.audio import have_ogg, write_ogg

    if not have_ogg():
        pytest.skip("host has no libvorbis")
    sr = 16000
    a = (0.3 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    b = (0.3 * np.sin(2 * np.pi * 880 * np.arange(sr) / sr)).astype(np.float32)
    pa, pb = str(tmp_path / "a.ogg"), str(tmp_path / "b.ogg")
    write_ogg(pa, a, sr)
    write_ogg(pb, b, sr)
    chained = str(tmp_path / "chained.ogg")
    with open(chained, "wb") as f:
        f.write(open(pa, "rb").read() + open(pb, "rb").read())
    pcm, got_sr = read_audio(chained)
    assert got_sr == sr
    # both links decoded (encoder block padding gives ±1024 per link)
    assert abs(pcm.shape[1] - 2 * sr) <= 2048


def test_chained_ogg_rate_change_refused(tmp_path):
    """A chained ogg whose second link changes the sample rate must be
    refused (AudioReadError, native rc -26) — silently keeping the first
    link's rate would mislabel the PCM, and a channel change would read
    out of bounds while deinterleaving."""
    from libreasr_tpu.data.audio import AudioReadError, have_ogg, write_ogg

    if not have_ogg():
        pytest.skip("host has no libvorbis")
    a = (0.3 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)).astype(
        np.float32
    )
    b = (0.3 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(
        np.float32
    )
    pa, pb = str(tmp_path / "a.ogg"), str(tmp_path / "b.ogg")
    write_ogg(pa, a, 16000)
    write_ogg(pb, b, 8000)
    chained = str(tmp_path / "chained.ogg")
    with open(chained, "wb") as f:
        f.write(open(pa, "rb").read() + open(pb, "rb").read())
    with pytest.raises(AudioReadError):
        read_audio(chained)


def test_unwritable_encode_path_fails_cleanly(tmp_path):
    """Encoding to an unwritable path must raise AudioReadError (batch
    converts over read-only trees hit this per file) and leak nothing —
    repeated failures must not accumulate codec state."""
    from libreasr_tpu.data.audio import (
        AudioReadError, have_mp3, have_ogg, write_mp3, write_ogg,
    )

    pcm = np.zeros(1600, np.float32)
    bad = str(tmp_path / "no-such-dir" / "out")
    wrote_any = False
    if have_mp3():
        wrote_any = True
        for _ in range(3):
            with pytest.raises(AudioReadError):
                write_mp3(bad + ".mp3", pcm, 16000)
    if have_ogg():
        wrote_any = True
        for _ in range(3):
            with pytest.raises(AudioReadError):
                write_ogg(bad + ".ogg", pcm, 16000)
    if not wrote_any:
        pytest.skip("host has no mp3/ogg encoders")


def test_unsupported_extension_raises(tmp_path):
    from libreasr_tpu.data.audio import AudioReadError

    p = str(tmp_path / "x.m4a")
    open(p, "wb").write(b"\x00" * 64)
    with pytest.raises(AudioReadError):
        read_audio(p)
