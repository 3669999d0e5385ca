"""Test client (reference api-client.py): loads the demo fixture, calls
both RPCs against a live server.

Usage: python -m libreasr_tpu.serving.client [--port 50051]
"""

from __future__ import annotations

import argparse

import numpy as np

from . import proto

DEMO = "/root/reference/demo/3729-6852-0035.flac"
CHUNK_S = 0.08  # 80 ms wire chunks (api-client.py:14)


def grab_audio(path: str = DEMO, sr: int = 16000):
    from ..data.audio import read_audio, resample

    pcm, file_sr = read_audio(path)
    pcm = pcm[0]
    if file_sr != sr:
        pcm = resample(pcm, file_sr, sr)
    return pcm.astype(np.float32), sr


def grab_audio_stream(path: str = DEMO, sr: int = 16000, n_pad: int = 2):
    """80 ms chunks with zero-padded lead-in/out (api-client.py:32-48)."""
    pcm, sr = grab_audio(path, sr)
    chunk = int(CHUNK_S * sr)
    zeros = np.zeros(chunk, np.float32)
    for _ in range(n_pad):
        yield proto.Audio(data=zeros.tobytes(), sr=sr)
    for i in range(0, len(pcm), chunk):
        buf = pcm[i : i + chunk]
        if len(buf) < chunk:
            buf = np.pad(buf, (0, chunk - len(buf)))
        yield proto.Audio(data=buf.tobytes(), sr=sr)
    for _ in range(n_pad):
        yield proto.Audio(data=zeros.tobytes(), sr=sr)


def test_asr(host: str = "localhost", port: int = 50051, path: str = DEMO):
    import grpc

    channel = grpc.insecure_channel(f"{host}:{port}")
    unary = channel.unary_unary(
        proto.METHOD_TRANSCRIBE,
        request_serializer=proto.Audio.SerializeToString,
        response_deserializer=proto.Transcript.FromString,
    )
    stream = channel.stream_stream(
        proto.METHOD_TRANSCRIBE_STREAM,
        request_serializer=proto.Audio.SerializeToString,
        response_deserializer=proto.Transcript.FromString,
    )

    pcm, sr = grab_audio(path)
    print("Transcribe...")
    out = unary(proto.Audio(data=pcm.tobytes(), sr=sr))
    print("  ->", repr(out.data))

    print("TranscribeStream...")
    pieces = [t.data for t in stream(grab_audio_stream(path))]
    print("  ->", repr("".join(pieces)))
    channel.close()
    return out.data, "".join(pieces)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="localhost")
    p.add_argument("--port", type=int, default=50051)
    p.add_argument("--path", default=DEMO)
    a = p.parse_args(argv)
    test_asr(a.host, a.port, a.path)


if __name__ == "__main__":
    main()
