"""Golden end-to-end decode: a committed *trained* bundle (overfit on 8
fixed utterances via train.py) must transcribe its training set exactly
— through batch greedy, beam search, AND the streaming engine. This
pins the full inference stack (bundle load -> frontend -> encoder ->
decode -> detokenize) against a known-good model, the role
demo/3729-6852-0035.flac plays for the reference (api-client.py:13)."""

import os

import numpy as np
import pytest

from libreasr_tpu.api import ASRBundle
from libreasr_tpu.data.audio import read_audio

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
TEXTS = [
    "yes", "no", "hello world", "stop now",
    "go left", "turn right", "one two", "three four",
]


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    bundle = ASRBundle.from_bundle(
        os.path.join(FIXTURES, "model.tar.gz"),
        extract_to=str(tmp_path_factory.mktemp("golden")),
    )
    audio = np.zeros((8, 16000), np.float32)
    for i in range(8):
        pcm, sr = read_audio(os.path.join(FIXTURES, f"s-{i:03d}.wav"))
        assert sr == 16000
        audio[i] = pcm[0]
    return bundle, audio


def test_batch_greedy_exact(golden):
    bundle, audio = golden
    texts, metrics = bundle.transcribe_batch(audio, np.full(8, 16000))
    assert texts == TEXTS
    assert (np.asarray(metrics["alignment_score"]) > 0).all()


def test_beam_exact(golden):
    bundle, audio = golden
    texts, scores = bundle.transcribe_beam(
        audio, np.full(8, 16000), beam_width=3
    )
    assert texts == TEXTS
    assert np.isfinite(scores).all()


def test_transcribe_stream_generator(golden):
    """The reference-shaped generator API yields growing transcripts."""
    bundle, audio = golden
    chunks = [audio[2, i : i + 1280] for i in range(0, 16000, 1280)]
    chunks.append(np.zeros(1280, np.float32))  # flush frontend carry
    last = ""
    for y_all, new_text, reset_fn in bundle.transcribe_stream(chunks):
        last = bundle.lang.denumericalize(y_all)
    assert last == "hello world"
    assert callable(reset_fn)


def test_streaming_engine_exact(golden):
    from libreasr_tpu.models.streaming import StreamingEngine

    bundle, audio = golden
    eng = StreamingEngine(bundle, n_streams=8)
    slots = [eng.open_slot() for _ in range(8)]
    chunk = 1280
    for off in range(0, 16000, chunk):
        for i, s in enumerate(slots):
            eng.feed(s, audio[i, off : off + chunk])
    # flush the tail the exact frontend is still carrying (~40 ms)
    for i, s in enumerate(slots):
        eng.feed(s, np.zeros(chunk, np.float32))
    got = [eng.transcript(s) for s in slots]
    assert got == TEXTS


def test_quantized_bundle_roundtrip(golden, tmp_path):
    """quantize() -> save() -> from_bundle() keeps the int8 towers
    (structure + bytes) and the exact transcripts — the reference ships
    its release models quantized the same way (model_utils.py:30-58)."""
    import jax

    from libreasr_tpu.ops.quant import QuantizedTensor

    bundle, audio = golden
    q = ASRBundle.from_bundle(
        os.path.join(FIXTURES, "model.tar.gz"),
        extract_to=str(tmp_path / "src"),
    ).quantize()
    out = str(tmp_path / "quantized.tar.gz")
    q.save(out)

    re = ASRBundle.from_bundle(out, extract_to=str(tmp_path / "re"))
    assert re.conf.get("quantized_cells") is True
    leaves = jax.tree_util.tree_leaves(
        re.variables,
        is_leaf=lambda x: isinstance(x, QuantizedTensor),
    )
    n_q = sum(isinstance(leaf, QuantizedTensor) for leaf in leaves)
    # every RNN layer contributes (kernel, recurrent_kernel)
    assert n_q >= 4
    texts, _ = re.transcribe_batch(audio, np.full(8, 16000))
    assert texts == TEXTS


def test_grpc_wire_exact(golden):
    """Exact transcripts through the real gRPC wire: unary Transcribe
    AND streaming TranscribeStream against the trained golden bundle."""
    import socket

    import grpc

    from libreasr_tpu.models.streaming import StreamingEngine
    from libreasr_tpu.serving import proto
    from libreasr_tpu.serving.server import make_server

    bundle, audio = golden
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    engine = StreamingEngine(bundle, n_streams=2)
    server, _ = make_server(bundle, port, engine=engine)
    server.start()
    try:
        channel = grpc.insecure_channel(f"localhost:{port}")
        unary = channel.unary_unary(
            proto.METHOD_TRANSCRIBE,
            request_serializer=proto.Audio.SerializeToString,
            response_deserializer=proto.Transcript.FromString,
        )
        out = unary(proto.Audio(data=audio[2].tobytes(), sr=16000))
        assert out.data == "hello world"

        stream = channel.stream_stream(
            proto.METHOD_TRANSCRIBE_STREAM,
            request_serializer=proto.Audio.SerializeToString,
            response_deserializer=proto.Transcript.FromString,
        )

        def chunks():
            # NO trailing zero padding: the server's end-of-stream flush
            # must pad the frontend remainder and drain the final tokens
            # (reference drains everything it decodes, api-server.py:115-132)
            for off in range(0, 16000, 1280):
                yield proto.Audio(
                    data=audio[3, off : off + 1280].tobytes(), sr=16000
                )

        pieces = [t.data for t in stream(chunks())]
        assert "".join(pieces) == "stop now"
        channel.close()
    finally:
        server.stop(0)


def test_grpc_wire_beam_flush_exact(golden):
    """Beam-mode streaming over the wire WITHOUT client padding: the
    end-of-stream flush must run the final padded step AND commit the
    beam's uncommitted tail before the RPC closes, so the client receives
    the complete exact transcript."""
    import socket

    import grpc

    from libreasr_tpu.models.streaming import StreamingConfig, StreamingEngine
    from libreasr_tpu.serving import proto
    from libreasr_tpu.serving.server import make_server

    bundle, audio = golden
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    engine = StreamingEngine(
        bundle, n_streams=2,
        scfg=StreamingConfig(sr=16000, beam_width=3),
    )
    server, _ = make_server(bundle, port, engine=engine)
    server.start()
    try:
        channel = grpc.insecure_channel(f"localhost:{port}")
        stream = channel.stream_stream(
            proto.METHOD_TRANSCRIBE_STREAM,
            request_serializer=proto.Audio.SerializeToString,
            response_deserializer=proto.Transcript.FromString,
        )

        def chunks(i):
            for off in range(0, 16000, 1280):
                yield proto.Audio(
                    data=audio[i, off : off + 1280].tobytes(), sr=16000
                )

        assert "".join(t.data for t in stream(chunks(2))) == "hello world"
        # second stream on the same engine (slot reuse after flush)
        assert "".join(t.data for t in stream(chunks(3))) == "stop now"
        channel.close()
    finally:
        server.stop(0)


def test_grpc_wire_concurrent_exact(golden):
    """Two concurrent wire streams each receive their own exact
    transcript — text decoded during a device step driven by the other
    stream's arrivals must still be delivered to its own RPC (the
    round-1 per-feed design dropped it)."""
    import socket
    import threading

    import grpc

    from libreasr_tpu.models.streaming import StreamingEngine
    from libreasr_tpu.serving import proto
    from libreasr_tpu.serving.server import make_server

    bundle, audio = golden
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]
    engine = StreamingEngine(bundle, n_streams=4)
    server, _ = make_server(bundle, port, engine=engine)
    server.start()
    try:
        channel = grpc.insecure_channel(f"localhost:{port}")
        stream = channel.stream_stream(
            proto.METHOD_TRANSCRIBE_STREAM,
            request_serializer=proto.Audio.SerializeToString,
            response_deserializer=proto.Transcript.FromString,
        )

        def chunks(i, delay):
            import time as _t

            for off in range(0, 16000, 1280):
                yield proto.Audio(
                    data=audio[i, off : off + 1280].tobytes(), sr=16000
                )
                _t.sleep(delay)

        results = {}

        def run(name, i, delay):
            results[name] = "".join(t.data for t in stream(chunks(i, delay)))

        threads = [
            threading.Thread(target=run, args=("a", 2, 0.0)),
            threading.Thread(target=run, args=("b", 3, 0.02)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert results == {"a": "hello world", "b": "stop now"}
        channel.close()
    finally:
        server.stop(0)


def test_bpe_bundle_exact(golden, tmp_path):
    """Second golden bundle: trained with a CLI-trained BPE tokenizer
    (train_tokenizer: true) — exercises the BPE path end to end
    (tokenizer in the tar.gz -> BPELanguage -> decode -> detokenize)."""
    from libreasr_tpu.data.bpe import BPELanguage

    _, audio = golden
    bundle = ASRBundle.from_bundle(
        os.path.join(FIXTURES, "model_bpe.tar.gz"), extract_to=str(tmp_path)
    )
    assert isinstance(bundle.lang, BPELanguage)
    texts, _ = bundle.transcribe_batch(audio, np.full(8, 16000))
    assert texts == TEXTS


def test_bpe_bundle_lm_fusion_exact(golden, tmp_path):
    """Beam search WITH trained-LM shallow fusion (alpha + token bonus
    beta) stays exact — validates the whole fusion pipeline (LM in the
    bundle -> per-beam LM state -> log-linear scores)."""
    _, audio = golden
    bundle = ASRBundle.from_bundle(
        os.path.join(FIXTURES, "model_bpe.tar.gz"),
        extract_to=str(tmp_path),
    )
    assert bundle.lm is not None
    texts, _ = bundle.transcribe_beam(
        audio, np.full(8, 16000), beam_width=3,
        use_lm=True, lm_alpha=0.2, lm_beta=0.6,
    )
    assert texts == TEXTS


def test_greedy_lm_fusion_exact(golden, tmp_path):
    """Reference-style greedy LM fusion (standardize + blank pinning +
    alpha-rescore of the argmax, lm.py:43-79) with the trained LM keeps
    the golden set exact."""
    _, audio = golden
    bundle = ASRBundle.from_bundle(
        os.path.join(FIXTURES, "model_bpe.tar.gz"),
        extract_to=str(tmp_path),
    )
    texts, _ = bundle.transcribe_batch(
        audio, np.full(8, 16000), use_lm=True
    )
    assert texts == TEXTS


def test_int8_towers_golden_exact(golden):
    """Weight-only/dynamic int8 RNN towers (ASRBundle.quantize) keep the
    trained golden set exact through batch greedy AND the streaming
    engine, and shrink the parameter bytes."""
    import copy

    from libreasr_tpu.api import ASRBundle
    from libreasr_tpu.models.streaming import StreamingEngine
    from libreasr_tpu.ops.quant import quantized_bytes

    bundle, audio = golden
    qb = ASRBundle(
        bundle.conf, bundle.model, copy.deepcopy(bundle.variables),
        bundle.lang, bundle.lm, bundle.lm_variables,
    ).quantize()
    now, as_f32 = quantized_bytes(qb.variables["params"])
    assert now < 0.65 * as_f32  # cells dominate -> big shrink

    texts, _ = qb.transcribe_batch(audio, np.full(8, 16000))
    assert texts == TEXTS

    eng = StreamingEngine(qb, n_streams=8)
    slots = [eng.open_slot() for _ in range(8)]
    for off in range(0, 16000, 1280):
        for i, s in enumerate(slots):
            eng.feed(s, audio[i, off : off + 1280])
    for i, s in enumerate(slots):
        eng.feed(s, np.zeros(1280, np.float32))
    assert [eng.transcript(s) for s in slots] == TEXTS
