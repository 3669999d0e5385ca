"""gRPC model server (reference api-server.py).

One process per language (ports en:50051 de:50052 fr:50053,
api-server.py:17-21). Same RPCs, same wire format — but where the
reference decodes one utterance per thread in Python loops, every
streaming connection here is a slot in the batched StreamingEngine, so
all live streams share one jitted device program.

Usage: python -m libreasr_tpu.serving.server [--lang en] [--port 50051]
"""

from __future__ import annotations

import argparse
import threading
import time
from collections import defaultdict
from concurrent import futures

from ..utils import tensorize
from . import proto

LANG_PORTS = {"en": 50051, "de": 50052, "fr": 50053}


class StageTimings:
    """Per-stage latency counters served as metrics (the reference only
    had ad-hoc start_perf/stop_perf prints, models.py:278-285)."""

    def __init__(self):
        self._sum = defaultdict(float)
        self._count = defaultdict(int)
        self._lock = threading.Lock()

    def record(self, stage: str, seconds: float):
        with self._lock:
            self._sum[stage] += seconds
            self._count[stage] += 1

    def snapshot(self) -> dict[str, dict]:
        with self._lock:
            return {
                k: {"avg_ms": 1e3 * self._sum[k] / max(self._count[k], 1),
                    "count": self._count[k]}
                for k in self._sum
            }


class ASRServicer:
    """Implements ASR.ASR (reference ASRServicer, api-server.py:53-135)."""

    def __init__(self, bundle, engine=None, max_streams: int = 64,
                 beam_width: int = 0, use_lm: bool = False):
        self.bundle = bundle
        self.beam_width = beam_width
        self.use_lm = use_lm
        if engine is None:
            from ..models.streaming import StreamingConfig, StreamingEngine

            sc = (bundle.conf.get("stream", {}) or {})
            scfg = StreamingConfig(
                sr=bundle.frontend.sr,
                n_buffer=sc.get("n_buffer", 1),
                max_iters=sc.get("max_iters", 10),
                reset_thresh_ms=sc.get("reset_thresh", 4000),
                beam_width=sc.get("beam_width", 0),
                lm_alpha=sc.get("lm_alpha", 0.1),
            )
            engine = StreamingEngine(
                bundle,
                n_streams=sc.get("max_streams", max_streams),
                scfg=scfg,
                use_lm=use_lm and bundle.lm is not None,
            )
        self.engine = engine
        self._lock = threading.Lock()
        self.timings = StageTimings()

    # -- unary -------------------------------------------------------------

    def Transcribe(self, request: proto.Audio, context=None) -> proto.Transcript:
        t0 = time.perf_counter()
        pcm = tensorize(request.data)
        if request.sr and request.sr != self.bundle.frontend.sr:
            from ..data.audio import resample

            pcm = resample(pcm, request.sr, self.bundle.frontend.sr)
        self.timings.record("preprocess", time.perf_counter() - t0)
        t1 = time.perf_counter()
        if self.beam_width > 1:
            text, _ = self.bundle.transcribe_beam(
                pcm, beam_width=self.beam_width, use_lm=self.use_lm
            )
        else:
            text, _ = self.bundle.transcribe(pcm)
        self.timings.record("transcribe", time.perf_counter() - t1)
        return proto.Transcript(data=text)

    # -- streaming -----------------------------------------------------------

    def TranscribeStream(self, request_iterator, context=None):
        """80 ms wire chunks in -> transcript diffs out (api-server.py:82-135).
        Duplicate-diff suppression matches the reference (:122-132)."""
        try:
            with self._lock:
                slot = self.engine.open_slot()
        except RuntimeError:
            if context is not None:
                import grpc

                context.abort(
                    grpc.StatusCode.RESOURCE_EXHAUSTED, "no free stream slots"
                )
            raise
        last = ""
        try:
            for msg in request_iterator:
                pcm = tensorize(msg.data)
                if msg.sr and msg.sr != self.bundle.frontend.sr:
                    from ..data.audio import resample

                    pcm = resample(pcm, msg.sr, self.bundle.frontend.sr)
                t0 = time.perf_counter()
                with self._lock:
                    new_text = self.engine.feed(slot, pcm)
                self.timings.record("stream_chunk", time.perf_counter() - t0)
                if new_text and new_text != last:
                    last = new_text
                    yield proto.Transcript(data=new_text)
        finally:
            with self._lock:
                self.engine.close_slot(slot)


def make_server(bundle, port: int, workers: int = 4, engine=None,
                beam_width: int = 0, use_lm: bool = False):
    """grpc server with hand-rolled method handlers (no generated stubs;
    the image lacks grpc_tools)."""
    import grpc

    servicer = ASRServicer(
        bundle, engine=engine, beam_width=beam_width, use_lm=use_lm
    )
    handlers = {
        "Transcribe": grpc.unary_unary_rpc_method_handler(
            servicer.Transcribe,
            request_deserializer=proto.Audio.FromString,
            response_serializer=proto.Transcript.SerializeToString,
        ),
        "TranscribeStream": grpc.stream_stream_rpc_method_handler(
            servicer.TranscribeStream,
            request_deserializer=proto.Audio.FromString,
            response_serializer=proto.Transcript.SerializeToString,
        ),
    }
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=workers))
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(proto.SERVICE, handlers),)
    )
    server.add_insecure_port(f"[::]:{port}")
    return server, servicer


def serve(lang: str = "en", port: int | None = None, config: str | None = None,
          bundle_path: str | None = None, beam: int = 0, use_lm: bool = False):
    from ..api import ASRBundle
    from ..config import parse_and_apply_config

    if bundle_path:
        bundle = ASRBundle.from_bundle(bundle_path, lang_name=lang)
    else:
        conf = parse_and_apply_config(inference=True, lang=lang, path=config)
        bundle = ASRBundle.from_config(conf, lang_name=lang)
    port = port or LANG_PORTS.get(lang, 50051)
    server, _ = make_server(bundle, port, beam_width=beam, use_lm=use_lm)
    server.start()
    print(f"[api-server] lang={lang} listening on :{port}"
          + (f" (beam={beam})" if beam > 1 else ""))
    server.wait_for_termination()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--lang", default="en")
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--bundle", default=None, help="release tar.gz to serve")
    p.add_argument("--beam", type=int, default=0, help="beam width for unary Transcribe")
    p.add_argument("--use-lm", action="store_true")
    a = p.parse_args(argv)
    serve(a.lang, a.port, a.config, a.bundle, a.beam, a.use_lm)


if __name__ == "__main__":
    main()
