"""Batched streaming runtime: N concurrent streams, one jitted step.

The reference serves one utterance per gRPC thread with Python-loop
decoding and object state (api-server.py:82-135, models.py:457-577) — it
cannot batch streams. Here all N active streams advance in lockstep in a
single device program:

  raw 240 ms audio windows [N, W]
    -> log-mel -> middle-third crop (StreamPostprocess) -> stack/downsample
    -> one encoder step (carried state)
    -> greedy decode frames (carried decode state, max_iters=10)
    -> newly emitted tokens per stream

State (encoder carry, predictor carry, LM carry, last token) lives on
device between chunks; per-stream reset (the server's silence THRESH
auto-reset, api-server.py:23-50) is a masked in-program state swap, no
host round-trip.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.frontend import (
    FrontendConfig,
    log_mel_spectrogram,
    stack_downsample,
    stream_postprocess,
)
from .decode import DecodeState, DecoderFns, decode_frame, init_decode_state
from .transducer import learnable_states


@dataclass(frozen=True)
class StreamingConfig:
    sr: int = 16000
    chunk_ms: int = 80           # wire chunk (api-client.py:14)
    buffer_n_frames: int = 3     # sliding window size (api-server.py:26)
    n_buffer: int = 1            # encoder frames per device step
    max_iters: int = 10          # tokens per frame bound (models.py:458)
    reset_thresh_ms: int = 4000  # silence auto-reset (api-server.py:23)
    max_tokens_per_step: int = 32

    @property
    def chunk_samples(self) -> int:
        return self.sr * self.chunk_ms // 1000

    @property
    def window_samples(self) -> int:
        return self.chunk_samples * self.buffer_n_frames


class StreamState(NamedTuple):
    enc_state: Any
    decode: DecodeState
    started: jax.Array  # [N] bool — slot has been (re)initialized


class StreamingEngine:
    """Host wrapper owning the jitted stream step and per-slot buffers."""

    def __init__(
        self,
        bundle,
        n_streams: int = 64,
        scfg: StreamingConfig | None = None,
        use_lm: bool = False,
    ):
        self.bundle = bundle
        self.n = n_streams
        self.scfg = scfg or StreamingConfig(sr=bundle.frontend.sr)
        self.use_lm = use_lm
        self.fns: DecoderFns = bundle.decoder_fns(use_lm)
        self.cfg = bundle.cfg
        self.frontend: FrontendConfig = bundle.frontend
        # variables enter as a jit argument (arg 0), state is donated
        self._step = jax.jit(self._build_step(), donate_argnums=(1,))
        self.state: StreamState | None = None
        # host-side slot bookkeeping
        self.sample_buf = [np.zeros(0, np.float32) for _ in range(self.n)]
        self.emitted = [[] for _ in range(self.n)]
        self.silence_ms = np.zeros(self.n, np.int64)
        self.active = np.zeros(self.n, bool)
        self._pending_reset_arr = np.zeros(self.n, bool)

    # ------------------------------------------------------------------

    def _fresh_state(self) -> StreamState:
        n, cfg = self.n, self.cfg
        dec = init_decode_state(
            self.fns, n, cfg.vocab_sz, bos=cfg.bos,
            max_tokens=self.scfg.max_tokens_per_step,
        )
        enc_state = None  # filled lazily by first encode (learnable h0)
        return dec, enc_state

    def _build_step(self):
        scfg, cfg = self.scfg, self.cfg
        fe = self.frontend
        bundle = self.bundle
        use_lm = self.use_lm

        def step(variables, state: StreamState, windows, valid, reset, fresh_dec):
            """windows: [N, n_buffer, W] raw pcm; valid/reset: [N] bool.
            fresh_dec: BOS-primed DecodeState (computed once on host)."""
            fns = bundle.decoder_fns(use_lm, variables=variables)

            def encode_step(feats, enc_state):
                return bundle.model.apply(
                    variables, feats, state=enc_state,
                    method=type(bundle.model).encode,
                )

            n = windows.shape[0]
            # --- frontend (on device) ---------------------------------
            mel = log_mel_spectrogram(
                windows, sr=fe.sr, n_fft=fe.n_fft,
                win_length=fe.win_length, hop_length=fe.hop_length,
                n_mels=fe.n_mels,
            )                                             # [N, B, Tm, M]
            mid = stream_postprocess(mel, n_stack=fe.n_stack)
            feats = stack_downsample(
                mid, n_stack=fe.n_stack, downsample=fe.downsample
            )                                             # [N, B, 1, F]
            feats = feats.reshape(n, -1, feats.shape[-1])  # [N, B, F]

            # --- per-stream reset (masked state swap) ------------------
            do_reset = reset | ~state.started

            def sel(a, b):
                m = do_reset.reshape((-1,) + (1,) * (a.ndim - 1))
                return jnp.where(m, a, b)

            dec = jax.tree_util.tree_map(sel, fresh_dec, state.decode)
            # reset encoder carry to the learnable h0 (what encode with
            # state=None would use)
            enc_h0 = learnable_states(
                variables["params"], "encoder", n, cfg.enc_num_layers
            )
            enc_state = jax.tree_util.tree_map(sel, enc_h0, state.enc_state)

            # fresh decode buffers each step: emissions are per-chunk
            dec = dec._replace(
                y_buf=jnp.zeros_like(dec.y_buf), y_len=jnp.zeros_like(dec.y_len)
            )

            # --- encoder step ------------------------------------------
            enc_out, enc_state = encode_step(feats, enc_state)

            # --- decode the chunk's frames ------------------------------
            for t in range(feats.shape[1]):
                dec = decode_frame(
                    fns, dec, enc_out[:, t, :], valid,
                    blank=cfg.blank, max_iters=scfg.max_iters,
                )
            new_state = StreamState(
                enc_state=enc_state,
                decode=dec,
                started=jnp.ones((n,), bool),
            )
            return new_state, (dec.y_buf, dec.y_len)

        return step

    # ------------------------------------------------------------------

    def _ensure_state(self):
        if self.state is None:
            dec, _ = self._fresh_state()
            # the engine state is donated each step — the kept fresh
            # template must own distinct buffers
            self._fresh_dec = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), dec
            )
            # build a concrete zero enc state by tracing one encode
            feats0 = jnp.zeros((self.n, 1, self.frontend.feature_sz))
            _, enc_state = self.bundle.encode(feats0, jnp.ones((self.n,), jnp.int32))
            enc_state = jax.tree_util.tree_map(jnp.zeros_like, enc_state)
            self.state = StreamState(
                enc_state=enc_state,
                decode=dec,
                started=jnp.zeros((self.n,), bool),
            )

    def step_batch(self, windows: np.ndarray, valid=None, reset=None):
        """Advance all streams one chunk. windows: [N, n_buffer, W].

        Returns (tokens [N, K], token_lengths [N]) — this chunk's
        emissions per stream.
        """
        self._ensure_state()
        n = self.n
        valid = np.ones(n, bool) if valid is None else valid
        reset = np.zeros(n, bool) if reset is None else reset
        self.state, (toks, lens) = self._step(
            self.bundle.variables,
            self.state,
            jnp.asarray(windows),
            jnp.asarray(valid),
            jnp.asarray(reset),
            self._fresh_dec,
        )
        return np.asarray(toks), np.asarray(lens)

    # ---- serving-facing slot API ---------------------------------------

    def open_slot(self) -> int:
        for i in range(self.n):
            if not self.active[i]:
                self.active[i] = True
                self.sample_buf[i] = np.zeros(0, np.float32)
                self.emitted[i] = []
                self.silence_ms[i] = 0
                self._pending_reset[i] = True
                return i
        raise RuntimeError("no free stream slots")

    def close_slot(self, slot: int):
        self.active[slot] = False

    @property
    def _pending_reset(self):
        return self._pending_reset_arr

    def feed(self, slot: int, pcm: np.ndarray) -> str:
        """Feed pcm into a slot; runs device steps for every complete
        sliding window across all slots; returns newly decoded text for
        this slot."""
        scfg = self.scfg
        self.sample_buf[slot] = np.concatenate([self.sample_buf[slot], pcm])
        new_text = []
        # fire while this slot has a full window; other slots join with
        # whatever they have (valid-masked)
        while len(self.sample_buf[slot]) >= scfg.window_samples:
            windows = np.zeros(
                (self.n, scfg.n_buffer, scfg.window_samples), np.float32
            )
            valid = np.zeros(self.n, bool)
            for i in range(self.n):
                if self.active[i] and len(self.sample_buf[i]) >= scfg.window_samples:
                    windows[i, 0] = self.sample_buf[i][: scfg.window_samples]
                    # slide by one chunk (api-server.py:95-115)
                    self.sample_buf[i] = self.sample_buf[i][scfg.chunk_samples :]
                    valid[i] = True
            reset = self._pending_reset & valid
            toks, lens = self.step_batch(windows, valid, reset)
            self._pending_reset_arr[valid] = False
            for i in np.nonzero(valid)[0]:
                ids = list(toks[i, : lens[i]])
                if ids:
                    self.silence_ms[i] = 0
                    self.emitted[i].extend(ids)
                    if i == slot:
                        new_text.append(self.bundle.lang.denumericalize(ids))
                else:
                    self.silence_ms[i] += scfg.chunk_ms
                    if self.silence_ms[i] >= scfg.reset_thresh_ms:
                        self._pending_reset_arr[i] = True
                        self.silence_ms[i] = 0
        return "".join(new_text)

    def transcript(self, slot: int) -> str:
        return self.bundle.lang.denumericalize(self.emitted[slot])
