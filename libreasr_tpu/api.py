"""High-level inference API: config -> model bundle -> transcribe.

TPU-native equivalent of the reference's inference bootstrap
(libreasr/lib/inference.py:18-51 + model_utils.py): builds the
Transducer, binds decoder endpoints to parameters, jits the
feature->encode->decode program once, and exposes `transcribe` /
`transcribe_batch`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import parse_and_apply_config
from .data.language import get_language
from .models.decode import DecoderFns, greedy_decode
from .models.lm import LM, LMConfig, init_lm
from .models.transducer import Transducer, TransducerConfig, init_transducer
from .ops.frontend import FrontendConfig, features_batch


class ASRBundle:
    """A loaded model + tokenizer + jitted decode programs."""

    def __init__(
        self,
        conf: dict,
        model: Transducer,
        variables: Any,
        lang,
        lm: LM | None = None,
        lm_variables: Any = None,
    ):
        self.conf = conf
        self.model = model
        self.variables = variables
        self.lang = lang
        self.lm = lm
        self.lm_variables = lm_variables
        self.cfg: TransducerConfig = model.cfg
        self.frontend = FrontendConfig.from_config(conf)
        self._jit_cache: dict = {}

    # ---- construction ----------------------------------------------------

    @classmethod
    def from_config(
        cls, conf: dict | None = None, *, lang_name: str = "", seed: int = 0
    ) -> "ASRBundle":
        conf = conf or parse_and_apply_config(inference=True, lang=lang_name)
        cfg = TransducerConfig.from_config(conf)
        model, variables = init_transducer(cfg, jax.random.PRNGKey(seed))
        lang, vocab_sz = get_language(
            model_file=conf.get("tokenizer", {}).get("model_file")
            if conf.get("tokenizer", {}).get("use_bpe")
            else None
        )
        lm = lm_vars = None
        if conf.get("lm", {}).get("enable") and conf.get("lm", {}).get("path"):
            lm_cfg = LMConfig.from_config(conf)
            lm, lm_vars = init_lm(lm_cfg, jax.random.PRNGKey(seed + 1))
        return cls(conf, model, variables, lang, lm, lm_vars)

    @classmethod
    def from_bundle(
        cls, path: str, *, lang_name: str = "en", extract_to: str = "./tmp"
    ) -> "ASRBundle":
        """Load a release tar.gz bundle (the reference's
        load_asr_model/extract_tars path, model_utils.py:50-95)."""
        import os

        from flax import serialization

        from .training.checkpoint import load_bundle, read_bundle_conf

        # size the model from the bundle's own config before touching
        # the weights
        conf = read_bundle_conf(path, lang_name) or parse_and_apply_config(
            inference=True, lang=lang_name
        )
        cfg = TransducerConfig.from_config(conf)
        model, template = init_transducer(cfg, jax.random.PRNGKey(0))
        if conf.get("quantized_cells"):
            # bundle was exported with int8 towers (ASRBundle.save after
            # quantize()): the template's pytree structure must match the
            # QuantizedTensor leaves before deserialization
            from .ops.quant import quantize_rnn_cells

            template = quantize_rnn_cells(template)
        variables, tok, lm_bytes, _ = load_bundle(
            path, lang_name, template, extract_to=extract_to
        )
        # flax msgpack deserializes to NUMPY leaves; left that way, every
        # jitted call that takes `variables` as an argument re-uploads the
        # whole parameter set host->device (for the 70 M flagship through
        # a remote tunnel: ~10 s PER ENGINE STEP). Commit them to the
        # device once at load.
        variables = jax.device_put(variables)
        lang, _ = get_language(model_file=tok)
        lm = lm_vars = None
        if lm_bytes:
            lm_cfg = LMConfig.from_config(conf)
            lm, lm_template = init_lm(lm_cfg, jax.random.PRNGKey(1))
            lm_vars = jax.device_put(
                serialization.from_bytes(lm_template, lm_bytes)
            )
        return cls(conf, model, variables, lang, lm, lm_vars)

    # ---- decoder endpoint bindings ----------------------------------------

    def quantize(self) -> "ASRBundle":
        """int8-quantize the RNN towers in place (serving memory /
        bandwidth lever — the reference's dynamic int8 LSTM path,
        utils.py:197-210). Every decode/stream program built from this
        bundle afterwards runs the cells as dynamic int8 MXU matmuls;
        combine with decoder_fns(quantized=True) for the int8 joint."""
        from .ops.quant import quantize_rnn_cells

        self.variables = quantize_rnn_cells(self.variables)
        self.conf["quantized_cells"] = True  # save() round-trips this
        self._jit_cache.clear()  # engines/programs must rebind
        return self

    def save(self, path: str, *, lang_name: str = "en",
             tokenizer_file: str | None = None) -> str:
        """Export this bundle as a release tar.gz (the reference ships
        quantized release models the same way, model_utils.py:30-58).
        Quantized towers round-trip: `conf["quantized_cells"]` marks the
        bundle and from_bundle rebuilds the int8 pytree template."""
        from .training.checkpoint import save_bundle

        tok = tokenizer_file
        if tok is None and getattr(self.lang, "model_file", None):
            tok = self.lang.model_file
        save_bundle(
            path, lang_name, self.variables, self.conf,
            tokenizer_file=tok, lm_variables=self.lm_variables,
        )
        return path

    def decoder_fns(
        self,
        use_lm: bool = True,
        variables=None,
        lm_variables=None,
        quantized: bool = False,
    ) -> DecoderFns:
        """Bind decode endpoints to parameters.

        Pass `variables` explicitly inside a jitted program so params are
        traced arguments, not baked-in constants (which bloat the HLO).

        quantized=True runs the joint network with int8 weights and
        dynamic int8 activations on the MXU (the serving-side analog of
        the reference's dynamic int8 quantization, utils.py:197-210);
        requires joint_method='concat'.
        """
        model = self.model
        variables = self.variables if variables is None else variables

        def predict_step(y, state):
            return model.apply(
                variables, y, state=state, method=Transducer.predict
            )

        if quantized:
            from .ops.quant import int8_matmul, quantize

            assert self.cfg.joint_method == "concat"
            jp = variables["params"]["joint"]
            q_pred = quantize(jp["pred_proj"]["kernel"])
            q_enc = quantize(jp["enc_proj"]["kernel"])
            q_out = quantize(jp["out"]["kernel"])
            b_pred = jp["pred_proj"]["bias"]
            b_out = jp["out"]["bias"]

            def joint_step(h_pred, h_enc):
                hidden = jnp.tanh(
                    int8_matmul(h_pred, q_pred)
                    + int8_matmul(h_enc, q_enc)
                    + b_pred
                )
                return int8_matmul(hidden, q_out) + b_out

        else:

            def joint_step(h_pred, h_enc):
                return model.apply(
                    variables, h_pred, h_enc, method=Transducer.joint_step
                )

        lm_step = lm_init_state = None
        if use_lm and self.lm is not None:
            lm = self.lm
            lm_vars = self.lm_variables if lm_variables is None else lm_variables

            def lm_step(y, state):
                return lm.apply(lm_vars, y, state=state)

            def lm_init_state(n):
                c = lm.cfg
                return tuple(
                    (jnp.zeros((n, c.hidden_sz)), jnp.zeros((n, c.hidden_sz)))
                    for _ in range(c.num_layers)
                )

        return DecoderFns(
            predict_step=predict_step,
            joint_step=joint_step,
            lm_step=lm_step,
            lm_init_state=lm_init_state,
        )

    def encode(self, feats, lengths, state=None, variables=None):
        return self.model.apply(
            self.variables if variables is None else variables,
            feats,
            state=state,
            lengths=lengths,
            method=Transducer.encode,
        )

    # ---- end-to-end transcription ------------------------------------------

    def _decode_program(self, use_lm: bool, max_iters: int, max_tokens: int):
        key = ("decode", use_lm, max_iters, max_tokens)
        if key not in self._jit_cache:

            @jax.jit
            def run(variables, lm_variables, audio, sample_lengths):
                fns = self.decoder_fns(
                    use_lm, variables=variables, lm_variables=lm_variables
                )
                feats, flens = features_batch(
                    audio, sample_lengths, self.frontend
                )
                enc_out, _ = self.encode(feats, flens, variables=variables)
                toks, tok_lens, metrics, _ = greedy_decode(
                    fns,
                    enc_out,
                    flens,
                    vocab_sz=self.cfg.vocab_sz,
                    blank=self.cfg.blank,
                    bos=self.cfg.bos,
                    max_iters=max_iters,
                    max_tokens=max_tokens,
                )
                return toks, tok_lens, metrics

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def transcribe_batch(
        self,
        audio: np.ndarray,
        sample_lengths: np.ndarray,
        *,
        use_lm: bool = False,
        max_iters: int = 3,
        max_tokens: int = 256,
    ):
        """audio: [N, S] float32 pcm at cfg sr. Returns (texts, metrics)."""
        run = self._decode_program(use_lm, max_iters, max_tokens)
        toks, tok_lens, metrics = run(
            self.variables,
            self.lm_variables if use_lm else None,
            jnp.asarray(audio),
            jnp.asarray(sample_lengths),
        )
        toks, tok_lens = np.asarray(toks), np.asarray(tok_lens)
        texts = [
            self.lang.denumericalize(list(toks[i, : tok_lens[i]]))
            for i in range(len(toks))
        ]
        return texts, jax.tree_util.tree_map(np.asarray, metrics)

    def transcribe(self, audio: np.ndarray, **kw):
        """Single utterance [S] -> (text, metrics) (reference
        Transducer.transcribe, models.py:365-367)."""
        audio = np.asarray(audio, np.float32).reshape(1, -1)
        texts, metrics = self.transcribe_batch(
            audio, np.array([audio.shape[1]]), **kw
        )
        return texts[0], {k: v[0] for k, v in metrics.items()}

    def transcribe_stream(self, chunks, *, use_lm: bool = False, **scfg_kw):
        """Generator API over a chunk iterable (reference
        Transducer.transcribe_stream, models.py:457-577): yields
        (all_tokens, new_text, reset_fn) per fed chunk. Thin wrapper over
        a single-slot StreamingEngine — cached per (use_lm, config), so
        repeated calls reuse the jitted step instead of recompiling; for
        many concurrent streams use StreamingEngine directly."""
        from .models.streaming import StreamingConfig, StreamingEngine

        key = ("stream_engine", use_lm, tuple(sorted(scfg_kw.items())))
        engine = self._jit_cache.get(key)
        if engine is None:
            scfg = StreamingConfig(sr=self.frontend.sr, **scfg_kw)
            engine = StreamingEngine(
                self, n_streams=1, scfg=scfg, use_lm=use_lm
            )
            self._jit_cache[key] = engine
        slot = engine.open_slot()

        def reset_fn():
            engine._pending_reset_arr[slot] = True
            engine.emitted[slot] = []

        try:
            for chunk in chunks:
                if chunk is None:
                    continue
                new_text = engine.feed(
                    slot, np.asarray(chunk, np.float32).reshape(-1)
                )
                yield list(engine.emitted[slot]), new_text, reset_fn
        finally:
            engine.close_slot(slot)

    # ---- beam search -------------------------------------------------------

    def _beam_program(self, use_lm, beam_width, max_expand, max_tokens,
                      lm_alpha, lm_beta):
        from .models.beam import beam_decode

        key = ("beam", use_lm, beam_width, max_expand, max_tokens,
               lm_alpha, lm_beta)
        if key not in self._jit_cache:

            @jax.jit
            def run(variables, lm_variables, audio, sample_lengths):
                fns = self.decoder_fns(
                    use_lm, variables=variables, lm_variables=lm_variables
                )
                feats, flens = features_batch(audio, sample_lengths, self.frontend)
                enc_out, _ = self.encode(feats, flens, variables=variables)
                return beam_decode(
                    fns, enc_out, flens,
                    vocab_sz=self.cfg.vocab_sz, beam_width=beam_width,
                    blank=self.cfg.blank, bos=self.cfg.bos,
                    max_expand=max_expand, max_tokens=max_tokens,
                    lm_alpha=lm_alpha, lm_beta=lm_beta,
                )

            self._jit_cache[key] = run
        return self._jit_cache[key]

    def transcribe_beam(
        self,
        audio: np.ndarray,
        sample_lengths: np.ndarray | None = None,
        *,
        beam_width: int = 4,
        use_lm: bool = False,
        max_expand: int = 3,
        max_tokens: int = 256,
        lm_alpha: float = 0.1,
        lm_beta: float = 0.0,
    ):
        """Beam-search transcription (with optional LM shallow fusion;
        lm_beta = token insertion bonus offsetting per-emission LM cost).
        audio: [S] or [N, S]. Returns (texts, scores)."""
        audio = np.asarray(audio, np.float32)
        single = audio.ndim == 1
        if single:
            audio = audio[None]
        if sample_lengths is None:
            sample_lengths = np.full(len(audio), audio.shape[1])
        run = self._beam_program(
            use_lm and self.lm is not None, beam_width, max_expand,
            max_tokens, lm_alpha, lm_beta,
        )
        toks, lens, scores = run(
            self.variables,
            self.lm_variables if use_lm else None,
            jnp.asarray(audio), jnp.asarray(sample_lengths),
        )
        toks, lens = np.asarray(toks), np.asarray(lens)
        texts = [
            self.lang.denumericalize(list(toks[i, : lens[i]]))
            for i in range(len(toks))
        ]
        scores = np.asarray(scores)
        if single:
            return texts[0], float(scores[0])
        return texts, scores
