"""Batched transducer decoding as on-device scans.

The reference decodes one utterance at a time in a Python loop over
frames with a nested while over emitted tokens (models.py:369-455); that
host loop is the reason it cannot batch streams. Here the whole decode is
one jitted `lax.scan` over time with a fixed `max_iters` inner loop and
per-stream active masks, so N streams decode in lockstep on one chip and
state never leaves the device.

LM shallow fusion follows the reference's LMFuser (lm.py:43-79):
standardize both distributions, pin blank to -10, fused = α·lm + θ·joint,
re-argmax — applied only when the raw joint argmax was non-blank.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

MIN_VAL = -10.0  # blank mask value (reference lm.py:15)


def _standardize(x, eps=1e-6):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    sd = jnp.std(x, axis=-1, keepdims=True)
    return (x - mu) / (sd + eps)


class DecodeState(NamedTuple):
    pred_state: Any       # predictor RNN carry
    h_pred: jax.Array     # [N, H] current predictor output
    last_token: jax.Array  # [N] int32
    y_buf: jax.Array      # [N, max_tokens]
    y_len: jax.Array      # [N]
    lm_state: Any         # LM carry (or None-like placeholder)
    lm_logits: jax.Array  # [N, V] standardized LM log-probs
    lm_primed: jax.Array  # [N] bool — has the LM seen a token yet
    sum_iters: jax.Array  # [N] alignment bookkeeping
    ones: jax.Array       # [N]


@dataclass(frozen=True)
class DecoderFns:
    """Model endpoints bound to parameters (built in api.py / engine)."""

    predict_step: Callable  # (y [N,1], state) -> (h [N,1,H], state)
    joint_step: Callable    # (h_pred [N,H], h_enc [N,H]) -> logits [N,V]
    lm_step: Callable | None = None  # (y [N,1], state) -> (logp [N,V], state)
    lm_init_state: Callable | None = None  # (n) -> state


def init_decode_state(
    fns: DecoderFns,
    n: int,
    vocab_sz: int,
    *,
    bos: int = 2,
    max_tokens: int = 256,
) -> DecodeState:
    """BOS-prime the predictor (reference models.py:396-398)."""
    bos_tok = jnp.full((n, 1), bos, jnp.int32)
    h, pred_state = fns.predict_step(bos_tok, None)
    if fns.lm_step is not None:
        lm_state = fns.lm_init_state(n)
    else:
        lm_state = ()
    return DecodeState(
        pred_state=pred_state,
        h_pred=h[:, 0, :],
        last_token=jnp.full((n,), bos, jnp.int32),
        y_buf=jnp.zeros((n, max_tokens), jnp.int32),
        y_len=jnp.zeros((n,), jnp.int32),
        lm_state=lm_state,
        lm_logits=jnp.zeros((n, vocab_sz)),
        lm_primed=jnp.zeros((n,), bool),
        sum_iters=jnp.zeros((n,), jnp.int32),
        ones=jnp.zeros((n,), jnp.int32),
    )


def _masked_tree_update(mask, new, old):
    """Per-stream select over a state pytree; mask [N]."""
    def sel(a, b):
        m = mask.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(m, a, b)
    return jax.tree_util.tree_map(sel, new, old)


def decode_frame(
    fns: DecoderFns,
    state: DecodeState,
    h_enc: jax.Array,
    frame_valid: jax.Array,
    *,
    blank: int = 0,
    max_iters: int = 3,
    fusion_alpha: float = 0.1,
    fusion_theta: float = 1.0,
) -> DecodeState:
    """Decode one encoder frame for all N streams (inner while of
    models.py:405-443, mask-based)."""
    n = h_enc.shape[0]

    def body(carry):
        st, active, i = carry
        logits = fns.joint_step(st.h_pred, h_enc)
        logp = jax.nn.log_softmax(logits, axis=-1)
        pred = jnp.argmax(logp, axis=-1).astype(jnp.int32)
        emit = active & (pred != blank)

        if fns.lm_step is not None:
            # fuse only streams that would emit and have LM context
            joint_std = _standardize(logp).at[:, blank].set(MIN_VAL)
            fused = fusion_alpha * st.lm_logits + fusion_theta * joint_std
            fused_pred = jnp.argmax(fused, axis=-1).astype(jnp.int32)
            pred = jnp.where(emit & st.lm_primed, fused_pred, pred)
            emit = active & (pred != blank)

        # append token where emitting
        can_store = st.y_len < st.y_buf.shape[1]
        store = emit & can_store
        y_buf = st.y_buf.at[jnp.arange(n), st.y_len].set(
            jnp.where(store, pred, st.y_buf[jnp.arange(n), st.y_len])
        )
        y_len = st.y_len + store.astype(jnp.int32)

        # advance predictor for emitting streams (batched step + select)
        tok = jnp.where(emit, pred, st.last_token)[:, None]
        h_new, pred_state_new = fns.predict_step(tok, st.pred_state)
        h_pred = jnp.where(emit[:, None], h_new[:, 0, :], st.h_pred)
        pred_state = _masked_tree_update(emit, pred_state_new, st.pred_state)

        if fns.lm_step is not None:
            lm_logp, lm_state_new = fns.lm_step(tok, st.lm_state)
            lm_logits_new = _standardize(lm_logp[:, -1, :]).at[:, blank].set(
                MIN_VAL
            )
            lm_logits = jnp.where(emit[:, None], lm_logits_new, st.lm_logits)
            lm_state = _masked_tree_update(emit, lm_state_new, st.lm_state)
            lm_primed = st.lm_primed | emit
        else:
            lm_logits, lm_state, lm_primed = st.lm_logits, st.lm_state, st.lm_primed

        st = st._replace(
            pred_state=pred_state,
            h_pred=h_pred,
            last_token=jnp.where(emit, pred, st.last_token),
            y_buf=y_buf,
            y_len=y_len,
            lm_state=lm_state,
            lm_logits=lm_logits,
            lm_primed=lm_primed,
            sum_iters=st.sum_iters + active.astype(jnp.int32),
        )
        return st, emit, i + 1  # next iteration only for streams that emitted

    def cond(carry):
        _, active, i = carry
        # early exit once every stream produced blank — saves the
        # predictor/joint rounds on mostly-blank frames (the common case
        # in streaming)
        return (i < max_iters) & jnp.any(active)

    st, active, _ = jax.lax.while_loop(cond, body, (state, frame_valid, 0))
    # frames that stopped after exactly 1 iteration (pure blank)
    iters_this_frame = st.sum_iters - state.sum_iters
    ones = state.ones + (iters_this_frame == 1).astype(jnp.int32)
    return st._replace(ones=ones)


def greedy_decode(
    fns: DecoderFns,
    enc_out: jax.Array,
    enc_lengths: jax.Array,
    *,
    vocab_sz: int,
    blank: int = 0,
    bos: int = 2,
    max_iters: int = 3,
    max_tokens: int = 256,
    fusion_alpha: float = 0.1,
    state: DecodeState | None = None,
):
    """Batched greedy transducer decode.

    enc_out: [N, T, H]; enc_lengths: [N].
    Returns (tokens [N, max_tokens], lengths [N], metrics dict, state).
    Passing `state` continues a previous decode (streaming).
    """
    n, t, _ = enc_out.shape
    if state is None:
        state = init_decode_state(
            fns, n, vocab_sz, bos=bos, max_tokens=max_tokens
        )

    def step(st, inp):
        h_enc, t_idx = inp
        valid = t_idx < enc_lengths
        st = decode_frame(
            fns, st, h_enc, valid,
            blank=blank, max_iters=max_iters,
            fusion_alpha=fusion_alpha,
        )
        return st, ()

    xs = (jnp.moveaxis(enc_out, 1, 0), jnp.arange(t))
    state, _ = jax.lax.scan(step, state, xs)
    # alignment_score (reference models.py:446-453)
    s = state.sum_iters.astype(jnp.float32)
    metrics = {"alignment_score": (s - state.ones) / (s + 1e-4)}
    return state.y_buf, state.y_len, metrics, state
