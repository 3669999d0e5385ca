"""Batched frame-synchronous beam search for RNN-T, with LM fusion.

The reference only implements greedy decoding (models.py:369: "better
if distributed along the sequence"; its beam imports PriorityQueue but
never ships one) and fuses the LM by rescoring the greedy argmax
(lm.py:56-79). This is the full thing, TPU-shaped:

- N streams x K beams advance in lockstep; predictor/LM steps run as one
  [N*K] batched call per expansion round;
- per frame, up to `max_expand` expansion rounds: every active beam
  either takes blank (freezes for this frame) or extends with one of the
  top tokens; candidates are ranked over the flattened (beam, token)
  space with `lax.top_k`;
- log-linear LM shallow fusion: non-blank extensions score
  `logp + alpha * lm_logp[token]` (the streaming-fusion formulation of
  arXiv:2104.04487), LM state carried per beam;
- all shapes static; hypothesis buffers are fixed [N, K, max_tokens].

Returns the best beam per stream.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .decode import DecoderFns

NEG = -1e30


class BeamState(NamedTuple):
    pred_state: Any        # pytree with leaves [N*K, ...]
    h_pred: jax.Array      # [N, K, H]
    last_token: jax.Array  # [N, K]
    scores: jax.Array      # [N, K]
    y_buf: jax.Array       # [N, K, max_tokens]
    y_len: jax.Array       # [N, K]
    lm_state: Any
    lm_logp: jax.Array     # [N, K, V] next-token LM log-probs


def _tile_tree(tree, k):
    return jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, k, axis=0), tree
    )


def _gather_beams(tree, idx, n, k):
    """Reorder [N*K, ...] leaves by per-stream beam index [N, K]."""
    def g(x):
        shaped = x.reshape(n, k, *x.shape[1:])
        out = jnp.take_along_axis(
            shaped, idx.reshape(n, k, *([1] * (x.ndim - 1))), axis=1
        )
        return out.reshape(n * k, *x.shape[1:])

    return jax.tree_util.tree_map(g, tree)


def init_beam_state(
    fns: DecoderFns, n: int, k: int, vocab_sz: int, *, bos: int, max_tokens: int
) -> BeamState:
    bos_tok = jnp.full((n * k, 1), bos, jnp.int32)
    h, pred_state = fns.predict_step(bos_tok, None)
    scores = jnp.full((n, k), NEG).at[:, 0].set(0.0)  # only beam 0 live
    if fns.lm_step is not None:
        lm_state = fns.lm_init_state(n * k)
        lm_logp, lm_state = fns.lm_step(bos_tok, lm_state)
        lm_logp = lm_logp[:, -1, :].reshape(n, k, vocab_sz)
    else:
        lm_state = ()
        lm_logp = jnp.zeros((n, k, vocab_sz))
    return BeamState(
        pred_state=pred_state,
        h_pred=h[:, 0, :].reshape(n, k, -1),
        last_token=jnp.full((n, k), bos, jnp.int32),
        scores=scores,
        y_buf=jnp.zeros((n, k, max_tokens), jnp.int32),
        y_len=jnp.zeros((n, k), jnp.int32),
        lm_state=lm_state,
        lm_logp=lm_logp,
    )


def collapse_to_best(beam: BeamState) -> BeamState:
    """Collapse every stream's pool to its best beam: all K slots take the
    best beam's predictor/LM state and history context, hypothesis buffers
    empty, only slot 0 live (the init_beam_state pattern). Used by the
    streaming engine's forced commit when the uncommitted-token buffer
    saturates — diversity rebuilds from the next frame's top-k."""
    n, k, cap = beam.y_buf.shape
    best = jnp.argmax(beam.scores, axis=1)            # [N]
    idx = jnp.broadcast_to(best[:, None], (n, k))

    def take_nk(x):  # [N, K, ...] -> best beam broadcast over K
        return jnp.take_along_axis(
            x, idx.reshape(n, k, *([1] * (x.ndim - 2))), axis=1
        )

    best_score = jnp.take_along_axis(beam.scores, best[:, None], axis=1)
    scores = jnp.full((n, k), NEG).at[:, 0].set(best_score[:, 0])
    return BeamState(
        pred_state=_gather_beams(beam.pred_state, idx, n, k),
        h_pred=take_nk(beam.h_pred),
        last_token=take_nk(beam.last_token[:, :, None])[:, :, 0],
        scores=scores,
        y_buf=jnp.zeros_like(beam.y_buf),
        y_len=jnp.zeros_like(beam.y_len),
        lm_state=_gather_beams(beam.lm_state, idx, n, k),
        lm_logp=take_nk(beam.lm_logp),
    )


def _merge_pools(a: BeamState, b: BeamState, n: int, k: int) -> BeamState:
    """Top-K merge of two K-slot hypothesis pools (full state snapshots)."""
    all_scores = jnp.concatenate([a.scores, b.scores], axis=1)  # [N, 2K]
    top_scores, idx = jax.lax.top_k(all_scores, k)
    from_a = idx < k
    pick_a = jnp.where(from_a, idx, 0)
    pick_b = jnp.where(from_a, 0, idx - k)

    def merge_leaf(x, y):
        if x.ndim >= 2 and x.shape[:2] == (n, k):        # [N, K, ...]
            fa = jnp.take_along_axis(
                x, pick_a.reshape(n, k, *([1] * (x.ndim - 2))), axis=1
            )
            fb = jnp.take_along_axis(
                y, pick_b.reshape(n, k, *([1] * (x.ndim - 2))), axis=1
            )
            sel = from_a.reshape(n, k, *([1] * (x.ndim - 2)))
            return jnp.where(sel, fa, fb)
        # [N*K, ...] leaves (pred/lm state)
        xs = x.reshape(n, k, *x.shape[1:])
        ys = y.reshape(n, k, *y.shape[1:])
        fa = jnp.take_along_axis(
            xs, pick_a.reshape(n, k, *([1] * (x.ndim - 1))), axis=1
        )
        fb = jnp.take_along_axis(
            ys, pick_b.reshape(n, k, *([1] * (x.ndim - 1))), axis=1
        )
        sel = from_a.reshape(n, k, *([1] * (x.ndim - 1)))
        return jnp.where(sel, fa, fb).reshape(n * k, *x.shape[1:])

    merged = jax.tree_util.tree_map(merge_leaf, a, b)
    return merged._replace(scores=top_scores)


def beam_frame(
    fns: DecoderFns,
    st: BeamState,
    h_enc: jax.Array,     # [N, H]
    frame_valid: jax.Array,  # [N] bool
    *,
    blank: int = 0,
    max_expand: int = 3,
    lm_alpha: float = 0.1,
    lm_beta: float = 0.0,
) -> BeamState:
    n, k = st.scores.shape
    vocab = st.lm_logp.shape[-1]

    def expand(carry):
        cur, active, finished, it = carry
        # joint over all beams: [N, K, V]
        logp = jax.nn.log_softmax(
            fns.joint_step(
                cur.h_pred.reshape(n * k, -1),
                jnp.repeat(h_enc, k, axis=0),
            ),
            axis=-1,
        ).reshape(n, k, vocab)

        # blank candidates: full state snapshot, score += logp[blank]
        blank_scores = jnp.where(
            active, cur.scores + logp[:, :, blank], NEG
        )
        finished = _merge_pools(
            finished, cur._replace(scores=blank_scores), n, k
        )

        # non-blank extensions with log-linear LM fusion + token
        # insertion bonus (beta offsets the per-emission LM cost that
        # would otherwise favor the all-blank hypothesis)
        ext = cur.scores[:, :, None] + logp
        if fns.lm_step is not None:
            ext = ext + lm_alpha * cur.lm_logp + lm_beta
        ext = ext.at[:, :, blank].set(NEG)
        ext = jnp.where(active[:, :, None], ext, NEG)
        ext = jnp.where((cur.y_len < cur.y_buf.shape[-1])[:, :, None], ext, NEG)

        top_scores, flat_idx = jax.lax.top_k(ext.reshape(n, k * vocab), k)
        src_beam = flat_idx // vocab          # [N, K]
        token = (flat_idx % vocab).astype(jnp.int32)
        new_active = top_scores > NEG / 2

        # gather state by source beam, append token, advance predictor/LM
        pred_state = _gather_beams(cur.pred_state, src_beam, n, k)
        lm_state = (
            _gather_beams(cur.lm_state, src_beam, n, k)
            if fns.lm_step is not None
            else cur.lm_state
        )
        y_buf = jnp.take_along_axis(cur.y_buf, src_beam[:, :, None], axis=1)
        y_len = jnp.take_along_axis(cur.y_len, src_beam, axis=1)
        y_buf = jnp.where(
            (jnp.arange(y_buf.shape[-1])[None, None, :] == y_len[:, :, None])
            & new_active[:, :, None],
            token[:, :, None],
            y_buf,
        )
        y_len = y_len + new_active.astype(jnp.int32)

        tok = token.reshape(n * k, 1)
        h_new, pred_state_new = fns.predict_step(tok, pred_state)
        h_pred = h_new[:, 0, :].reshape(n, k, -1)
        if fns.lm_step is not None:
            lm_out, lm_state_new = fns.lm_step(tok, lm_state)
            lm_logp = lm_out[:, -1, :].reshape(n, k, vocab)
        else:
            lm_state_new, lm_logp = lm_state, cur.lm_logp

        cur = BeamState(
            pred_state=pred_state_new,
            h_pred=h_pred,
            last_token=token,
            scores=top_scores,
            y_buf=y_buf,
            y_len=y_len,
            lm_state=lm_state_new,
            lm_logp=lm_logp,
        )
        return cur, new_active, finished, it + 1

    def cond(carry):
        _, active, _, it = carry
        return (it < max_expand) & jnp.any(active)

    active0 = jnp.broadcast_to(frame_valid[:, None], (n, k)) & (
        st.scores > NEG / 2
    )
    # dead/invalid slots enter the finished pool with their frozen score
    finished0 = st._replace(scores=jnp.where(active0, NEG, st.scores))
    expanded, still_active, finished, _ = jax.lax.while_loop(
        cond, expand, (st, active0, finished0, 0)
    )

    # beams still active at max_expand enter without a blank transition
    # (forced-exit approximation)
    forced = expanded._replace(
        scores=jnp.where(still_active, expanded.scores, NEG)
    )
    merged = _merge_pools(finished, forced, n, k)

    # invalid frames keep the previous state wholesale
    keep = ~frame_valid

    def keep_old(nv, ov):
        if nv.ndim >= 1 and nv.shape[0] == n:
            m = keep.reshape((n,) + (1,) * (nv.ndim - 1))
        else:
            m = jnp.repeat(keep, k).reshape((n * k,) + (1,) * (nv.ndim - 1))
        return jnp.where(m, ov, nv)

    return jax.tree_util.tree_map(keep_old, merged, st)


def beam_decode(
    fns: DecoderFns,
    enc_out: jax.Array,
    enc_lengths: jax.Array,
    *,
    vocab_sz: int,
    beam_width: int = 4,
    blank: int = 0,
    bos: int = 2,
    max_expand: int = 3,
    max_tokens: int = 256,
    lm_alpha: float = 0.1,
    lm_beta: float = 0.0,
):
    """Batched beam search. enc_out: [N, T, H].

    Returns (tokens [N, max_tokens], lengths [N], scores [N]).
    """
    n, t, _ = enc_out.shape
    st = init_beam_state(
        fns, n, beam_width, vocab_sz, bos=bos, max_tokens=max_tokens
    )

    def step(st, inp):
        h_enc, t_idx = inp
        st = beam_frame(
            fns, st, h_enc, t_idx < enc_lengths,
            blank=blank, max_expand=max_expand,
            lm_alpha=lm_alpha, lm_beta=lm_beta,
        )
        return st, ()

    st, _ = jax.lax.scan(
        step, st, (jnp.moveaxis(enc_out, 1, 0), jnp.arange(t))
    )
    best = jnp.argmax(st.scores, axis=1)
    toks = jnp.take_along_axis(st.y_buf, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(st.y_len, best[:, None], axis=1)[:, 0]
    scores = jnp.take_along_axis(st.scores, best[:, None], axis=1)[:, 0]
    return toks, lens, scores
