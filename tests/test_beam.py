"""Beam search tests: width-1 == greedy, wider beams score >= narrower,
LM fusion wiring, jittability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.models.beam import beam_decode
from libreasr_tpu.models.decode import DecoderFns, greedy_decode
from libreasr_tpu.models.lm import LMConfig, init_lm
from libreasr_tpu.models.transducer import Transducer, TransducerConfig, init_transducer


@pytest.fixture(scope="module")
def setup():
    cfg = TransducerConfig(
        feature_sz=8, embed_sz=6, vocab_sz=12, hidden_sz=8, out_sz=8,
        joint_sz=8, enc_num_layers=1, pred_num_layers=1,
    )
    model, variables = init_transducer(cfg, jax.random.PRNGKey(5))

    def predict_step(y, state):
        return model.apply(variables, y, state=state, method=Transducer.predict)

    def joint_step(h_pred, h_enc):
        return model.apply(variables, h_pred, h_enc, method=Transducer.joint_step)

    fns = DecoderFns(predict_step=predict_step, joint_step=joint_step)
    return cfg, model, variables, fns


def _enc(model, variables, rng, n=2, t=6, f=8):
    x = jnp.asarray(rng.standard_normal((n, t, f)).astype(np.float32))
    out, _ = model.apply(variables, x, method=Transducer.encode)
    return out


def _oracle_best(fns, enc_np, vocab, blank, bos, max_expand):
    """Exhaustive frame-synchronous search: enumerate every per-frame
    emission chain of depth <= max_expand (terminated by blank, or forced
    at max depth) and return (best_score, best_tokens)."""
    import itertools

    t = enc_np.shape[0]
    h0, s0 = fns.predict_step(jnp.full((1, 1), bos, jnp.int32), None)

    best = (-np.inf, [])
    frontier = [(0.0, [], h0, s0)]  # (score, tokens, h_pred, pred_state)
    for ti in range(t):
        h_enc = jnp.asarray(enc_np[ti : ti + 1])
        new_frontier = []
        for score, toks, h_pred, state in frontier:
            # BFS over chains up to max_expand
            stack = [(score, toks, h_pred, state, 0)]
            while stack:
                sc, tk, hp, stt, depth = stack.pop()
                logp = np.asarray(
                    jax.nn.log_softmax(fns.joint_step(hp[:, 0, :], h_enc), -1)
                )[0]
                # blank-terminate this frame
                new_frontier.append((sc + logp[blank], tk, hp, stt))
                if depth == max_expand - 1:
                    # forced exit without blank
                    for v in range(vocab):
                        if v == blank:
                            continue
                        tok = jnp.full((1, 1), v, jnp.int32)
                        h2, s2 = fns.predict_step(tok, stt)
                        new_frontier.append((sc + logp[v], tk + [v], h2, s2))
                    continue
                for v in range(vocab):
                    if v == blank:
                        continue
                    tok = jnp.full((1, 1), v, jnp.int32)
                    h2, s2 = fns.predict_step(tok, stt)
                    stack.append((sc + logp[v], tk + [v], h2, s2, depth + 1))
        # exact search: keep everything (tiny vocab keeps this bounded)
        frontier = new_frontier
    return max(frontier, key=lambda x: x[0])[:2]


def test_beam_matches_exhaustive_oracle(setup, rng):
    """With beam_width >= #hypotheses the search must be exact: same best
    score and token sequence as brute-force enumeration."""
    cfg, model, variables, fns = setup
    enc_out = _enc(model, variables, rng, n=1, t=2)
    vocab, max_expand = 4, 2  # restrict token set via a masked joint
    real_joint = fns.joint_step

    def masked_joint(h_pred, h_enc):
        logits = real_joint(h_pred, h_enc)
        return jnp.where(jnp.arange(logits.shape[-1]) < vocab, logits, -1e9)

    fns_small = DecoderFns(predict_step=fns.predict_step, joint_step=masked_joint)
    want_score, want_toks = _oracle_best(
        fns_small, np.asarray(enc_out)[0], vocab, cfg.blank, cfg.bos, max_expand
    )
    toks, lens, scores = beam_decode(
        fns_small, enc_out, jnp.array([2]), vocab_sz=cfg.vocab_sz,
        beam_width=16, blank=cfg.blank, bos=cfg.bos,
        max_expand=max_expand, max_tokens=8,
    )
    got_toks = list(np.asarray(toks)[0, : int(lens[0])])
    assert abs(float(scores[0]) - want_score) < 1e-4, (
        f"score {float(scores[0])} != oracle {want_score}"
    )
    assert got_toks == want_toks


def test_wider_beam_never_scores_worse(setup, rng):
    cfg, model, variables, fns = setup
    enc_out = _enc(model, variables, rng, n=2, t=8)
    lens = jnp.array([8, 8])
    _, _, s1 = beam_decode(
        fns, enc_out, lens, vocab_sz=cfg.vocab_sz, beam_width=1,
        blank=cfg.blank, bos=cfg.bos, max_tokens=32,
    )
    _, _, s4 = beam_decode(
        fns, enc_out, lens, vocab_sz=cfg.vocab_sz, beam_width=4,
        blank=cfg.blank, bos=cfg.bos, max_tokens=32,
    )
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-4).all()


def test_beam_with_lm_fusion(setup, rng):
    cfg, model, variables, fns = setup
    lm_cfg = LMConfig(vocab_sz=cfg.vocab_sz, embed_sz=8, hidden_sz=8, num_layers=1)
    lm, lm_vars = init_lm(lm_cfg, jax.random.PRNGKey(9))

    def lm_step(y, state):
        return lm.apply(lm_vars, y, state=state)

    def lm_init_state(n):
        return tuple(
            (jnp.zeros((n, 8)), jnp.zeros((n, 8)))
            for _ in range(lm_cfg.num_layers)
        )

    fns_lm = DecoderFns(
        predict_step=fns.predict_step, joint_step=fns.joint_step,
        lm_step=lm_step, lm_init_state=lm_init_state,
    )
    enc_out = _enc(model, variables, rng, n=2, t=6)
    toks, lens, scores = beam_decode(
        fns_lm, enc_out, jnp.array([6, 6]), vocab_sz=cfg.vocab_sz,
        beam_width=3, blank=cfg.blank, bos=cfg.bos, max_tokens=16,
        lm_alpha=0.3,
    )
    assert toks.shape == (2, 16)
    assert np.isfinite(np.asarray(scores)).all()
    # alpha=0 must equal no-LM decode
    t0, l0, s0 = beam_decode(
        fns_lm, enc_out, jnp.array([6, 6]), vocab_sz=cfg.vocab_sz,
        beam_width=3, blank=cfg.blank, bos=cfg.bos, max_tokens=16,
        lm_alpha=0.0,
    )
    t1, l1, s1 = beam_decode(
        fns, enc_out, jnp.array([6, 6]), vocab_sz=cfg.vocab_sz,
        beam_width=3, blank=cfg.blank, bos=cfg.bos, max_tokens=16,
    )
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


def test_beam_jittable(setup, rng):
    cfg, model, variables, fns = setup
    enc_out = _enc(model, variables, rng, n=2, t=5)

    @jax.jit
    def run(eo, lens):
        return beam_decode(
            fns, eo, lens, vocab_sz=cfg.vocab_sz, beam_width=2,
            blank=cfg.blank, bos=cfg.bos, max_tokens=16,
        )

    toks, lens, scores = run(enc_out, jnp.array([5, 5]))
    assert toks.shape == (2, 16) and scores.shape == (2,)


def test_committed_prefix_forced_commit_on_saturation():
    """When a stream's uncommitted buffer nears capacity, the committed-
    prefix rule force-commits the best beam's whole buffer and collapses
    the pool to that beam — tokens are never silently dropped on a
    never-agreeing stream."""
    import jax.numpy as jnp

    from libreasr_tpu.models.beam import NEG, BeamState
    from libreasr_tpu.models.streaming import _beam_committed_prefix

    n, k, cap, v, h = 2, 2, 8, 5, 3
    # stream 0: beams disagree from position 0 and are nearly full
    # stream 1: beams agree on a 2-token prefix, far from full
    y_buf = jnp.zeros((n, k, cap), jnp.int32)
    y_buf = y_buf.at[0, 0, :7].set(jnp.arange(1, 8))
    y_buf = y_buf.at[0, 1, :6].set(jnp.arange(11, 17))
    y_buf = y_buf.at[1, 0, :3].set(jnp.array([4, 4, 2]))
    y_buf = y_buf.at[1, 1, :2].set(jnp.array([4, 4]))
    y_len = jnp.array([[7, 6], [3, 2]], jnp.int32)
    st = BeamState(
        pred_state=(jnp.arange(n * k * h, dtype=jnp.float32).reshape(n * k, h),),
        h_pred=jnp.ones((n, k, h)),
        last_token=jnp.array([[7, 16], [2, 4]], jnp.int32),
        scores=jnp.array([[0.0, -1.0], [-0.5, 0.0]]),
        y_buf=y_buf,
        y_len=y_len,
        lm_state=(),
        lm_logp=jnp.zeros((n, k, v)),
    )
    committed, commit_len, out = _beam_committed_prefix(st, force_margin=2)
    committed, commit_len = np.asarray(committed), np.asarray(commit_len)

    # stream 0 forced: full best-beam buffer committed, pool collapsed
    assert commit_len[0] == 7
    assert list(committed[0, :7]) == list(range(1, 8))
    assert np.asarray(out.y_len)[0].tolist() == [0, 0]
    assert np.asarray(out.scores)[0, 0] == 0.0
    assert np.asarray(out.scores)[0, 1] <= NEG / 2
    # collapsed predictor state: both beams take beam 0's rows
    ps = np.asarray(out.pred_state[0]).reshape(n, k, h)
    np.testing.assert_array_equal(ps[0, 1], ps[0, 0])

    # stream 1 normal: agreed 2-token prefix committed, buffers shifted
    assert commit_len[1] == 2
    assert list(committed[1, :2]) == [4, 4]
    assert np.asarray(out.y_len)[1].tolist() == [1, 0]
    assert np.asarray(out.y_buf)[1, 0, 0] == 2
