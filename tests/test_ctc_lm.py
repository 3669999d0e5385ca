"""CTC model family + LM trainer tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libreasr_tpu.models.ctc import (
    CTCConfig, CTCModel, ctc_decode_greedy, ctc_loss, init_ctc,
)


@pytest.fixture(scope="module")
def ctc():
    cfg = CTCConfig(feature_sz=16, d_model=16, n_heads=2, n_layers=2, vocab_sz=10)
    model, variables = init_ctc(cfg, jax.random.PRNGKey(0))
    return cfg, model, variables


def test_ctc_forward_shapes(ctc, rng):
    cfg, model, variables = ctc
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    logp = model.apply(variables, x, jnp.array([12, 8]))
    assert logp.shape == (2, 12, 10)
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-4
    )


def test_ctc_loss_decreases(ctc, rng):
    import optax

    cfg, model, variables = ctc
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 10, (2, 4)).astype(np.int32))
    fl = jnp.array([12, 12])
    ll = jnp.array([4, 3])
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    def loss_fn(p):
        logp = model.apply({"params": p}, x, fl)
        return ctc_loss(logp, labels, fl, ll).mean()

    l0 = float(loss_fn(params))
    for _ in range(10):
        g = jax.grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, u)
    assert float(loss_fn(params)) < l0


def test_ctc_greedy_decode():
    # hand-crafted log-probs: blank, A, A, blank, B, B, B -> [A, B]
    v = 4
    seq = [0, 1, 1, 0, 2, 2, 2]
    logp = np.full((1, len(seq), v), -10.0, np.float32)
    for t, s in enumerate(seq):
        logp[0, t, s] = 0.0
    toks, lens = ctc_decode_greedy(jnp.asarray(logp), jnp.array([len(seq)]))
    assert list(np.asarray(toks)[0, : int(lens[0])]) == [1, 2]
    # repeated token after blank is kept: A blank A -> [A, A]
    seq2 = [1, 0, 1]
    logp2 = np.full((1, 3, v), -10.0, np.float32)
    for t, s in enumerate(seq2):
        logp2[0, t, s] = 0.0
    toks, lens = ctc_decode_greedy(jnp.asarray(logp2), jnp.array([3]))
    assert list(np.asarray(toks)[0, : int(lens[0])]) == [1, 1]


def test_lm_trainer_smoke(tmp_path, capsys):
    import train_lm

    corpus = tmp_path / "c.txt"
    corpus.write_text("the cat sat on the mat\n" * 200)
    out = tmp_path / "lm.msgpack"
    train_lm.main([
        "--corpus", str(corpus), "--bs", "8", "--seq-len", "16",
        "--steps", "30", "--eval-every", "15",
        "--embed-sz", "16", "--hidden-sz", "16", "--num-layers", "1",
        "--out", str(out),
    ])
    assert out.exists()
    printed = capsys.readouterr().out
    assert "ppl=" in printed
