"""Train-step tests: single-host and 8-device mesh (DP + TP), optimizer
correctness on toy problems, carry semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from libreasr_tpu.models.transducer import TransducerConfig, init_transducer
from libreasr_tpu.ops.frontend import FrontendConfig
from libreasr_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch
from libreasr_tpu.training.learner import (
    Batch, Learner, LossConfig, init_carry, make_train_step,
)
from libreasr_tpu.training.optimizers import apollo, build_optimizer, lookahead


def tiny_cfg(**kw):
    d = dict(
        feature_sz=40, embed_sz=8, vocab_sz=16, hidden_sz=16, out_sz=16,
        joint_sz=16, enc_num_layers=2, pred_num_layers=1,
        use_tmp_state_pcent=0.99,
    )
    d.update(kw)
    return TransducerConfig(**d)


def feature_batch(rng, n=4, t=12, u=5, f=40, vocab=16):
    return Batch(
        audio=jnp.asarray(rng.standard_normal((n, t, f)).astype(np.float32)),
        audio_len=jnp.array([t] * n),
        labels=jnp.asarray(rng.integers(1, vocab, (n, u)).astype(np.int32)),
        label_len=jnp.asarray(([u, u - 1, u - 2, u] * ((n + 3) // 4))[:n]),
    )


def test_train_step_runs_and_learns(rng):
    cfg = tiny_cfg()
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("ranger", 1e-3)
    learner = Learner(model, variables, tx, frontend=None)
    batch = feature_batch(rng)
    losses = [learner.step(batch)["loss"] for _ in range(20)]
    assert all(np.isfinite(l) for l in losses)
    # same batch: trailing-average loss must drop (single-step compare is
    # noisy under ranger's lookahead sync cadence)
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_train_step_with_device_frontend(rng):
    cfg = tiny_cfg(feature_sz=1280)
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    fe = FrontendConfig()
    learner = Learner(model, variables, tx, frontend=fe)
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32)),
        audio_len=jnp.array([16000, 12000]),
        labels=jnp.asarray(rng.integers(1, 16, (2, 5)).astype(np.int32)),
        label_len=jnp.array([5, 3]),
    )
    m = learner.step(batch)
    assert np.isfinite(m["loss"]) and bool(m["finite"])


def test_train_step_on_mesh(rng):
    """DP(4) x TP(2) over 8 virtual CPU devices must match the
    single-device step numerically."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    cfg = tiny_cfg()
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    batch = feature_batch(rng, n=8)

    sharded_vars = jax.device_put(variables, param_shardings(mesh, variables))
    # deep-copy for the reference learner: its donated step consumes its
    # buffers, and on the virtual-CPU mesh the replicated copy above can
    # alias the device-0 shard
    ref_vars = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
    ref = Learner(model, ref_vars, tx, frontend=None, seed=7)
    m_ref = ref.step(batch)
    learner = Learner(model, sharded_vars, tx, frontend=None, mesh=mesh, seed=7)
    m = learner.step(batch)

    np.testing.assert_allclose(m["loss"], m_ref["loss"], rtol=1e-4)
    w_ref = np.asarray(ref.state.params["joint"]["out"]["kernel"])
    w = np.asarray(learner.state.params["joint"]["out"]["kernel"])
    np.testing.assert_allclose(w, w_ref, rtol=1e-3, atol=1e-5)


def test_chained_steps_match_sequential(rng):
    """step_chained(K batches) == K sequential step() calls: same rng
    stream, same carry threading, same final params/metrics."""
    cfg = tiny_cfg()
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    batches = [feature_batch(np.random.default_rng(i)) for i in range(5)]

    seq = Learner(
        model,
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables),
        tx, frontend=None, seed=3,
    )
    for b in batches:
        m_seq = seq.step(b)

    ch = Learner(model, variables, tx, frontend=None, seed=3)
    m_ch = ch.step_chained(batches)

    np.testing.assert_allclose(m_ch["loss"], m_seq["loss"], rtol=1e-5)
    assert "loss_mean" in m_ch
    w_seq = np.asarray(seq.state.params["joint"]["out"]["kernel"])
    w_ch = np.asarray(ch.state.params["joint"]["out"]["kernel"])
    np.testing.assert_allclose(w_ch, w_seq, rtol=1e-5, atol=1e-7)
    assert int(ch.state.step) == int(seq.state.step) == 5
    # carry threads through the scan identically
    np.testing.assert_allclose(
        np.asarray(ch.carries[4].enc_state[0][0]),
        np.asarray(seq.carries[4].enc_state[0][0]),
        rtol=1e-5, atol=1e-7,
    )
    # mixed-shape chains are refused (train.py groups by bucket shape)
    with pytest.raises(ValueError):
        ch.step_chained([batches[0], feature_batch(rng, t=9)])


def test_chained_steps_on_mesh(rng):
    """Chained steps shard over the mesh (batch axis 1 of the stacked
    [K, N, ...] arrays) and match the single-device chain."""
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    cfg = tiny_cfg()
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    batches = [feature_batch(np.random.default_rng(i), n=8) for i in range(3)]

    ref_vars = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
    ref = Learner(model, ref_vars, tx, frontend=None, seed=7)
    m_ref = ref.step_chained(batches)

    sharded_vars = jax.device_put(variables, param_shardings(mesh, variables))
    learner = Learner(model, sharded_vars, tx, frontend=None, mesh=mesh, seed=7)
    m = learner.step_chained(batches)

    np.testing.assert_allclose(m["loss"], m_ref["loss"], rtol=1e-4)
    w_ref = np.asarray(ref.state.params["joint"]["out"]["kernel"])
    w = np.asarray(learner.state.params["joint"]["out"]["kernel"])
    np.testing.assert_allclose(w, w_ref, rtol=1e-3, atol=1e-5)


def test_carry_updates_across_steps(rng):
    cfg = tiny_cfg(use_tmp_bos=True, use_tmp_bos_pcent=1.0)
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3)
    learner = Learner(model, variables, tx, frontend=None)
    batch = feature_batch(rng)
    learner.step(batch)
    carry = learner.carries[4]
    assert bool(carry.valid)
    # bos cache = last label of each sequence
    want = np.asarray(batch.labels)[
        np.arange(4), np.asarray(batch.label_len) - 1
    ]
    np.testing.assert_array_equal(np.asarray(carry.bos)[:, 0], want)
    # encoder state cache is non-zero after a step
    assert np.abs(np.asarray(carry.enc_state[0][0])).sum() > 0


def test_reduce_on_plateau_step(rng):
    cfg = tiny_cfg()
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer("adam", 1e-3, reduce_on_plateau=True)
    learner = Learner(model, variables, tx, frontend=None,
                      pass_loss_value=True)
    batch = feature_batch(rng)
    for _ in range(3):
        m = learner.step(batch)
        assert np.isfinite(m["loss"])


def test_loss_shaping_options(rng):
    """entropy/zero loss regularizers change the loss and keep it finite
    (reference loss.py:111-129)."""
    cfg = tiny_cfg(enc_dropout=0.0, pred_dropout=0.0, use_tmp_state_pcent=0.0)
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    batch = feature_batch(rng)
    losses = {}
    for name, lc in [
        ("plain", LossConfig()),
        ("entropy", LossConfig(entropy_loss=True)),
        ("zero", LossConfig(zero_loss=True)),
        ("div", LossConfig(div_by_len=True)),
    ]:
        var_c = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)
        l = Learner(model, var_c, build_optimizer("adam", 1e-3),
                    frontend=None, loss_cfg=lc, seed=5)
        losses[name] = float(l.step(batch)["loss"])
    assert all(np.isfinite(v) for v in losses.values())
    assert losses["entropy"] > losses["plain"]
    assert losses["zero"] > losses["plain"]
    assert losses["div"] < losses["plain"]


def test_fused_loss_step_matches_unfused(rng):
    """The fused joint+loss train step must produce the same loss and
    the same updated params as the lattice path (dropout off)."""
    cfg = tiny_cfg(enc_dropout=0.0, pred_dropout=0.0, use_tmp_state_pcent=0.0)
    model, variables = init_transducer(cfg, jax.random.PRNGKey(0))
    batch = feature_batch(rng)
    var_copy = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), variables)

    tx = build_optimizer("adam", 1e-3)
    l_ref = Learner(model, variables, tx, frontend=None, seed=11)
    m_ref = l_ref.step(batch)

    l_fused = Learner(
        model, var_copy, tx, frontend=None, seed=11,
        loss_cfg=LossConfig(fused=True, t_chunk=4),
    )
    m_fused = l_fused.step(batch)

    np.testing.assert_allclose(m_fused["loss"], m_ref["loss"], rtol=1e-4)
    # batch_stats must update in BOTH towers on the fused path too
    for tower in ("encoder", "predictor"):
        a = np.concatenate([
            np.ravel(l) for l in jax.tree_util.tree_leaves(
                l_ref.state.batch_stats[tower])
        ])
        b = np.concatenate([
            np.ravel(l) for l in jax.tree_util.tree_leaves(
                l_fused.state.batch_stats[tower])
        ])
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)
    w_a = np.asarray(l_ref.state.params["joint"]["out"]["kernel"])
    w_b = np.asarray(l_fused.state.params["joint"]["out"]["kernel"])
    np.testing.assert_allclose(w_a, w_b, rtol=1e-3, atol=1e-5)
    e_a = np.asarray(
        jax.tree_util.tree_leaves(l_ref.state.params["encoder"])[0]
    )
    e_b = np.asarray(
        jax.tree_util.tree_leaves(l_fused.state.params["encoder"])[0]
    )
    np.testing.assert_allclose(e_a, e_b, rtol=1e-3, atol=1e-5)


def test_lookahead_sync():
    params = {"w": jnp.array([1.0, 2.0])}
    tx = lookahead(optax.sgd(0.1), k=2, alpha=0.5)
    state = tx.init(params)
    g = {"w": jnp.array([1.0, 1.0])}
    # step 1: plain sgd
    u, state = tx.update(g, state, params)
    p1 = optax.apply_updates(params, u)
    np.testing.assert_allclose(np.asarray(p1["w"]), [0.9, 1.9], rtol=1e-6)
    # step 2: sgd then sync: slow = slow + 0.5*(fast - slow)
    u, state = tx.update(g, state, p1)
    p2 = optax.apply_updates(p1, u)
    # fast after sgd = [0.8, 1.8]; slow was [1, 2] -> synced [0.9, 1.9]
    np.testing.assert_allclose(np.asarray(p2["w"]), [0.9, 1.9], rtol=1e-6)


@pytest.mark.parametrize(
    "name,lr,steps",
    [
        ("ranger", 0.1, 60),
        ("ranger_adabelief", 0.1, 60),
        ("lamb", 0.1, 60),
        ("adamw", 0.1, 60),
        ("apollo", 0.5, 200),
        ("sgd", 0.1, 60),
    ],
)
def test_optimizers_minimize_quadratic(name, lr, steps):
    params = {"w": jnp.array([3.0, -2.0, 1.5])}
    tx = build_optimizer(name, lr, accumulate=1)
    state = tx.init(params)

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    p = params
    for _ in range(steps):
        g = jax.grad(loss)(p)
        u, state = tx.update(g, state, p)
        p = optax.apply_updates(p, u)
    assert float(loss(p)) < float(loss(params)) * 0.3


def test_grad_accumulation_matches_big_batch(rng):
    """MultiSteps(k) over k microbatches == one step on the union batch
    (for a linear model with sgd)."""
    w0 = {"w": jnp.ones((3,))}
    x = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))

    def loss(p, xs):
        return jnp.mean((xs @ p["w"]) ** 2)

    tx_acc = optax.MultiSteps(optax.sgd(0.1), every_k_schedule=2)
    s = tx_acc.init(w0)
    p = w0
    for mb in (x[:2], x[2:]):
        g = jax.grad(loss)(p, mb)
        u, s = tx_acc.update(g, s, p)
        p = optax.apply_updates(p, u)

    tx = optax.sgd(0.1)
    s2 = tx.init(w0)
    g_full = jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2,
        jax.grad(loss)(w0, x[:2]), jax.grad(loss)(w0, x[2:]),
    )
    u2, _ = tx.update(g_full, s2, w0)
    p_ref = optax.apply_updates(w0, u2)
    np.testing.assert_allclose(np.asarray(p["w"]), np.asarray(p_ref["w"]), rtol=1e-5)
