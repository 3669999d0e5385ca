"""RNN-T loss tests: brute-force path enumeration oracle, naive-DP
equivalence, and analytic-vs-autodiff gradient parity."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from libreasr_tpu.ops.rnnt_loss import rnnt_loss, rnnt_loss_naive


def log_softmax_np(x):
    m = x.max(-1, keepdims=True)
    e = x - m
    return e - np.log(np.exp(e).sum(-1, keepdims=True))


def brute_force_loss(logits, labels, t_len, u_len, blank=0):
    """Enumerate every monotone lattice path (T blanks, U emits)."""
    lp = log_softmax_np(logits)
    total = -np.inf
    # a path is a binary string: positions of the U emits among T+U steps
    steps = t_len + u_len
    for emit_positions in itertools.combinations(range(steps - 1), u_len):
        t, u, acc = 0, 0, 0.0
        ok = True
        for s in range(steps):
            if s in emit_positions:
                if u >= u_len:
                    ok = False
                    break
                acc += lp[t, u, labels[u]]
                u += 1
            else:
                acc += lp[t, u, blank]
                t += 1
                if t > t_len:
                    ok = False
                    break
        if ok and t == t_len and u == u_len:
            total = np.logaddexp(total, acc)
    return -total


def test_matches_brute_force(rng):
    t, u, v = 4, 2, 5
    logits = rng.standard_normal((1, t, u + 1, v)).astype(np.float32)
    labels = np.array([[1, 3]], dtype=np.int32)
    want = brute_force_loss(logits[0], labels[0], t, u)
    got = rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels), jnp.array([t]), jnp.array([u])
    )
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4)


def test_matches_brute_force_short_lengths(rng):
    t_max, u_max, v = 5, 3, 4
    logits = rng.standard_normal((1, t_max, u_max + 1, v)).astype(np.float32)
    labels = np.array([[2, 1, 3]], dtype=np.int32)
    t_len, u_len = 3, 2
    want = brute_force_loss(logits[0], labels[0], t_len, u_len)
    got = rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.array([t_len]), jnp.array([u_len]),
    )
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4)


def test_matches_naive_batch(rng):
    n, t, u, v = 4, 11, 6, 16
    logits = rng.standard_normal((n, t, u + 1, v)).astype(np.float32)
    labels = rng.integers(1, v, (n, u)).astype(np.int32)
    t_len = np.array([11, 8, 5, 11], np.int32)
    u_len = np.array([6, 4, 1, 3], np.int32)
    got = rnnt_loss(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(t_len), jnp.asarray(u_len),
    )
    want = rnnt_loss_naive(
        jnp.asarray(logits), jnp.asarray(labels),
        jnp.asarray(t_len), jnp.asarray(u_len),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)
    assert np.isfinite(np.asarray(got)).all()
    assert (np.asarray(got) > 0).all()


def test_gradient_matches_autodiff(rng):
    n, t, u, v = 2, 6, 3, 8
    logits = jnp.asarray(rng.standard_normal((n, t, u + 1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (n, u)).astype(np.int32))
    t_len = jnp.array([6, 4], jnp.int32)
    u_len = jnp.array([3, 2], jnp.int32)

    g_custom = jax.grad(
        lambda lg: jnp.sum(rnnt_loss(lg, labels, t_len, u_len))
    )(logits)
    g_auto = jax.grad(
        lambda lg: jnp.sum(rnnt_loss_naive(lg, labels, t_len, u_len))
    )(logits)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=1e-3, atol=1e-5
    )


def test_gradient_zero_outside_valid_region(rng):
    n, t, u, v = 1, 6, 3, 8
    logits = jnp.asarray(rng.standard_normal((n, t, u + 1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (n, u)).astype(np.int32))
    t_len = jnp.array([4], jnp.int32)
    u_len = jnp.array([2], jnp.int32)
    g = jax.grad(lambda lg: jnp.sum(rnnt_loss(lg, labels, t_len, u_len)))(logits)
    g = np.asarray(g)
    assert np.abs(g[:, 4:]).max() == 0.0       # beyond frame length
    assert np.abs(g[:, :, 3:]).max() == 0.0    # beyond label length + 1


def test_jit_and_weighted_cotangent(rng):
    n, t, u, v = 2, 5, 2, 6
    logits = jnp.asarray(rng.standard_normal((n, t, u + 1, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, v, (n, u)).astype(np.int32))
    t_len = jnp.array([5, 5], jnp.int32)
    u_len = jnp.array([2, 2], jnp.int32)
    f = jax.jit(lambda lg: rnnt_loss(lg, labels, t_len, u_len).mean())
    loss = f(logits)
    assert np.isfinite(float(loss))
    g = jax.jit(jax.grad(f))(logits)
    # mean reduction scales gradients by 1/N
    g2 = jax.grad(lambda lg: jnp.sum(rnnt_loss(lg, labels, t_len, u_len)))(logits)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2) / n, rtol=1e-4, atol=1e-6)
