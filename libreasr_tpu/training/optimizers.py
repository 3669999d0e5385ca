"""Optimizers (optax-based).

The reference offers ranger / ranger_adabelief / adam / lamb (over9000) /
apollo / adahessian via fastai wrappers (libreasr/lib/learner.py:180-230,
optimizer.py). Here:
- ranger            = lookahead(radam)       (fastai ranger semantics)
- ranger_adabelief  = lookahead(adabelief)   (optimizer.py:267-284)
- over9000 / lamb   = lookahead(lamb)        (learner.py:47)
- adam / adamw / sgd straight from optax
- apollo            = diagonal quasi-Newton (optimizer.py:87, per the
  Apollo paper arXiv:2009.13586), implemented as an optax transform
- adahessian        = Adam-like with Hutchinson Hessian-diagonal second
  moments (optimizer.py:56); the Hessian diagonal is produced by the
  train step (training/learner.py) via an hvp with Rademacher probes —
  the functional equivalent of the reference's HutchinsonTraceCallback
  (learner.py:68-118)

Lookahead is implemented as a self-contained GradientTransformation that
keeps the slow weights in optimizer state (no special param wrapper like
optax.lookahead requires).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    count: jax.Array


def lookahead(
    inner: optax.GradientTransformation, k: int = 6, alpha: float = 0.5
) -> optax.GradientTransformation:
    """Every k steps pull the fast weights toward the slow weights:
    slow += alpha * (fast - slow); fast := slow."""

    def init(params):
        return LookaheadState(
            inner=inner.init(params),
            # materialize a copy — aliasing params here would break buffer
            # donation of the train state
            slow=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
            count=jnp.zeros([], jnp.int32),
        )

    def update(updates, state, params=None, **extra):
        del extra
        assert params is not None, "lookahead requires params"
        inner_updates, inner_state = inner.update(updates, state.inner, params)
        fast = optax.apply_updates(params, inner_updates)
        count = state.count + 1
        sync = (count % k) == 0

        def do_sync(_):
            slow = jax.tree_util.tree_map(
                lambda s, f: s + alpha * (f - s), state.slow, fast
            )
            # final update moves params to the synced slow weights
            ups = jax.tree_util.tree_map(lambda s, p: s - p, slow, params)
            return ups, slow

        def no_sync(_):
            ups = jax.tree_util.tree_map(lambda f, p: f - p, fast, params)
            return ups, state.slow

        final_updates, slow = jax.lax.cond(sync, do_sync, no_sync, None)
        return final_updates, LookaheadState(inner_state, slow, count)

    return optax.GradientTransformation(init, update)


class ApolloState(NamedTuple):
    count: jax.Array
    exp_avg_grad: optax.Updates
    approx_hessian: optax.Updates
    update_prev: optax.Updates


def apollo(
    learning_rate,
    beta: float = 0.9,
    eps: float = 1e-4,
    rebound: float = 0.01,
    warmup: int = 100,
    init_lr_factor: float = 0.01,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Apollo: nonconvex stochastic optimization with a diagonal
    quasi-Newton Hessian approximation (arXiv:2009.13586; the reference
    ships a torch implementation at optimizer.py:87-264).

    Per tensor: bias-corrected grad EMA m; diagonal Hessian approx
    B_t = B_{t-1} - alpha * d^2 with the scalar secant correction
    alpha = (d.(m_t - m_{t-1}) - d.B.d) / (||d||_4^4 + eps); update
    direction d_t = m_t / max(|B_t|, rebound). An internal linear lr
    warmup is required because B starts at 0 (as in the reference impl).
    """

    def init(params):
        def z(p):
            return jnp.zeros_like(p)

        return ApolloState(
            jnp.zeros([], jnp.int32),
            jax.tree_util.tree_map(z, params),
            jax.tree_util.tree_map(z, params),
            jax.tree_util.tree_map(z, params),
        )

    def update(updates, state, params=None, **extra):
        del extra
        count = state.count + 1
        t = count.astype(jnp.float32)
        bc = 1.0 - beta**t

        def per_leaf(g, m, b, d):
            delta_m = (g - m) * (1.0 - beta) / bc
            m_new = m + delta_m
            denom4 = jnp.sum(d**4) + eps
            alpha = (jnp.sum(d * delta_m) - jnp.sum(d * b * d)) / denom4
            b_new = b - alpha * d * d
            d_new = m_new / jnp.maximum(jnp.abs(b_new), rebound)
            return m_new, b_new, d_new

        flat_g, treedef = jax.tree_util.tree_flatten(updates)
        flat_m = treedef.flatten_up_to(state.exp_avg_grad)
        flat_b = treedef.flatten_up_to(state.approx_hessian)
        flat_d = treedef.flatten_up_to(state.update_prev)
        outs = [
            per_leaf(g, m, b, d)
            for g, m, b, d in zip(flat_g, flat_m, flat_b, flat_d)
        ]
        m_new = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        b_new = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        d_new = jax.tree_util.tree_unflatten(treedef, [o[2] for o in outs])
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        ramp = jnp.minimum(t / float(max(warmup, 1)), 1.0)
        lr_t = lr * (init_lr_factor + (1.0 - init_lr_factor) * ramp)
        final = jax.tree_util.tree_map(lambda d: -lr_t * d, d_new)
        return final, ApolloState(count, m_new, b_new, d_new)

    tx = optax.GradientTransformation(init, update)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


class AdaHessianState(NamedTuple):
    count: jax.Array
    m: optax.Updates        # grad EMA
    v: optax.Updates        # hessian-diag^2 EMA


def adahessian(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-4,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdaHessian (arXiv:2006.00719; reference optimizer.py:56-85 +
    HutchinsonTraceCallback learner.py:68-118): Adam-shaped update whose
    second moment tracks the squared Hutchinson Hessian-diagonal
    estimate. The train step supplies `hessian_diag` via update's extra
    kwarg (z ⊙ Hz with Rademacher z); when absent, |grad| is used as the
    curvature proxy so the transform still functions standalone."""

    def init(params):
        # distinct buffer trees — aliases break train-state donation
        return AdaHessianState(
            jnp.zeros([], jnp.int32),
            jax.tree_util.tree_map(jnp.zeros_like, params),
            jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None, *, hessian_diag=None, **extra):
        del extra
        count = state.count + 1
        t = count.astype(jnp.float32)
        hd = (
            hessian_diag
            if hessian_diag is not None
            else jax.tree_util.tree_map(jnp.abs, updates)
        )
        m = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.m, updates
        )
        v = jax.tree_util.tree_map(
            lambda v, d: b2 * v + (1 - b2) * d * d, state.v, hd
        )
        mc = 1 - b1**t
        vc = 1 - b2**t
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def upd(m, v, p):
            step = (m / mc) / (jnp.sqrt(v / vc) + eps)
            if weight_decay and p is not None:
                step = step + weight_decay * p
            return -lr * step

        if params is not None:
            final = jax.tree_util.tree_map(upd, m, v, params)
        else:
            final = jax.tree_util.tree_map(lambda m, v: upd(m, v, None), m, v)
        return final, AdaHessianState(count, m, v)

    # ExtraArgs so optax.chain/MultiSteps forward hessian_diag through
    return optax.GradientTransformationExtraArgs(init, update)


def build_optimizer(
    name: str,
    learning_rate,
    *,
    weight_decay: float = 0.01,
    grad_clip: float = 10.0,
    accumulate: int = 1,
    reduce_on_plateau: bool = False,
) -> optax.GradientTransformation:
    """Build the full update chain: clip -> optimizer [-> plateau lr
    scaling] [-> MultiSteps accumulation] (reference GradAccumCallback
    learner.py:51-65 + ReduceLROnPlateau learner.py:178).

    With reduce_on_plateau the train step must pass `value=loss` to
    tx.update (training/learner.py does when enabled)."""
    name = name.lower()
    if name == "ranger":
        base = lookahead(optax.radam(learning_rate))
    elif name == "ranger_adabelief":
        base = lookahead(optax.adabelief(learning_rate))
    elif name in ("over9000", "lamb"):
        base = lookahead(optax.lamb(learning_rate, weight_decay=weight_decay))
    elif name == "adam":
        base = optax.adam(learning_rate)
    elif name == "adamw":
        base = optax.adamw(learning_rate, weight_decay=weight_decay)
    elif name == "apollo":
        base = apollo(learning_rate, weight_decay=weight_decay)
    elif name == "adahessian":
        base = adahessian(learning_rate, weight_decay=weight_decay)
    elif name == "sgd":
        base = optax.sgd(learning_rate, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer: {name}")
    parts = [optax.clip_by_global_norm(grad_clip), base]
    if reduce_on_plateau:
        parts.append(
            optax.contrib.reduce_on_plateau(
                factor=0.5, patience=10, cooldown=5, accumulation_size=50
            )
        )
    tx = optax.chain(*parts)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx


def make_lr_schedule(conf_training: dict) -> optax.Schedule:
    """One-cycle-ish warmup+cosine (the reference trains with fastai
    fit_one_cycle then flat fit, libreasr.ipynb cells 25-27)."""
    lr = conf_training.get("lr", 5e-4)
    steps = conf_training.get("total_steps", 100_000)
    warmup = int(steps * conf_training.get("warmup_pct", 0.3))
    warmup = max(warmup, 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=lr / 25.0,
        peak_value=lr,
        warmup_steps=warmup,
        # total steps; the cosine leg (decay - warmup) must be positive
        # even for tiny --steps runs
        decay_steps=max(steps, warmup + 1),
        end_value=lr / 100.0,
    )
