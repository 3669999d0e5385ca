"""RNN-Transducer loss — TPU-native log-space DP.

Replaces the reference's external CUDA kernel (warp_rnnt, imported at
libreasr/lib/loss.py:77-79) with a pure-XLA program:

- the per-timestep label recurrence
  ``alpha[t,u] = logaddexp(alpha[t-1,u] + blank[t-1,u],
                           alpha[t,u-1] + emit[t,u-1])``
  is a first-order linear recurrence in the (logaddexp, +) semiring, so
  the inner U-loop becomes a `lax.associative_scan` (log-depth on the
  VPU) inside a `lax.scan` over T — no per-cell Python/CUDA loop;
- gradients are computed analytically from the forward/backward
  occupancies in a `jax.custom_vjp` (one softmax recompute, no giant
  autodiff tape through the DP);
- variable (T, U) per sequence is handled with masks + per-sequence
  gather of the terminal cell — shapes stay static for XLA.

Grid convention (same as warp_rnnt): logits [N, T, U+1, V], labels
[N, U], blank id 0, emitting label u advances u, blank advances t, the
final blank at (T-1, U) exits the lattice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e30


def _semiring_combine(c1, c2):
    """Compose affine maps f(x) = logaddexp(x + A, b) in the log semiring:
    (c2 ∘ c1)(x) = logaddexp(x + A1 + A2, logaddexp(b1 + A2, b2))."""
    a1, b1 = c1
    a2, b2 = c2
    return a1 + a2, jnp.logaddexp(b1 + a2, b2)


def _row_recurrence(a, e):
    """Solve r[u] = logaddexp(a[u], r[u-1] + e[u-1]) along axis 1.

    a: [N, U1] additive row terms; e: [N, U1-1] emit scores.
    """
    n = a.shape[0]
    gain = jnp.concatenate([jnp.full((n, 1), NEG, a.dtype), e], axis=1)
    _, r = jax.lax.associative_scan(_semiring_combine, (gain, a), axis=1)
    return r


def _log_probs(logits, labels, blank: int):
    """-> (lp_blank [N,T,U1], lp_emit [N,T,U])."""
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    lp_blank = logits[..., blank] - lse
    u = labels.shape[1]
    emit_logits = jnp.take_along_axis(
        logits[:, :, :u, :], labels[:, None, :, None], axis=-1
    )[..., 0]
    lp_emit = emit_logits - lse[:, :, :u]
    return lp_blank, lp_emit


def _forward_alphas(lp_blank, lp_emit, label_lengths):
    """alpha [N, T, U1] via scan over T with associative row recurrences."""
    n, t, u1 = lp_blank.shape
    u_ids = jnp.arange(u1 - 1)
    emit_mask = u_ids[None, :] < label_lengths[:, None]            # [N, U]
    lp_emit = jnp.where(emit_mask[:, None, :], lp_emit, NEG)

    # row 0: alpha[0, u] = sum_{k<u} emit[0, k]
    row0 = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.cumsum(lp_emit[:, 0, :], axis=1)], axis=1
    )

    def step(alpha_prev, inp):
        lpb_prev, lpe_t = inp
        a = alpha_prev + lpb_prev
        row = _row_recurrence(a, lpe_t)
        return row, row

    lpb_scan = jnp.moveaxis(lp_blank[:, :-1, :], 1, 0)   # [T-1, N, U1]
    lpe_scan = jnp.moveaxis(lp_emit[:, 1:, :], 1, 0)     # [T-1, N, U]
    _, rows = jax.lax.scan(step, row0, (lpb_scan, lpe_scan))
    alpha = jnp.concatenate([row0[None], rows], axis=0)  # [T, N, U1]
    return jnp.moveaxis(alpha, 0, 1), lp_emit


def _backward_betas(lp_blank, lp_emit, frame_lengths, label_lengths):
    """beta [N, T, U1] with per-sequence exit at (fl-1, yl).

    beta[t,u] = logaddexp(blank[t,u] + beta*[t+1,u],
                          emit[t,u] + beta[t,u+1])
    where beta*[fl, u] := 0 if u == yl else NEG (lattice exit).
    """
    n, t, u1 = lp_blank.shape
    u_ids = jnp.arange(u1)
    exit_row = jnp.where(u_ids[None, :] == label_lengths[:, None], 0.0, NEG)
    e_full = jnp.concatenate([lp_emit, jnp.full((n, t, 1), NEG)], axis=2)

    def step(beta_next, inp):
        lpb_t, lpe_t, t_idx = inp
        # at t+1 == fl the continuation is the lattice exit row
        b_next = jnp.where(
            (t_idx + 1 == frame_lengths)[:, None], exit_row, beta_next
        )
        bb = lpb_t + b_next
        # s[u] = logaddexp(bb[u], e[u] + s[u+1]): reversing u turns this
        # into the same forward recurrence _row_recurrence solves, with
        # gain[i] = e[U1-1-i] = reversed(e)[1:][i-1]
        rev_e = lpe_t[:, ::-1]
        row = _row_recurrence(bb[:, ::-1], rev_e[:, 1:])[:, ::-1]
        return row, row

    lpb_scan = jnp.moveaxis(lp_blank, 1, 0)[::-1]   # t = T-1 .. 0
    lpe_scan = jnp.moveaxis(e_full, 1, 0)[::-1]
    t_ids = jnp.arange(t)[::-1]
    init = jnp.full((n, u1), NEG)
    _, rows = jax.lax.scan(step, init, (lpb_scan, lpe_scan, t_ids))
    beta = rows[::-1]                                # [T, N, U1]
    return jnp.moveaxis(beta, 0, 1)


def _terminal_gather(alpha, lp_blank, frame_lengths, label_lengths):
    """logZ[n] = alpha[n, fl-1, yl] + lp_blank[n, fl-1, yl]."""
    n = alpha.shape[0]
    nn = jnp.arange(n)
    tl = frame_lengths - 1
    return alpha[nn, tl, label_lengths] + lp_blank[nn, tl, label_lengths]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def rnnt_loss(logits, labels, frame_lengths, label_lengths, blank: int = 0):
    """Per-sequence negative log-likelihood of the RNN-T lattice.

    logits: [N, T, U+1, V] raw (pre-log_softmax) joint outputs
    labels: [N, U] int32, frame_lengths: [N], label_lengths: [N]
    Returns loss [N].
    """
    loss, _ = _rnnt_fwd_impl(logits, labels, frame_lengths, label_lengths, blank)
    return loss


def _rnnt_fwd_impl(logits, labels, frame_lengths, label_lengths, blank):
    logits = logits.astype(jnp.float32)
    lp_blank, lp_emit = _log_probs(logits, labels, blank)
    alpha, _ = _forward_alphas(lp_blank, lp_emit, label_lengths)
    log_z = _terminal_gather(alpha, lp_blank, frame_lengths, label_lengths)
    return -log_z, log_z


def _occupancies(lp_blank, lp_emit_m, alpha, beta, frame_lengths,
                 label_lengths, log_z):
    """Posterior transition occupancies of the RNN-T lattice —
    (occ_blank [N,T,U1], occ_emit [N,T,U]), zeroed outside the valid
    (t, u) region; d(-logZ)/d lp = -occ. Shared by the full-lattice
    custom-vjp backward below and the fused-loss backward
    (fused_loss._fused_bwd), so the analytic gradient math lives in
    exactly one place."""
    n, t, u1 = lp_blank.shape
    t_ids = jnp.arange(t)
    u_ids = jnp.arange(u1)
    valid = (t_ids[None, :] < frame_lengths[:, None])[:, :, None] & (
        u_ids[None, :] <= label_lengths[:, None]
    )[:, None, :]                                                  # [N, T, U1]

    # continuation after a blank from (t, u): beta[t+1, u], exit at fl
    exit_row = jnp.where(u_ids[None, :] == label_lengths[:, None], 0.0, NEG)
    beta_next_t = jnp.concatenate(
        [beta[:, 1:, :], jnp.full((n, 1, u1), NEG)], axis=1
    )
    beta_next_t = jnp.where(
        (t_ids[None, :] + 1 == frame_lengths[:, None])[:, :, None],
        exit_row[:, None, :],
        beta_next_t,
    )
    # continuation after emitting label u at (t, u): beta[t, u+1]
    beta_next_u = jnp.concatenate(
        [beta[:, :, 1:], jnp.full((n, t, 1), NEG)], axis=2
    )

    lz = log_z[:, None, None]
    occ_blank = jnp.exp(
        jnp.clip(alpha + lp_blank + beta_next_t - lz, NEG, 0.0)
    )
    occ_emit = jnp.exp(
        jnp.clip(
            alpha[:, :, :-1] + lp_emit_m + beta_next_u[:, :, :-1] - lz,
            NEG,
            0.0,
        )
    )
    occ_blank = jnp.where(valid, occ_blank, 0.0)
    occ_emit = jnp.where(valid[:, :, :-1], occ_emit, 0.0)
    return occ_blank, occ_emit


def _rnnt_fwd(logits, labels, frame_lengths, label_lengths, blank):
    loss, _ = _rnnt_fwd_impl(logits, labels, frame_lengths, label_lengths, blank)
    return loss, (logits, labels, frame_lengths, label_lengths)


def _rnnt_bwd(blank, res, g):
    logits, labels, frame_lengths, label_lengths = res
    logits = logits.astype(jnp.float32)
    n, t, u1, v = logits.shape
    lp_blank, lp_emit = _log_probs(logits, labels, blank)
    alpha, lp_emit_masked = _forward_alphas(lp_blank, lp_emit, label_lengths)
    beta = _backward_betas(lp_blank, lp_emit_masked, frame_lengths, label_lengths)
    log_z = _terminal_gather(alpha, lp_blank, frame_lengths, label_lengths)

    occ_blank, occ_emit = _occupancies(
        lp_blank, lp_emit_masked, alpha, beta, frame_lengths,
        label_lengths, log_z,
    )

    # d(-logZ)/d lp = -occ; chain through log_softmax:
    # d/d logits[v] = g_lp[v] - softmax[v] * sum_v' g_lp[v']
    g_total = occ_blank.at[:, :, :-1].add(occ_emit)                # [N, T, U1]
    p = jax.nn.softmax(logits, axis=-1)
    grad = p * g_total[..., None]
    grad = grad.at[..., blank].add(-occ_blank)
    # emit term: subtract occ_emit at v == labels[u]. A gather-style
    # scatter-add here takes *seconds* on TPU; the broadcast compare is
    # a fused elementwise pass instead.
    emit_mask = (
        labels[:, None, :, None] == jnp.arange(v)[None, None, None, :]
    )                                                              # [N,1,U,V]
    grad = grad.at[:, :, :-1, :].add(
        jnp.where(emit_mask, -occ_emit[..., None], 0.0)
    )
    grad = grad * g[:, None, None, None]
    return (grad.astype(logits.dtype), None, None, None)


rnnt_loss.defvjp(_rnnt_fwd, _rnnt_bwd)


def rnnt_loss_autodiff(logits, labels, frame_lengths, label_lengths,
                       blank: int = 0):
    """The same scan/associative-scan DP as `rnnt_loss`, WITHOUT the
    custom_vjp wrapper: every op is a differentiable lax primitive, so
    JAX can take gradients of any order — including the
    forward-over-reverse hvp AdaHessian's Hutchinson estimator needs
    (reference HutchinsonTraceCallback, learner.py:68-118), which a
    custom_vjp function cannot provide (jvp of custom_vjp is undefined).
    First-order training should keep `rnnt_loss` (analytic occupancy
    gradients, no DP tape); this variant trades one extra tape for
    arbitrary-order differentiability at the SAME compile-friendly
    program size — unlike rnnt_loss_naive's O(T·U) unrolled graph."""
    loss, _ = _rnnt_fwd_impl(logits, labels, frame_lengths, label_lengths, blank)
    return loss


# ---------------------------------------------------------------------------
# reference implementations (for tests)
# ---------------------------------------------------------------------------


def rnnt_loss_naive(logits, labels, frame_lengths, label_lengths, blank: int = 0):
    """Straightforward autodiff-able DP (O(T*U) sequential) — the test
    oracle. Equivalent math to the brute-force lattice sum warp_rnnt
    implements."""
    logits = logits.astype(jnp.float32)
    lp_blank, lp_emit = _log_probs(logits, labels, blank)
    n, t, u1 = lp_blank.shape
    u_ids = jnp.arange(u1 - 1)
    emit_mask = u_ids[None, :] < label_lengths[:, None]
    lp_emit = jnp.where(emit_mask[:, None, :], lp_emit, NEG)

    row = jnp.concatenate(
        [jnp.zeros((n, 1)), jnp.cumsum(lp_emit[:, 0, :], axis=1)], axis=1
    )
    rows = [row]
    for ti in range(1, t):
        a = rows[-1] + lp_blank[:, ti - 1, :]
        cells = [a[:, :1]]
        for ui in range(1, u1):
            cells.append(
                jnp.logaddexp(
                    a[:, ui : ui + 1],
                    cells[-1] + lp_emit[:, ti, ui - 1 : ui],
                )
            )
        rows.append(jnp.concatenate(cells, axis=1))
    alpha = jnp.stack(rows, axis=1)
    return -_terminal_gather(alpha, lp_blank, frame_lengths, label_lengths)
