"""Fused joint+RNN-T loss: never materializes the full [N,T,U,V] lattice.

The reference expands encoder/predictor to [N,T,U,H] and materializes
the full vocab lattice for warp_rnnt (models.py:345-359) — its memory
hot spot. Here the joint network and the loss are fused behind one
`custom_vjp` over (enc_out [N,T,H], pred_out [N,U1,H], joint params):

- forward: scan over T-chunks; each chunk computes its [N,Tc,U1,V]
  logits, reduces them immediately to the two DP inputs
  lp_blank [N,Tc,U1] / lp_emit [N,Tc,U] (no V axis), and discards the
  logits. Peak live memory is one chunk of lattice instead of T/Tc of
  them.
- backward: alpha/beta run on the small lp arrays; per chunk the logits
  are *recomputed* and the analytic occupancy gradients are pulled back
  through the joint with a per-chunk `jax.vjp` — gradient checkpointing
  over time with exact analytic DP gradients.

The joint math matches models/modules.Joint (concat method decomposed
into pred/enc projections).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .rnnt_loss import (
    NEG, _backward_betas, _forward_alphas, _log_probs, _occupancies,
    _terminal_gather,
)


class JointParams(NamedTuple):
    w_pred: jax.Array  # [H, J]
    b_pred: jax.Array  # [J]
    w_enc: jax.Array   # [H, J]
    w_out: jax.Array   # [J, V]
    b_out: jax.Array   # [V]


def _mmc(a, b, cdt):
    """Matmul with optional low-precision INPUTS and f32 accumulation —
    the joint's [.,J]x[J,V] product is the train step's FLOP hot spot
    and runs ~4x faster on the MXU in bf16; the DP and the logsumexp
    normalization stay f32."""
    if cdt is not None:
        a = a.astype(cdt)
        b = b.astype(cdt)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _chunk_lp(enc_chunk, pred_proj, jp: JointParams, labels, blank,
              cdt=None):
    """[N,Tc,H] x [N,U1,J] -> (lp_blank [N,Tc,U1], lp_emit [N,Tc,U])."""
    enc_proj = _mmc(enc_chunk, jp.w_enc, cdt)            # [N,Tc,J]
    hidden = jnp.tanh(enc_proj[:, :, None, :] + pred_proj[:, None, :, :])
    logits = (
        _mmc(hidden, jp.w_out, cdt)
        + jp.b_out
    )                                                    # [N,Tc,U1,V]
    return _log_probs(logits, labels, blank)


def _pred_proj(pred_out, jp: JointParams, cdt=None):
    return _mmc(pred_out, jp.w_pred, cdt) + jp.b_pred


def _joint_pallas_ok(jp: JointParams, cdt, u1: int) -> bool:
    """Fused Pallas joint kernels (ops/pallas/joint_lp.py): DEFAULT ON
    for TPU training with a low-precision compute policy and
    lane-aligned J/V. Round 2 shipped them opt-in: the original
    [N, T*Up, 1] row layout (lane dim 1) forced XLA layout-conversion
    copies at every custom-call boundary, costing ~1.5 ms inside the
    full step. Round 3 moved every boundary array to its natural XLA
    shape ([N,T,Up] lattices, selector-matmul row expansion in VMEM) —
    measured full flagship train step 29.9 -> 28.1 ms vs the XLA
    chunked path (scripts/bench_train_step.py). Opt out with
    LIBREASR_NO_PALLAS_JOINT=1; LIBREASR_FORCE_PALLAS=1 engages
    interpret mode for CPU tests (off-TPU only — on hardware it must
    not bypass the alignment/precision/VMEM eligibility below)."""
    import os

    if os.environ.get("LIBREASR_NO_PALLAS_JOINT") == "1":
        return False
    from .pallas.joint_lp import MAX_U1

    if jax.default_backend() != "tpu":
        # forced interpret mode still traces the bwd row-slicer, whose
        # temporaries are only bounded for u1 <= MAX_U1 (_n_slices
        # raises past it) — the bound applies off-TPU too
        return os.environ.get("LIBREASR_FORCE_PALLAS") == "1" and u1 <= MAX_U1
    if cdt is None:
        return False

    j, v = jp.w_out.shape
    # u1 bound: the fwd kernel holds all BT*Up rows of one tile's
    # [rows, V] logits in VMEM, and the bwd row-slicer only bounds its
    # temporaries for up <= MAX_U1 — longer labels fall back to the
    # XLA chunked path instead of failing Mosaic allocation
    return j % 128 == 0 and v % 128 == 0 and u1 <= MAX_U1


def _joint_w_dtype(cdt):
    # interpret mode (CPU tests) keeps f32 for exactness; on TPU the
    # resident W_out follows the compute policy
    if jax.default_backend() != "tpu":
        return jnp.float32
    return cdt or jnp.bfloat16


def _all_lp(enc_out, pred_out, jp, labels, blank, t_chunk, cdt=None):
    n, t, _ = enc_out.shape
    pp = _pred_proj(pred_out, jp, cdt)
    n_chunks = t // t_chunk
    enc_chunks = enc_out.reshape(n, n_chunks, t_chunk, -1).swapaxes(0, 1)

    def body(_, enc_c):
        return (), _chunk_lp(enc_c, pp, jp, labels, blank, cdt)

    _, (lpb, lpe) = jax.lax.scan(body, (), enc_chunks)
    # [n_chunks, N, Tc, .] -> [N, T, .]
    lpb = lpb.swapaxes(0, 1).reshape(n, t, -1)
    lpe = lpe.swapaxes(0, 1).reshape(n, t, -1)
    return lpb, lpe


def _pad_time(enc_out, t_chunk):
    t = enc_out.shape[1]
    pad = (-t) % t_chunk
    if pad:
        enc_out = jnp.pad(enc_out, ((0, 0), (0, pad), (0, 0)))
    return enc_out, t + pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def rnnt_loss_fused(
    enc_out, pred_out, joint_params, labels, frame_lengths, label_lengths,
    blank: int = 0, t_chunk: int = 16, compute_dtype=None,
):
    """Per-sequence RNN-T loss from raw encoder/predictor outputs.

    enc_out: [N, T, H]; pred_out: [N, U+1, H]; labels [N, U].
    Returns loss [N]. Differentiable w.r.t. enc_out, pred_out and
    joint_params with chunked recomputation. compute_dtype (static)
    runs the joint matmuls with low-precision inputs (f32 accumulation);
    the DP itself always runs f32.
    """
    loss, _ = _fused_fwd_impl(
        enc_out, pred_out, joint_params, labels, frame_lengths,
        label_lengths, blank, t_chunk, compute_dtype,
    )
    return loss


def _fused_fwd_impl(enc_out, pred_out, jp, labels, fl, yl, blank, t_chunk,
                    cdt=None):
    enc_p, t_pad = _pad_time(enc_out.astype(jnp.float32), t_chunk)
    pred32 = pred_out.astype(jnp.float32)
    if _joint_pallas_ok(jp, cdt, pred_out.shape[1]):
        from .pallas.joint_lp import joint_lp_fwd_pallas

        encp = _mmc(enc_p, jp.w_enc, cdt)
        pp = _pred_proj(pred32, jp, cdt)
        lpb, lpe = joint_lp_fwd_pallas(
            encp, pp, jp.w_out, jp.b_out, labels, blank,
            interpret=jax.default_backend() != "tpu",
            w_dtype=_joint_w_dtype(cdt),
        )
    else:
        lpb, lpe = _all_lp(enc_p, pred32, jp, labels, blank, t_chunk, cdt)
    alpha, lpe_m = _forward_alphas(lpb, lpe, yl)
    log_z = _terminal_gather(alpha, lpb, fl, yl)
    return -log_z, (lpb, lpe_m, alpha, log_z)


def _fused_fwd(enc_out, pred_out, jp, labels, fl, yl, blank, t_chunk,
               cdt=None):
    loss, aux = _fused_fwd_impl(enc_out, pred_out, jp, labels, fl, yl, blank,
                                t_chunk, cdt)
    # the DP inputs/outputs are V-free ([N,T,U1] — a few MB at train
    # shapes), so carrying them as residuals is cheap and saves the
    # backward an entire joint-lattice recompute pass; only the [.,V]
    # logits are ever rebuilt (chunked / in-kernel)
    return loss, (enc_out, pred_out, jp, labels, fl, yl) + aux


def _fused_bwd(blank, t_chunk, cdt, res, g):
    enc_out, pred_out, jp, labels, fl, yl, lpb, lpe_m, alpha, log_z = res
    enc_out32 = enc_out.astype(jnp.float32)
    pred_out32 = pred_out.astype(jnp.float32)
    n, t_orig, h = enc_out.shape
    u1 = pred_out.shape[1]

    enc_p, t = _pad_time(enc_out32, t_chunk)
    use_pallas = _joint_pallas_ok(jp, cdt, u1)
    beta = _backward_betas(lpb, lpe_m, fl, yl)

    occ_blank, occ_emit = _occupancies(lpb, lpe_m, alpha, beta, fl, yl, log_z)
    # d(-logZ)/d lp = -occ, scaled by the upstream cotangent
    g_lpb = -occ_blank * g[:, None, None]
    g_lpe = -occ_emit * g[:, None, None]

    if use_pallas:
        # fused Pallas joint backward: dlogits forms in VMEM and the
        # weight grads accumulate there too — nothing [.,V]-shaped ever
        # hits HBM (ops/pallas/joint_lp.py)
        from .pallas.joint_lp import joint_lp_bwd_pallas

        encp, encp_vjp = jax.vjp(
            lambda e, w: _mmc(e, w, cdt), enc_p, jp.w_enc
        )
        pp, pp_vjp = jax.vjp(
            lambda po, jp_: _pred_proj(po, jp_, cdt), pred_out32, jp
        )
        d_encp, d_pp, d_wout, d_bout = joint_lp_bwd_pallas(
            encp, pp, jp.w_out, jp.b_out, labels, g_lpb, g_lpe, blank,
            interpret=jax.default_backend() != "tpu",
            w_dtype=_joint_w_dtype(cdt),
        )
        d_enc_p, d_wenc = encp_vjp(d_encp)
        d_pred, d_jp_pred = pp_vjp(d_pp)
        d_jp = JointParams(
            w_pred=d_jp_pred.w_pred,
            b_pred=d_jp_pred.b_pred,
            w_enc=d_wenc,
            w_out=d_wout.astype(jp.w_out.dtype),
            b_out=d_bout.astype(jp.b_out.dtype),
        )
        return (
            d_enc_p[:, :t_orig].astype(enc_out.dtype),
            d_pred.astype(pred_out.dtype),
            d_jp,
            None,
            None,
            None,
        )

    # pull back through the joint, chunk by chunk, recomputing logits
    pp = _pred_proj(pred_out32, jp, cdt)
    n_chunks = t // t_chunk
    enc_chunks = enc_p.reshape(n, n_chunks, t_chunk, h).swapaxes(0, 1)
    g_lpb_c = g_lpb.reshape(n, n_chunks, t_chunk, u1).swapaxes(0, 1)
    g_lpe_c = g_lpe.reshape(n, n_chunks, t_chunk, -1).swapaxes(0, 1)

    def chunk_fn(enc_c, pp_, jp_):
        return _chunk_lp(enc_c, pp_, jp_, labels, blank, cdt)

    def body(carry, xs):
        d_pp_acc, d_jp_acc = carry
        enc_c, gb, ge = xs
        _, vjp_fn = jax.vjp(chunk_fn, enc_c, pp, jp)
        d_enc_c, d_pp, d_jp = vjp_fn((gb, ge))
        d_pp_acc = d_pp_acc + d_pp
        d_jp_acc = jax.tree_util.tree_map(jnp.add, d_jp_acc, d_jp)
        return (d_pp_acc, d_jp_acc), d_enc_c

    zero_jp = jax.tree_util.tree_map(jnp.zeros_like, jp)
    (d_pp, d_jp), d_enc_chunks = jax.lax.scan(
        body, (jnp.zeros_like(pp), zero_jp), (enc_chunks, g_lpb_c, g_lpe_c)
    )
    d_enc = d_enc_chunks.swapaxes(0, 1).reshape(n, t, h)[:, :t_orig]

    # pred_out grad: through the pred projection
    _, pp_vjp = jax.vjp(
        lambda po, jp_: _pred_proj(po, jp_, cdt), pred_out32, jp
    )
    d_pred, d_jp2 = pp_vjp(d_pp)
    d_jp = jax.tree_util.tree_map(jnp.add, d_jp, d_jp2)

    return (
        d_enc.astype(enc_out.dtype),
        d_pred.astype(pred_out.dtype),
        d_jp,
        None,
        None,
        None,
    )


rnnt_loss_fused.defvjp(_fused_fwd, _fused_bwd)


def joint_params_from_flax(joint_variables) -> JointParams:
    """Extract JointParams from a flax Joint module's param dict
    (models/modules.Joint, method='concat')."""
    p = joint_variables
    return JointParams(
        w_pred=p["pred_proj"]["kernel"],
        b_pred=p["pred_proj"]["bias"],
        w_enc=p["enc_proj"]["kernel"],
        w_out=p["out"]["kernel"],
        b_out=p["out"]["bias"],
    )
