"""Fused RNN-T joint log-prob kernels (flash-attention-style).

The fused loss (ops/fused_loss.py) reduces each joint-logits chunk
[N,Tc,U1,V] to lp_blank/lp_emit immediately — but XLA still round-trips
the chunk's `hidden` [.,J] and `logits` [.,V] tensors through HBM
(hundreds of MB per step at the flagship shape; measured bandwidth-bound
at ~50% MXU peak, and the backward pays it ~3x). These kernels keep the
whole tile pipeline in VMEM:

- forward: per (n, T-block) tile, hidden = tanh(enc_proj + pred_proj)
  and logits = hidden @ W_out are computed and reduced to the DP inputs
  (logsumexp, blank column, label gather) without ever leaving VMEM.
  W_out (bf16, 4 MB at J=1024/V=2048) is resident for the whole grid.
- backward: recomputes the tile, forms dlogits from the occupancy
  cotangents (g_lpb/g_lpe) in VMEM, and accumulates ALL weight grads in
  VMEM scratch across the grid: dW_out [J,V] f32 (8 MB) and db_out
  stream out once at the last grid step; d_pred_proj accumulates per-n.
  Only the small [.,J] / [.,Up] arrays ever hit HBM.

Layout strategy: every HBM-side array keeps its natural XLA shape —
enc/pred projections [N,T,J]/[N,Up,J], labels [N,Up], cotangents and lp
outputs [N,T,Up]. (The first version of these kernels moved lattice
rows as [N, T*Up, 1] arrays; a trailing dim of 1 pads every element to
a full 128-lane tile in the TPU tiled layout, so XLA inserted layout-
conversion copies at every custom-call boundary — measured ~1.5 ms of
overhead inside the full train step, enough to lose to the XLA chunked
path it beats standalone.) The (t, u) lattice rows exist ONLY in VMEM:
Mosaic rejects lane<->sublane shape casts, so the [BT,Up] <-> [R=BT*Up]
expansions run as exact 0/1 selector matmuls built from iota compares
(rows = sel_t^T @ enc + sel_u^T @ pred; block = sel_t @ (rows*mask_u)).
The U axis is padded to a multiple of 8; padded rows carry label -1
(matches nothing) and zero cotangents, contributing exactly nothing.

Role: the memory plan of the reference's warp_rnnt extern
(models.py:345-359 materializes the full lattice), redesigned for TPU
VMEM. The label gather runs as an iota-compare masked reduce — TPU has
no fast lane gather, but a [.,V] compare+select+sum is one VPU sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# T rows per tile: BT*Up matmul rows (384 at padded U1=48) keeps the
# MXU fed; the tile's hidden/logits temporaries + the resident W_out
# (bf16) and the backward's dW accumulator (f32) must fit ~16 MB VMEM.
_BT = 8

# Largest padded U1 the kernels accept: the fwd kernel materializes one
# tile's full [BT*Up, V] logits in VMEM, and _n_slices can only honor
# its <=96-rows-per-slice bound for BT*Up <= 8*96. The eligibility gate
# (fused_loss._joint_pallas_ok) routes longer-label batches to the XLA
# chunked path instead of failing Mosaic VMEM allocation.
MAX_U1 = 96


def _n_slices(r: int) -> int:
    """Backward row-slices per tile: bound the live [rows, V]
    temporaries to <=96 rows regardless of the label length (VMEM must
    hold them next to the resident W_out / dW blocks)."""
    for n in (1, 2, 4, 8):
        if r % n == 0 and r // n <= 96:
            return n
    raise ValueError(
        f"joint_lp: {r} lattice rows per tile exceeds the VMEM slicing "
        f"bound (padded U1 must be <= {MAX_U1}; gate on MAX_U1)"
    )


def _selectors(bt: int, up: int):
    """Exact 0/1 matrices mapping lattice rows (row-major t*Up+u) to
    their t (sel_t [bt, R]) and u (sel_u [up, R]) coordinates, plus the
    elementwise row->u one-hot mask_u [R, up]."""
    r = bt * up
    row_t = jax.lax.broadcasted_iota(jnp.int32, (bt, r), 1) // up
    sel_t = (row_t == jax.lax.broadcasted_iota(jnp.int32, (bt, r), 0))
    row_u = jax.lax.broadcasted_iota(jnp.int32, (up, r), 1) % up
    sel_u = (row_u == jax.lax.broadcasted_iota(jnp.int32, (up, r), 0))
    row_u_col = jax.lax.broadcasted_iota(jnp.int32, (r, up), 0) % up
    mask_u = (row_u_col == jax.lax.broadcasted_iota(jnp.int32, (r, up), 1))
    return (
        sel_t.astype(jnp.float32),
        sel_u.astype(jnp.float32),
        mask_u.astype(jnp.float32),
    )


def _tile_rows(encp_ref, predp_ref, sel_t, sel_u):
    """Row-expand the tile: [R, J] = sel_t^T @ enc + sel_u^T @ pred."""
    enc_rows = jax.lax.dot_general(
        sel_t, encp_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pred_rows = jax.lax.dot_general(
        sel_u, predp_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.tanh(enc_rows + pred_rows)


def _rows_from_block(block, sel_t, mask_u):
    """[BT, Up] block -> [R, 1] row-major rows: temp = sel_t^T @ block
    gives temp[r, u] = block[t(r), u]; the one-hot mask_u selects u(r)."""
    temp = jax.lax.dot_general(
        sel_t, block,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [R, Up]
    return jnp.sum(temp * mask_u, axis=1, keepdims=True)


def _block_from_rows(rows, sel_t, mask_u):
    """[R, 1] rows -> [BT, Up] block: scatter each row's value to its
    (t, u) cell (exact: sel_t/mask_u are 0/1 with one hit per row)."""
    return jax.lax.dot_general(
        sel_t, rows * mask_u,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _lab_rows(labels_ref, mask_u):
    """Labels block [1, 1, Up] (f32; -1 pads) -> per-row label ids [R, 1]."""
    return jnp.sum(mask_u * labels_ref[0], axis=1, keepdims=True)


def _joint_lp_fwd_kernel(encp_ref, predp_ref, labels_ref, wout_ref, bout_ref,
                         lpb_ref, lpe_ref, *, blank: int):
    bt = encp_ref.shape[1]
    up = predp_ref.shape[1]
    v = wout_ref.shape[1]
    sel_t, sel_u, mask_u = _selectors(bt, up)
    h2 = _tile_rows(encp_ref, predp_ref, sel_t, sel_u)      # [R, J]
    logits = (
        jnp.dot(h2.astype(wout_ref.dtype), wout_ref[:],
                preferred_element_type=jnp.float32)
        + bout_ref[0]
    )                                                       # [R, V]
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    r = bt * up
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, v), 1)
    blank_col = jnp.sum(
        jnp.where(iota == blank, logits, 0.0), axis=-1, keepdims=True
    )
    lab = _lab_rows(labels_ref, mask_u)                     # [R, 1] f32
    emit = jnp.sum(
        jnp.where(iota.astype(jnp.float32) == lab, logits, 0.0),
        axis=-1, keepdims=True,
    )
    lpb_ref[0] = _block_from_rows(blank_col - lse, sel_t, mask_u)
    lpe_ref[0] = _block_from_rows(emit - lse, sel_t, mask_u)


def _joint_dx_kernel(encp_ref, predp_ref, labels_ref, wout_ref, bout_ref,
                     glpb_ref, glpe_ref,
                     dencp_ref, dpredp_ref, lse_ref, *, blank: int):
    """Backward part 1: d_enc_proj / d_pred_proj (needs the full-V
    contraction dlogits @ W_out^T, so W_out stays whole) plus the row
    logsumexp, which part 2 consumes to softmax V-chunks locally.
    d_pred accumulates directly into its (per-n constant, consecutively
    revisited) output block."""
    t_id = pl.program_id(1)
    bt = encp_ref.shape[1]
    up = predp_ref.shape[1]
    v = wout_ref.shape[1]

    @pl.when(t_id == 0)
    def _():
        dpredp_ref[0] = jnp.zeros(dpredp_ref.shape[1:], dpredp_ref.dtype)

    sel_t, sel_u, mask_u = _selectors(bt, up)
    r = bt * up
    glpb_rows = _rows_from_block(glpb_ref[0], sel_t, mask_u)    # [R, 1]
    glpe_rows = _rows_from_block(glpe_ref[0], sel_t, mask_u)
    lab_rows = _lab_rows(labels_ref, mask_u)
    n_sl = _n_slices(r)
    half = r // n_sl
    dencp_acc = jnp.zeros((bt, encp_ref.shape[2]), jnp.float32)
    lse_acc = jnp.zeros((bt, up), jnp.float32)
    for sidx in range(n_sl):
        sl = slice(sidx * half, (sidx + 1) * half)
        st, su = sel_t[:, sl], sel_u[:, sl]
        # recompute this slice's rows: MUST stay bitwise-identical to
        # the forward kernel, hence the shared _tile_rows
        h2 = _tile_rows(encp_ref, predp_ref, st, su)        # [half, J]
        logits = (
            jnp.dot(h2.astype(wout_ref.dtype), wout_ref[:],
                    preferred_element_type=jnp.float32)
            + bout_ref[0]
        )
        m = jnp.max(logits, axis=-1, keepdims=True)
        lse = m + jnp.log(
            jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
        )
        # scatter this slice's lse into the [BT, Up] output block
        lse_acc = lse_acc + _block_from_rows(lse, st, mask_u[sl])
        p = jnp.exp(logits - lse)                           # [half, V]

        glpb = glpb_rows[sl]                                # [half, 1]
        glpe = glpe_rows[sl]                                # 0 on pads
        rowg = glpb + glpe
        lab = lab_rows[sl]
        iota = jax.lax.broadcasted_iota(jnp.int32, (half, v), 1)
        dlogits = (
            jnp.where(iota == blank, glpb, 0.0)
            + jnp.where(iota.astype(jnp.float32) == lab, glpe, 0.0)
            - p * rowg
        )
        dh2 = jax.lax.dot_general(
            dlogits.astype(wout_ref.dtype), wout_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 - h2 * h2)
        dencp_acc = dencp_acc + jax.lax.dot_general(
            st, dh2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dpredp_ref[0] += jax.lax.dot_general(
            su, dh2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dencp_ref[0] = dencp_acc
    lse_ref[0] = lse_acc


def _joint_dw_kernel(encp_ref, predp_ref, labels_ref, woutc_ref, boutc_ref,
                     glpb_ref, glpe_ref, lse_ref,
                     dwc_ref, dbc_ref, *, blank: int, vc: int):
    """Backward part 2: dW_out / db_out over one V-chunk. The V-chunk
    grid axis is OUTERMOST, so each chunk's [J, VC] output block stays
    VMEM-resident across its whole (n, t) sweep (consecutive revisits)
    and flushes once — 4 MB instead of the full 8 MB dW next to the
    rest. Chunk softmax uses the row lse from part 1."""
    q = pl.program_id(0)
    n_id = pl.program_id(1)
    t_id = pl.program_id(2)
    bt = encp_ref.shape[1]
    up = predp_ref.shape[1]

    @pl.when((n_id == 0) & (t_id == 0))
    def _():
        dwc_ref[:] = jnp.zeros(dwc_ref.shape, dwc_ref.dtype)
        dbc_ref[:] = jnp.zeros(dbc_ref.shape, dbc_ref.dtype)

    sel_t, sel_u, mask_u = _selectors(bt, up)
    r = bt * up
    glpb_rows = _rows_from_block(glpb_ref[0], sel_t, mask_u)
    glpe_rows = _rows_from_block(glpe_ref[0], sel_t, mask_u)
    lse_rows = _rows_from_block(lse_ref[0], sel_t, mask_u)
    lab_rows = _lab_rows(labels_ref, mask_u)
    n_sl = _n_slices(r)
    half = r // n_sl
    base = q * vc
    for sidx in range(n_sl):
        sl = slice(sidx * half, (sidx + 1) * half)
        st, su = sel_t[:, sl], sel_u[:, sl]
        # same bitwise recompute contract as _joint_dx_kernel
        h2 = _tile_rows(encp_ref, predp_ref, st, su)        # [half, J]
        logits_c = (
            jnp.dot(h2.astype(woutc_ref.dtype), woutc_ref[:],
                    preferred_element_type=jnp.float32)
            + boutc_ref[0]
        )                                                   # [half, VC]
        p_c = jnp.exp(logits_c - lse_rows[sl])

        glpb = glpb_rows[sl]
        glpe = glpe_rows[sl]
        rowg = glpb + glpe
        lab = lab_rows[sl]
        iota = base + jax.lax.broadcasted_iota(jnp.int32, (half, vc), 1)
        dlogits_c = (
            jnp.where(iota == blank, glpb, 0.0)
            + jnp.where(iota.astype(jnp.float32) == lab, glpe, 0.0)
            - p_c * rowg
        )
        dwc_ref[:] += jax.lax.dot_general(
            h2.astype(woutc_ref.dtype), dlogits_c.astype(woutc_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbc_ref[:] += jnp.sum(dlogits_c, axis=0, keepdims=True)


def _pad_axis1(x, mult):
    pad = (-x.shape[1]) % mult
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def _prep(enc_proj, pred_proj, labels):
    """Pad T to _BT and U to a multiple of 8. Labels stay [N, Up] (f32
    ids; -1 padding matches no vocab id) — the per-tile row expansion
    happens in VMEM inside the kernels."""
    n, t0, _ = enc_proj.shape
    u1 = pred_proj.shape[1]
    up = u1 + ((-u1) % 8)
    enc_p = _pad_axis1(enc_proj.astype(jnp.float32), _BT)
    pred_p = _pad_axis1(pred_proj.astype(jnp.float32), 8)
    lab = jnp.full((n, up), -1.0, jnp.float32)
    lab = lab.at[:, : labels.shape[1]].set(labels.astype(jnp.float32))
    # rank-3 [N, 1, Up] so the block's last two dims (1, Up) match the
    # array dims exactly (Mosaic block tiling rule)
    return enc_p, pred_p, lab[:, None, :], t0, u1, up


def _lp_spec(up):
    """[N, T, Up] lattice-shaped arrays, one [1, BT, Up] block per tile."""
    return pl.BlockSpec((1, _BT, up), lambda i, k: (i, k, 0),
                        memory_space=pltpu.VMEM)


def _lab_spec(up):
    return pl.BlockSpec((1, 1, up), lambda i, k: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("blank", "interpret", "w_dtype"))
def joint_lp_fwd_pallas(enc_proj, pred_proj, w_out, b_out, labels,
                        blank: int = 0, *, interpret: bool = False,
                        w_dtype=jnp.bfloat16):
    """enc_proj [N,T,J] f32, pred_proj [N,U1,J] f32, w_out [J,V], b_out
    [V], labels [N,U] int32 (U == U1-1).
    Returns (lp_blank [N,T,U1], lp_emit [N,T,U])."""
    n, _, j = enc_proj.shape
    v = w_out.shape[1]
    enc_p, pred_p, lab, t0, u1, up = _prep(enc_proj, pred_proj, labels)
    t = enc_p.shape[1]
    nt = t // _BT

    lpb, lpe = pl.pallas_call(
        functools.partial(_joint_lp_fwd_kernel, blank=blank),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, _BT, j), lambda i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, up, j), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _lab_spec(up),
            pl.BlockSpec((j, v), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(_lp_spec(up), _lp_spec(up)),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, up), jnp.float32),
            jax.ShapeDtypeStruct((n, t, up), jnp.float32),
        ),
        interpret=interpret,
    )(
        enc_p,
        pred_p,
        lab,
        w_out.astype(w_dtype),
        b_out.reshape(1, v).astype(jnp.float32),
    )
    return lpb[:, :t0, :u1], lpe[:, :t0, : u1 - 1]


@functools.partial(jax.jit, static_argnames=("blank", "interpret", "w_dtype"))
def joint_lp_bwd_pallas(enc_proj, pred_proj, w_out, b_out, labels,
                        g_lpb, g_lpe, blank: int = 0, *,
                        interpret: bool = False, w_dtype=jnp.bfloat16):
    """Cotangents of joint_lp_fwd_pallas w.r.t. (enc_proj, pred_proj,
    w_out, b_out). g_lpb [N,T,U1], g_lpe [N,T,U]."""
    n, _, j = enc_proj.shape
    v = w_out.shape[1]
    enc_p, pred_p, lab, t0, u1, up = _prep(enc_proj, pred_proj, labels)
    t = enc_p.shape[1]
    nt = t // _BT

    def pad_g(g):
        g = g.astype(jnp.float32)
        return jnp.pad(
            g, ((0, 0), (0, t - g.shape[1]), (0, up - g.shape[2]))
        )

    wq = w_out.astype(w_dtype)
    bq = b_out.reshape(1, v).astype(jnp.float32)
    gb = pad_g(g_lpb)
    ge = pad_g(g_lpe)

    dencp, dpredp, lse_lat = pl.pallas_call(
        functools.partial(_joint_dx_kernel, blank=blank),
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, _BT, j), lambda i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, up, j), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _lab_spec(up),
            pl.BlockSpec((j, v), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
            _lp_spec(up),
            _lp_spec(up),
        ],
        out_specs=(
            pl.BlockSpec((1, _BT, j), lambda i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, up, j), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            _lp_spec(up),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, j), jnp.float32),
            jax.ShapeDtypeStruct((n, up, j), jnp.float32),
            jax.ShapeDtypeStruct((n, t, up), jnp.float32),
        ),
        interpret=interpret,
    )(enc_p, pred_p, lab, wq, bq, gb, ge)

    # dW/db over V-chunks; the chunk axis is outermost so each [J, VC]
    # output block accumulates VMEM-resident across its (n, t) sweep
    vc = v if v % 1024 else 1024
    nv = v // vc
    dwout, dbout = pl.pallas_call(
        functools.partial(_joint_dw_kernel, blank=blank, vc=vc),
        grid=(nv, n, nt),
        in_specs=[
            pl.BlockSpec((1, _BT, j), lambda q, i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, up, j), lambda q, i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, up), lambda q, i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, vc), lambda q, i, k: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vc), lambda q, i, k: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BT, up), lambda q, i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BT, up), lambda q, i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BT, up), lambda q, i, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((j, vc), lambda q, i, k: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, vc), lambda q, i, k: (0, q),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((j, v), jnp.float32),
            jax.ShapeDtypeStruct((1, v), jnp.float32),
        ),
        interpret=interpret,
    )(enc_p, pred_p, lab, wq, bq, gb, ge, lse_lat)

    return (
        dencp[:, :t0],
        dpredp[:, :u1],
        dwout,
        dbout.reshape(v),
    )
