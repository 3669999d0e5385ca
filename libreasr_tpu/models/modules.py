"""Neural network building blocks (flax.linen).

TPU-native redesign of the reference's model layer
(libreasr/lib/models.py, layers/custom_rnn.py): all stream/batch state is
explicit functional carry; the joint network is expressed as a broadcast
add of separately projected encoder/predictor terms so the [N,T,U,2H]
concat from models.py:345-353 is never materialized.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import rnn as rnn_ops

_WARNED: set = set()


def _warn_once(key: str, msg: str) -> None:
    """Perf-visibility warnings (printed once per process): silent
    fast-path fallbacks cost 1.3-2x train time without a trace."""
    if key not in _WARNED:
        _WARNED.add(key)
        import sys

        print(f"[libreasr_tpu] {msg}", file=sys.stderr)


class ResidualAdapter(nn.Module):
    """Multilingual residual adapter (reference ResidualAdapter,
    models.py:28-65, after https://ai.googleblog.com/2019/09): LayerNorm
    -> bottleneck down -> activation -> up -> residual. Bottleneck is
    rounded up to a multiple of 8 like the reference (:46-47)."""

    hidden_sz: int
    projection_factor: float = 3.2

    @nn.compact
    def __call__(self, x):
        bott = int(self.hidden_sz / self.projection_factor)
        bott = bott + (8 - bott % 8)
        h = nn.LayerNorm(name="layer_norm")(x)
        h = nn.Dense(bott, name="down")(h)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_sz, name="up")(h)
        return h + x


class RNNLayer(nn.Module):
    """One recurrent layer with learnable initial state
    (reference custom_rnn.py:75-82,112-117)."""

    input_sz: int
    hidden_sz: int
    rnn_type: str = "LSTM"       # LSTM | GRU | NBRC | LN_LSTM
    zoneout: float = 0.0
    dropconnect: float = 0.0
    compute_dtype: Any = None
    # "pack": zero outputs + freeze state past `lengths` (torch
    # pack_padded, the reference's LSTM/GRU path); "haste": full-length
    # outputs, returned state read off at `lengths` (the reference's
    # NBRC path, layers/haste/base_rnn.py:49-60)
    length_mode: str = "pack"
    # inference fast path: fused Pallas kernel with the recurrent matrix
    # resident in VMEM (ops/pallas/lstm.py; 2-3.5x over the scan cell on
    # v5e at encode shapes). Engaged only when it is exact-equivalent:
    # eval, LSTM, pack semantics, no zoneout, f32 cells, TPU backend,
    # and a sequence long enough to amortize the launch.
    use_pallas: bool = False
    # training fast path: the same fused forward plus a reverse-time
    # Pallas backward (custom_vjp, ops/pallas/lstm.py:lstm_train_core).
    # Gradient-exact vs the scan path (tests/test_pallas_lstm.py).
    use_pallas_train: bool = False

    def _backend_ok(self) -> bool:
        # LIBREASR_FORCE_PALLAS=1 engages the kernels in interpret mode
        # on CPU so tests cover these branches without TPU hardware
        import os

        return jax.default_backend() == "tpu" or (
            os.environ.get("LIBREASR_FORCE_PALLAS") == "1"
        )

    def _tiles_ok(self) -> bool:
        # the kernels slice gate lanes as v[:, k*H:(k+1)*H]; on hardware
        # H must be lane-aligned (128) or Mosaic can mis-tile / fail to
        # compile — fall back to the scan path for odd widths. Interpret
        # mode (forced-CI) has no lane constraints.
        if jax.default_backend() != "tpu":
            return True
        return self.hidden_sz % 128 == 0

    def _pallas_eligible(self, cell_params, x, train: bool) -> bool:
        if not self.use_pallas or train:
            return False
        if self.rnn_type != "LSTM" or self.length_mode != "pack":
            return False
        if self.zoneout != 0.0 or x.shape[1] < 16:
            return False
        if not self._tiles_ok():
            return False
        # int8-quantized cells dispatch to the int8 kernel variant
        # inside lstm_pack_pallas — eligible too
        return self._backend_ok()

    def _pallas_train_eligible(self, cell_params, x, train: bool) -> bool:
        if not self.use_pallas_train or not train:
            return False
        if self.rnn_type != "LSTM" or self.length_mode != "pack":
            return False
        # DropConnect is compatible: the mask multiplies R ONCE per call
        # (haste semantics, ops/rnn.py:_drop_connect) outside the
        # custom-VJP core, so gradients flow through it as plain XLA.
        # Zoneout mixes state per TIMESTEP inside the recurrence — that
        # needs kernel support; fall back to the scan path and say so
        # loudly once (r4 verdict #8: a silent 1.3-2x train-time cost).
        if self.zoneout != 0.0:
            _warn_once(
                "pallas-train-zoneout",
                f"RNNLayer(hidden={self.hidden_sz}): zoneout="
                f"{self.zoneout} is not supported by the fused Pallas "
                "training kernel; using the (1.3-2x slower) scan path. "
                "DropConnect IS fused-path compatible — consider "
                "dropconnect for recurrent regularization.",
            )
            return False
        if x.shape[1] < 16:
            return False
        if not self._tiles_ok():
            return False
        # R residency dtype follows the compute policy (no silent bf16
        # cast for f32 training): with no/an f32 policy R stays f32 in
        # VMEM, which only fits the budget at smaller widths — larger
        # f32-policy models keep the (numerically f32) scan path
        r_itemsize = (
            jnp.dtype(self.compute_dtype).itemsize
            if self.compute_dtype is not None
            else 4
        )
        if self.hidden_sz * 4 * self.hidden_sz * r_itemsize > 9 * 2**20:
            return False
        from ..ops.quant import QuantizedTensor

        if isinstance(cell_params.recurrent_kernel, QuantizedTensor):
            return False  # quantized cells never train
        return self._backend_ok()

    def initial_state(self, params_scope_unused, batch: int):
        """Expand the learnable h0 to a batch (called via .apply)."""
        n_state = rnn_ops.CELLS[self.rnn_type][2]
        h0 = self.get_variable("params", "h0")
        return tuple(
            jnp.broadcast_to(h0[i], (batch, self.hidden_sz)) for i in range(n_state)
        )

    @nn.compact
    def __call__(self, x, state=None, lengths=None, train: bool = False):
        scan_fn, init_fn, n_state = rnn_ops.CELLS[self.rnn_type]
        if self.has_variable("params", "cell"):
            # raw fetch (no shape validation): serving may swap the cell
            # matrices for int8 QuantizedTensor leaves (ops.quant), whose
            # pytree structure differs from the f32 init template
            cell_params = self.get_variable("params", "cell")
        else:
            cell_params = self.param(
                "cell", lambda rng: init_fn(rng, self.input_sz, self.hidden_sz)
            )
        h0 = self.param(
            "h0", nn.initializers.zeros, (n_state, 1, self.hidden_sz)
        )
        if state is None:
            state = tuple(
                jnp.broadcast_to(h0[i], (x.shape[0], self.hidden_sz))
                for i in range(n_state)
            )
        rng = None
        if train and (self.zoneout > 0 or self.dropconnect > 0):
            rng = self.make_rng("dropout")
        if self._pallas_train_eligible(cell_params, x, train):
            from ..ops.pallas.lstm import lstm_pack_train_pallas

            cp = cell_params
            if train and self.dropconnect > 0 and rng is not None:
                # same mask stream as the scan path (fold_in(rng, 1)) so
                # the two paths are numerically identical under one rng;
                # the masked R is differentiable plain XLA outside the
                # kernel's custom VJP
                cp = cp._replace(
                    recurrent_kernel=rnn_ops._drop_connect(
                        cp.recurrent_kernel,
                        jax.random.fold_in(rng, 1), self.dropconnect,
                    )
                )
            return lstm_pack_train_pallas(
                x, tuple(state), cp, lengths,
                compute_dtype=self.compute_dtype,
                interpret=jax.default_backend() != "tpu",
            )
        if self._pallas_eligible(cell_params, x, train):
            from ..ops.pallas.lstm import lstm_pack_pallas

            return lstm_pack_pallas(
                x, tuple(state), cell_params, lengths,
                interpret=jax.default_backend() != "tpu",
            )
        y, new_state = scan_fn(
            x,
            tuple(state),
            cell_params,
            lengths=lengths,
            zoneout=self.zoneout,
            dropconnect=self.dropconnect,
            rng=rng,
            training=train,
            compute_dtype=self.compute_dtype,
            length_mode=self.length_mode,
        )
        return y, new_state


class MaskedBatchNorm(nn.Module):
    """BatchNorm over features whose batch statistics come from VALID
    (unpadded) frames only. The reference's per-layer BN sees packed
    sequences (custom_rnn.py:210-213 via pack_padded_sequence), so
    padded positions never pollute its statistics; normalizing padded
    frames too makes each bucket's batch stats depend on its padding
    fraction, and the momentum-averaged running stats then fit no
    bucket at eval. Param/stat names and eval math are IDENTICAL to
    flax nn.BatchNorm (scale/bias params, mean/var batch_stats), so
    existing checkpoints and golden bundles load unchanged."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        if train:
            xf = x.astype(jnp.float32)
            if lengths is None:
                mean = xf.mean(axis=(0, 1))
                var = xf.var(axis=(0, 1))
            else:
                mask = (
                    jnp.arange(x.shape[1])[None, :] < lengths[:, None]
                ).astype(jnp.float32)[..., None]
                denom = jnp.maximum(mask.sum(), 1.0)
                mean = (xf * mask).sum(axis=(0, 1)) / denom
                var = (jnp.square(xf - mean) * mask).sum(axis=(0, 1)) / denom
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class RNNStack(nn.Module):
    """Multi-layer RNN stack: per-layer BatchNorm over features, optional
    inter-layer time reduction and rezero residual
    (reference CustomRNN.forward, custom_rnn.py:177-232)."""

    input_sz: int
    hidden_sz: int
    num_layers: int
    rnn_type: str = "LSTM"
    layer_norm: bool = False
    zoneout: float = 0.0
    dropconnect: float = 0.0
    reduction_indices: tuple = ()
    reduction_factors: tuple = ()
    rezero: bool = False
    use_norm: bool = True
    norm: str = "batch"  # "batch" | "layer" | "none" (with use_norm)
    compute_dtype: Any = None
    length_mode: str = "pack"  # see RNNLayer.length_mode
    use_pallas: bool = False   # see RNNLayer.use_pallas
    use_pallas_train: bool = False  # see RNNLayer.use_pallas_train

    def _cell_type(self) -> str:
        if self.rnn_type == "LSTM" and self.layer_norm:
            return "LN_LSTM"
        return self.rnn_type

    @nn.compact
    def __call__(self, x, state=None, lengths=None, train: bool = False):
        residual = None
        new_states = []
        in_sz = self.input_sz
        for i in range(self.num_layers):
            if i in self.reduction_indices:
                factor = self.reduction_factors[
                    list(self.reduction_indices).index(i)
                ]
                x, lengths = rnn_ops.time_reduce(x, lengths, factor)
            inp = x
            layer = RNNLayer(
                input_sz=in_sz,
                hidden_sz=self.hidden_sz,
                rnn_type=self._cell_type(),
                zoneout=self.zoneout,
                dropconnect=self.dropconnect,
                compute_dtype=self.compute_dtype,
                length_mode=self.length_mode,
                use_pallas=self.use_pallas,
                use_pallas_train=self.use_pallas_train,
                name=f"layer{i}",
            )
            x, st = layer(
                x, state=None if state is None else state[i],
                lengths=lengths, train=train,
            )
            if self.use_norm and self.norm == "batch":
                x = MaskedBatchNorm(name=f"norm{i}")(
                    x, lengths=lengths, train=train
                )
            elif self.use_norm and self.norm == "layer":
                # per-sample statistics: no train/eval gap. BatchNorm's
                # batch statistics are themselves informative when
                # batches are homogeneous (small/synthetic corpora,
                # same-bucket packing) — the model exploits them in
                # training and collapses at eval under running stats
                # (measured: same batch, batch-stats loss 0.036 vs
                # running-stats 25.6). "layer" opts out of that
                # pathology; "batch" stays default for reference parity.
                x = nn.LayerNorm(name=f"norm{i}")(x)
            if self.rezero and residual is not None and residual.shape == x.shape:
                x = x + residual
            residual = inp
            new_states.append(st)
            in_sz = self.hidden_sz
        return x, tuple(new_states)


class Encoder(nn.Module):
    """Audio encoder: input LayerNorm -> RNN stack -> dropout -> proj
    (reference Encoder, models.py:68-113)."""

    feature_sz: int
    hidden_sz: int
    out_sz: int
    num_layers: int = 6
    dropout: float = 0.01
    rnn_type: str = "LSTM"
    layer_norm: bool = False
    norm: str = "batch"  # inter-layer norm: "batch" | "layer" | "none"
    zoneout: float = 0.0
    dropconnect: float = 0.0
    reduction_indices: tuple = ()
    reduction_factors: tuple = ()
    compute_dtype: Any = None
    use_pallas: bool = False
    use_pallas_train: bool = False

    @nn.compact
    def __call__(self, x, state=None, lengths=None, train: bool = False):
        x = x.reshape(x.shape[0], x.shape[1], -1)
        x = nn.LayerNorm(name="input_norm")(x)
        x, state = RNNStack(
            input_sz=self.feature_sz,
            hidden_sz=self.hidden_sz,
            num_layers=self.num_layers,
            rnn_type=self.rnn_type,
            layer_norm=self.layer_norm,
            norm=self.norm,
            zoneout=self.zoneout,
            dropconnect=self.dropconnect,
            reduction_indices=self.reduction_indices,
            reduction_factors=self.reduction_factors,
            compute_dtype=self.compute_dtype,
            # reference dispatch (custom_rnn.py:20-49): LSTM/GRU run
            # through torch pack_padded, NBRC through haste
            length_mode="haste" if self.rnn_type == "NBRC" else "pack",
            use_pallas=self.use_pallas,
            use_pallas_train=self.use_pallas_train,
            name="rnn_stack",
        )(x, state=state, lengths=lengths, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.hidden_sz != self.out_sz:
            x = nn.Dense(self.out_sz, name="proj")(x)
        return x, state


class Predictor(nn.Module):
    """Label predictor: embed -> ffn -> RNN stack -> dropout -> proj
    (reference Predictor, models.py:143-187). blank embeddings are pinned
    to zero (torch padding_idx semantics)."""

    vocab_sz: int
    embed_sz: int
    hidden_sz: int
    out_sz: int
    num_layers: int = 2
    dropout: float = 0.01
    blank: int = 0
    rnn_type: str = "NBRC"
    layer_norm: bool = False
    norm: str = "batch"  # inter-layer norm: "batch" | "layer" | "none"
    zoneout: float = 0.0
    dropconnect: float = 0.0
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, y, state=None, lengths=None, train: bool = False):
        emb = nn.Embed(self.vocab_sz, self.embed_sz, name="embed")(y)
        emb = jnp.where((y == self.blank)[..., None], 0.0, emb)
        if self.embed_sz != self.hidden_sz:
            emb = nn.Dense(self.hidden_sz, name="ffn")(emb)
        x, state = RNNStack(
            input_sz=self.hidden_sz,
            hidden_sz=self.hidden_sz,
            num_layers=self.num_layers,
            rnn_type=self.rnn_type,
            layer_norm=self.layer_norm,
            norm=self.norm,
            zoneout=self.zoneout,
            dropconnect=self.dropconnect,
            compute_dtype=self.compute_dtype,
            length_mode="haste" if self.rnn_type == "NBRC" else "pack",
            name="rnn_stack",
        )(x=emb, state=state, lengths=lengths, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.hidden_sz != self.out_sz:
            x = nn.Dense(self.out_sz, name="proj")(x)
        return x, state


class Joint(nn.Module):
    """Joint network (reference Joint, models.py:116-140).

    ``concat`` is decomposed as two projections with a broadcast add:
    tanh(h_pred @ W_p + h_enc @ W_e + b) @ W_out — algebraically equal to
    Linear(cat(h_pred, h_enc)) but never materializes the [.., 2H] concat
    across the [N,T,U] lattice (the reference's memory hot spot,
    models.py:345-353).
    """

    out_sz: int
    joint_sz: int
    vocab_sz: int
    method: str = "concat"
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, h_pred, h_enc):
        dt = self.compute_dtype
        if self.method == "concat":
            a = nn.Dense(self.joint_sz, dtype=dt, name="pred_proj")(h_pred)
            b = nn.Dense(self.joint_sz, use_bias=False, dtype=dt, name="enc_proj")(h_enc)
            x = a + b
        elif self.method == "add":
            x = nn.Dense(self.joint_sz, dtype=dt, name="pred_proj")(h_pred + h_enc)
        else:
            raise ValueError(f"no such joint method: {self.method}")
        x = jnp.tanh(x)
        return nn.Dense(self.vocab_sz, dtype=dt, name="out")(x)
