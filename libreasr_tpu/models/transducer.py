"""RNN-Transducer model (reference Transducer, models.py:190-577).

Differences from the reference are all TPU-motivated:
- `__call__` returns the raw joint logits lattice [N, T, U+1, V]; the
  log_softmax lives inside the RNN-T loss (ops/rnnt_loss.py) so XLA can
  fuse it with the DP and the bwd pass recomputes instead of storing.
- encoder/predictor state is explicit carry (pytrees), shared between
  training, batched greedy decode and streaming.
- the tmp-BOS / tmp-state caches (models.py:287-306,
  custom_rnn.py:144-158) become explicit inputs owned by the train step
  (training/learner.py) — no hidden Python-object state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .modules import Encoder, Joint, Predictor


@dataclass(frozen=True)
class TransducerConfig:
    feature_sz: int = 1280
    embed_sz: int = 512
    vocab_sz: int = 2048
    hidden_sz: int = 1024
    out_sz: int = 1024
    joint_sz: int = 1024
    blank: int = 0
    bos: int = 2  # hardcoded in the reference too (models.py:227)
    joint_method: str = "concat"
    enc_num_layers: int = 6
    enc_dropout: float = 0.05
    enc_rnn_type: str = "LSTM"
    enc_layer_norm: bool = False
    # inter-layer norm: "batch" (reference parity) | "layer" (no
    # train/eval statistics gap — see models/modules.py MaskedBatchNorm
    # note) | "none"
    enc_norm: str = "batch"
    enc_reduction_indices: tuple = ()
    enc_reduction_factors: tuple = ()
    # fused Pallas LSTM for eval-mode encode on TPU (ops/pallas/lstm.py)
    enc_use_pallas: bool = True
    # fused Pallas LSTM (fwd + custom-VJP reverse-time bwd) for the
    # training encode path (ops/pallas/lstm.py:lstm_train_core)
    enc_use_pallas_train: bool = True
    pred_num_layers: int = 2
    pred_dropout: float = 0.05
    pred_rnn_type: str = "NBRC"
    pred_layer_norm: bool = False
    pred_norm: str = "batch"
    zoneout: float = 0.0
    # DropConnect on the recurrent matrices (haste's `dropout` arg,
    # reference layers/haste/lstm.py:60-66); fused-Pallas compatible
    dropconnect: float = 0.0
    compute_dtype: Any = None
    # cross-batch state carry probabilities (reference use_tmp_state_pcent
    # / use_tmp_bos_pcent)
    use_tmp_state_pcent: float = 0.99
    use_tmp_bos: bool = False
    use_tmp_bos_pcent: float = 0.2

    @classmethod
    def from_config(cls, conf: dict) -> "TransducerConfig":
        m = conf["model"]
        enc, pred = m["encoder"], m["predictor"]
        dtypes = conf.get("dtypes", {})
        compute = dtypes.get("compute")
        compute_dtype = jnp.bfloat16 if compute == "bfloat16" else None
        return cls(
            feature_sz=m["feature_sz"],
            embed_sz=m["embed_sz"],
            vocab_sz=m["vocab_sz"],
            hidden_sz=m["hidden_sz"],
            out_sz=m["out_sz"],
            joint_sz=m["joint_sz"],
            joint_method=m["joint"]["method"],
            enc_num_layers=enc["num_layers"],
            enc_dropout=enc["dropout"],
            enc_rnn_type=enc["rnn_type"],
            enc_layer_norm=enc.get("layer_norm", False),
            enc_norm=enc.get("norm", "batch"),
            enc_reduction_indices=tuple(enc.get("reduction_indices", ())),
            enc_reduction_factors=tuple(enc.get("reduction_factors", ())),
            enc_use_pallas=enc.get("use_pallas", True),
            enc_use_pallas_train=enc.get("use_pallas_train", True),
            pred_num_layers=pred["num_layers"],
            pred_dropout=pred["dropout"],
            pred_rnn_type=pred["rnn_type"],
            pred_layer_norm=pred.get("layer_norm", False),
            pred_norm=pred.get("norm", "batch"),
            zoneout=m.get("zoneout", enc.get("zoneout", 0.0)),
            dropconnect=m.get("dropconnect", enc.get("dropconnect", 0.0)),
            use_tmp_state_pcent=enc.get("use_tmp_state_pcent", 0.99),
            use_tmp_bos=m.get("use_tmp_bos", False),
            use_tmp_bos_pcent=m.get("use_tmp_bos_pcent", 0.2),
            compute_dtype=compute_dtype,
        )

    @property
    def reduction_factor(self) -> int:
        r = 1
        for f in self.enc_reduction_factors:
            r *= f
        return r


class Transducer(nn.Module):
    cfg: TransducerConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(
            feature_sz=c.feature_sz,
            hidden_sz=c.hidden_sz,
            out_sz=c.out_sz,
            num_layers=c.enc_num_layers,
            dropout=c.enc_dropout,
            rnn_type=c.enc_rnn_type,
            layer_norm=c.enc_layer_norm,
            norm=c.enc_norm,
            zoneout=c.zoneout,
            dropconnect=c.dropconnect,
            reduction_indices=c.enc_reduction_indices,
            reduction_factors=c.enc_reduction_factors,
            compute_dtype=c.compute_dtype,
            use_pallas=c.enc_use_pallas,
            use_pallas_train=c.enc_use_pallas_train,
        )
        self.predictor = Predictor(
            vocab_sz=c.vocab_sz,
            embed_sz=c.embed_sz,
            hidden_sz=c.hidden_sz,
            out_sz=c.out_sz,
            num_layers=c.pred_num_layers,
            dropout=c.pred_dropout,
            blank=c.blank,
            rnn_type=c.pred_rnn_type,
            layer_norm=c.pred_layer_norm,
            norm=c.pred_norm,
            zoneout=c.zoneout,
            dropconnect=c.dropconnect,
            compute_dtype=c.compute_dtype,
        )
        self.joint = Joint(
            out_sz=c.out_sz,
            joint_sz=c.joint_sz,
            vocab_sz=c.vocab_sz,
            method=c.joint_method,
            compute_dtype=c.compute_dtype,
        )

    def __call__(
        self,
        x,
        y,
        xl=None,
        yl=None,
        bos_tokens=None,
        enc_state=None,
        pred_state=None,
        train: bool = False,
    ):
        """Training lattice forward (reference forward, models.py:308-359).

        x: [N, T, F] features; y: [N, U] labels; xl/yl: lengths.
        bos_tokens: optional [N, 1] replacing the BOS column (the
        reference's tmp-BOS cache, models.py:287-306).
        Returns (logits [N, T, U+1, V], (enc_state, pred_state)).
        """
        n = x.shape[0]
        enc_out, enc_state = self.encoder(
            x, state=enc_state, lengths=xl, train=train
        )
        if bos_tokens is None:
            bos_tokens = jnp.full((n, 1), self.cfg.bos, dtype=y.dtype)
        yconcat = jnp.concatenate([bos_tokens, y], axis=1)
        pred_out, pred_state = self.predictor(
            yconcat, state=pred_state, lengths=yl, train=train
        )
        logits = self.joint(
            pred_out[:, None, :, :].astype(jnp.float32),
            enc_out[:, :, None, :].astype(jnp.float32),
        )
        return logits, (enc_state, pred_state)

    # ---- decode-facing endpoints (used via apply(method=...)) ----

    def encode(self, x, state=None, lengths=None, train: bool = False):
        return self.encoder(x, state=state, lengths=lengths, train=train)

    def predict(self, y, state=None, lengths=None, train: bool = False):
        return self.predictor(y, state=state, lengths=lengths, train=train)

    def joint_step(self, h_pred, h_enc):
        return self.joint(h_pred, h_enc)


def learnable_states(params, tower: str, batch: int, n_layers: int):
    """Broadcast a tower's learnable per-layer h0 params to a batch —
    the initial state the model uses when `state=None`
    (reference custom_rnn.py:112-117)."""
    stack = params[tower]["rnn_stack"]
    states = []
    for i in range(n_layers):
        h0 = stack[f"layer{i}"]["h0"]  # [n_state, 1, H]
        states.append(
            tuple(
                jnp.broadcast_to(h0[j], (batch, h0.shape[-1]))
                for j in range(h0.shape[0])
            )
        )
    return tuple(states)


def init_transducer(cfg: TransducerConfig, rng, t: int = 8, u: int = 4):
    """Initialize parameters with tiny dummy shapes."""
    model = Transducer(cfg)
    x = jnp.zeros((1, t, cfg.feature_sz))
    y = jnp.zeros((1, u), jnp.int32)
    variables = model.init(
        {"params": rng, "dropout": rng},
        x, y, jnp.array([t]), jnp.array([u]),
    )
    return model, variables
