"""CTC model family (reference CTCModel, models.py:580-602, selectable
via ``model.name`` in the config) and the greedy CTC decoder
(reference decoders.py:21-57).

The reference's CTCModel is a vanilla torch TransformerEncoder
(d=128, 8 heads, 8 layers) + Linear(vocab) + log_softmax; here it's a
flax pre-LN transformer with the same shape defaults. Loss is
optax.ctc_loss (blank=0, matching torch CTCLoss semantics used at
loss.py:66-69).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass(frozen=True)
class CTCConfig:
    feature_sz: int = 128
    d_model: int = 128
    n_heads: int = 8
    n_layers: int = 8
    ffn_mult: int = 4
    vocab_sz: int = 2048
    dropout: float = 0.1
    blank: int = 0

    @classmethod
    def from_config(cls, conf: dict) -> "CTCConfig":
        m = conf.get("model", {})
        ctc = m.get("ctc", {}) or {}
        return cls(
            feature_sz=m.get("feature_sz", 128),
            vocab_sz=m.get("vocab_sz", 2048),
            d_model=ctc.get("d_model", 128),
            n_heads=ctc.get("n_heads", 8),
            n_layers=ctc.get("n_layers", 8),
            dropout=ctc.get("dropout", 0.1),
        )


class TransformerBlock(nn.Module):
    d_model: int
    n_heads: int
    ffn_mult: int
    dropout: float

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads,
            dropout_rate=self.dropout,
            deterministic=not train,
        )(h, h, mask=mask)
        x = x + nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.d_model * self.ffn_mult)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model)(h)
        return x + nn.Dropout(self.dropout, deterministic=not train)(h)


class CTCModel(nn.Module):
    cfg: CTCConfig

    @nn.compact
    def __call__(self, x, lengths=None, train: bool = False):
        """x: [N, T, F] -> log-probs [N, T, V]."""
        c = self.cfg
        x = x.reshape(x.shape[0], x.shape[1], -1)
        if x.shape[-1] != c.d_model:
            x = nn.Dense(c.d_model, name="in_proj")(x)
        # sinusoidal positions
        t = x.shape[1]
        pos = np.arange(t)[:, None] / np.power(
            10000.0, np.arange(0, c.d_model, 2) / c.d_model
        )
        pe = np.zeros((t, c.d_model), np.float32)
        pe[:, 0::2] = np.sin(pos)
        pe[:, 1::2] = np.cos(pos)
        x = x + jnp.asarray(pe)[None]
        mask = None
        if lengths is not None:
            valid = jnp.arange(t)[None, :] < lengths[:, None]       # [N, T]
            mask = valid[:, None, None, :] & valid[:, None, :, None]
        for i in range(c.n_layers):
            x = TransformerBlock(
                d_model=c.d_model, n_heads=c.n_heads,
                ffn_mult=c.ffn_mult, dropout=c.dropout,
                name=f"block{i}",
            )(x, mask=mask, train=train)
        x = nn.LayerNorm()(x)
        logits = nn.Dense(c.vocab_sz, name="out")(x)
        return jax.nn.log_softmax(logits, axis=-1)


def init_ctc(cfg: CTCConfig, rng, t: int = 8):
    model = CTCModel(cfg)
    x = jnp.zeros((1, t, cfg.feature_sz))
    variables = model.init({"params": rng, "dropout": rng}, x, jnp.array([t]))
    return model, variables


def ctc_loss(log_probs, labels, frame_lengths, label_lengths, blank: int = 0):
    """Per-sequence CTC loss (reference warp path: torch CTCLoss with
    zero_infinity, loss.py:66-69)."""
    t = log_probs.shape[1]
    u = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= frame_lengths[:, None]).astype(
        jnp.float32
    )
    label_pad = (jnp.arange(u)[None, :] >= label_lengths[:, None]).astype(
        jnp.float32
    )
    loss = optax.ctc_loss(log_probs, logit_pad, labels, label_pad, blank_id=blank)
    return jnp.nan_to_num(loss, posinf=0.0)  # zero_infinity semantics


def ctc_decode_greedy(log_probs, lengths, blank: int = 0, max_tokens: int = 256):
    """argmax -> collapse repeats -> drop blanks (decoders.py:21-57),
    as a fixed-shape batched program. Returns (tokens, token_lengths)."""
    n, t, _ = log_probs.shape
    pred = jnp.argmax(log_probs, axis=-1).astype(jnp.int32)        # [N, T]
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    prev = jnp.concatenate([jnp.full((n, 1), -1, jnp.int32), pred[:, :-1]], axis=1)
    emit = (pred != blank) & (pred != prev) & valid                # [N, T]

    def scatter(carry, inp):
        buf, count = carry
        p, e = inp
        buf = buf.at[jnp.arange(n), count].set(
            jnp.where(e & (count < max_tokens), p, buf[jnp.arange(n), count])
        )
        count = count + (e & (count < max_tokens)).astype(jnp.int32)
        return (buf, count), ()

    buf = jnp.zeros((n, max_tokens), jnp.int32)
    count = jnp.zeros((n,), jnp.int32)
    (buf, count), _ = jax.lax.scan(
        scatter, (buf, count), (jnp.moveaxis(pred, 1, 0), jnp.moveaxis(emit, 1, 0))
    )
    return buf, count
