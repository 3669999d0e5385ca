"""LSTM language model (reference LM, lm.py:20-41).

Embedding (blank/pad row pinned to zero) -> N-layer LSTM -> dropout ->
output projection (weight-tied to the embedding when embed_sz ==
hidden_sz) -> log_softmax. State is explicit carry for fusion during
streaming decode.
"""

from __future__ import annotations

from dataclasses import dataclass
import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import rnn as rnn_ops


@dataclass(frozen=True)
class LMConfig:
    vocab_sz: int = 2048
    embed_sz: int = 1024
    hidden_sz: int = 1024
    num_layers: int = 6
    p: float = 0.2

    @classmethod
    def from_config(cls, conf: dict) -> "LMConfig":
        lm = conf.get("lm", {})
        return cls(
            vocab_sz=lm.get("vocab_sz", 2048),
            embed_sz=lm.get("embed_sz", 1024),
            hidden_sz=lm.get("hidden_sz", 1024),
            num_layers=lm.get("num_layers", 6),
            p=lm.get("p", 0.2),
        )


class LM(nn.Module):
    cfg: LMConfig

    @nn.compact
    def __call__(self, y, state=None, train: bool = False):
        c = self.cfg
        embed = nn.Embed(c.vocab_sz, c.embed_sz, name="embed")
        x = embed(y)
        x = jnp.where((y == 0)[..., None], 0.0, x)
        n = y.shape[0]
        new_states = []
        in_sz = c.embed_sz
        for i in range(c.num_layers):
            params = self.param(
                f"lstm{i}",
                lambda rng, isz=in_sz: rnn_ops.init_lstm(rng, isz, c.hidden_sz),
            )
            st = (
                (jnp.zeros((n, c.hidden_sz)), jnp.zeros((n, c.hidden_sz)))
                if state is None
                else state[i]
            )
            x, st = rnn_ops.lstm_scan(x, st, params)
            new_states.append(st)
            in_sz = c.hidden_sz
        x = nn.Dropout(c.p, deterministic=not train)(x)
        if c.embed_sz == c.hidden_sz:
            # tied weights (reference lm.py:27-29)
            logits = x @ embed.embedding.T
        else:
            logits = nn.Dense(c.vocab_sz, name="out")(x)
        return jax.nn.log_softmax(logits, axis=-1), tuple(new_states)


def init_lm(cfg: LMConfig, rng):
    model = LM(cfg)
    y = jnp.zeros((1, 4), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, y)
    return model, variables
