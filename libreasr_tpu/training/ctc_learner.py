"""CTC model family training (reference selects CTCModel via
``model.name``, config.py/models.py:580-602; its loss path is torch
CTCLoss, loss.py:66-69).

Shares Batch / bucketing / frontend with the transducer path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.ctc import CTCModel, ctc_decode_greedy, ctc_loss
from ..ops.frontend import FrontendConfig, features_batch
from .learner import Batch
from .metrics import cer, wer


class CTCTrainState(NamedTuple):
    step: jax.Array
    params: dict
    opt_state: optax.OptState


def make_ctc_train_step(model: CTCModel, tx, frontend: FrontendConfig | None):
    def step(state: CTCTrainState, batch: Batch, rng):
        rng_aug, rng_drop = jax.random.split(rng)
        if frontend is not None:
            feats, flens = features_batch(
                batch.audio, batch.audio_len, frontend, rng=rng_aug, augment=True
            )
        else:
            feats, flens = batch.audio, batch.audio_len

        def loss_fn(params):
            logp = model.apply(
                {"params": params}, feats, flens, train=True,
                rngs={"dropout": rng_drop},
            )
            per_seq = ctc_loss(
                logp, batch.labels, flens, batch.label_len, model.cfg.blank
            )
            return per_seq.mean()

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        finite = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            CTCTrainState(state.step + 1, params, opt_state),
            {"loss": loss, "finite": finite,
             "grad_norm": optax.global_norm(grads)},
        )

    return step


class CTCLearner:
    def __init__(self, model, variables, tx, frontend=None, seed: int = 0):
        self.model = model
        self.tx = tx
        self.state = CTCTrainState(
            jnp.zeros([], jnp.int32), variables["params"], tx.init(variables["params"])
        )
        self._step = jax.jit(
            make_ctc_train_step(model, tx, frontend), donate_argnums=(0,)
        )
        self._rng = jax.random.PRNGKey(seed)
        self.frontend = frontend

    def step(self, batch: Batch):
        self._rng, k = jax.random.split(self._rng)
        self.state, metrics = self._step(self.state, batch, k)
        return {k2: np.asarray(v) for k2, v in metrics.items()}

    def evaluate(self, batches, lang, max_batches=None):
        model, frontend = self.model, self.frontend

        @jax.jit
        def run(params, audio, lengths):
            if frontend is not None:
                feats, flens = features_batch(audio, lengths, frontend)
            else:
                feats, flens = audio, lengths
            logp = model.apply({"params": params}, feats, flens)
            return ctc_decode_greedy(logp, flens, model.cfg.blank)

        wers, cers = [], []
        for bi, b in enumerate(batches):
            if max_batches is not None and bi >= max_batches:
                break
            toks, lens = run(self.state.params, jnp.asarray(b.audio),
                             jnp.asarray(b.audio_len))
            toks, lens = np.asarray(toks), np.asarray(lens)
            for i in range(len(toks)):
                pred = lang.denumericalize(list(toks[i, : lens[i]]))
                tgt = lang.denumericalize(
                    list(np.asarray(b.labels)[i, : b.label_len[i]])
                )
                wers.append(wer(pred, tgt))
                cers.append(cer(pred, tgt))
        n = max(len(wers), 1)
        return {"wer": float(np.mean(wers or [1.0])),
                "cer": float(np.mean(cers or [1.0])), "n": n}
