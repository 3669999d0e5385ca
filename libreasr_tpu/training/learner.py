"""Training: functional train step + Learner driver.

TPU-native redesign of the reference's fastai Learner assembly
(libreasr/lib/learner.py:172-267):
- the train step is one jitted program: device frontend (SpecAugment
  included) -> lattice forward -> RNN-T loss -> grads -> optimizer, DP/TP
  sharded over the mesh;
- gradient accumulation is optax.MultiSteps (reference
  GradAccumCallback, learner.py:51-65);
- NaN handling: non-finite logits are zeroed before the loss (reference
  loss.py:99-105) and a `finite` flag is reported so the driver can skip
  bad steps (reference TerminateOnNaNCallback);
- the cross-batch RNN state / BOS caches (custom_rnn.py:144-158,
  models.py:287-306) are an explicit `carry` pytree threaded through the
  step — with prob `use_tmp_state_pcent` the previous batch's final
  states seed the next batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.transducer import Transducer, TransducerConfig, learnable_states
from ..ops.frontend import FrontendConfig, features_batch
from ..ops.rnnt_loss import rnnt_loss


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState


class BatchCarry(NamedTuple):
    """Cross-batch caches, one per bucket shape (host-managed)."""

    enc_state: Any
    pred_state: Any
    bos: jax.Array       # [N, 1] last labels of the previous batch
    valid: jax.Array     # scalar bool — carry has been filled once


class Batch(NamedTuple):
    audio: jax.Array       # [N, S] padded pcm (or features if raw=False)
    audio_len: jax.Array   # [N]
    labels: jax.Array      # [N, U]
    label_len: jax.Array   # [N]


@dataclass(frozen=True)
class LossConfig:
    zero_nan: bool = True
    div_by_len: bool = False
    keep_best_pcent: float = -0.75
    entropy_loss: bool = False   # + mean lattice entropy (loss.py:111-115)
    zero_loss: bool = False      # blank-logit magnitude reg (loss.py:116-120)
    fused: bool = False          # fused joint+loss (no [N,T,U,V] lattice)
    t_chunk: int = 16

    @classmethod
    def from_config(cls, conf):
        l = conf.get("loss", {}) or {}
        return cls(
            zero_nan=l.get("zero_nan", True),
            div_by_len=l.get("div_by_len", False),
            keep_best_pcent=l.get("keep_best_pcent", -0.75),
            entropy_loss=l.get("entropy_loss", False),
            zero_loss=l.get("zero_loss", False),
            fused=l.get("fused", False),
            t_chunk=l.get("t_chunk", 16),
        )


_learnable_states = learnable_states


@dataclass(frozen=True)
class PPConfig:
    """Pipeline-parallel training config (train.py --pp N).

    The encoder's uniform [H -> H] LSTM layers run GPipe-pipelined over
    the mesh's "pipe" axis (parallel/pipeline.py); the non-uniform head
    (input norm + the first feature_sz -> H layer, plus any layers left
    over when (L-1) isn't divisible by the stage count) runs
    data-parallel before the pipeline. Requires the fused-loss path and
    an encoder the pipeline kernel can express exactly: LSTM cells,
    inter-layer norm "none", no zoneout, no time reduction, no
    cross-batch encoder state carry."""

    mesh: Any
    n_micro: int = 4
    axis: str = "pipe"


def _validate_pp(cfg: TransducerConfig, loss_cfg: LossConfig, pp: PPConfig):
    problems = []
    if not loss_cfg.fused:
        problems.append("loss.fused must be true")
    if cfg.enc_rnn_type != "LSTM":
        problems.append(f"encoder rnn_type must be LSTM (got {cfg.enc_rnn_type})")
    if cfg.enc_norm != "none":
        problems.append(
            f"encoder norm must be 'none' (got {cfg.enc_norm!r}: inter-layer "
            "norms would need pipeline stages of their own)"
        )
    if cfg.enc_layer_norm:
        problems.append("LayerNorm-LSTM cells are not pipelined")
    if cfg.zoneout:
        problems.append("zoneout is not pipelined")
    if cfg.enc_reduction_indices:
        problems.append("inter-layer time reduction is not pipelined")
    if cfg.use_tmp_state_pcent > 0:
        problems.append(
            "encoder cross-batch state carry (use_tmp_state_pcent) can't "
            "thread through pipeline stages — set it to 0"
        )
    stages = pp.mesh.shape[pp.axis]
    if cfg.enc_num_layers - 1 < stages:
        problems.append(
            f"{cfg.enc_num_layers} encoder layers can't fill {stages} stages "
            "(layer 0 is the non-uniform input layer)"
        )
    if problems:
        raise ValueError("pipeline parallelism config: " + "; ".join(problems))


def _encode_pp(
    params, feats, flens, *, cfg: TransducerConfig, pp: PPConfig,
    train: bool, rng_drop,
):
    """The pp-mode encoder: exactly Encoder.__call__'s math
    (models/modules.py:330-355) under the constraints _validate_pp
    enforces, with the uniform [H -> H] tail of the LSTM stack run
    through pipeline_lstm_stack. Parity with the sequential encoder is
    pinned by tests/test_pp_train.py."""
    from ..ops.rnn import LSTMParams, lstm_scan
    from ..parallel.pipeline import pipeline_lstm_stack, stack_layer_params

    p = params["encoder"]
    n, t = feats.shape[0], feats.shape[1]
    x = feats.reshape(n, t, -1)
    ln = p["input_norm"]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + ln["bias"]

    def cell(i) -> LSTMParams:
        c = p["rnn_stack"][f"layer{i}"]["cell"]
        if isinstance(c, dict):  # restored checkpoints may lose the NamedTuple
            return LSTMParams(**c)
        return c

    def h0(i):
        return p["rnn_stack"][f"layer{i}"]["h0"]

    stages = pp.mesh.shape[pp.axis]
    n_layers = cfg.enc_num_layers
    n_pipe = ((n_layers - 1) // stages) * stages
    n_seq = n_layers - n_pipe
    for i in range(n_seq):
        state0 = tuple(
            jnp.broadcast_to(h0(i)[s], (n, cfg.hidden_sz)) for s in range(2)
        )
        x, _ = lstm_scan(
            x, state0, cell(i), lengths=flens,
            compute_dtype=cfg.compute_dtype,
        )
    stacked = stack_layer_params([cell(i) for i in range(n_seq, n_layers)])
    h0s = jnp.stack([h0(i) for i in range(n_seq, n_layers)])
    dp_axis = "data" if "data" in pp.mesh.shape else None
    x = pipeline_lstm_stack(
        stacked, x, mesh=pp.mesh, axis=pp.axis, n_micro=pp.n_micro,
        lengths=flens, compute_dtype=cfg.compute_dtype, h0=h0s,
        dp_axis=dp_axis,
    )
    if train and cfg.enc_dropout > 0:
        keep = 1.0 - cfg.enc_dropout
        mask = jax.random.bernoulli(rng_drop, keep, x.shape)
        x = jnp.where(mask, x / keep, jnp.zeros_like(x))
    if "proj" in p:
        x = x @ p["proj"]["kernel"] + p["proj"]["bias"]
    return x


def init_carry(cfg: TransducerConfig, batch: int) -> BatchCarry:
    def zeros_tower(n_layers, n_state):
        return tuple(
            tuple(jnp.zeros((batch, cfg.hidden_sz)) for _ in range(n_state))
            for _ in range(n_layers)
        )

    enc_n_state = 2 if cfg.enc_rnn_type in ("LSTM",) else 1
    pred_n_state = 2 if cfg.pred_rnn_type in ("LSTM",) else 1
    return BatchCarry(
        enc_state=zeros_tower(cfg.enc_num_layers, enc_n_state),
        pred_state=zeros_tower(cfg.pred_num_layers, pred_n_state),
        bos=jnp.full((batch, 1), cfg.bos, jnp.int32),
        valid=jnp.zeros([], bool),
    )


def make_train_step(
    model: Transducer,
    tx: optax.GradientTransformation,
    frontend: FrontendConfig | None,
    loss_cfg: LossConfig = LossConfig(),
    hutchinson: bool = False,
    pass_loss_value: bool = False,
    pp: PPConfig | None = None,
):
    """Build the jitted train step.

    If `frontend` is given, batches carry raw padded audio and feature
    extraction + SpecAugment run on device inside the same program.
    If `hutchinson` (AdaHessian runs), a Rademacher Hessian-diagonal
    estimate z ⊙ Hz is computed via forward-over-reverse AD and passed to
    the optimizer (reference HutchinsonTraceCallback, learner.py:68-118);
    the loss then uses rnnt_loss_autodiff — the same scan DP without the
    (first-order-only) custom_vjp, differentiable to any order at the
    same compiled program size.
    Returns step(state, carry, batch, rng) -> (state, carry, metrics).
    """
    from ..ops.rnnt_loss import rnnt_loss_autodiff

    cfg = model.cfg
    loss_impl = rnnt_loss_autodiff if hutchinson else rnnt_loss
    if loss_cfg.fused and cfg.joint_method != "concat":
        raise ValueError("fused loss requires joint_method='concat'")
    if loss_cfg.fused and hutchinson:
        raise ValueError("fused loss is first-order only (no hutchinson)")
    if pp is not None:
        _validate_pp(cfg, loss_cfg, pp)

    def step(state: TrainState, carry: BatchCarry, batch: Batch, rng):
        rng_aug, rng_drop, rng_state, rng_bos = jax.random.split(rng, 4)
        if frontend is not None:
            feats, flens = features_batch(
                batch.audio, batch.audio_len, frontend, rng=rng_aug, augment=True
            )
        else:
            feats, flens = batch.audio, batch.audio_len
        n = feats.shape[0]
        y, yl = batch.labels, batch.label_len

        # --- cross-batch state carry (utsp) & tmp-BOS --------------------
        use_state = carry.valid & (
            jax.random.uniform(rng_state) < cfg.use_tmp_state_pcent
        )

        def pick(cache, learned):
            return jax.tree_util.tree_map(
                lambda c, l: jnp.where(use_state, c, l), cache, learned
            )

        def initial_states(params):
            """Select each tower's initial state INSIDE the
            differentiated function: the learnable h0 params must
            receive gradients through the steps that start from them
            (the reference trains its initial-state Parameters through
            the ordinary forward, custom_rnn.py:75-82,112-117 — deriving
            them from state.params outside loss_fn silently detached
            them). The carry branch stays a constant: cached final
            states are detached cross-batch context, reference
            custom_rnn.py:224-231."""
            enc_learned = _learnable_states(
                params, "encoder", n, cfg.enc_num_layers
            )
            pred_learned = _learnable_states(
                params, "predictor", n, cfg.pred_num_layers
            )
            return (
                pick(carry.enc_state, enc_learned),
                pick(carry.pred_state, pred_learned),
            )

        use_bos = (
            cfg.use_tmp_bos
            & carry.valid
            & (jax.random.uniform(rng_bos) < cfg.use_tmp_bos_pcent)
        )
        bos_tokens = jnp.where(
            use_bos, carry.bos, jnp.full((n, 1), cfg.bos, jnp.int32)
        )

        flens_red = flens // max(cfg.reduction_factor, 1)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            enc_state0, pred_state0 = initial_states(params)
            if loss_cfg.fused:
                # fused joint+loss: encoder/predictor run separately and
                # the lattice is never materialized (ops/fused_loss.py)
                from ..ops.fused_loss import (
                    joint_params_from_flax, rnnt_loss_fused,
                )

                if pp is not None:
                    # GPipe-pipelined encoder (no batch stats, no state
                    # carry — _validate_pp enforced norm="none"/utsp=0)
                    enc_out = _encode_pp(
                        params, feats, flens, cfg=cfg, pp=pp,
                        train=True, rng_drop=rng_drop,
                    )
                    enc_st, upd1 = enc_state0, {}
                else:
                    (enc_out, enc_st), upd1 = model.apply(
                        variables, feats, state=enc_state0, lengths=flens,
                        train=True, rngs={"dropout": rng_drop},
                        mutable=["batch_stats"], method=Transducer.encode,
                    )
                yconcat = jnp.concatenate([bos_tokens, y], axis=1)
                (pred_out, pred_st), upd2 = model.apply(
                    variables, yconcat, state=pred_state0, lengths=yl,
                    train=True, rngs={"dropout": jax.random.fold_in(rng_drop, 1)},
                    mutable=["batch_stats"], method=Transducer.predict,
                )
                # flax returns the *whole* collection from each apply —
                # take each tower's updated stats from its own call
                # (naive dict-merge would overwrite encoder stats with
                # the predictor call's stale copy). norm="layer"/"none"
                # models have no batch statistics at all.
                new_bs = dict(state.batch_stats)
                for key, upd in (("encoder", upd1), ("predictor", upd2)):
                    stats = upd.get("batch_stats", {})
                    if key in stats:
                        new_bs[key] = stats[key]
                per_seq = rnnt_loss_fused(
                    enc_out, pred_out, joint_params_from_flax(params["joint"]),
                    y, flens_red, yl, cfg.blank, loss_cfg.t_chunk,
                    # joint matmul inputs follow the model's compute
                    # policy (f32 accumulation + f32 DP inside)
                    cfg.compute_dtype,
                )
                if loss_cfg.div_by_len:
                    per_seq = per_seq / (yl.astype(per_seq.dtype) + 1e-5)
                if 0.0 <= loss_cfg.keep_best_pcent < 1.0:
                    k = max(int(n * loss_cfg.keep_best_pcent), 1)
                    per_seq = jax.lax.top_k(per_seq, k)[0]
                return per_seq.mean(), (new_bs, enc_st, pred_st)

            (logits, (enc_st, pred_st)), updates = model.apply(
                variables,
                feats,
                y,
                flens,
                yl,
                bos_tokens=bos_tokens,
                enc_state=enc_state0,
                pred_state=pred_state0,
                train=True,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats"],
            )
            if loss_cfg.zero_nan:
                logits = jnp.nan_to_num(logits, nan=0.0, posinf=0.0, neginf=0.0)
            per_seq = loss_impl(logits, y, flens_red, yl)
            if loss_cfg.entropy_loss:
                # mean per-(t,u) entropy of the joint distribution
                logp = jax.nn.log_softmax(logits, axis=-1)
                ent = -jnp.sum(jnp.exp(logp) * logp, axis=-1)  # [N,T,U1]
                per_seq = per_seq + ent.mean(axis=(1, 2))
            if loss_cfg.zero_loss:
                # penalize small blank logits (reference loss.py:116-120)
                zl = (1.0 / (jnp.abs(logits[..., 0]) + 1e-5)).mean(
                    axis=(1, 2)
                ) * yl.astype(logits.dtype)
                per_seq = per_seq + zl
            if loss_cfg.div_by_len:
                per_seq = per_seq / (yl.astype(per_seq.dtype) + 1e-5)
            if 0.0 <= loss_cfg.keep_best_pcent < 1.0:
                k = max(int(n * loss_cfg.keep_best_pcent), 1)
                per_seq = jax.lax.top_k(per_seq, k)[0]
            loss = per_seq.mean()
            return loss, (updates["batch_stats"], enc_st, pred_st)

        (loss, (new_bs, enc_st, pred_st)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        finite = jnp.isfinite(loss) & jnp.array(
            jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)), grads, True
            )
        )
        # zero the whole update on non-finite steps (TerminateOnNaN analog)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        extra = {}
        if pass_loss_value:
            extra["value"] = loss  # reduce_on_plateau consumes this
        if hutchinson:
            rng_z = jax.random.fold_in(rng, 99)
            leaves, treedef = jax.tree_util.tree_flatten(state.params)
            keys = jax.random.split(rng_z, len(leaves))
            z = jax.tree_util.tree_unflatten(
                treedef,
                [
                    jax.random.rademacher(k, l.shape, l.dtype)
                    if jnp.issubdtype(l.dtype, jnp.floating)
                    else jnp.zeros_like(l)
                    for k, l in zip(keys, leaves)
                ],
            )
            grad_only = lambda p: jax.grad(
                lambda q: loss_fn(q)[0]
            )(p)
            _, hz = jax.jvp(grad_only, (state.params,), (z,))
            extra["hessian_diag"] = jax.tree_util.tree_map(
                lambda zz, hh: zz * hh, z, hz
            )
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params, **extra
        )
        params = optax.apply_updates(state.params, updates)

        # next-batch caches: final states + last labels (detached by
        # construction — they are outputs, not differentiated)
        last_idx = jnp.maximum(yl - 1, 0)
        last_labels = jnp.take_along_axis(y, last_idx[:, None], axis=1)
        new_carry = BatchCarry(
            enc_state=enc_st,
            pred_state=pred_st,
            bos=last_labels.astype(jnp.int32),
            valid=jnp.ones([], bool),
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "finite": finite,
            "frames": flens.sum(),
            "tokens": yl.sum(),
        }
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
        )
        return new_state, new_carry, metrics

    return step


def create_train_state(
    model: Transducer, variables, tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


class Learner:
    """Host-side training driver: owns the jitted step, per-bucket
    carries, and metric aggregation (fastai-Learner equivalent without
    the callback machinery — callbacks live in training/callbacks.py)."""

    def __init__(
        self,
        model: Transducer,
        variables,
        tx,
        frontend: FrontendConfig | None = None,
        loss_cfg: LossConfig = LossConfig(),
        mesh=None,
        seed: int = 0,
        hutchinson: bool = False,
        pass_loss_value: bool = False,
        pp_micro: int = 4,
    ):
        self.model = model
        self.tx = tx
        self.state = create_train_state(model, variables, tx)
        self.frontend = frontend
        self.mesh = mesh
        self.carries: dict[int, BatchCarry] = {}
        # a mesh with a "pipe" axis > 1 engages pipeline-parallel
        # training (train.py --pp N); batch rows stay dp-sharded
        pp = None
        if mesh is not None and mesh.shape.get("pipe", 1) > 1:
            pp = PPConfig(mesh=mesh, n_micro=pp_micro)
        self.pp = pp
        self._raw_step = make_train_step(
            model, tx, frontend, loss_cfg,
            hutchinson=hutchinson, pass_loss_value=pass_loss_value,
            pp=pp,
        )
        self._step_fn = jax.jit(self._raw_step, donate_argnums=(0,))
        self._chain_fn = jax.jit(self._chained, donate_argnums=(0, 1))
        self._rng = jax.random.PRNGKey(seed)

    def next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def step(self, batch: Batch):
        n = batch.audio.shape[0]
        carry = self.carries.get(n)
        if carry is None:
            carry = init_carry(self.model.cfg, n)
        if self.mesh is not None and jax.process_count() == 1:
            from ..parallel.mesh import shard_batch

            batch = Batch(*shard_batch(self.mesh, tuple(batch)))
        # multi-process: the caller assembles the global batch with
        # parallel.distributed.global_batch (each process contributes
        # its local rows) — re-placing here would be wrong
        self.state, carry, metrics = self._step_fn(
            self.state, carry, batch, self.next_rng()
        )
        self.carries[n] = carry
        # metrics stay device-resident: materializing them here would
        # block on the device every step (on a tunneled chip that is
        # ~85% of wall-clock; see docs/performance.md). Callers float()
        # them at their own logging cadence.
        return metrics

    def _chained(self, state, carry, batches, rngs):
        """lax.scan body over K stacked batches (traced under jit)."""
        def body(sc, xs):
            s, c = sc
            batch, rng = xs
            s, c, m = self._raw_step(s, c, Batch(*batch), rng)
            return (s, c), m

        (state, carry), ms = jax.lax.scan(
            body, (state, carry), (tuple(batches), rngs)
        )
        # last-step metrics (what a sequential loop would hold after the
        # chain) + the chain-mean loss for smoother logging
        metrics = {k: v[-1] for k, v in ms.items()}
        metrics["loss_mean"] = ms["loss"].mean()
        return state, carry, metrics

    def step_chained(self, batches: list[Batch]):
        """Run K same-shape train steps as ONE device program.

        One dispatch + one host->device upload per chain instead of per
        step: on a remote/tunneled chip the per-step round-trip dwarfs
        the ~26 ms device step, the same economics the serving stepper's
        chained dispatch exploits (serving/server.py). Numerics are
        identical to K sequential step() calls — the rng stream is
        pre-split exactly as step() would, and the per-shape carry
        threads through the scan.
        """
        if len(batches) == 1:
            return self.step(batches[0])
        shape = batches[0].audio.shape
        yshape = batches[0].labels.shape
        if any(b.audio.shape != shape or b.labels.shape != yshape
               for b in batches):
            raise ValueError("step_chained needs one bucket shape per chain "
                             "(audio AND label padding)")
        n = shape[0]
        carry = self.carries.get(n)
        if carry is None:
            carry = init_carry(self.model.cfg, n)
        stacked = Batch(
            *(np.stack([np.asarray(getattr(b, f)) for b in batches])
              for f in Batch._fields)
        )
        if self.mesh is not None and jax.process_count() == 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def put(x):  # [K, N, ...]: batch axis is now axis 1
                spec = P(None, "data", *([None] * (x.ndim - 2)))
                return jax.device_put(x, NamedSharding(self.mesh, spec))

            stacked = Batch(*(put(x) for x in stacked))
        rngs = jnp.stack([self.next_rng() for _ in batches])
        self.state, carry, metrics = self._chain_fn(
            self.state, carry, stacked, rngs
        )
        self.carries[n] = carry
        return metrics
