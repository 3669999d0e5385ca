"""Numerical parity against the REFERENCE'S OWN torch model.

Instantiates the actual reference Transducer from
/root/reference/libreasr/lib/models.py (fastai2 shimmed: only its Module
base/metaclass is needed at runtime), randomizes every parameter
(including h0 states and BatchNorm running stats), converts the
state_dict with compat.torch_import.convert_transducer, and asserts:

- full-lattice log-prob parity (reference forward, models.py:308-359);
- masked parity with ragged lengths (pack_padded semantics);
- greedy token-sequence + alignment parity against the reference's
  decode_greedy Python loop (models.py:369-455).

This makes importing a published reference checkpoint a weights-file
away: the math mapping is proven against the reference itself, not a
reimplementation.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _install_fastai2_shim():
    """Minimal fastai2 stand-in: the reference only uses Module (an
    nn.Module whose subclasses skip super().__init__), CancelBatchException,
    and names that never run at inference (xresnet18, Debugger, ResBlock)."""
    if "fastai2" in sys.modules:
        return
    import torch.nn as nn

    class _PrePostInitMeta(type(nn.Module)):
        def __call__(cls, *a, **k):
            obj = cls.__new__(cls)
            nn.Module.__init__(obj)
            obj.__init__(*a, **k)
            return obj

    class Module(nn.Module, metaclass=_PrePostInitMeta):
        pass

    fa = types.ModuleType("fastai2")
    tc = types.ModuleType("fastai2.torch_core")
    tc.Module = Module
    layers = types.ModuleType("fastai2.layers")
    layers.Debugger = object
    layers.ResBlock = object
    vision = types.ModuleType("fastai2.vision")
    vmodels = types.ModuleType("fastai2.vision.models")
    xres = types.ModuleType("fastai2.vision.models.xresnet")
    xres.xresnet18 = lambda *a, **k: None
    learner = types.ModuleType("fastai2.learner")

    class CancelBatchException(Exception):
        pass

    learner.CancelBatchException = CancelBatchException
    fa.torch_core, fa.layers, fa.vision, fa.learner = tc, layers, vision, learner
    vision.models = vmodels
    vmodels.xresnet = xres
    for name, mod in {
        "fastai2": fa,
        "fastai2.torch_core": tc,
        "fastai2.layers": layers,
        "fastai2.vision": vision,
        "fastai2.vision.models": vmodels,
        "fastai2.vision.models.xresnet": xres,
        "fastai2.learner": learner,
    }.items():
        sys.modules[name] = mod


class _Lang:
    bos = 2

    def denumericalize(self, ids):
        return list(ids)


N, T, U = 3, 7, 5
FEAT, EMBED, VOCAB, HIDDEN, OUT, JOINT = 64, 16, 32, 24, 20, 28


@pytest.fixture(scope="module")
def pair():
    """(reference torch model, our model, converted variables, cfg)."""
    _install_fastai2_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from libreasr.lib.models import Transducer as RefTransducer

    import jax

    from libreasr_tpu.compat.torch_import import convert_transducer
    from libreasr_tpu.models.transducer import (
        TransducerConfig,
        init_transducer,
    )

    torch.manual_seed(0)
    ref = RefTransducer(
        FEAT, EMBED, VOCAB, HIDDEN, OUT, JOINT, _Lang(),
        encoder_kwargs=dict(
            num_layers=2, dropout=0.0, rnn_type="LSTM",
            use_tmp_state_pcent=0.0, device="cpu",
        ),
        predictor_kwargs=dict(
            num_layers=2, dropout=0.0, rnn_type="NBRC",
            use_tmp_state_pcent=0.0,
        ),
    )
    # randomize EVERYTHING the converter must map: weights, learnable
    # initial states, BN affine AND running stats
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.5, 0.5, generator=g)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.uniform_(-0.3, 0.3, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    ref.eval()

    cfg = TransducerConfig(
        feature_sz=FEAT, embed_sz=EMBED, vocab_sz=VOCAB, hidden_sz=HIDDEN,
        out_sz=OUT, joint_sz=JOINT, enc_num_layers=2, pred_num_layers=2,
        enc_rnn_type="LSTM", pred_rnn_type="NBRC",
        enc_dropout=0.0, pred_dropout=0.0,
    )
    model, template = init_transducer(cfg, jax.random.PRNGKey(0))
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    converted = convert_transducer(sd, cfg)
    from flax import serialization

    variables = serialization.from_state_dict(template, converted)
    # every leaf restored with the template's exact shape
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else (_ for _ in ()).throw(
            AssertionError((a.shape, b.shape))
        ),
        template, variables,
    )
    return ref, model, variables, cfg


def _inputs(rng, n=N, t=T, u=U):
    x = rng.standard_normal((n, t, FEAT)).astype(np.float32)
    y = rng.integers(3, VOCAB, (n, u)).astype(np.int64)
    return x, y


def test_lattice_logprob_parity_full_lengths(pair, rng):
    ref, model, variables, cfg = pair
    import jax

    x, y = _inputs(rng)
    xl = np.full(N, T, np.int64)
    yl = np.full(N, U, np.int64)
    with torch.no_grad():
        ref_out = ref(
            (torch.from_numpy(x), torch.from_numpy(y),
             torch.from_numpy(xl), torch.from_numpy(yl))
        ).numpy()  # [N, T, U+1, V] log-probs (haste keeps full length)

    logits, _ = model.apply(
        variables, x, y.astype(np.int32), xl, yl
    )  # [N, T, U+1, V] raw logits
    ours = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-5)


def test_lattice_parity_ragged_lengths(pair, rng):
    """Ragged xl/yl: parity on the valid region (the reference's
    pack_padded zeroes the padded tail before BN, so only t<xl, u<yl is
    semantically defined)."""
    ref, model, variables, cfg = pair
    import jax

    x, y = _inputs(rng)
    xl = np.array([T, T - 2, T - 3], np.int64)
    yl = np.array([U, U - 1, U - 2], np.int64)
    with torch.no_grad():
        ref_out = ref(
            (torch.from_numpy(x), torch.from_numpy(y),
             torch.from_numpy(xl), torch.from_numpy(yl))
        ).numpy()

    logits, _ = model.apply(variables, x, y.astype(np.int32), xl, yl)
    ours = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    for i in range(N):
        got = ours[i, : xl[i], : yl[i] + 1, :]
        want = ref_out[i, : xl[i], : yl[i] + 1, :]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_greedy_decode_parity(pair, rng):
    """Token-for-token greedy parity: the reference's decode_greedy
    Python loop vs our batched lax.scan decode, on converted params."""
    ref, model, variables, cfg = pair
    from libreasr_tpu.models.decode import DecoderFns, greedy_decode
    from libreasr_tpu.models.transducer import Transducer

    x, _ = _inputs(rng, n=1)

    with torch.no_grad():
        # decode_greedy's double-unsqueeze + reshape only keeps the time
        # axis for [T, H, 1]-shaped input (models.py:385-394)
        ref_tokens, neg_logp, metrics, _ = ref.decode_greedy(
            torch.from_numpy(x[0])[:, :, None], max_iters=3
        )

    fns = DecoderFns(
        predict_step=lambda yy, st: model.apply(
            variables, yy, state=st, method=Transducer.predict
        ),
        joint_step=lambda hp, he: model.apply(
            variables, hp, he, method=Transducer.joint_step
        ),
    )
    enc_out, _ = model.apply(
        variables, x, lengths=np.array([T]), method=Transducer.encode
    )
    toks, lens, our_metrics, _ = greedy_decode(
        fns, enc_out, np.array([T]), vocab_sz=VOCAB, blank=cfg.blank,
        bos=cfg.bos, max_iters=3, max_tokens=64,
    )
    ours = list(np.asarray(toks)[0, : int(np.asarray(lens)[0])])
    assert ours == list(ref_tokens), (ours, ref_tokens)
    np.testing.assert_allclose(
        float(np.asarray(our_metrics["alignment_score"])[0]),
        metrics["alignment_score"], atol=1e-6,
    )
