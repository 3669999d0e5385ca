"""End-to-end API test: audio bytes -> features -> encode -> decode ->
text, on a tiny random-weight model."""

import numpy as np
import pytest

from libreasr_tpu.api import ASRBundle
from libreasr_tpu.config import open_config, apply_overrides, conf_get


@pytest.fixture(scope="module")
def bundle():
    conf = open_config("config/base.yaml")
    conf = apply_overrides(conf, ["inference"])
    # shrink the model so the test is fast
    conf["model"].update(
        feature_sz=1280, embed_sz=16, hidden_sz=24, out_sz=24,
        joint_sz=16, vocab_sz=64,
    )
    conf["model"]["encoder"]["num_layers"] = 2
    conf["model"]["predictor"]["num_layers"] = 1
    conf["lm"]["enable"] = False
    conf["dtypes"]["compute"] = "float32"
    return ASRBundle.from_config(conf)


def test_config_overrides_applied(bundle):
    assert conf_get(bundle.conf, "bs") == 1
    assert conf_get(bundle.conf, "chunk") == 160


def test_transcribe_runs(bundle, rng):
    audio = rng.standard_normal(16000).astype(np.float32) * 0.1
    text, metrics = bundle.transcribe(audio)
    assert isinstance(text, str)
    assert 0.0 <= float(metrics["alignment_score"]) <= 1.0


def test_transcribe_batch_padding_invariance(bundle, rng):
    """A padded shorter utterance decodes identically to unpadded."""
    a = rng.standard_normal(16000).astype(np.float32) * 0.1
    b = rng.standard_normal(8000).astype(np.float32) * 0.1
    batch = np.zeros((2, 16000), np.float32)
    batch[0] = a
    batch[1, :8000] = b
    texts, _ = bundle.transcribe_batch(batch, np.array([16000, 8000]))
    text_b, _ = bundle.transcribe(b)
    assert texts[1] == text_b


def test_from_bundle_commits_params_to_device():
    """Deserialized bundles must NOT keep numpy parameter leaves: as
    jit arguments they re-upload the whole model on every call (~10 s
    per engine step for the 70M flagship through a remote tunnel —
    the round-4 trained-bench stall)."""
    import os

    import jax
    import numpy as np

    from libreasr_tpu.api import ASRBundle

    fx = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
    bundle = ASRBundle.from_bundle(
        os.path.join(fx, "model_bpe.tar.gz"), extract_to="./tmp/api_devput"
    )
    for leaf in jax.tree_util.tree_leaves(bundle.variables):
        assert not isinstance(leaf, np.ndarray), "numpy leaf survived load"
