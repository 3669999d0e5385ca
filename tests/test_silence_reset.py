"""Silence auto-reset semantics (reference should_reset + THRESH,
api-server.py:23-50,133-135): after reset_thresh_ms of chunks with no
emissions, the next chunk decodes from a fresh stream state."""

import numpy as np
import pytest

from libreasr_tpu.api import ASRBundle
from libreasr_tpu.config import apply_overrides, open_config
from libreasr_tpu.models.streaming import StreamingConfig, StreamingEngine


@pytest.fixture(scope="module")
def bundle():
    conf = open_config("config/base.yaml")
    conf = apply_overrides(conf, ["inference"])
    conf["model"].update(
        feature_sz=1280, embed_sz=8, hidden_sz=16, out_sz=16,
        joint_sz=16, vocab_sz=40,
    )
    conf["model"]["encoder"]["num_layers"] = 1
    conf["model"]["predictor"]["num_layers"] = 1
    conf["lm"]["enable"] = False
    conf["dtypes"]["compute"] = "float32"
    return ASRBundle.from_config(conf)


def test_silence_triggers_reset(bundle, rng, monkeypatch):
    scfg = StreamingConfig(sr=16000, reset_thresh_ms=240)  # 3 chunks
    eng = StreamingEngine(bundle, n_streams=1, scfg=scfg)
    slot = eng.open_slot()

    # silence (zeros) yields no tokens with an untrained-but-quiet input?
    # not guaranteed with random weights — force the no-emission path by
    # monkeypatching the device-step results (the dispatch/collect path
    # used by feed()/step_ready and the serving stepper)
    calls = {"resets": []}
    orig = eng._step_device

    def spy(chunks, valid=None, reset=None):
        calls["resets"].append(bool(reset[0]) if reset is not None else False)
        packed = np.asarray(orig(chunks, valid, reset)).copy()
        packed[:, -1] = 0  # zero the length column: pretend no emission
        return packed

    monkeypatch.setattr(eng, "_step_device", spy)
    for _ in range(7):
        eng.feed(slot, np.zeros(1280, np.float32))
    # first call resets (slot open), then after 3 silent chunks (240 ms)
    # the reset flag must fire again
    assert calls["resets"][0] is True
    assert any(calls["resets"][1:]), f"no auto-reset fired: {calls['resets']}"
