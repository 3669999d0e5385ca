"""Engine soak: hundreds of chunks with slot churn, silence, and
repeated utterances. Pins the production-serving invariants the
one-shot golden tests can't: host-side buffers stay bounded, slots are
fully recycled, decode quality does not degrade with engine age.
(The reference's serving loop holds one Python thread per utterance and
never reuses state across utterances — api-server.py:82-139; here one
long-lived batched engine must stay healthy indefinitely.)"""

import os

import numpy as np
import pytest

from libreasr_tpu.api import ASRBundle
from libreasr_tpu.data.audio import read_audio

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
CHUNK = 1280


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    bundle = ASRBundle.from_bundle(
        os.path.join(FIXTURES, "model.tar.gz"),
        extract_to=str(tmp_path_factory.mktemp("soak")),
    )
    pcm, sr = read_audio(os.path.join(FIXTURES, "s-002.wav"))  # hello world
    audio = np.zeros(16000 + CHUNK, np.float32)
    audio[: pcm.shape[1]] = pcm[0]
    return bundle, audio


def test_engine_soak_slot_churn(golden):
    from libreasr_tpu.models.streaming import StreamingEngine

    bundle, audio = golden
    eng = StreamingEngine(bundle, n_streams=4)
    n_chunks = len(audio) // CHUNK

    # slot 0: decodes the utterance over and over (close/reopen between)
    # slot 1: pure silence for the whole soak
    # slots 2/3: churn — opened and closed mid-utterance repeatedly
    silence = eng.open_slot()
    transcripts = []
    churn_cycles = 0
    for rep in range(8):
        s = eng.open_slot()
        churn = eng.open_slot()
        for c in range(n_chunks):
            eng.feed(s, audio[c * CHUNK : (c + 1) * CHUNK])
            eng.feed(silence, np.zeros(CHUNK, np.float32))
            if c % 3 == 0:
                eng.feed(churn, audio[c * CHUNK : (c + 1) * CHUNK])
            if c == n_chunks // 2:
                eng.close_slot(churn)  # abandoned mid-utterance
                churn = eng.open_slot()
                churn_cycles += 1
        transcripts.append(eng.transcript(s))
        eng.close_slot(s)
        eng.close_slot(churn)

    # decode quality does not degrade with engine age
    assert transcripts == ["hello world"] * 8
    # the silent slot's output stays bounded: all-zero input is out of
    # distribution for the overfit toy model, which may hallucinate one
    # short word after each silence auto-reset; the EOS latch then
    # suppresses further tokens until the next reset. The engine's
    # guarantee is linear-in-reset-cycles boundedness (here: 8.3 s of
    # silence -> at most ~1 token/0.7 s), never frame-rate drift
    # (which would be ~300 tokens at max_iters over these chunks).
    assert len(eng.emitted[silence]) <= 12
    # host-side buffers stay bounded: every slot's sample remainder is
    # less than one chunk, emissions are per-utterance not cumulative
    for buf in eng.sample_buf:
        assert len(buf) < CHUNK
    assert churn_cycles == 8
    # all slots recyclable after the soak
    eng.close_slot(silence)
    opened = [eng.open_slot() for _ in range(4)]
    assert sorted(opened) == [0, 1, 2, 3]
    for s in opened:
        assert eng.emitted[s] == [] and eng.outbox[s] == []
