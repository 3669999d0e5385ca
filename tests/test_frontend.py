"""Frontend tests: STFT/mel parity with an independent numpy oracle and
layout parity of stack/downsample with the reference's unfold semantics
(transforms.py:429-441)."""

import numpy as np
import jax
import jax.numpy as jnp

from libreasr_tpu.ops import frontend as fe


def numpy_log_mel(audio, sr=16000, n_fft=1024, wl=400, hop=160, n_mels=128):
    """Independent oracle: same math as torchaudio MelSpectrogram defaults."""
    pad = n_fft // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = (len(x) - n_fft) // hop + 1
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(wl) / wl))
    window = np.zeros(n_fft)
    left = (n_fft - wl) // 2
    window[left : left + wl] = win
    frames = np.stack(
        [x[i * hop : i * hop + n_fft] * window for i in range(n_frames)]
    )
    spec = np.abs(np.fft.rfft(frames, n_fft, axis=-1)) ** 2
    fb = fe.mel_filterbank(n_fft // 2 + 1, n_mels, sr)
    return np.log(spec @ fb + 1e-6)


def test_log_mel_matches_oracle(rng):
    audio = rng.standard_normal(16000).astype(np.float32)
    got = np.asarray(fe.log_mel_spectrogram(jnp.asarray(audio)))
    want = numpy_log_mel(audio)
    assert got.shape == (101, 128)
    # fp32 FFT vs numpy's float64 rfft: small elementwise drift expected
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_mel_filterbank_properties():
    fb = fe.mel_filterbank(513, 128, 16000)
    assert fb.shape == (513, 128)
    assert (fb >= 0).all()
    # every filter has some mass
    assert (fb.sum(axis=0) > 0).all()


def test_stack_downsample_layout(rng):
    x = rng.standard_normal((2, 26, 4)).astype(np.float32)
    out = np.asarray(fe.stack_downsample(jnp.asarray(x), n_stack=10, downsample=8))
    t_out = (26 - 10) // 8 + 1
    assert out.shape == (2, t_out, 40)
    # parity with torch unfold(-2, n_stack, ds).view(...): feature-major
    for n in range(2):
        for t in range(t_out):
            for h in range(4):
                for s in range(10):
                    assert out[n, t, h * 10 + s] == x[n, t * 8 + s, h]


def test_features_batch_shapes(rng):
    cfg = fe.FrontendConfig()
    assert cfg.feature_sz == 1280
    audio = jnp.asarray(rng.standard_normal((3, 16000)).astype(np.float32))
    lens = jnp.array([16000, 8000, 4000])
    feats, flens = fe.features_batch(audio, lens, cfg)
    # 1 s -> 101 mel frames -> (101-10)//8+1 = 12 stacked frames
    assert feats.shape == (3, 12, 1280)
    np.testing.assert_array_equal(
        np.asarray(flens), [12, (51 - 10) // 8 + 1, (26 - 10) // 8 + 1]
    )


def test_features_batch_augment_runs(rng):
    cfg = fe.FrontendConfig()
    audio = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    lens = jnp.array([16000, 12000])
    feats, flens = fe.features_batch(
        audio, lens, cfg, rng=jax.random.PRNGKey(0), augment=True
    )
    assert feats.shape == (2, 12, 1280)
    assert np.isfinite(np.asarray(feats)).all()
    assert (np.asarray(flens) >= 1).all()


def test_mask_freq_changes_bands(rng):
    x = jnp.asarray(rng.standard_normal((2, 20, 16)).astype(np.float32))
    out = fe.mask_freq(x, jax.random.PRNGKey(1), num_masks=2, size=4)
    assert out.shape == x.shape
    assert (np.asarray(out) != np.asarray(x)).any()


def test_compute_deltas_constant_signal():
    x = jnp.ones((1, 12, 8))
    d = fe.compute_deltas(x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_frontend_config_reads_specaugment_stages():
    """SpecAugment params follow the config's feature pipeline: stage
    present -> its args apply; stage absent -> that augmentation is off
    (reference transforms.py:345-427 semantics). Previously the YAML
    args were silently ignored and hard defaults always applied."""
    from libreasr_tpu.ops.frontend import FrontendConfig

    conf = {
        "transforms": {"features": [
            {"name": "LogMelSpectrogram"},
            {"name": "MaskTime", "wrap": True,
             "args": {"num_masks": 7, "size": 3}},
            {"name": "StackDownsample", "args": {"downsample": 8}},
        ]},
    }
    cfg = FrontendConfig.from_config(conf)
    assert cfg.time_masks == 7 and cfg.time_mask_size == 3
    assert cfg.freq_masks == 0 and cfg.cut_max_front == 0  # absent = off

    # no feature list at all: programmatic defaults stay
    cfg2 = FrontendConfig.from_config({})
    assert cfg2.time_masks == 4 and cfg2.freq_masks == 4


def test_features_batch_augment_noop_when_disabled(rng):
    """augment=True with all SpecAugment stages disabled must equal the
    un-augmented features (the recipe's --no-augment path)."""
    import jax
    import jax.numpy as jnp

    from libreasr_tpu.ops.frontend import FrontendConfig, features_batch

    cfg = FrontendConfig(
        cut_max_front=0, cut_max_back=0, time_masks=0, time_mask_size=0,
        freq_masks=0, freq_mask_size=0,
    )
    audio = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    lens = jnp.array([16000, 12000])
    a, la = features_batch(audio, lens, cfg, rng=jax.random.PRNGKey(0),
                           augment=True)
    b, lb = features_batch(audio, lens, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
