"""Audio feature frontend as pure, jittable JAX functions.

TPU-native replacement for the reference's per-item torch transforms
(libreasr/lib/transforms.py): here the whole
STFT -> log-mel -> SpecAugment -> stack/downsample chain is one fused XLA
program operating on a *batch* of padded signals, so feature extraction
rides the MXU (mel projection is a matmul) instead of per-utterance host
DSP through torchaudio/sox.

Numerical parity targets (reference constants):
- MelSpectrogram n_fft=1024, win 25 ms, hop 10 ms, 128 mels, HTK mel
  scale, power 2.0, center+reflect pad   (transforms.py:269-296)
- log(mel + 1e-6)                        (transforms.py:311-313)
- StackDownsample unfold n_stack=10 stride 8, feature-major flatten
  -> 1280-dim frames                     (transforms.py:429-441)
- SpecAugment MyCutFrames/MyMaskTime/MyMaskFreq (transforms.py:345-427)
- StreamPostprocess keeps frames [T//3+1 : T//3+1+n_stack]
                                         (transforms.py:326-342)
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# mel filterbank (host-side constant construction, HTK scale, norm=None —
# matches torchaudio.functional.melscale_fbanks defaults used by the
# reference's MelSpectrogram)
# ---------------------------------------------------------------------------


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int, n_mels: int, sr: int, f_min: float = 0.0, f_max: float | None = None
) -> np.ndarray:
    """[n_freqs, n_mels] triangular filterbank, HTK mel scale, no norm."""
    f_max = f_max if f_max is not None else sr / 2.0
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                      # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]                  # rising edge
    up = slopes[:, 2:] / f_diff[1:]                       # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=4)
def dft_mel_matrices(n_fft: int, n_mels: int, sr: int, win_length: int):
    """Windowed real-DFT as two matmuls (MXU path): returns C, S
    [n_fft, n_freqs] with the Hann window folded in, plus the mel bank.

    |FFT(w*x)|^2 == (x @ C)^2 + (x @ S)^2 — on TPU the MXU matmul
    formulation beats the generic XLA FFT for these sizes.
    """
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    w = hann_window_padded(win_length, n_fft)[:, None]
    c = (np.cos(ang) * w).astype(np.float32)
    s = (-np.sin(ang) * w).astype(np.float32)
    fb = mel_filterbank(n_fft // 2 + 1, n_mels, sr)
    return c, s, fb


@functools.lru_cache(maxsize=8)
def hann_window_padded(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann of win_length, zero-padded centered to n_fft
    (torch.stft semantics when win_length < n_fft)."""
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[left : left + win_length] = w
    return out


# ---------------------------------------------------------------------------
# STFT / log-mel
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """[..., S] -> [..., T, n_fft] frames with center=True reflect padding.

    T = S // hop + 1 (torch.stft center semantics).
    """
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    s = x.shape[-1]
    n_frames = (s - n_fft) // hop + 1
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[..., idx]


def log_mel_spectrogram(
    audio: jnp.ndarray,
    *,
    sr: int = 16000,
    n_fft: int = 1024,
    win_length: float = 0.025,
    hop_length: float = 0.01,
    n_mels: int = 128,
    log_offset: float = 1e-6,
    method: str = "matmul",
) -> jnp.ndarray:
    """[..., S] float pcm -> [..., T, n_mels] log-mel features.

    Matches reference TransformTime (transforms.py:269-313): power
    spectrogram x HTK mel filterbank, then log(x + 1e-6).

    method="matmul" (default) computes the windowed real DFT as two MXU
    matmuls — the TPU-native formulation; method="fft" uses XLA's FFT.
    """
    wl = int(win_length * sr)
    hl = int(hop_length * sr)
    frames = frame_signal(audio.astype(jnp.float32), n_fft, hl)
    if method == "matmul":
        c, s, fb = dft_mel_matrices(n_fft, n_mels, sr, wl)
        # HIGHEST: TPU f32 matmuls default to bf16 multiplies — too
        # coarse for a DFT (log of small power bins would drift)
        hi = jax.lax.Precision.HIGHEST
        re = jnp.dot(frames, jnp.asarray(c), precision=hi)
        im = jnp.dot(frames, jnp.asarray(s), precision=hi)
        power = re * re + im * im
    else:
        window = jnp.asarray(hann_window_padded(wl, n_fft))
        spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
        power = jnp.abs(spec) ** 2                           # [..., T, F]
        n_mels_fb = mel_filterbank(n_fft // 2 + 1, n_mels, sr)
        return jnp.log(power @ jnp.asarray(n_mels_fb) + log_offset)
    mel = jnp.dot(power, jnp.asarray(fb), preferred_element_type=jnp.float32)
    return jnp.log(mel + log_offset)


def num_frames(n_samples, hop: int):
    """Sample count -> frame count under center=True stft."""
    return n_samples // hop + 1


def compute_deltas(x: jnp.ndarray, win_length: int = 3) -> jnp.ndarray:
    """torchaudio.functional.compute_deltas over the time axis of
    [..., T, F] (reference delta_op, transforms.py:297; deltas=0 in the
    shipped config but supported)."""
    n = (win_length - 1) // 2
    denom = n * (n + 1) * (2 * n + 1) / 3.0
    kernel = np.arange(-n, n + 1, dtype=np.float32)
    xt = jnp.moveaxis(x, -2, -1)  # [..., F, T]
    pad = [(0, 0)] * (xt.ndim - 1) + [(n, n)]
    xt = jnp.pad(xt, pad, mode="edge")
    out = sum(kernel[i] * xt[..., i : i + x.shape[-2]] for i in range(win_length))
    return jnp.moveaxis(out / denom, -1, -2)


# ---------------------------------------------------------------------------
# SpecAugment (batched, mask-based — no dynamic shapes)
# ---------------------------------------------------------------------------


def cut_frames(
    x: jnp.ndarray,
    lengths: jnp.ndarray,
    rng: jax.Array,
    *,
    max_front: int = 1,
    max_back: int = 1,
):
    """Random front/back frame cut (reference MyCutFrames,
    transforms.py:345-363). Under static shapes this becomes a left-roll
    by `front` plus a length reduction of `front + back`.

    x: [N, T, F]; lengths: [N]. Returns (x, new_lengths).
    """
    n = x.shape[0]
    kf, kb = jax.random.split(rng)
    f = jax.random.randint(kf, (n,), 0, max_front + 1)
    b = jax.random.randint(kb, (n,), 0, max_back + 1)
    t = jnp.arange(x.shape[1])
    # per-sample roll left by f: out[:, i] = x[:, i + f]
    idx = (t[None, :] + f[:, None]) % x.shape[1]
    x = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    new_len = jnp.maximum(lengths - f - b, 1)
    return x, new_len


def _mask_axis(x, lengths, rng, axis_len, num_masks, size, axis):
    """Shared impl for time/freq masking with per-sample channel-mean fill
    (reference MyMaskTime fills with the spectrogram mean,
    transforms.py:366-401)."""
    n = x.shape[0]
    fill = jnp.mean(x, axis=(1, 2), keepdims=True)
    pos = jnp.arange(axis_len)
    starts = jax.random.randint(
        rng, (n, num_masks), 0, jnp.maximum(axis_len - size, 1)
    )
    # [N, axis_len] True where masked
    hit = jnp.any(
        (pos[None, None, :] >= starts[:, :, None])
        & (pos[None, None, :] < starts[:, :, None] + size),
        axis=1,
    )
    shape = [n, 1, 1]
    shape[axis] = axis_len
    hit = hit.reshape(shape)
    return jnp.where(hit, fill, x)


def mask_time(x, rng, *, num_masks=4, size=2, lengths=None):
    """SpecAugment time masking on [N, T, F]."""
    return _mask_axis(x, lengths, rng, x.shape[1], num_masks, size, axis=1)


def mask_freq(x, rng, *, num_masks=4, size=4):
    """SpecAugment frequency masking on [N, T, F]."""
    return _mask_axis(x, None, rng, x.shape[2], num_masks, size, axis=2)


# ---------------------------------------------------------------------------
# stack / downsample
# ---------------------------------------------------------------------------


def stack_downsample(
    x: jnp.ndarray, *, n_stack: int = 10, downsample: int = 8
) -> jnp.ndarray:
    """[..., T, F] -> [..., T', F * n_stack], T' = (T - n_stack)//ds + 1.

    Exact layout parity with the reference's unfold+view
    (transforms.py:429-441): out[..., t, h * n_stack + s] =
    x[..., t * ds + s, h] (feature-major, stack-minor).
    """
    t = x.shape[-2]
    n_out = (t - n_stack) // downsample + 1
    idx = np.arange(n_out)[:, None] * downsample + np.arange(n_stack)[None, :]
    win = x[..., idx, :]                       # [..., T', S, F]
    win = jnp.swapaxes(win, -1, -2)            # [..., T', F, S]
    return win.reshape(*win.shape[:-2], -1)


def stacked_length(t_frames, *, n_stack: int = 10, downsample: int = 8):
    """Frame-count transform matching stack_downsample."""
    return jnp.maximum((t_frames - n_stack) // downsample + 1, 0)


# NOTE: the reference's StreamPostprocess middle-third crop
# (transforms.py:326-342) has no equivalent here by design: the exact
# incremental frontend (models/streaming.py) makes the crop-and-overlap
# scheme unnecessary.


# ---------------------------------------------------------------------------
# fused batched pipeline
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FrontendConfig:
    sr: int = 16000
    n_fft: int = 1024
    win_length: float = 0.025
    hop_length: float = 0.01
    n_mels: int = 128
    deltas: int = 0
    delta_win_length: int = 3
    n_stack: int = 10
    downsample: int = 8
    # SpecAugment
    cut_max_front: int = 1
    cut_max_back: int = 1
    time_masks: int = 4
    time_mask_size: int = 2
    freq_masks: int = 4
    freq_mask_size: int = 4

    @property
    def hop(self) -> int:
        return int(self.hop_length * self.sr)

    @property
    def feature_sz(self) -> int:
        return self.n_mels * (1 + self.deltas) * self.n_stack

    @classmethod
    def from_config(cls, conf: dict) -> "FrontendConfig":
        mk = conf.get("melkwargs", {})
        kw = dict(
            sr=conf.get("sr", 16000),
            n_fft=mk.get("n_fft", 1024),
            n_mels=mk.get("n_mels", 128),
            win_length=conf.get("win_length", 0.025),
            hop_length=conf.get("hop_length", 0.01),
            deltas=conf.get("deltas", 0),
            delta_win_length=conf.get("delta_win_length", 3),
        )
        # SpecAugment follows the config's feature pipeline (reference
        # transforms.py:345-427: a stage present = that augmentation on,
        # with its args; absent = off). Configs without a feature list
        # keep the dataclass defaults (programmatic use).
        feats = (conf.get("transforms") or {}).get("features")
        if feats:
            def stage(name):
                for s in feats:
                    if (s or {}).get("name") == name:
                        return s.get("args") or {}
                return None

            cut, mt, mf = (
                stage("CutFrames"), stage("MaskTime"), stage("MaskFreq")
            )
            kw.update(
                cut_max_front=cut.get("max_front", 1) if cut is not None else 0,
                cut_max_back=cut.get("max_back", 1) if cut is not None else 0,
                time_masks=mt.get("num_masks", 4) if mt is not None else 0,
                time_mask_size=mt.get("size", 2) if mt is not None else 0,
                freq_masks=mf.get("num_masks", 4) if mf is not None else 0,
                freq_mask_size=mf.get("size", 4) if mf is not None else 0,
            )
            sd = stage("StackDownsample")
            if sd is not None:
                kw.update(
                    n_stack=sd.get("n_stack", 10),
                    downsample=sd.get("downsample", 8),
                )
        return cls(**kw)

    def out_length(self, n_samples):
        return stacked_length(
            num_frames(n_samples, self.hop),
            n_stack=self.n_stack,
            downsample=self.downsample,
        )


def features_batch(
    audio: jnp.ndarray,
    sample_lengths: jnp.ndarray,
    cfg: FrontendConfig,
    *,
    rng: jax.Array | None = None,
    augment: bool = False,
):
    """Full device frontend on a padded batch.

    audio: [N, S] float pcm — or int16 wire-quantized pcm, decoded here
    on device so batches can travel host->device at half the bytes (the
    training analog of the serving engine's transfer codec; lossless
    for 16-bit capture chains). sample_lengths: [N].
    Returns (features [N, T', feature_sz], frame_lengths [N]).
    """
    if jnp.issubdtype(audio.dtype, jnp.integer):
        audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    mel = log_mel_spectrogram(
        audio,
        sr=cfg.sr,
        n_fft=cfg.n_fft,
        win_length=cfg.win_length,
        hop_length=cfg.hop_length,
        n_mels=cfg.n_mels,
    )
    if cfg.deltas:
        ds = [mel]
        d = mel
        for _ in range(cfg.deltas):
            d = compute_deltas(d, cfg.delta_win_length)
            ds.append(d)
        mel = jnp.concatenate(ds, axis=-1)
    frame_len = num_frames(sample_lengths, cfg.hop)
    if augment:
        assert rng is not None, "augment=True requires rng"
        k1, k2, k3 = jax.random.split(rng, 3)
        if cfg.cut_max_front or cfg.cut_max_back:
            mel, frame_len = cut_frames(
                mel, frame_len, k1,
                max_front=cfg.cut_max_front, max_back=cfg.cut_max_back,
            )
        if cfg.time_masks and cfg.time_mask_size:
            mel = mask_time(
                mel, k2, num_masks=cfg.time_masks, size=cfg.time_mask_size
            )
        if cfg.freq_masks and cfg.freq_mask_size:
            mel = mask_freq(
                mel, k3, num_masks=cfg.freq_masks, size=cfg.freq_mask_size
            )
    feats = stack_downsample(mel, n_stack=cfg.n_stack, downsample=cfg.downsample)
    out_len = stacked_length(frame_len, n_stack=cfg.n_stack, downsample=cfg.downsample)
    out_len = jnp.clip(out_len, 1, feats.shape[1])
    return feats, out_len
