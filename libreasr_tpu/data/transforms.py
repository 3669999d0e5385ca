"""Host-side audio/label pipeline stages.

The reference runs ~25 fastai Transform classes per item in DataLoader
workers (libreasr/lib/transforms.py); in the TPU build only the
*host-bound* stages live here (file I/O, resampling, waveform augs,
label handling) — everything spectral (mel, SpecAugment, stacking) is a
device program (ops/frontend.py) fused into the train step.

Stages are resolved by name from the YAML transform lists
(config.py:45-69 semantics): each stage is a callable item -> item where
item is a dict {audio [S] float32, sr, label str, ids list[int], ...}.
Stages marked wrap=true are disabled when random=False (validation /
inference), matching utils.wrap_transform (utils.py:136-146).
"""

from __future__ import annotations

import random as pyrandom
from dataclasses import dataclass
from typing import Callable

import numpy as np

from . import audio as audio_io


@dataclass
class Stage:
    fn: Callable
    name: str
    random: bool = False  # augmentation stage — skipped when not training

    def __call__(self, item, *, training: bool = True):
        if self.random and not training:
            return item
        return self.fn(item)


# ---- audio stages ---------------------------------------------------------


def OpenAudio(**kw):
    """Read (a span of) an audio file (MyOpenAudio/OpenAudioSpan,
    transforms.py:104-119). On read failure yields 1 s of silence — the
    reference's DUMMY_AUDIO error masking (transforms.py:41-42)."""

    def fn(item):
        try:
            pcm, sr = audio_io.read_audio(item["file"])
            xstart = float(item.get("xstart", 0) or 0)
            xlen = float(item.get("xlen", 0) or 0)
            if xlen > 0:
                a = int(xstart / 1000.0 * sr)
                b = a + int(xlen / 1000.0 * sr)
                pcm = pcm[:, a:b]
            item["audio"] = pcm
            item["sr"] = sr
        except Exception:
            item["audio"] = np.zeros((1, 16000), np.float32)
            item["sr"] = 16000
            item["bad"] = True
        return item

    return Stage(fn, "OpenAudio")


def ChannelCut(**kw):
    """Keep channel 0 (transforms.py:122)."""

    def fn(item):
        a = item["audio"]
        item["audio"] = a[0] if a.ndim == 2 else a
        return item

    return Stage(fn, "ChannelCut")


def Resample(sr: int = 16000, **kw):
    def fn(item):
        if item["sr"] != sr:
            item["audio"] = audio_io.resample(item["audio"], item["sr"], sr)
            item["sr"] = sr
        return item

    return Stage(fn, "Resample")


def SpeedPerturb(delta: int = 10, sr: int = 16000, **kw):
    """±delta% speed change via resampling (ResamplePoly,
    transforms.py:147-165)."""

    def fn(item):
        pct = pyrandom.randint(-delta, delta)
        if pct:
            new_sr = int(sr * (100 + pct) / 100)
            item["audio"] = audio_io.resample(item["audio"], sr, new_sr)
        return item

    return Stage(fn, "SpeedPerturb", random=True)


def ChangeVolume(pcent: float = 0.03, **kw):
    """Random gain (transforms.py:167-182)."""

    def fn(item):
        g = 1.0 + pyrandom.uniform(-pcent, pcent)
        item["audio"] = item["audio"] * g
        return item

    return Stage(fn, "ChangeVolume", random=True)


def AddNoise(noise_level: float = 0.05, color: int = 0, **kw):
    """Additive white noise scaled by signal std (MyAddNoise,
    transforms.py:184-196)."""

    def fn(item):
        a = item["audio"]
        lvl = pyrandom.uniform(0, noise_level) * (np.std(a) + 1e-6)
        item["audio"] = a + np.random.randn(*a.shape).astype(np.float32) * lvl
        return item

    return Stage(fn, "AddNoise", random=True)


def SignalShifter(max_time: float = 0.1, direction: int = 1, sr: int = 16000, **kw):
    """Roll the signal in time (MySignalShifter, transforms.py:198-210)."""

    def fn(item):
        shift = int(pyrandom.uniform(0, max_time) * sr) * (
            direction if direction else pyrandom.choice([-1, 1])
        )
        item["audio"] = np.roll(item["audio"], shift)
        return item

    return Stage(fn, "SignalShifter", random=True)


def PadderCutter(almins: float = 0.5, almaxs: float = 6.0, sr: int = 16000, **kw):
    """Pad to >= almins s, cut to <= almaxs s (transforms.py:212-238)."""

    def fn(item):
        a = item["audio"]
        lo, hi = int(almins * sr), int(almaxs * sr)
        if len(a) < lo:
            a = np.pad(a, (0, lo - len(a)))
        if len(a) > hi:
            a = a[:hi]
        item["audio"] = a
        return item

    return Stage(fn, "PadderCutter")


# ---- label stages ---------------------------------------------------------


def OpenLabel(**kw):
    def fn(item):
        item["label"] = str(item.get("label", ""))
        return item

    return Stage(fn, "OpenLabel")


def PadCutLabel(y_max: int = 60, **kw):
    def fn(item):
        item["label"] = item["label"][:y_max]
        return item

    return Stage(fn, "PadCutLabel")


def Numericalize(lang=None, **kw):
    def fn(item):
        item["ids"] = lang.numericalize(item["label"])
        return item

    return Stage(fn, "Numericalize")


def AddLen(**kw):
    def fn(item):
        item["ylen"] = len(item["ids"])
        return item

    return Stage(fn, "AddLen")


_REGISTRY = {
    "OpenAudio": OpenAudio,
    "MyOpenAudio": OpenAudio,       # reference names accepted
    "ChannelCut": ChannelCut,
    "Resample": Resample,
    "SpeedPerturb": SpeedPerturb,
    "ResamplePoly": SpeedPerturb,
    "ChangeVolume": ChangeVolume,
    "AddNoise": AddNoise,
    "MyAddNoise": AddNoise,
    "SignalShifter": SignalShifter,
    "MySignalShifter": SignalShifter,
    "PadderCutter": PadderCutter,
    "OpenLabel": OpenLabel,
    "MyOpenLabel": OpenLabel,
    "PadCutLabel": PadCutLabel,
    "Numericalize": Numericalize,
    "MyNumericalize": Numericalize,
    "AddLen": AddLen,
}


def parse_stages(specs: list[dict], conf: dict, lang=None) -> list[Stage]:
    """Resolve YAML stage specs by name with shared kwargs
    (reference parse_transforms, config.py:45-69)."""
    shared = dict(
        sr=conf.get("sr", 16000),
        almins=conf.get("almins", 0.5),
        almaxs=conf.get("almaxs", 6.0),
        y_max=conf.get("y_max", 60),
        lang=lang,
    )
    stages = []
    for spec in specs or []:
        name = spec["name"]
        if name not in _REGISTRY:
            continue  # device-side stage (handled by ops/frontend.py)
        kw = dict(shared)
        kw.update(spec.get("args", {}) or {})
        stage = _REGISTRY[name](**kw)
        if spec.get("wrap"):
            stage.random = True
        stages.append(stage)
    return stages


class Pipeline:
    def __init__(self, stages: list[Stage], training: bool = True):
        self.stages = stages
        self.training = training

    def __call__(self, item: dict) -> dict:
        for s in self.stages:
            item = s(item, training=self.training)
        return item
