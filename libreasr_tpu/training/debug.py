"""Debugging & profiling utilities.

TPU-native equivalents of the reference's hand tooling:
- `activation_stats` — per-module activation statistics via flax
  capture_intermediates (reference hook_debug forward hooks,
  utils.py:87-128)
- `param_stats` — weight histograms summary (reference qna,
  utils.py:73-84)
- `perf_trace` — jax.profiler trace context (replaces the hand-rolled
  start_perf/stop_perf ms printers, models.py:278-285)
- `enable_nan_debugging` — jax debug_nans (replaces check()/
  TerminateOnNaN sanitizers for debugging runs)
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


def activation_stats(model, variables, *args, **kwargs) -> dict[str, dict]:
    """Run a forward pass capturing every module's output stats."""
    out, state = model.apply(
        variables, *args, capture_intermediates=True, mutable=["intermediates"],
        **kwargs,
    )
    stats = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                for leaf in jax.tree_util.tree_leaves(v):
                    a = np.asarray(leaf)
                    if a.dtype.kind != "f":
                        continue
                    stats[name] = {
                        "mean": float(a.mean()),
                        "std": float(a.std()),
                        "absmax": float(np.abs(a).max()),
                        "nan": bool(np.isnan(a).any()),
                    }
    walk(state["intermediates"])
    return stats


def param_stats(params) -> dict[str, dict]:
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        a = np.asarray(leaf)
        if a.dtype.kind != "f":
            continue
        out[jax.tree_util.keystr(path)] = {
            "shape": list(a.shape),
            "mean": float(a.mean()),
            "std": float(a.std()),
        }
    return out


@contextlib.contextmanager
def perf_trace(logdir: str = "/tmp/jax-trace"):
    """Profile a region: `with perf_trace(): step(...)` then inspect with
    xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
