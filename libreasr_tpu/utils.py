"""Small shared utilities.

TPU-native counterpart of libreasr/lib/utils.py in the reference
(check/what/n_params/tensorize/standardize/sanitize_str).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30  # safe -inf stand-in (avoids nan from -inf + -inf)


def n_params(tree) -> int:
    """Total number of parameters in a pytree (reference utils.py:27)."""
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def check_finite(tree, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (reference utils.py:35-49)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if not np.all(np.isfinite(arr)):
            raise ValueError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )


def tensorize(data: bytes) -> np.ndarray:
    """bytes (f32 little-endian pcm) -> float32 array (reference utils.py:149)."""
    return np.frombuffer(data, dtype=np.float32).copy()


def standardize(x, eps: float = 1e-6):
    """Zero-mean/unit-std normalize (reference utils.py:162)."""
    return (x - x.mean()) / (x.std() + eps)


_SANITIZE_RE = re.compile(r"[^a-z' ]")


def sanitize_str(s: str) -> str:
    """Label cleanup (reference utils.py:167): lowercase, strip non [a-z' ])."""
    s = s.lower().replace("-", " ").replace("_", " ")
    s = _SANITIZE_RE.sub("", s)
    return re.sub(r"\s+", " ", s).strip()


def log_softmax(x, axis: int = -1):
    return jax.nn.log_softmax(x, axis=axis)


def enable_compilation_cache(path: str = "tmp/jax_cache") -> None:
    """Persistent XLA compilation cache — first compiles in this
    environment run through a remote-compile tunnel and cost minutes, so
    caching across processes matters."""
    import os

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs


def make_lengths_mask(lengths, max_len: int, dtype=jnp.bool_):
    """[N] lengths -> [N, max_len] validity mask."""
    t = jnp.arange(max_len)[None, :]
    return (t < lengths[:, None]).astype(dtype)
