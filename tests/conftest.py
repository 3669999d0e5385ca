"""Pytest configuration.

All unit tests run on CPU with 8 virtual XLA devices so that multi-chip
sharding (jax.sharding.Mesh) is exercised without TPU hardware
(SURVEY.md §4: multi-chip tests via xla_force_host_platform_device_count).
"""

import os

# Must be set before jax initializes a backend. The environment may pin
# JAX_PLATFORMS to a hardware plugin (e.g. "axon"); the explicit
# jax.config.update below overrides it so tests always run on 8 virtual
# CPU devices.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite jit-compiles hundreds of programs;
# warm runs cut minutes.
#
# The cache dir is keyed by a hash of the host CPU features: XLA:CPU AOT
# artifacts embed the compiling host's ISA (e.g. "+prefer-no-scatter"),
# and *executing* an artifact compiled for a different host raises
# `Fatal Python error: Aborted` mid-suite (seen when a repo clone moves
# between machines). Keying the dir makes a foreign cache simply miss
# instead of abort.


def _cpu_feature_tag():
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


_cache = os.path.join(
    os.path.dirname(__file__), "..", "tmp", f"jax_cache_cpu_{_cpu_feature_tag()}"
)
os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
