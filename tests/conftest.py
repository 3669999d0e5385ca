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


def _validate_cache(cache_dir):
    """Execute a canary program against the persistent cache in a
    SUBPROCESS before the suite trusts it. A cache whose artifacts this
    host cannot execute (foreign AOT entries that slip past the
    cpu-feature key, or entries truncated by a killed writer) dies with
    `Fatal Python error: Aborted` at EXECUTION time — uncatchable
    in-process, so the probe must be a child. Every session writes the
    same canary entry (min_compile_time 0), so a poisoned cache fails
    the probe and is purged instead of aborting the suite mid-run."""
    import shutil
    import subprocess
    import sys

    marker = os.path.join(cache_dir, "canary.ok")
    entries = [e for e in os.listdir(cache_dir) if e != "canary.ok"]
    if entries and not os.path.exists(marker):
        # a cache populated before this guard existed has no canary
        # entry to probe — it cannot be validated, only distrusted
        shutil.rmtree(cache_dir, ignore_errors=True)
        os.makedirs(cache_dir, exist_ok=True)
    elif entries and os.path.exists(marker):
        # nothing written since the last successful probe — skip the
        # child-process JAX import (it costs seconds per pytest start)
        try:
            newest = max(
                os.path.getmtime(os.path.join(cache_dir, e)) for e in entries
            )
            if os.path.getmtime(marker) >= newest:
                return
        except OSError:
            pass  # raced a writer; fall through to the probe
    code = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax, jax.numpy as jnp\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"jax.config.update('jax_compilation_cache_dir', {cache_dir!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "x = jnp.arange(1024.0).reshape(32, 32)\n"
        "print(float(jax.jit(lambda v: (v @ v.T + 1.0).sum())(x)))\n"
    )
    for _ in range(2):  # second pass seeds a fresh cache after a purge
        try:
            ok = (
                subprocess.run(
                    [sys.executable, "-c", code],
                    capture_output=True, timeout=300,
                ).returncode
                == 0
            )
        except Exception:
            ok = False
        if ok:
            with open(marker, "w") as f:
                f.write("ok\n")
            return
        shutil.rmtree(cache_dir, ignore_errors=True)
        os.makedirs(cache_dir, exist_ok=True)


_cache = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "tmp", f"jax_cache_cpu_{_cpu_feature_tag()}"
))
os.makedirs(_cache, exist_ok=True)
_validate_cache(_cache)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
