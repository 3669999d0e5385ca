"""Driver entry points: entry() compiles (tiny variant) and
dryrun_multichip runs a full sharded train step on the 8-device CPU
mesh."""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _load_graft():
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dryrun_multichip_8(capsys):
    graft = _load_graft()
    graft.dryrun_multichip(8)
    assert "dryrun_multichip ok" in capsys.readouterr().out


def test_entry_tiny_compiles():
    """entry() builds the flagship (70M) — too slow for unit tests; the
    same code path is exercised with the tiny config here."""
    graft = _load_graft()
    cfg, model, variables = graft._flagship(tiny=True)

    def fn(variables, x, y, xl, yl):
        logits, _ = model.apply(variables, x, y, xl, yl)
        return logits

    n, t, u = 2, 10, 4
    out = jax.jit(fn)(
        variables,
        jnp.zeros((n, t, cfg.feature_sz)),
        jnp.ones((n, u), jnp.int32),
        jnp.array([t, t - 2]),
        jnp.array([u, u - 1]),
    )
    assert out.shape == (n, t, u + 1, cfg.vocab_sz)
    assert np.isfinite(np.asarray(out)).all()
