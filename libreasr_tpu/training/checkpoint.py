"""Checkpointing: orbax for train state, tar.gz bundles for release.

Mirrors the reference's two formats:
- training checkpoints incl. optimizer state (fastai learn.save
  with_opt=True, libreasr.ipynb cells 20-21) -> orbax StandardCheckpointer
- distribution bundles: tar.gz of {lang}/model + {lang}/tokenizer
  (model_utils.py:30-58), here with flax msgpack weights + the LABPE1
  tokenizer model + the resolved config.
"""

from __future__ import annotations

import json
import os
import tarfile
import tempfile

import jax
import numpy as np
from flax import serialization


def save_train_state(path: str, state, carries: dict | None = None):
    """Orbax checkpoint of the full TrainState (+ bucket carries)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    payload = {"state": _to_pytree(state)}
    if carries:
        payload["carries"] = {str(k): _to_pytree(v) for k, v in carries.items()}
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()


def restore_train_state(path: str, state, carries: dict | None = None):
    """Restore into the structure of `state` (and optional carries)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    target = {"state": _to_pytree(state)}
    if carries:
        target["carries"] = {str(k): _to_pytree(v) for k, v in carries.items()}
    restored = ckpt.restore(path, target=target)
    new_state = serialization.from_state_dict(state, restored["state"])
    new_carries = None
    if carries:
        new_carries = {
            k: serialization.from_state_dict(v, restored["carries"][str(k)])
            for k, v in carries.items()
        }
    return new_state, new_carries


def _to_pytree(x):
    return serialization.to_state_dict(x)


def restore_params_only(path: str, params_template, batch_stats_template=None):
    """Restore just params/batch_stats/step from a train-state checkpoint.

    The full opt_state tree depends on exactly how the optimizer was
    built (LR-schedule counts, MultiSteps wrappers, ...), so a target
    built from a fresh `tx.init` can structurally mismatch a checkpoint
    written by a differently-configured run. Bundle export only needs
    the model variables — restore target-free and map the subtrees.

    Returns (params, batch_stats_or_None, step:int).
    """
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    restored = ckpt.restore(os.path.abspath(path))
    st = restored["state"]
    params = serialization.from_state_dict(params_template, st["params"])
    batch_stats = None
    if batch_stats_template is not None:
        batch_stats = serialization.from_state_dict(
            batch_stats_template, st.get("batch_stats", {}))
    step = int(np.asarray(st.get("step", 0)))
    return params, batch_stats, step


# ---------------------------------------------------------------------------
# release bundles (tar.gz, reference model_utils.py layout)
# ---------------------------------------------------------------------------


def save_bundle(
    out_path: str,
    lang_name: str,
    variables,
    conf: dict,
    tokenizer_file: str | None = None,
    lm_variables=None,
):
    """tar.gz with {lang}/model.msgpack [+ {lang}/tokenizer.labpe-model,
    {lang}/lm.msgpack, {lang}/config.json] (model_utils.py:30-58)."""
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        d = os.path.join(tmp, lang_name)
        os.makedirs(d)
        with open(os.path.join(d, "model.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(variables))
        if lm_variables is not None:
            with open(os.path.join(d, "lm.msgpack"), "wb") as f:
                f.write(serialization.to_bytes(lm_variables))
        if tokenizer_file and os.path.exists(tokenizer_file):
            import shutil

            shutil.copy(tokenizer_file, os.path.join(d, "tokenizer.labpe-model"))
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(_json_safe(conf), f, indent=2)
        with tarfile.open(out_path, "w:gz") as tar:
            tar.add(d, arcname=lang_name)
    return out_path


def read_bundle_conf(path: str, lang_name: str) -> dict:
    """Read just the config.json out of a bundle (to size the model
    before deserializing weights)."""
    with tarfile.open(path, "r:gz") as tar:
        try:
            f = tar.extractfile(f"{lang_name}/config.json")
        except KeyError:
            return {}
        return json.load(f) if f else {}


def load_bundle(path: str, lang_name: str, variables_template, extract_to="./tmp"):
    """Extract and load a bundle (model_utils.py:50-95). Returns
    (variables, tokenizer_path_or_None, lm_bytes_or_None, conf)."""
    os.makedirs(extract_to, exist_ok=True)
    with tarfile.open(path, "r:gz") as tar:
        tar.extractall(extract_to, filter="data")
    d = os.path.join(extract_to, lang_name)
    with open(os.path.join(d, "model.msgpack"), "rb") as f:
        variables = serialization.from_bytes(variables_template, f.read())
    tok = os.path.join(d, "tokenizer.labpe-model")
    tok = tok if os.path.exists(tok) else None
    lm_path = os.path.join(d, "lm.msgpack")
    lm_bytes = open(lm_path, "rb").read() if os.path.exists(lm_path) else None
    conf_path = os.path.join(d, "config.json")
    conf = json.load(open(conf_path)) if os.path.exists(conf_path) else {}
    return variables, tok, lm_bytes, conf


def _json_safe(x):
    if isinstance(x, dict):
        return {k: _json_safe(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_json_safe(v) for v in x]
    if isinstance(x, (np.generic, np.ndarray)):
        return x.tolist()
    if isinstance(x, jax.Array):
        return np.asarray(x).tolist()
    return x
