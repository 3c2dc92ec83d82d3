"""Checkpoint / resume subsystem.

The reference has no checkpoint framework — only ad-hoc
``get_parameters``/``set_parameters`` dicts (reference:
autompc/sysid/model.py:207-221) and debug-flag pickles of surrogates
(tuning/pipeline_tuner.py:209-219); SMAC tuning is not resumable
mid-run. Here checkpointing is first-class:

* model parameters are numpy pytrees saved/loaded atomically;
* the batched BO tuner's full state (encoded history + costs + configs)
  snapshots after every batch, so a killed tuning run resumes exactly
  where it stopped (``PipelineTuner.run(checkpoint_path=...)``).
"""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any, Dict

import numpy as np


def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]):
    """Atomic pickle write (write temp + rename)."""
    payload = _to_numpy(payload)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_model(path: str, model):
    """Save a trained model's parameters + identifying metadata."""
    save_checkpoint(
        path,
        {
            "kind": "model",
            "class": type(model).__name__,
            "params": model.get_parameters(),
        },
    )


def load_model_params(path: str):
    ckpt = load_checkpoint(path)
    if ckpt.get("kind") != "model":
        raise ValueError(f"{path} is not a model checkpoint")
    return ckpt["params"]


def restore_model(path: str, model):
    """Load parameters into an already-constructed (untrained) model of
    the matching class."""
    ckpt = load_checkpoint(path)
    if ckpt.get("class") != type(model).__name__:
        raise ValueError(
            f"Checkpoint is for {ckpt.get('class')}, got {type(model).__name__}"
        )
    model.set_parameters(ckpt["params"])
    return model


# -- tuner state ---------------------------------------------------------


def bo_state_dict(bo) -> Dict[str, Any]:
    return {
        "kind": "bo_state",
        "X": [np.asarray(x) for x in bo._X],
        "y": list(bo._y),
        "cfg_dicts": [c.get_dictionary() for c in bo._cfgs],
        "default_proposed": bo._default_proposed,
    }


def bo_load_state(bo, state: Dict[str, Any]):
    if state.get("kind") != "bo_state":
        raise ValueError("Not a BO state checkpoint")
    bo._X = [np.asarray(x) for x in state["X"]]
    bo._y = list(state["y"])
    bo._cfgs = [
        bo.space.configuration_from_dict(d) for d in state["cfg_dicts"]
    ]
    bo._default_proposed = bool(state["default_proposed"])
    return bo
