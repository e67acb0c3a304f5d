"""Model checkpoint IO (flax msgpack serialization).

Capability parity with the reference's checkpoint handling: best-metric
state_dict saves + fallback chains (reference ml/train.py:334-341,
pipeline/run_v2.py:95-122). Checkpoints live under <repo>/models_ckpt/
as <name>.msgpack next to a <name>.json metadata sidecar (accuracy,
temperature, training config).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CKPT_DIR = os.path.join(_REPO_ROOT, "models_ckpt")


def _paths(name: str) -> tuple[str, str]:
    return (os.path.join(CKPT_DIR, f"{name}.msgpack"),
            os.path.join(CKPT_DIR, f"{name}.json"))


def save_variables(name: str, variables, metadata: Optional[dict] = None):
    os.makedirs(CKPT_DIR, exist_ok=True)
    data_path, meta_path = _paths(name)
    with open(data_path, "wb") as f:
        f.write(serialization.to_bytes(variables))
    with open(meta_path, "w") as f:
        json.dump(metadata or {}, f, indent=2, default=float)


def load_variables(name: str, template) -> Any:
    """Load into the structure of `template` (from model.init)."""
    data_path, _ = _paths(name)
    with open(data_path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_metadata(name: str) -> dict:
    _, meta_path = _paths(name)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def exists(name: str) -> bool:
    return os.path.exists(_paths(name)[0])


def load_variables_or_none(name: str, template=None):
    """Best-effort load; None when the checkpoint is absent.

    Without a template the raw msgpack tree is restored (dict of numpy
    arrays) — valid input for flax Module.apply.
    """
    if not exists(name):
        return None
    data_path, _ = _paths(name)
    with open(data_path, "rb") as f:
        raw = f.read()
    if template is not None:
        return serialization.from_bytes(template, raw)
    state = serialization.msgpack_restore(raw)
    return jax.tree_util.tree_map(jnp.asarray, state)


def load_first(names: list[str], template=None):
    """Fallback chain: first existing checkpoint wins (reference
    pipeline/run_v2.py:104-110). Returns (name, variables) or (None, None)."""
    for name in names:
        v = load_variables_or_none(name, template)
        if v is not None:
            return name, v
    return None, None
