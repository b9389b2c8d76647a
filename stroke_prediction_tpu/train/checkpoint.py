"""Checkpoint I/O with the reference's file-naming contract.

The reference pickles whole torch modules to ``<base><marker><suffix>.model``
plus optimizer state to ``.optim`` and jsonpickled metric curves to
``.json`` (Learner.py:90-114).  Here a checkpoint is a self-describing
msgpack file: a pytree of arrays (params, batch_stats, optionally opt
state) together with a JSON model-config header, so a tester can rebuild
the model from the ``.model`` file alone — same capability as torch's
module pickling without arbitrary code execution.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state: Dict[str, Any],
                    config: Optional[Dict[str, Any]] = None) -> None:
    # to_state_dict flattens custom containers (e.g. optax hyperparam
    # states) into plain dicts that msgpack can serialize
    payload = {"state": _to_host(serialization.to_state_dict(state))}
    if config is not None:
        payload["__config__"] = np.frombuffer(
            json.dumps(config).encode(), dtype=np.uint8).copy()
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str):
    """Returns (state_dict, config_dict_or_None)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    config = None
    if "__config__" in payload:
        config = json.loads(bytes(payload["__config__"].tobytes()).decode())
    return payload["state"], config


def save_curves(path: str, curves: Dict[str, Any]) -> None:
    """Metric curves as plain JSON (reference stores jsonpickled DTO lists,
    Learner.py:97-110; ours is an equivalent plain-JSON schema:
    {'training': [epoch_dict...], 'validate': [epoch_dict...]})."""

    def default(o):
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        if isinstance(o, np.ndarray):
            return o.tolist()
        if o == float("inf"):
            return "Infinity"
        raise TypeError(type(o))

    with open(path, "w") as f:
        json.dump(curves, f, default=default)


def load_curves(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return json.load(f)
