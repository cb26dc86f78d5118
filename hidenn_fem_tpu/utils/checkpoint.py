"""Checkpoint / resume for solve state.

The reference has none (SURVEY.md §5: no torch.save/load anywhere; a
crashed run restarts from scratch).  Long multi-chip r-adaptivity runs need
periodic checkpoints + deterministic resume, so this module saves/restores
``(params, opt_state, step, metadata)`` as msgpack via flax.serialization
— a single self-describing file, no directory layout or async machinery
needed at this state size (nodal arrays are O(N), tiny).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]

_MAGIC = b"HDNNTPU1"


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: int = 0, metadata: Optional[dict] = None) -> str:
    """Serialize solve state to ``path`` (atomic rename)."""
    payload = {
        # to_state_dict flattens arbitrary pytrees (incl. optax NamedTuple
        # states) into msgpack-able nested dicts
        "params": jax.tree.map(np.asarray,
                               serialization.to_state_dict(params)),
        "opt_state": (jax.tree.map(np.asarray,
                                   serialization.to_state_dict(opt_state))
                      if opt_state is not None else {}),
        "step": step,
        "metadata": json.dumps(metadata or {}),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(blob)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, params_template: Any = None,
                       opt_state_template: Any = None
                       ) -> Tuple[Any, Any, int, dict]:
    """Load (params, opt_state, step, metadata).

    If templates are given, the stored arrays are restored *into* their
    pytree structure (validating shapes); otherwise raw nested dicts are
    returned.
    """
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a hidenn_fem_tpu checkpoint")
        payload = serialization.msgpack_restore(f.read())
    params = payload["params"]
    opt_state = payload["opt_state"]
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    if opt_state_template is not None and opt_state:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  opt_state)
    return (params, opt_state, int(payload["step"]),
            json.loads(payload["metadata"]))


def latest_checkpoint(directory: str, prefix: str = "ckpt_"
                      ) -> Optional[str]:
    """Highest-step ``{prefix}{step}.msgpack`` in ``directory`` (or None)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".msgpack"):
            try:
                step = int(name[len(prefix):-len(".msgpack")])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
