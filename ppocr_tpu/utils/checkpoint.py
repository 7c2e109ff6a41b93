"""Parameter checkpointing: npz weight caches + orbax train checkpoints.

SURVEY.md §5: the reference's only "checkpoint" analog is the TensorRT
shape-cache. Here:
  * converted inference weights cache to a single .npz per model, so
    serving restarts skip the pdmodel/pdiparams parse+convert
    (and custom/fine-tuned weights can be dropped in the same way);
  * training state checkpoints via orbax (step, params, opt state).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np


_EMPTY = "__empty__"  # marker array for empty dict/list subtrees


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        if not tree:
            out[f"{prefix}{_EMPTY}"] = np.array("dict")
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        # tuples round-trip as LISTS (documented: the model pytrees use
        # dicts/lists only)
        if not tree:
            out[f"{prefix}{_EMPTY}"] = np.array("list")
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def fix(node):
        if not isinstance(node, dict):
            return node
        if _EMPTY in node:
            return [] if str(node[_EMPTY]) == "list" else {}
        keys = list(node.keys())
        # a LIST only when the keys are exactly 0..n-1 (a genuine dict
        # with sparse digit keys used to crash on the missing indices)
        if keys and all(k.isdigit() for k in keys):
            idx = sorted(int(k) for k in keys)
            if idx == list(range(len(keys))):
                return [fix(node[str(i)]) for i in idx]
        return {k: fix(v) for k, v in node.items()}

    return fix(root)


def save_params_npz(path: str, params) -> str:
    """Save a nested param pytree to one compressed .npz at EXACTLY
    ``path`` (an open file handle sidesteps np.savez's silent '.npz'
    suffixing, which made the reported and actual paths diverge for
    extension-less --out arguments). The write is atomic — temp file in
    the same directory then os.replace — so an interrupted periodic
    checkpoint never truncates the previous good one. Returns the path."""
    flat = _flatten(jax.device_get(params))
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def load_params_npz(path: str):
    """Load a param pytree saved by :func:`save_params_npz`."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


def save_train_state(ckpt_dir: str, state, step: int | None = None) -> str:
    """Checkpoint a TrainState with orbax; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    step = int(step if step is not None else jax.device_get(state.step))
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, template):
    """Restore a TrainState saved by :func:`save_train_state`; ``template``
    is a matching abstract/concrete state providing the tree structure."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(template))
