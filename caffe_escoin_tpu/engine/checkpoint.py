"""Snapshot / restore.

Reference: `Solver::Snapshot/Restore` writes `.caffemodel` (weights) +
`.solverstate` (iter, momentum history) (`src/caffe/solver.cpp:403-472`,
`sgd_solver.cpp:246-302`). Here both are a single .npz of the flattened
params/state pytree plus a JSON sidecar of metadata — readable without this
framework. Orbax is intentionally not required (zero-dependency restore),
but the format is pytree-faithful.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(jax.device_get(tree))
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


def save_checkpoint(path: str, params, *, solver_state=None, net_state=None,
                    meta=None):
    """Writes path.npz (+ path.json). Only plain-array pytrees (train-side
    params; aligned sparse artifacts are rebuilt by weight_align on load,
    exactly as the reference realigns in CopyTrainedLayersFrom). net_state
    holds non-trainable buffers (BatchNorm moving stats — the reference
    persists them as ordinary layer blobs in the .caffemodel)."""
    flat = _flatten({"params": params})
    if solver_state is not None:
        flat.update(_flatten({"state": solver_state}))
    if net_state:
        flat.update(_flatten({"net_state": net_state}))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path + ".npz", **flat)
    with open(path + ".json", "w") as f:
        json.dump(meta or {}, f)


def load_checkpoint(path: str) -> Tuple[Any, Any, Dict]:
    """Returns (params, solver_state_or_None, meta). Buffer state, when
    present, is under meta-side key via load_checkpoint_full."""
    params, state, _net_state, meta = load_checkpoint_full(path)
    return params, state, meta


def load_checkpoint_full(path: str) -> Tuple[Any, Any, Any, Dict]:
    """Returns (params, solver_state_or_None, net_state_or_None, meta)."""
    with np.load(path + ".npz") as z:
        flat = {k: z[k] for k in z.files}
    tree = _unflatten(flat)
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return tree.get("params", {}), tree.get("state"), tree.get("net_state"), meta
