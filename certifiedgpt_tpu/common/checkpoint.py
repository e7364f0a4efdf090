"""Checkpoint save/restore.

Keeps the reference's checkpoint characteristics (SURVEY.md §5.4):
trainable-params-only model state, optimizer state, epoch counter, and a
best-on-val checkpoint distinct from the resume checkpoint. Storage is a
single ``.npz`` of path-flattened arrays plus a JSON metadata sidecar —
dependency-free, byte-stable, and GCS-friendly (write-to-temp + atomic
rename).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _path_key(entry) -> str:
    for attr in ("key", "idx", "name"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + "/".join(_path_key(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_into(template: Any, flat: Dict[str, np.ndarray], prefix: str) -> Any:
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in paths_leaves:
        key = prefix + "/".join(_path_key(p) for p in path)
        if key not in flat:
            raise KeyError(f"Checkpoint missing array for '{key}'")
        arr = flat[key]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"Shape mismatch for '{key}': ckpt {arr.shape} vs model {leaf.shape}"
            )
        new_leaves.append(np.asarray(arr).astype(leaf.dtype) if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_checkpoint(
    path: str,
    trainable: Any,
    opt_state: Any = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Atomic save of trainable params (+ optimizer state + metadata).

    Multi-process SPMD: only process 0 writes (the reference's
    master-only ``torch.save``, ref ``minigpt4_finetune_agent.py:356-392``)
    and every process joins a barrier afterwards so no rank can race
    ahead to resume from a half-written file (ref ``xm.rendezvous``
    semantics). Assumes a shared filesystem (gcsfuse/NFS), as the
    reference does."""
    try:
        if jax.process_index() == 0:
            flat = _flatten(trainable, "model:")
            if opt_state is not None:
                flat.update(_flatten(opt_state, "opt:"))
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            fd, tmp = tempfile.mkstemp(
                dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp"
            )
            try:
                with os.fdopen(fd, "wb") as handle:
                    np.savez(handle, **flat)
                os.replace(tmp, path)
            except BaseException:
                if os.path.exists(tmp):
                    os.remove(tmp)
                raise
            # the sidecar follows the same temp+rename contract as the
            # npz: a crash mid-dump must not leave torn JSON that breaks
            # the next resume
            meta_path = path + ".meta.json"
            fd, tmp = tempfile.mkstemp(
                dir=os.path.dirname(os.path.abspath(path)), suffix=".tmp"
            )
            try:
                with os.fdopen(fd, "w") as handle:
                    json.dump(metadata or {}, handle)
                os.replace(tmp, meta_path)
            except BaseException:
                if os.path.exists(tmp):
                    os.remove(tmp)
                raise
    finally:
        # the barrier must run even when rank 0's write fails — otherwise
        # every other rank hangs in the collective while rank 0 unwinds
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(
                "checkpoint_saved:" + os.path.basename(path)
            )


def load_checkpoint(
    path: str,
    trainable_template: Any,
    opt_state_template: Any = None,
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Restore (trainable, opt_state, metadata); opt_state None if absent."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    trainable = _unflatten_into(trainable_template, flat, "model:")
    opt_state = None
    if opt_state_template is not None and any(k.startswith("opt:") for k in flat):
        opt_state = _unflatten_into(opt_state_template, flat, "opt:")
    metadata: Dict[str, Any] = {}
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path, "r") as handle:
            metadata = json.load(handle)
    return trainable, opt_state, metadata
