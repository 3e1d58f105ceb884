"""Checkpoint / TRUE resume.

The reference saves model/optimizer/scheduler state but never restores it —
training resume is unimplemented (train.py:1785-1796; SURVEY.md §5.4).  This
module closes that gap: orbax checkpoints of the full jitted TrainState
(params, batch_stats, optimizer state, step, RNG, clip history) plus a JSON
sidecar with the host-side state (epoch, best mAP, SDM scheduler, sampler RNG
stream, monitor state, config snapshot) so a resumed run continues the exact
data + schedule stream.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from prcv2025reid_tpu.training.train_step import TrainState

HOST_STATE_FILE = "host_state.json"

# at most one async save in flight: (checkpointer, sidecar path, host_state)
_PENDING: list = []


def _default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


def finalize_pending_saves():
    """Block until any in-flight async save is durable, then write its host
    sidecar.  The sidecar is written ONLY after the state commit so
    ``latest_checkpoint_exists`` / readers never observe a half-written
    checkpoint directory."""
    while _PENDING:
        ckptr, sidecar_path, host_state = _PENDING.pop(0)
        ckptr.wait_until_finished()
        with open(sidecar_path, "w") as f:
            json.dump(host_state, f, default=_default)


def save_checkpoint(
    directory: str,
    state: TrainState,
    host_state: Dict[str, Any],
    *,
    name: str = "latest",
    block: bool = True,
):
    """Write <directory>/<name>/ with the device state + host sidecar.

    ``block=False`` overlaps the storage write with subsequent compute:
    orbax's StandardCheckpointer copies the arrays OUT OF device memory
    synchronously inside ``save`` (safe even with ``donate_train_state``
    aliasing the buffers on the very next step) and persists to disk in a
    background thread; the host sidecar lands when the commit completes
    (``finalize_pending_saves``, called automatically by the next save /
    restore, and by Trainer.fit on exit)."""
    finalize_pending_saves()  # order saves; at most one in flight
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    host_state = dict(host_state)
    # record the writer's monitor-ring shapes so any reader (eval CLI with a
    # default template) can build an EXACT template and restore strictly —
    # orbax metadata does not reliably expose saved global shapes across
    # process/topology boundaries
    host_state["ring_shapes"] = {
        "metric_ring": list(np.shape(state.metric_ring)),
        "grad_norm_hist": list(np.shape(state.grad_norm_hist)),
    }
    if not block:
        _PENDING.append((ckptr, os.path.join(path, HOST_STATE_FILE), host_state))
        return
    ckptr.wait_until_finished()
    with open(os.path.join(path, HOST_STATE_FILE), "w") as f:
        json.dump(host_state, f, default=_default)


def restore_checkpoint(
    directory: str,
    abstract_state: TrainState,
    *,
    name: str = "latest",
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore a checkpoint written by save_checkpoint.

    ``abstract_state`` is a template TrainState (e.g. a freshly created one)
    providing the tree structure/shapes/dtypes.
    """
    finalize_pending_saves()  # never read past an in-flight write
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    state_path = os.path.join(path, "state")
    # ring-buffer leaves are sized by the WRITER's config (steps_per_epoch /
    # adaptive_clip_window); a reader that only wants params (eval CLI)
    # builds its template with defaults.  The host sidecar records the
    # writer's ring shapes (save_checkpoint), so the template is corrected
    # up front and the restore stays STRICT — model-shape mismatches still
    # fail loudly.
    with open(os.path.join(path, HOST_STATE_FILE)) as f:
        host_state = json.load(f)
    ring_shapes = host_state.get("ring_shapes") or {}
    fixes = {}
    for leaf_name, saved in ring_shapes.items():
        cur = getattr(target, leaf_name, None)
        if cur is not None and tuple(saved) != tuple(cur.shape):
            fixes[leaf_name] = jax.ShapeDtypeStruct(
                tuple(saved), cur.dtype, sharding=getattr(cur, "sharding", None)
            )
    if fixes:
        target = target.replace(**fixes)
    try:
        state = ckptr.restore(state_path, target)
    except ValueError:
        if ring_shapes:
            raise  # shapes were known-exact: a real model mismatch
        # legacy checkpoint without ring_shapes — last resort, and LOUD:
        # a model-shape mismatch here would be silently truncated/padded
        logging.getLogger(__name__).warning(
            "legacy checkpoint without recorded ring shapes — retrying "
            "non-strict (if MODEL shapes were the mismatch, the restored "
            "params are silently truncated/padded and WRONG — rebuild the "
            "template from the checkpoint's host_state.json config)"
        )
        state = ckptr.restore(state_path, target, strict=False)
    return state, host_state


def latest_checkpoint_exists(directory: str, name: str = "latest") -> bool:
    return os.path.exists(os.path.join(directory, name, HOST_STATE_FILE))
