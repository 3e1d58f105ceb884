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
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from prcv2025reid_tpu.training.train_step import TrainState
from prcv2025reid_tpu.utils.distributed import barrier, is_main_process

HOST_STATE_FILE = "host_state.json"

# at most one async save in flight: (checkpointer, staging dir, final dir,
# host_state)
_PENDING: list = []


def _default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")


def _is_complete(path: str) -> bool:
    """A checkpoint dir is complete iff the sidecar exists — it is written
    only after the orbax state commit, so it doubles as the commit marker."""
    return os.path.exists(os.path.join(path, HOST_STATE_FILE)) and os.path.isdir(
        os.path.join(path, "state")
    )


def _swap_into_place(staging: str, path: str):
    """Atomically promote a COMPLETE staging dir to ``path``.

    Old-checkpoint durability: the previous ``path`` is renamed aside before
    the staging rename and removed only after, so at every instant at least
    one complete checkpoint exists under ``path``/``path.old``/``path.tmp``
    (``_recover_interrupted_swap`` reconciles a crash between the renames)."""
    old = path + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(staging, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _recover_interrupted_swap(path: str):
    """Make ``path`` a complete checkpoint again after a crash mid-swap."""
    staging, old = path + ".tmp", path + ".old"
    if _is_complete(path):
        return
    if _is_complete(staging):  # newest durable state: finish the swap
        _swap_into_place(staging, path)
    elif _is_complete(old) and not os.path.exists(path):  # roll back
        os.rename(old, path)


def finalize_pending_saves():
    """Block until any in-flight async save is durable, write its host
    sidecar into the staging dir, then atomically swap it into place.  The
    sidecar lands ONLY after the state commit, and the previous checkpoint
    dir is replaced only by a complete staging dir — readers never observe a
    half-written or sidecar/state-mismatched checkpoint."""
    while _PENDING:
        ckptr, staging, path, host_state = _PENDING.pop(0)
        ckptr.wait_until_finished()
        # multi-host: every process's shard write must be durable before
        # process 0 promotes the staging dir (no-op single-process)
        barrier("ckpt-commit")
        if is_main_process():
            with open(os.path.join(staging, HOST_STATE_FILE), "w") as f:
                json.dump(host_state, f, default=_default)
            _swap_into_place(staging, path)
        barrier("ckpt-swapped")


def save_checkpoint(
    directory: str,
    state: TrainState,
    host_state: Dict[str, Any],
    *,
    name: str = "latest",
    block: bool = True,
):
    """Write <directory>/<name>/ with the device state + host sidecar.

    The write is staged in <name>.tmp and renamed into place only once both
    the orbax commit and the sidecar are durable, so a crash at any point
    leaves either the previous checkpoint or the new one intact — never a
    deleted/partial state dir or a new state paired with a stale sidecar.

    ``block=False`` overlaps the storage write with subsequent compute:
    orbax's StandardCheckpointer copies the arrays OUT OF device memory
    synchronously inside ``save`` (safe even with ``donate_train_state``
    aliasing the buffers on the very next step) and persists to disk in a
    background thread; the sidecar + swap land when the commit completes
    (``finalize_pending_saves``, called automatically by the next save /
    restore, and by Trainer.fit on exit)."""
    finalize_pending_saves()  # order saves; at most one in flight
    path = os.path.abspath(os.path.join(directory, name))
    staging = path + ".tmp"
    # multi-host: directory mutations are process 0's (directory is shared
    # storage); the orbax save below stays COLLECTIVE — each process writes
    # its addressable shards — so every process must see a clean staging
    # dir before any of them starts writing
    if is_main_process() and os.path.isdir(staging):
        shutil.rmtree(staging)
    barrier("ckpt-staging-clean")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(staging, "state"), state, force=True)
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
        _PENDING.append((ckptr, staging, path, host_state))
        return
    ckptr.wait_until_finished()
    barrier("ckpt-commit")
    if is_main_process():
        with open(os.path.join(staging, HOST_STATE_FILE), "w") as f:
            json.dump(host_state, f, default=_default)
        _swap_into_place(staging, path)
    barrier("ckpt-swapped")


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
    if is_main_process():
        _recover_interrupted_swap(path)
    barrier("ckpt-recovered")
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
    path = os.path.abspath(os.path.join(directory, name))
    try:
        if is_main_process():
            _recover_interrupted_swap(path)
    except OSError:
        pass
    barrier("ckpt-exists")
    # multi-host: process 0 is the AUTHORITY (same rationale as
    # GalleryCache.load — shared-filesystem visibility lag can make ranks
    # disagree, and a split verdict sends only some processes into the
    # collective orbax restore: a hang).  Broadcast 0's verdict.
    import jax

    if jax.process_count() == 1:
        return _is_complete(path)
    from jax.experimental import multihost_utils

    verdict = np.asarray(
        1 if (is_main_process() and _is_complete(path)) else 0, np.int64
    )
    exists = bool(multihost_utils.broadcast_one_to_all(verdict))
    if exists and not is_main_process():
        # process 0 sees the checkpoint, but a shared-filesystem view can
        # lag on other ranks — entering the collective orbax restore before
        # the files are locally visible fails or stalls that rank.  Poll
        # with a bounded timeout; on expiry proceed anyway (restore's own
        # error is more informative than a silent False that would
        # split-brain the ranks' control flow).
        import time as _time

        deadline = _time.monotonic() + 60.0
        while not _is_complete(path) and _time.monotonic() < deadline:
            _time.sleep(0.5)
    return exists
