"""Device mesh + data-parallel sharding.

The reference is single-process single-GPU (SURVEY.md §2 parallelism audit:
no DDP/NCCL anywhere) — this module is the first-class NEW component the TPU
rebuild owes: a ``jax.sharding.Mesh`` over the chips with

- parameters/optimizer state replicated,
- batches sharded along the batch dim over the 'data' axis,
- gradients/batch-norm statistics reduced by GSPMD automatically (the train
  step computes global-batch means; XLA inserts the psums over ICI).

The single-device path is the degenerate 1-chip mesh — one code path.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prcv2025reid_tpu.configs import TrainingConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"  # tensor-parallel axis (parallel/tp.py)


def create_mesh(
    config: Optional[TrainingConfig] = None,
    devices: Optional[Sequence] = None,
    n_devices: Optional[int] = None,
    batch_size: Optional[int] = None,
    model_axis_size: Optional[int] = None,
) -> Mesh:
    """Device mesh: 1-D data-parallel by default, 2-D (data, model) when
    ``mesh_axis_names=('data','model')`` (tensor parallelism, parallel/tp.py).

    ``config.mesh_shape`` (product) caps the device count when set; with
    ``batch_size`` given, the DATA axis further shrinks to the largest size
    that divides the batch (a P*K batch is not always a multiple of the chip
    count)."""
    devs = list(devices) if devices is not None else jax.devices()
    # the leading axis name is a cross-module contract: every PartitionSpec in
    # parallel/ + the train step names it DATA_AXIS
    axis_names = tuple(config.mesh_axis_names) if config is not None else (DATA_AXIS,)
    if model_axis_size is not None and model_axis_size > 1:
        axis_names = (DATA_AXIS, MODEL_AXIS)
    if not axis_names or axis_names[0] != DATA_AXIS:
        raise ValueError(
            f"mesh_axis_names must start with {DATA_AXIS!r}, got {axis_names!r}"
        )
    if len(axis_names) > 2 or (len(axis_names) == 2 and axis_names[1] != MODEL_AXIS):
        raise ValueError(
            f"supported meshes: ({DATA_AXIS!r},) data-parallel or "
            f"({DATA_AXIS!r}, {MODEL_AXIS!r}) tensor-parallel; got {axis_names!r}"
        )

    m = model_axis_size or 1
    if len(axis_names) == 2 and model_axis_size is None:
        if config is not None and len(config.mesh_shape) == 2:
            m = config.mesh_shape[1]
        else:
            raise ValueError(
                "a ('data','model') mesh needs mesh_shape=(d, m) or an "
                "explicit model_axis_size"
            )
    if n_devices is None and config is not None and config.mesh_shape:
        import math

        n_devices = math.prod(config.mesh_shape)
    if n_devices is not None:
        devs = devs[:n_devices]
    if m > 1:
        if len(devs) % m != 0:
            raise ValueError(
                f"model_axis_size={m} does not divide {len(devs)} devices"
            )
        d = len(devs) // m
        if batch_size is not None:
            while d > 1 and batch_size % d != 0:
                d -= 1
        devs = devs[: d * m]
        return Mesh(np.asarray(devs).reshape(d, m), (DATA_AXIS, MODEL_AXIS))
    if batch_size is not None:
        n = len(devs)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devs = devs[:n]
    return Mesh(np.asarray(devs).reshape(len(devs)), (DATA_AXIS,))


def data_axis_size(mesh: Mesh) -> int:
    """Shard count along the batch/gallery ('data') axis — NOT the device
    count: on a 2-D (data, model) mesh batch-sharded arrays split over the
    data axis only."""
    return dict(zip(mesh.axis_names, mesh.devices.shape))[DATA_AXIS]


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch onto the mesh, batch-dim sharded.

    Batch sizes must divide the mesh size; the host pipeline guarantees this
    (P*K is padded up by the trainer when needed).
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def make_global_batch(local_batch: Dict, mesh: Mesh) -> Dict:
    """Multi-host batch formation: each process holds its LOCAL slice of the
    global batch; this assembles global jax.Arrays sharded over the data axis
    (DCN only carries input data, SURVEY.md §5.8).  On a single-process mesh
    it is equivalent to ``shard_batch``."""
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh)
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )


def process_local_indices(n: int, process_index: Optional[int] = None,
                          process_count: Optional[int] = None):
    """Split a global per-batch index list across host processes.

    Each process feeds its contiguous slice of every global batch; the global
    batch size must divide by the process count (the trainer pads).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n // pc
    return slice(pi * per, (pi + 1) * per)


def pad_batch_to(batch: Dict, size: int) -> Dict:
    """Pad every array's batch dim to ``size`` with zeros; padded rows carry
    zero masks and label -1 so every loss/metric ignores them."""
    import numpy as onp

    b = next(iter(batch.values())).shape[0]
    if b == size:
        return batch
    pad = size - b

    def _pad(name, x):
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        # labels AND pids pad with -1: -1 labels are loss-masked, and every
        # pid consumer (batch_composition's `pids >= 0` filter, the coverage
        # monitors' zero-mask exclusion) treats negatives as padding — a 0
        # fill would conflate padding with a real identity 0
        fill = -1 if name in ("labels", "pids") else 0
        return onp.pad(onp.asarray(x), widths, constant_values=fill)

    return {k: _pad(k, v) for k, v in batch.items()}
