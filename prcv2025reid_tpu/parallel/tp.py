"""Tensor parallelism: Megatron-style param sharding over a 2-D mesh.

The reference is single-GPU (SURVEY.md §2 parallelism audit) — like the data
axis, this is a first-class NEW component of the TPU rebuild.  A 2-D
``Mesh(('data', 'model'))`` shards

- q/k/v projection + fc1 kernels on their OUTPUT dim (column parallel),
- out-proj + fc2 kernels on their INPUT dim (row parallel; XLA inserts the
  psum over the 'model' axis for the partial contractions),
- biases and LoRA legs to match (a column-parallel linear shards its bias and
  ``lora_B`` output dim; a row-parallel linear shards its ``lora_A`` input dim
  and keeps bias/``lora_B`` replicated),
- everything else (LayerNorms, embeddings, fusion, BNNeck, optimizer scalars)
  replicated.

Everything is pure GSPMD: no model-code changes, no explicit collectives —
parameters are *placed* with these shardings and XLA propagates them through
the jitted train/eval steps, inserting all-gathers/psums over ICI.  The rules
work for both towers because the vision MER projections
(``block_i/attn/{q,k,v,out}_proj/shared/kernel`` + ``lora_A/lora_B`` — see
models/mer.py) and the text tower's plain Dense layers
(``block_i/{q,k,v,out}_proj/kernel``, models/text.py) share the projection
names; matching keys off the projection-name path component.

ViT-B/16 fits on one chip, so TP here is a memory/latency lever for larger
family members (ViT-L/14: 24 layers, 1024 wide) and a validated scaling path,
not a throughput requirement.  Dims that don't divide the model-axis size
fall back to replicated per-leaf (correctness never depends on divisibility).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prcv2025reid_tpu.parallel.mesh import MODEL_AXIS, replicate_state

# column-parallel (output dim sharded) / row-parallel (input dim sharded)
_COLUMN = ("q_proj", "k_proj", "v_proj", "fc1")
_ROW = ("out_proj", "fc2")


def _path_keys(path) -> tuple:
    keys = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            keys.append(str(p.key))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            keys.append(p.name)
        elif isinstance(p, jax.tree_util.SequenceKey):
            keys.append(str(p.idx))
        else:  # pragma: no cover - future key kinds
            keys.append(str(p))
    return tuple(keys)


def leaf_partition_spec(path_keys, shape, model_size: int) -> P:
    """PartitionSpec for one param/optimizer leaf.

    ``path_keys`` are the pytree path components (dict keys / attr names);
    the projection name and the leaf name (kernel/bias/lora_A/lora_B) decide
    the spec.  Any leaf whose sharded dim is not divisible by ``model_size``
    is replicated — sharding is an optimization, never a correctness change.
    """
    keys = set(path_keys)
    leaf = path_keys[-1] if path_keys else ""
    col = any(k in keys for k in _COLUMN)
    row = any(k in keys for k in _ROW)
    if not (col or row) or (col and row):
        return P()

    def ok(dim_idx: int) -> bool:
        return (
            0 <= dim_idx < len(shape)
            and shape[dim_idx] % model_size == 0
            and shape[dim_idx] >= model_size
        )

    if col:
        if leaf == "kernel" and len(shape) == 2 and ok(1):
            return P(None, MODEL_AXIS)  # [in, out]
        if leaf == "bias" and len(shape) == 1 and ok(0):
            return P(MODEL_AXIS)
        if leaf == "lora_B" and len(shape) == 3 and ok(2):
            return P(None, None, MODEL_AXIS)  # [experts, r, out]
        return P()
    # row-parallel: input dim sharded, outputs (bias, lora_B) replicated
    if leaf == "kernel" and len(shape) == 2 and ok(0):
        return P(MODEL_AXIS, None)  # [in, out]
    if leaf == "lora_A" and len(shape) == 3 and ok(1):
        return P(None, MODEL_AXIS, None)  # [experts, in, r]
    return P()


def tree_partition_specs(tree: Any, model_size: int) -> Any:
    """Pytree of PartitionSpecs matching ``tree`` (params, optimizer state,
    or a whole TrainState — optimizer moments mirror the param tree's key
    names, so the same rules shard them consistently)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: leaf_partition_spec(
            _path_keys(path), getattr(leaf, "shape", ()), model_size
        ),
        tree,
    )


def tree_shardings(tree: Any, mesh: Mesh) -> Any:
    """Pytree of NamedShardings for ``tree`` on ``mesh``."""
    m = dict(zip(mesh.axis_names, mesh.devices.shape))[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh,
            leaf_partition_spec(_path_keys(path), getattr(leaf, "shape", ()), m),
        ),
        tree,
    )


def shard_state(state, mesh: Mesh):
    """Place a TrainState (or any param-bearing pytree) on the mesh.

    1-D data mesh: fully replicated (the round-2 path, unchanged).
    2-D (data, model) mesh: tensor-parallel placement per the rules above —
    GSPMD propagates the shardings through the jitted step.
    """
    if MODEL_AXIS not in mesh.axis_names:
        return replicate_state(state, mesh)
    shardings = tree_shardings(state, mesh)
    return jax.tree.map(jax.device_put, state, shardings)


def shard_variables(variables: dict, mesh: Mesh) -> dict:
    """Same placement for an eval ``{'params': ..., 'batch_stats': ...}``."""
    return shard_state(variables, mesh)
