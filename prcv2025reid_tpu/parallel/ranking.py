"""Sharded gallery ranking: Q x G cosine similarity + distributed top-k.

The competition gallery is ~45k vis images (BASELINE.md); at scale the
Q x G similarity matrix and its sort dominate eval.  Design (SURVEY.md §5.7):
shard the GALLERY dimension over the mesh, compute per-shard local top-k with
``lax.top_k`` (k << G/shard), then all-gather the k*n_dev candidates and merge
with one tiny final top-k.  ICI traffic is O(Q * k * n_dev) instead of
O(Q * G).

Deterministic tie-breaking: scores are tie-broken by gallery index (lower
index wins) so submission files are stable across mesh shapes (SURVEY.md §7
hard part 6).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from prcv2025reid_tpu.parallel.mesh import DATA_AXIS


def sharded_topk(
    q_feats: jnp.ndarray,  # [Q, D]
    g_feats: jnp.ndarray,  # [G, D]
    k: int,
    mesh,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k gallery indices per query over a gallery sharded across the mesh.

    Returns (scores [Q, k], indices [Q, k]) with deterministic tie-breaks.
    """
    from prcv2025reid_tpu.parallel.mesh import data_axis_size

    n_dev = data_axis_size(mesh)  # gallery shards split the DATA axis only
    G = g_feats.shape[0]
    pad = (-G) % n_dev
    if pad:
        g_feats = jnp.pad(g_feats, ((0, pad), (0, 0)))
    Gp = G + pad
    shard = Gp // n_dev
    k_eff = min(k, shard)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    def local(q, g):
        sim = jnp.dot(q, g.T, preferred_element_type=jnp.float32)
        # mask padded gallery rows of the LAST shard
        dev = jax.lax.axis_index(DATA_AXIS)
        base = dev * shard
        col = jnp.arange(shard) + base
        sim = jnp.where((col < G)[None, :], sim, -jnp.inf)
        scores, idx = jax.lax.top_k(sim, k_eff)
        return scores[None], (idx + base)[None]

    # local returns per-shard stacked results [n_dev, Q, k_eff]
    scores_all, idx_all = local(q_feats, g_feats)
    scores_all = scores_all.reshape(-1, q_feats.shape[0], k_eff)
    idx_all = idx_all.reshape(-1, q_feats.shape[0], k_eff)
    cand_scores = jnp.concatenate(list(scores_all), axis=1)  # [Q, n_dev*k_eff]
    cand_idx = jnp.concatenate(list(idx_all), axis=1)

    # deterministic merge: order by (-score, index)
    k_final = min(k, cand_scores.shape[1])
    order = jnp.lexsort((cand_idx, -cand_scores), axis=1)[:, :k_final]
    final_idx = jnp.take_along_axis(cand_idx, order, axis=1)
    final_scores = jnp.take_along_axis(cand_scores, order, axis=1)
    return final_scores, final_idx


def topk_reference(q_feats: np.ndarray, g_feats: np.ndarray, k: int):
    """Single-host numpy oracle with the same tie-break rule."""
    sim = q_feats @ g_feats.T
    order = np.lexsort(
        (np.broadcast_to(np.arange(sim.shape[1]), sim.shape), -sim), axis=1
    )[:, :k]
    scores = np.take_along_axis(sim, order, axis=1)
    return scores, order
