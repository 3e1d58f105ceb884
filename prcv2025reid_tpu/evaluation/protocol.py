"""The unified MM-1..4 retrieval evaluation engine.

The reference ships TWO parallel eval implementations — the in-training one
(train.py:237-639) and a partially bitrotted standalone tool
(tools/eval_mm_protocol.py) — SURVEY.md §2.6 prescribes ONE engine serving
both.  This is it:

- gallery = all vis anchors of the split (train.py:252-275 GalleryOnlyVIS);
- queries = every k-combination of {nir, sk, cp, text} per record
  (train.py:342-391 / tools/eval_mm_protocol.py:223-287), named
  single/double/triple/quad with '+'-joined modalities;
- whitelist filtering by fnmatch patterns (train.py:504-514);
- gallery feature caching keyed by (tag, size, content-hash)
  (train.py:516-534, tools/eval_mm_protocol.py:291-325);
- optional same-image exclusion for the standalone protocol
  (tools/eval_mm_protocol.py:429-438);
- submission CSV (query_key, top-100 ranked gallery ids,
  tools/eval_mm_protocol.py:595-649).

TPU-native: embedding is batched + padded to static shapes; ranking is ONE
matmul + vectorized AP/CMC (the reference's per-query Python loop at
train.py:450-479 becomes argsort/cumsum on device).  mAP counts only queries
with at least one relevant gallery item (the ``valid`` denominator of
train.py:477); top-1 divides by all queries — both reproduced exactly.  The
reference's "simplified CMC" (first query only, train.py:620-621) is replaced
by a real CMC@1/5/10 (SURVEY.md §2.7: reproduce intent, not bugs).
"""
from __future__ import annotations

import fnmatch
import functools
import hashlib
import itertools
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prcv2025reid_tpu.data.dataset import MultiModalDataset
from prcv2025reid_tpu.utils.distributed import fetch_global, is_main_process

NONVIS = ("nir", "sk", "cp", "text")
KIND_NAME = {1: "single", 2: "double", 3: "triple", 4: "quad"}


def build_query_plans(k_values: Sequence[int] = (1, 2, 3, 4)) -> List[Tuple[str, Tuple[str, ...]]]:
    plans = []
    for k in k_values:
        for combo in itertools.combinations(NONVIS, k):
            plans.append((f"{KIND_NAME[k]}/{'+'.join(combo)}", combo))
    return plans


def filter_plans(
    plans: List[Tuple[str, Tuple[str, ...]]], include_patterns: Optional[Sequence[str]]
) -> List[Tuple[str, Tuple[str, ...]]]:
    if not include_patterns:
        return plans
    return [
        (name, mods)
        for name, mods in plans
        if any(fnmatch.fnmatch(name, pat) for pat in include_patterns)
    ]


# ----- batched embedding with static shapes -----


def embed_samples(
    embed_fn: Callable,
    variables,
    dataset: MultiModalDataset,
    indices: Sequence[int],
    tokenizer,
    batch_size: int,
    modalities: Optional[Tuple[str, ...]] = None,
    seed: int = 0,
    sharding=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Embed records -> (features [N, D], pids [N]).

    ``modalities=None`` -> gallery mode (vis only).  The last batch is padded
    to ``batch_size`` so every shape hits the same jit executable.  With
    ``sharding`` (a jax.sharding.Sharding), batches land batch-sharded over
    the data-parallel mesh and GSPMD splits the embedding across chips.
    """
    import jax

    from prcv2025reid_tpu.data.pipeline import collate

    rng = np.random.default_rng(seed)
    feats_out: List[np.ndarray] = []
    pids_out: List[np.ndarray] = []
    mods = modalities if modalities is not None else ("vis",)
    # one-deep pipeline: jax dispatch is async, so the NEXT batch's host-side
    # decode/collate overlaps the device embed of the current one (the
    # np.asarray fetch is deferred until the following batch is dispatched)
    pending = None  # (device_feats, n_real, pids)

    def _collect(p):
        feats, n_real, pids = p
        # fetch_global: plain np.asarray single-process; on a multi-host
        # mesh the GSPMD-sharded features live partly on other hosts and
        # are gathered over DCN (utils/distributed.py)
        feats_out.append(fetch_global(feats)[:n_real])
        pids_out.append(pids[:n_real])

    for start in range(0, len(indices), batch_size):
        chunk = list(indices[start : start + batch_size])
        n_real = len(chunk)
        samples = [dataset.get_query_sample(i, mods, rng) for i in chunk]
        # pad the tail batch by REUSING the last decoded sample (rows past
        # n_real are discarded — re-decoding a duplicate per pad row only
        # burned host time)
        samples.extend(samples[-1:] * (batch_size - n_real))
        batch = collate(samples, tokenizer)
        # pids stay HOST-side numpy: after device_put(sharding) on a
        # multi-host mesh batch['pids'] would be a globally sharded array
        # whose np-materialization raises (non-addressable shards)
        np_pids = np.asarray(batch["pids"])
        if sharding is not None:
            batch = jax.device_put(batch, sharding)  # pytree-aware, one call
        feats = embed_fn(variables, batch)  # async dispatch
        if pending is not None:
            _collect(pending)
        pending = (feats, n_real, np_pids)
    if pending is not None:
        _collect(pending)
    if not feats_out:
        return np.zeros((0, 1), np.float32), np.zeros((0,), np.int64)
    return np.concatenate(feats_out), np.concatenate(pids_out)


# ----- vectorized ranking metrics -----


@functools.partial(jax.jit, static_argnames=("topk_cmc",))
def _chunk_stats(
    q: jnp.ndarray,
    q_pids: jnp.ndarray,
    g: jnp.ndarray,
    g_pids: jnp.ndarray,
    exclude: Optional[jnp.ndarray],
    excl_idx: Optional[jnp.ndarray],
    boost_idx: Optional[jnp.ndarray],
    topk_cmc: Tuple[int, ...],
):
    """Per-query (ap, has_rel, top1_hit, cmc hits) for one query chunk.

    ``exclude``: dense [Nq, Ng] bool (arbitrary pairs).  ``excl_idx``: [Nq]
    int32 gallery POSITION to drop per query (-1 = none) — the same-image
    exclusion case, O(Nq) host-side instead of a dense Nq x Ng matrix; the
    mask materializes per chunk on device.  ``boost_idx``: [Nq, K] gallery
    positions per query that take over the ranking HEAD in the given order
    (the re-ranked top-N — see evaluation/rerank.py); items outside keep
    their cosine order below the head."""
    if excl_idx is not None:
        exclude = (
            jnp.arange(g.shape[0], dtype=jnp.int32)[None, :] == excl_idx[:, None]
        )
    sim = jnp.dot(q, g.T, precision=jax.lax.Precision.HIGHEST)
    if exclude is not None:
        sim = jnp.where(exclude, -jnp.inf, sim)
    if boost_idx is not None:
        # cosine sims live in [-1, 1]; scores in (2, 3], descending with the
        # given column order, pin the boosted items to the head in that order
        k_b = boost_idx.shape[1]
        bvals = 2.0 + (k_b - jnp.arange(k_b, dtype=jnp.float32)) / k_b
        rows = jnp.arange(sim.shape[0])[:, None]
        sim = sim.at[rows, boost_idx].set(bvals[None, :])

    order = jnp.argsort(-sim, axis=1)  # [Nq, Ng]
    g_sorted = g_pids[order]
    matches = (g_sorted == q_pids[:, None]).astype(jnp.float32)
    if exclude is not None:
        excl_sorted = jnp.take_along_axis(exclude, order, axis=1)
        matches = matches * (1.0 - excl_sorted.astype(jnp.float32))

    rel = matches.sum(axis=1)
    ranks = jnp.arange(1, matches.shape[1] + 1, dtype=jnp.float32)[None, :]
    precision = jnp.cumsum(matches, axis=1) / ranks
    ap = (precision * matches).sum(axis=1) / jnp.maximum(rel, 1.0)
    has_rel = (rel > 0).astype(jnp.float32)
    hits = jnp.cumsum(matches, axis=1) > 0
    cmc_hits = [hits[:, min(k, matches.shape[1]) - 1].astype(jnp.float32) for k in topk_cmc]
    return ap, has_rel, matches[:, 0], cmc_hits


def _chunk_rows(n_real: int, n_dev: int, cap: int) -> int:
    """Next power-of-two bucket >= n_real (multiple of n_dev, <= cap-ish):
    ragged trailing chunks otherwise mint a NOVEL jit shape per distinct
    Nq %% query_chunk — and novel compiles go through a remote service on
    this toolchain (30 s - 30 min each, CLAUDE.md).  Buckets bound the
    executable count at log2(cap) across all plans/evals."""
    rows = 1
    while rows < n_real:
        rows *= 2
    rows = min(rows, cap)
    rows = max(rows, n_real, n_dev)
    return -(-rows // n_dev) * n_dev


def compute_retrieval_metrics(
    q_feats: np.ndarray,
    q_pids: np.ndarray,
    g_feats: np.ndarray,
    g_pids: np.ndarray,
    exclude: Optional[np.ndarray] = None,  # [Nq, Ng] bool, True = drop pair;
    # or [Nq] int32 gallery position per query (-1 = none)
    topk_cmc: Sequence[int] = (1, 5, 10),
    query_chunk: int = 1024,
    mesh=None,
    boost_idx: Optional[np.ndarray] = None,  # [Nq, K] re-ranked head
) -> Dict[str, float]:
    """mAP / top-1 / CMC, computed on device in query chunks.

    Chunking bounds device memory at O(query_chunk x Ng) — the competition
    gallery is ~45k images (BASELINE.md), so a full [Nq, Ng] fp32 similarity
    matrix does not fit; the reference loops queries one by one in Python
    (train.py:450-479), this vectorizes per chunk instead.

    With ``mesh``, ranking runs sharded over the device mesh: queries are
    sharded along the data axis (every per-query statistic — argsort, AP,
    CMC — is row-independent, so query sharding gives an exact n_dev-way
    split with bit-identical results), the gallery is replicated.  The
    gallery-sharded top-k path (parallel/ranking.sharded_topk, used by
    submission export) is the right shape for top-k; full-ranking AP needs
    every gallery rank per query, which query sharding provides without a
    cross-shard merge.  Per-chunk padding rows are dropped on the host.
    """
    topk_cmc = tuple(topk_cmc)
    q = jnp.asarray(q_feats, jnp.float32)
    g = jnp.asarray(g_feats, jnp.float32)
    g_p = jnp.asarray(g_pids)
    Nq = q.shape[0]

    q_sharding = g_sharding = None
    n_dev = 1
    if mesh is not None and mesh.devices.size > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from prcv2025reid_tpu.parallel.mesh import DATA_AXIS, data_axis_size

        n_dev = data_axis_size(mesh)  # queries shard the DATA axis only
        q_sharding = NamedSharding(mesh, P(DATA_AXIS))
        g_sharding = NamedSharding(mesh, P())
        g = jax.device_put(g, g_sharding)
        g_p = jax.device_put(g_p, g_sharding)

    exclude = None if exclude is None else np.asarray(exclude)
    excl_is_idx = exclude is not None and exclude.ndim == 1

    ap_l, hr_l, t1_l = [], [], []
    cmc_l = {k: [] for k in topk_cmc}
    for start in range(0, Nq, query_chunk):
        sl = slice(start, min(start + query_chunk, Nq))
        qc = q[sl]
        qp = jnp.asarray(q_pids[sl])
        ex = jnp.asarray(exclude[sl]) if exclude is not None else None
        bi = (
            jnp.asarray(boost_idx[sl], jnp.int32)
            if boost_idx is not None
            else None
        )
        n_real = qc.shape[0]
        pad = _chunk_rows(n_real, n_dev, query_chunk) - n_real
        if pad:
            qc = jnp.concatenate([qc, jnp.repeat(qc[-1:], pad, axis=0)])
            qp = jnp.concatenate([qp, jnp.repeat(qp[-1:], pad, axis=0)])
            if ex is not None:
                ex = jnp.concatenate([ex, jnp.repeat(ex[-1:], pad, axis=0)])
            if bi is not None:
                bi = jnp.concatenate([bi, jnp.repeat(bi[-1:], pad, axis=0)])
        if q_sharding is not None:
            qc = jax.device_put(qc, q_sharding)
            qp = jax.device_put(qp, q_sharding)
            if ex is not None:
                ex = jax.device_put(ex, q_sharding)
            if bi is not None:
                bi = jax.device_put(bi, q_sharding)
        ap, hr, t1, cmc_hits = _chunk_stats(
            qc, qp, g, g_p,
            None if excl_is_idx else ex,
            ex.astype(jnp.int32) if excl_is_idx else None,
            bi,
            topk_cmc,
        )
        ap_l.append(fetch_global(ap)[:n_real])
        hr_l.append(fetch_global(hr)[:n_real])
        t1_l.append(fetch_global(t1)[:n_real])
        for k, h in zip(topk_cmc, cmc_hits):
            cmc_l[k].append(fetch_global(h)[:n_real])

    ap = np.concatenate(ap_l)
    has_rel = np.concatenate(hr_l)
    top1 = np.concatenate(t1_l)
    n_valid = max(has_rel.sum(), 1.0)
    out = {
        "mAP": float((ap * has_rel).sum() / n_valid),
        "top1": float(top1.mean()),
        "num_queries": int(Nq),
    }
    for k in topk_cmc:
        hits = np.concatenate(cmc_l[k])
        out[f"cmc{k}"] = float((hits * has_rel).sum() / n_valid)
    return out


def ranking_equivalence(
    q_ref: np.ndarray,
    g_ref: np.ndarray,
    q_test: np.ndarray,
    g_test: np.ndarray,
    q_pids: np.ndarray,
    g_pids: np.ndarray,
    topk: int = 100,
    ref_cache: Optional[Dict] = None,
) -> Dict[str, float]:
    """Is a non-default compute path RETRIEVAL-equivalent to the reference
    path?  The product metric is ranking order (reference train.py:450-479),
    not embedding cosine — int8/bf16 paths can hold cosine >= 0.999 yet swap
    close gallery neighbors, so promotion gates (bench.py, serving configs)
    must check ranking directly:

    - ``top_overlap``: mean per-query overlap of the top-k ranked gallery
      sets between the two paths;
    - ``map_delta``: |mAP_test - mAP_ref| with the supplied pid labels.

    All features are L2-normalized by the caller.  ``ref_cache`` (a dict the
    caller keeps across calls) memoizes the reference path's orders + mAP so
    comparing N candidate paths ranks the reference once, not N times."""
    k_eff = int(min(topk, g_ref.shape[0]))

    def orders(q, g):
        sims = jnp.dot(
            jnp.asarray(q, jnp.float32),
            jnp.asarray(g, jnp.float32).T,
            precision=jax.lax.Precision.HIGHEST,
        )
        _, idx = jax.lax.top_k(sims, k_eff)
        return np.asarray(idx)

    if ref_cache is not None and "o_ref" in ref_cache:
        o_ref, m_ref = ref_cache["o_ref"], ref_cache["m_ref"]
    else:
        o_ref = orders(q_ref, g_ref)
        m_ref = compute_retrieval_metrics(q_ref, q_pids, g_ref, g_pids)
        if ref_cache is not None:
            ref_cache["o_ref"] = o_ref
            ref_cache["m_ref"] = m_ref
    o_test = orders(q_test, g_test)
    overlaps = [
        len(set(a.tolist()) & set(b.tolist())) / k_eff
        for a, b in zip(o_ref, o_test)
    ]
    m_test = compute_retrieval_metrics(q_test, q_pids, g_test, g_pids)
    return {
        "top_overlap": float(np.mean(overlaps)),
        "map_ref": m_ref["mAP"],
        "map_test": m_test["mAP"],
        "map_delta": abs(m_test["mAP"] - m_ref["mAP"]),
    }


# ----- gallery cache -----


# every config selector that changes embedding NUMERICS (not just speed):
# (field, default).  A cache entry written under one value must never be
# reused under another — the tag appends each non-default value.
NUMERICS_PATH_FIELDS = (
    ("block_impl", "xla"),
    ("attn_backend", "xla"),
    ("use_pallas_attention", False),
    ("use_fused_resln", False),
    ("use_fused_mlp", False),
    ("gelu_impl", "erf"),
    ("compute_dtype", "bfloat16"),
    # token reduction is INEXACT — features embedded with a different keep
    # set must never share a cache entry (layer/mode only matter when
    # token_keep > 0, which the tag then also carries)
    ("token_keep", 0),
    ("token_reduce_layer", 6),
    ("token_reduce_mode", "merge"),
)


def checkpoint_cache_tag(params, base: str, *, step: int, config,
                         weighted: bool = False) -> str:
    """Cache tag that changes with the WEIGHTS (md5 of the classifier
    kernel — step/epoch alone collide across runs) and with the COMPUTE
    PATH (int8/fused/splash/... embeddings differ slightly from the default
    path and must never be reused across paths — NUMERICS_PATH_FIELDS is
    the authority).  Shared by the Trainer and the standalone eval CLI so
    the rules cannot drift apart."""
    cls_kernel = np.asarray(params["bn_neck"]["classifier"]["kernel"])
    fp = hashlib.md5(cls_kernel.tobytes()).hexdigest()[:10]
    tag = f"{base}_st{step}_{fp}"
    if weighted:
        tag += "_w"
    for field, default in NUMERICS_PATH_FIELDS:
        val = getattr(config, field)
        if val != default:
            tag += f"_{field}={val}"
    return tag


class GalleryCache:
    """On-disk gallery feature cache (train.py:516-534 semantics, npz form).

    ``keep_newest`` bounds the directory: the weight-fingerprinted tags mint
    a new file per evaluated checkpoint, so a 60-epoch run with per-epoch
    eval would otherwise leave ~60 stale feature files behind.  Each save
    evicts the oldest gallery npz beyond the limit (the just-written file is
    always retained)."""

    def __init__(self, cache_dir: str, tag: str, keep_newest: int = 4):
        self.cache_dir = cache_dir
        self.tag = tag
        self.keep_newest = keep_newest

    def _path(self, indices: Sequence[int]) -> str:
        h = hashlib.md5(np.asarray(indices, np.int64).tobytes()).hexdigest()[:12]
        return os.path.join(self.cache_dir, f"gallery_{self.tag}_{len(indices)}_{h}.npz")

    def _load_local(self, indices) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        p = self._path(indices)
        try:
            z = np.load(p)
            return z["feats"], z["pids"]
        except (OSError, FileNotFoundError, ValueError):
            # absent, or evicted/truncated by a concurrent process between
            # our check and the read — treat as a miss and re-embed
            return None

    def load(self, indices) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        if jax.process_count() == 1:
            return self._load_local(indices)
        # multi-host: process 0 is the cache AUTHORITY.  A cache miss leads
        # straight into the collective sharded embed, so a hit/miss
        # disagreement between processes (shared-filesystem visibility lag)
        # would leave some processes inside the collective and others past
        # it — a hang.  Process 0 decides; hits are broadcast over DCN
        # (gallery features are [N, 512] f32 — tens of MB once per eval).
        from jax.experimental import multihost_utils

        local = self._load_local(indices) if is_main_process() else None
        if local is not None:
            hdr = np.asarray(
                [1, local[0].shape[0], local[0].shape[1]], np.int64
            )
        else:
            hdr = np.zeros(3, np.int64)
        hdr = np.asarray(multihost_utils.broadcast_one_to_all(hdr))
        if hdr[0] == 0:
            return None
        n, d = int(hdr[1]), int(hdr[2])
        feats = (
            np.asarray(local[0], np.float32)
            if local is not None
            else np.zeros((n, d), np.float32)
        )
        pids = (
            np.asarray(local[1], np.int64)
            if local is not None
            else np.zeros((n,), np.int64)
        )
        feats = np.asarray(multihost_utils.broadcast_one_to_all(feats))
        pids = np.asarray(multihost_utils.broadcast_one_to_all(pids))
        return feats, pids

    def save(self, indices, feats: np.ndarray, pids: np.ndarray):
        if not is_main_process():
            return  # one writer; readers go through the broadcast in load()
        os.makedirs(self.cache_dir, exist_ok=True)
        p = self._path(indices)
        # atomic: a concurrent reader (another eval process on this host)
        # must never observe a truncated npz
        tmp = f"{p}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(f, feats=feats, pids=pids)
        os.replace(tmp, p)
        self._evict(protect=p)

    def _evict(self, protect: str):
        if self.keep_newest is None or self.keep_newest < 1:
            return
        try:
            entries = [
                os.path.join(self.cache_dir, f)
                for f in os.listdir(self.cache_dir)
                if f.startswith("gallery_") and f.endswith(".npz")
            ]
            entries.sort(key=os.path.getmtime, reverse=True)
            for p in entries[self.keep_newest :]:
                if os.path.abspath(p) != os.path.abspath(protect):
                    os.remove(p)
        except OSError:  # concurrent eval processes racing on the same dir
            pass


# ----- the protocol driver -----


def evaluate_protocol(
    embed_fn: Callable,
    variables,
    dataset: MultiModalDataset,
    tokenizer,
    *,
    batch_size: int = 64,
    include_patterns: Optional[Sequence[str]] = None,
    k_values: Sequence[int] = (1, 2, 3, 4),
    exclude_same_image: bool = False,
    cache: Optional[GalleryCache] = None,
    sample_ratio: float = 1.0,
    seed: int = 0,
    embed_factory: Optional[Callable[[Tuple[str, ...]], Callable]] = None,
    sharding=None,
    mesh=None,
    rerank: Optional[Dict] = None,
) -> Dict:
    """Run the MM protocol; returns {map_single, map_quad, map_avg2, detail,
    cmc1/5/10} like validate_competition_style (train.py:503-639).

    ``embed_factory(modalities) -> embed_fn`` enables combo-specialized
    embedding graphs (only the needed towers compile/run); falls back to the
    generic ``embed_fn`` when absent.  ``sharding`` shards the EMBEDDING
    batches over the mesh; ``mesh`` additionally shards the RANKING
    (similarity matmul + per-query stats) — see compute_retrieval_metrics.

    ``rerank`` (kwargs for evaluation/rerank.rerank_orders, e.g.
    ``{"top_n": 100, "k1": 20, "k2": 6, "lam": 0.3}``) re-ranks every
    query's cosine top-N head with k-reciprocal re-ranking before scoring;
    each per-combo detail then also carries the plain-cosine ``mAP_plain``
    for comparison.  No reference counterpart (it ranks by raw cosine
    only)."""
    gallery_indices = [i for i, r in enumerate(dataset.records) if r.vis]

    def _fn(mods: Tuple[str, ...]) -> Callable:
        return embed_factory(mods) if embed_factory is not None else embed_fn

    g = cache.load(gallery_indices) if cache else None
    if g is None:
        g_feats, g_pids = embed_samples(
            _fn(("vis",)), variables, dataset, gallery_indices, tokenizer,
            batch_size, sharding=sharding,
        )
        if cache:
            cache.save(gallery_indices, g_feats, g_pids)
    else:
        g_feats, g_pids = g

    plans = filter_plans(build_query_plans(k_values), include_patterns)
    detail: Dict[str, Dict] = {}
    for name, mods in plans:
        q_indices = [
            i
            for i, r in enumerate(dataset.records)
            if all(m in r.modalities() for m in mods)
        ]
        if sample_ratio < 1.0 and len(q_indices) > 4:
            # per-plan derived stream: the subset for (checkpoint, plan,
            # seed) must not depend on which OTHER plans ran before it
            # (include_patterns filtering would otherwise shift every
            # later plan's draws)
            import zlib

            plan_rng = np.random.default_rng([seed, zlib.crc32(name.encode())])
            n_keep = max(1, int(len(q_indices) * sample_ratio))
            q_indices = sorted(
                plan_rng.choice(q_indices, n_keep, replace=False).tolist()
            )
        if not q_indices:
            continue
        q_feats, q_pids = embed_samples(
            _fn(mods),
            variables,
            dataset,
            q_indices,
            tokenizer,
            batch_size,
            modalities=mods,
            seed=seed,
            sharding=sharding,
        )
        exclude = None
        if exclude_same_image:
            # a query must not retrieve the gallery entry built from the very
            # same record/anchor image (tools/eval_mm_protocol.py:429-438).
            # At most ONE gallery position per query — passed as an index
            # vector, not a dense [Nq, Ng] matrix (~2 GB of host bool at the
            # competition's 45k x 45k scale)
            g_pos = {rec_i: pos for pos, rec_i in enumerate(gallery_indices)}
            exclude = np.asarray(
                [g_pos.get(qi, -1) for qi in q_indices], np.int32
            )
        if rerank is not None:
            from prcv2025reid_tpu.evaluation.rerank import rerank_orders

            boost = rerank_orders(
                q_feats, g_feats, excl_idx=exclude, mesh=mesh, **rerank
            )
            detail[name] = compute_retrieval_metrics(
                q_feats, q_pids, g_feats, g_pids, exclude, mesh=mesh,
                boost_idx=boost,
            )
            detail[name]["mAP_plain"] = compute_retrieval_metrics(
                q_feats, q_pids, g_feats, g_pids, exclude, mesh=mesh
            )["mAP"]
        else:
            detail[name] = compute_retrieval_metrics(
                q_feats, q_pids, g_feats, g_pids, exclude, mesh=mesh
            )

    singles = [detail[f"single/{m}"]["mAP"] for m in NONVIS if f"single/{m}" in detail]
    map_single = float(np.mean(singles)) if singles else 0.0
    quad_name = "quad/nir+sk+cp+text"
    map_quad = detail.get(quad_name, {}).get("mAP", 0.0)
    all_cmc = {
        f"cmc{k}": float(np.mean([d[f"cmc{k}"] for d in detail.values()]))
        if detail
        else 0.0
        for k in (1, 5, 10)
    }
    # MM-k averages (tools/eval_mm_protocol.py:573-589): mean over combos of size k
    mm_avgs = {}
    for k in k_values:
        vals = [
            d["mAP"] for n, d in detail.items() if n.startswith(KIND_NAME[k] + "/")
        ]
        if vals:
            mm_avgs[f"mm{k}_map"] = float(np.mean(vals))
    mm_all = [v for v in mm_avgs.values()]
    return {
        "map_single": map_single,
        "map_quad": map_quad,
        "map_avg2": (map_single + map_quad) / 2.0,
        "map_mm_avg": float(np.mean(mm_all)) if mm_all else 0.0,
        **mm_avgs,
        **all_cmc,
        "detail": detail,
    }


def export_submission_csv(
    embed_fn: Callable,
    variables,
    dataset: MultiModalDataset,
    tokenizer,
    output_path: str,
    *,
    batch_size: int = 64,
    k_values: Sequence[int] = (1, 2, 3, 4),
    top_k: int = 100,
    seed: int = 0,
    embed_factory: Optional[Callable[[Tuple[str, ...]], Callable]] = None,
    mesh=None,
    sharding=None,
    rerank: Optional[Dict] = None,
):
    """Write the competition CSV: query_key,ranked_gallery_ids
    (tools/eval_mm_protocol.py:595-649).  query_key = pid|mods|anchor-stem;
    gallery ids are anchor-image stems ranked by similarity, top-100,
    space-joined.  Ties break deterministically by gallery order (SURVEY.md §7
    hard part 6).

    With ``mesh``, ranking is GALLERY-sharded over the device mesh
    (parallel/ranking.sharded_topk: per-shard lax.top_k + deterministic
    merge) — the BASELINE.json "sharded XLA matmul+top-k over the device
    mesh" path, replacing the reference's per-query loop (train.py:450-479).
    ``sharding`` batch-shards the EMBEDDING over the mesh like
    evaluate_protocol does — on a pod the competition's ~45k-image gallery
    embed must not single-chip."""

    def _fn(mods: Tuple[str, ...]) -> Callable:
        return embed_factory(mods) if embed_factory is not None else embed_fn

    gallery_indices = [i for i, r in enumerate(dataset.records) if r.vis]
    g_feats, g_pids = embed_samples(
        _fn(("vis",)), variables, dataset, gallery_indices, tokenizer,
        batch_size, sharding=sharding,
    )
    g_ids = [
        os.path.splitext(os.path.basename(dataset.records[i].anchor_vis))[0]
        for i in gallery_indices
    ]

    rows: List[Tuple[str, str]] = []
    for name, mods in build_query_plans(k_values):
        q_indices = [
            i
            for i, r in enumerate(dataset.records)
            if all(m in r.modalities() for m in mods)
        ]
        if not q_indices:
            continue
        q_feats, _ = embed_samples(
            _fn(mods), variables, dataset, q_indices, tokenizer, batch_size,
            modalities=mods, seed=seed, sharding=sharding,
        )
        # ranking on device: top-k per query chunk (descending, lower index
        # wins ties) — no full host argsort of the [Nq, Ng] matrix.  With a
        # mesh the gallery is sharded and per-shard top-ks merge on device.
        k_eff = min(top_k, g_feats.shape[0])
        if rerank is not None:
            from prcv2025reid_tpu.evaluation.rerank import rerank_orders

            rr = dict(rerank)
            # re-rank at least as deep as the submission writes
            rr["top_n"] = max(rr.get("top_n", k_eff), k_eff)
            order = rerank_orders(q_feats, g_feats, mesh=mesh, **rr)[:, :k_eff]
            for qi, record_idx in enumerate(q_indices):
                rec = dataset.records[record_idx]
                stem = os.path.splitext(os.path.basename(rec.anchor_vis))[0]
                query_key = f"{rec.pid}|{'+'.join(mods)}|{stem}"
                rows.append((query_key, " ".join(g_ids[j] for j in order[qi])))
            continue
        order_chunks = []
        for start in range(0, len(q_feats), 1024):
            qc_np = q_feats[start : start + 1024]
            n_real = len(qc_np)
            # pad ragged tails to a power-of-two bucket: one executable per
            # bucket instead of one novel (remote, 30s-30min) compile per
            # distinct Nq % 1024 — same rationale as compute_retrieval_metrics
            pad = _chunk_rows(n_real, 1, 1024) - n_real
            if pad:
                qc_np = np.concatenate([qc_np, np.repeat(qc_np[-1:], pad, axis=0)])
            qc = jnp.asarray(qc_np)
            if mesh is not None and mesh.devices.size > 1:
                from prcv2025reid_tpu.parallel.ranking import sharded_topk

                _, idx = sharded_topk(qc, jnp.asarray(g_feats), k_eff, mesh)
            else:
                sims_c = jnp.dot(
                    qc,
                    jnp.asarray(g_feats).T,
                    precision=jax.lax.Precision.HIGHEST,
                )
                _, idx = jax.lax.top_k(sims_c, k_eff)
            order_chunks.append(fetch_global(idx)[:n_real])
        order = np.concatenate(order_chunks)
        for qi, record_idx in enumerate(q_indices):
            rec = dataset.records[record_idx]
            stem = os.path.splitext(os.path.basename(rec.anchor_vis))[0]
            query_key = f"{rec.pid}|{'+'.join(mods)}|{stem}"
            ranked = " ".join(g_ids[j] for j in order[qi])
            rows.append((query_key, ranked))

    # multi-host: every process ranks (the embeds/top-k above are
    # collective) but exactly one writes the shared CSV
    if is_main_process():
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        with open(output_path, "w") as f:
            f.write("query_key,ranked_gallery_ids\n")
            for key, ranked in rows:
                f.write(f"{key},{ranked}\n")
    return len(rows)
