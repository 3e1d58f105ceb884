#!/usr/bin/env python
"""Serving mode: frozen-weight embedding server.

The reference has no serving path — its closest analog is the standalone
eval tool's per-image FeatureExtractor (tools/eval_mm_protocol.py:133-219,
batch=1, no caching).  This is the TPU-native production shape: one
checkpoint load, LoRA folded into per-modality effective kernels at trace
time (models/mer.py fold=True), persistent compilation cache, batched
embedding at config.inference_batch_size, L2-normalized fp32 output.

Usage:
    python tools/serve_embed.py --model_path ./checkpoints/best \
        --images 'gallery/*.jpg' --modality vis --out feats.npz
    python tools/serve_embed.py --model_path ... --text captions.txt --out t.npz
    python tools/serve_embed.py --model_path ... --benchmark  # embeds/s
    python tools/serve_embed.py --model_path ... --serve 8787  # HTTP server
    python tools/serve_embed.py --model_path ... --serve 8787 \
        --serve_gallery feats.npz  # + retrieval endpoint over that gallery

HTTP API (``--serve PORT``):
    GET  /healthz             -> {"status": "ok", "fusion_dim": ..., ...}
    POST /embed               -> {"embeddings": [[...]], "count": N}
        body {"texts": ["caption", ...]}                       (text tower)
        body {"images_b64": ["<base64 jpeg/png>", ...],
              "modality": "vis"|"nir"|"sk"|"cp"}               (vision)
        body {"queries": [{"nir": "<b64>", "sk": "<b64>",
              "text": "caption"}, ...]}          (MM-2/3/4 combo queries,
              each fused through the combo graph of its own modality set)
    POST /search              -> {"results": [[{"id", "score"}, ...]], ...}
        same body as /embed + optional "top_k" (default 10) — ranks the
        queries against the --serve_gallery features by cosine (the MM
        protocol's ranking rule) on device; optional "rerank": true
        re-scores the top-N head with k-reciprocal re-ranking
        (--search_rerank_* parameters; score becomes the fused similarity)
    POST /gallery/add         -> {"added": N, "gallery_size": G}
        same body as /embed + "ids": [str, ...] — embeds and enrolls the
        rows into the live gallery (a missing --serve_gallery path starts
        an empty enrollable gallery)
    POST /gallery/remove      -> {"removed": N, "gallery_size": G}
        body {"ids": [str, ...]} — drops every row with a matching id
    POST /gallery/save        -> {"saved": path, "gallery_size": G}
        atomically rewrites the --serve_gallery npz (path is server-side)
    POST /admin/reload        -> {"reloaded": true, "weights_fingerprint": f}
        re-reads the --model_path checkpoint dir and hot-swaps the served
        weights with ZERO recompiles (graphs take variables as an
        argument) — a freshly trained checkpoint goes live without a
        restart; in-flight requests finish on the weights they started on
    GET  /metrics             -> Prometheus text exposition
        per-route request counts/latency sums by status code, batcher
        dispatch/request totals, gallery size, reload count
"""
import argparse
import glob as globlib
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_model(model_path, block_impl=None, attn_backend=None, gelu_impl=None):
    import jax
    import jax.numpy as jnp

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.training.checkpoint import restore_checkpoint
    from prcv2025reid_tpu.training.param_groups import build_optimizer
    from prcv2025reid_tpu.training.train_step import TrainState

    with open(os.path.join(model_path, "host_state.json")) as f:
        host = json.load(f)
    config = TrainingConfig.from_json(host["config"])
    # serving-only overrides: these change the compute path, never the
    # checkpoint contract (same param tree); each is bench-gated on
    # embedding parity + ranking equivalence (bench.py, docs/performance.md)
    overrides = {
        k: v
        for k, v in (("block_impl", block_impl), ("attn_backend", attn_backend),
                     ("gelu_impl", gelu_impl))
        if v is not None
    }
    if overrides:
        config = config.replace(**overrides)
    model = MultiModalReIDModel(config=config, num_classes=host["num_classes"])
    B, S = 2, config.image_size
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, len(config.vision_modalities), S, S, 3), jnp.float32),
        jnp.ones((B, len(config.vision_modalities)), jnp.float32),
        jnp.zeros((B, config.text_context_length), jnp.int32),
        jnp.ones((B,), jnp.float32),
        train=False,
    )
    tx = build_optimizer(config, variables["params"], steps_per_epoch=1)
    template = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
    )
    ckpt_path = os.path.abspath(model_path)  # abspath strips any trailing /
    state, _ = restore_checkpoint(
        os.path.dirname(ckpt_path), template, name=os.path.basename(ckpt_path)
    )
    return config, model, {"params": state.params, "batch_stats": state.batch_stats}


import collections

Engine = collections.namedtuple(
    "Engine",
    ["embed_pils", "embed_texts", "embed_paths", "embed_queries", "reload"],
)


def make_engine(config, model, variables, batch_size, fusion_mode="model"):
    """Batch embedding callables over a loaded model (an ``Engine``
    namedtuple): ``embed_pils(images, modality)``, ``embed_texts(captions)``,
    ``embed_paths(paths, modality)``, and ``embed_queries(query_dicts)`` for
    multi-modal MM-2/3/4 combo queries — each returns L2-normalized fp32
    [N, fusion_dim].  Combo graphs compile once per modality set and are
    reused across calls (the serving hot loop).  ``fusion_mode="weighted"``
    fuses multi-modal queries by the reference FeatureExtractor's weighted
    sum (text 1.2 — ref tools/eval_mm_protocol.py:133-219) instead of the
    model's fusion module, matching the eval CLI's --fusion_mode."""
    import jax.numpy as jnp
    import numpy as np

    from prcv2025reid_tpu.data.augment import ImageTransform
    from prcv2025reid_tpu.training.train_step import (
        make_combo_embed_step,
        make_weighted_embed_step,
    )

    if fusion_mode not in ("model", "weighted"):
        raise ValueError(f"unknown fusion_mode {fusion_mode!r}")
    B = batch_size
    Mv, S = len(config.vision_modalities), config.image_size
    tf = ImageTransform(image_size=S, train=False)
    fns = {}
    # hot reload (engine.reload) swaps the entry; every jitted graph takes
    # variables as an ARGUMENT, so a swap never recompiles.  Each embed_*
    # call snapshots the box once — chunks of one call never mix weights.
    var_box = [variables]

    def _fn(mods):
        if mods not in fns:
            # same dispatch rule as the eval CLI: weighted sum only has an
            # effect on true multi-modal combos (a single modality is the
            # identical graph either way)
            if fusion_mode == "weighted" and len(mods) > 1:
                fns[mods] = make_weighted_embed_step(model, mods)
            else:
                fns[mods] = make_combo_embed_step(model, mods)
        return fns[mods]

    def _empty():
        return np.zeros((0, config.fusion_dim), np.float32)

    def embed_pils(pil_images, modality):
        slot = list(config.vision_modalities).index(modality)
        fn = _fn((modality,))
        variables = var_box[0]
        feats = []
        for start in range(0, len(pil_images), B):
            chunk = pil_images[start : start + B]
            n = len(chunk)
            imgs = np.zeros((B, Mv, S, S, 3), np.float32)
            mask = np.zeros((B, Mv), np.float32)
            for i, im in enumerate(chunk):
                imgs[i, slot] = tf(im.convert("RGB"))
                mask[i, slot] = 1.0
            batch = {
                "images": jnp.asarray(imgs),
                "image_mask": jnp.asarray(mask),
                "text_tokens": jnp.zeros(
                    (B, config.text_context_length), jnp.int32
                ),
                "text_mask": jnp.zeros((B,), jnp.float32),
            }
            feats.append(np.asarray(fn(variables, batch))[:n])
        return np.concatenate(feats) if feats else _empty()

    def embed_paths(paths, modality):
        """Chunked file embedding: at most one batch of images is open at a
        time (a gallery can exceed the fd limit if opened all at once)."""
        from PIL import Image

        feats = []
        for start in range(0, len(paths), B):
            chunk = [Image.open(p) for p in paths[start : start + B]]
            feats.append(embed_pils(chunk, modality))
            for im in chunk:
                im.close()
        return np.concatenate(feats) if feats else _empty()

    tokenizer_box = []

    def _tokenizer():
        from prcv2025reid_tpu.data.tokenizer import build_tokenizer

        if not tokenizer_box:
            tokenizer_box.append(
                build_tokenizer(
                    config.tokenizer_vocab_path,
                    config.text_vocab_size,
                    config.text_context_length,
                )
            )
        return tokenizer_box[0]

    def embed_texts(captions):
        tokenizer = _tokenizer()
        fn = _fn(("text",))
        variables = var_box[0]
        feats = []
        for start in range(0, len(captions), B):
            chunk = list(captions[start : start + B])
            n = len(chunk)
            padded = chunk + [""] * (B - n)
            batch = {
                "images": jnp.zeros((B, Mv, S, S, 3), jnp.float32),
                "image_mask": jnp.zeros((B, Mv), jnp.float32),
                "text_tokens": jnp.asarray(tokenizer(padded).astype(np.int32)),
                "text_mask": jnp.asarray(
                    [1.0] * n + [0.0] * (B - n), jnp.float32
                ),
            }
            feats.append(np.asarray(fn(variables, batch))[:n])
        return np.concatenate(feats) if feats else _empty()

    def embed_queries(query_dicts):
        """Multi-modal combo queries, each ``{"vis"/"nir"/"sk"/"cp":
        PIL.Image, "text": str}`` — the MM-2/3/4 protocol query shape.  Each
        row embeds through the fused combo graph of its OWN modality set
        (model.encode_subset semantics, one graph per distinct combo);
        returns [N, fusion_dim] in input order."""
        out = np.zeros((len(query_dicts), config.fusion_dim), np.float32)
        variables = var_box[0]
        by_combo = {}
        for i, q in enumerate(query_dicts):
            mods = tuple(
                m for m in (*config.vision_modalities, "text") if m in q
            )
            if not mods:
                raise ValueError("query dict has no known modality keys")
            by_combo.setdefault(mods, []).append(i)
        tokenizer = _tokenizer()
        for mods, rows in by_combo.items():
            fn = _fn(mods)
            for start in range(0, len(rows), B):
                chunk = rows[start : start + B]
                imgs = np.zeros((B, Mv, S, S, 3), np.float32)
                imask = np.zeros((B, Mv), np.float32)
                texts = [""] * B
                tmask = np.zeros((B,), np.float32)
                for bi, ri in enumerate(chunk):
                    q = query_dicts[ri]
                    for mi, mod in enumerate(config.vision_modalities):
                        if mod in q:
                            imgs[bi, mi] = tf(q[mod].convert("RGB"))
                            imask[bi, mi] = 1.0
                    if "text" in q:
                        texts[bi] = str(q["text"])
                        tmask[bi] = 1.0
                batch = {
                    "images": jnp.asarray(imgs),
                    "image_mask": jnp.asarray(imask),
                    "text_tokens": jnp.asarray(tokenizer(texts).astype(np.int32)),
                    "text_mask": jnp.asarray(tmask),
                }
                out[np.asarray(chunk)] = np.asarray(fn(variables, batch))[
                    : len(chunk)
                ]
        return out

    def reload(new_variables):
        """Swap the served weights in place (hot reload — a new checkpoint
        lands without restarting the server or recompiling any graph).
        In-flight calls finish on the snapshot they started with."""
        var_box[0] = new_variables

    return Engine(embed_pils, embed_texts, embed_paths, embed_queries, reload)


class MicroBatcher:
    """Coalesces concurrent embed requests into shared device batches.

    The device executes one batch at a time; the old design serialized whole
    requests through a lock, so N concurrent 1-item requests paid N padded
    dispatches.  Here every request enqueues ``(group_key, items)`` and ONE
    dispatcher thread drains the queue: while a batch is on the device, newly
    arrived same-group requests pile up and the next drain embeds them
    together (opportunistic batching — zero added latency when idle, device-
    batch-sized coalescing under load).  Groups: ``("texts",)`` and
    ``("images", modality)`` — different graphs never mix."""

    def __init__(self, engine, max_items):
        import queue as queuelib
        import threading
        from concurrent.futures import Future

        self._Future = Future
        self._embed_pils = engine[0]
        self._embed_texts = engine[1]
        self._embed_queries = engine[3] if len(engine) > 3 else None
        self._q = queuelib.Queue()
        self._empty = queuelib.Empty
        self._max = max(1, max_items)
        self.dispatches = 0  # batches sent to the device
        self.requests = 0  # requests served (>= dispatches under load)
        t = threading.Thread(target=self._run, daemon=True,
                             name="serve-embed-batcher")
        t.start()

    def submit(self, key, items):
        """-> Future resolving to the [len(items), fusion_dim] features."""
        fut = self._Future()
        self._q.put((key, items, fut))
        return fut

    def _call(self, key, items):
        if key[0] == "texts":
            return self._embed_texts(items)
        if key[0] == "queries":
            # mixed combos coalesce fine: embed_queries groups by combo
            return self._embed_queries(items)
        return self._embed_pils(items, key[1])

    def _run(self):
        while True:
            key, items, fut = self._q.get()
            group = [(items, fut)]
            n = len(items)
            requeue = []
            # coalesce same-group requests that queued up meanwhile, up to
            # one device batch; others go back in arrival order
            while n < self._max:
                try:
                    k2, it2, f2 = self._q.get_nowait()
                except self._empty:
                    break
                if k2 == key and n + len(it2) <= self._max:
                    group.append((it2, f2))
                    n += len(it2)
                else:
                    requeue.append((k2, it2, f2))
            for entry in requeue:
                self._q.put(entry)
            try:
                feats = self._call(key, [x for it, _ in group for x in it])
            except BaseException as e:  # noqa: BLE001 — delivered per-request
                for _, f in group:
                    f.set_exception(e)
                continue
            self.dispatches += 1
            self.requests += len(group)
            off = 0
            for it, f in group:
                f.set_result(feats[off : off + len(it)])
                off += len(it)


def load_gallery(path):
    """A features .npz as written by --out -> (feats [G, D] f32, ids [G]).

    Features are re-normalized defensively — ranking assumes unit vectors
    (cosine == dot), and an externally produced npz may not be normalized."""
    import numpy as np

    z = np.load(path, allow_pickle=False)
    feats = np.asarray(z["features"], np.float32)
    ids = [str(x) for x in z["ids"]]
    if feats.ndim != 2 or feats.shape[0] != len(ids):
        raise ValueError(
            f"gallery npz malformed: features {feats.shape} vs {len(ids)} ids"
        )
    feats /= np.maximum(np.linalg.norm(feats, axis=1, keepdims=True), 1e-12)
    return feats, ids


_TOPK_FN = []


def _topk_fn():
    """Shared jitted masked ranking: Q@G^T with padding columns at -inf,
    then lax.top_k.  Compiled per (gallery capacity, k) — capacity only
    doubles (GalleryStore), so enrollment never recompiles per add."""
    if not _TOPK_FN:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("k",))
        def fn(q, g, nvalid, k):
            scores = q @ g.T
            valid = jnp.arange(g.shape[0])[None, :] < nvalid
            return jax.lax.top_k(
                jnp.where(valid, scores, -jnp.inf), k
            )

        _TOPK_FN.append(fn)
    return _TOPK_FN[0]


_UPDATE_FN = []


def _update_rows_fn():
    """Shared jitted appender: write a block of rows into the padded
    device gallery at a traced offset.  Compiled per (capacity, block)
    pair — both power-of-two-bucketed, so O(log^2 G) executables over a
    gallery's lifetime."""
    if not _UPDATE_FN:
        import jax

        @jax.jit
        def fn(buf, rows, start):
            return jax.lax.dynamic_update_slice(buf, rows, (start, 0))

        _UPDATE_FN.append(fn)
    return _UPDATE_FN[0]


class GalleryStore:
    """Mutable serving gallery with TPU-static shapes.

    The production enrollment story (no reference counterpart — its eval
    tool ranks a frozen gallery offline): identities can be added/removed
    while serving.  Features live in a capacity-padded ``[C, D]`` device
    buffer where C only ever doubles (floor ``min_capacity``), so the
    jitted ``Q @ G^T + top_k`` graph compiles O(log G) times over the
    gallery's lifetime — never once per add, which matters when novel
    compiles go through a 30 s - 30 min remote service (CLAUDE.md).
    Padding columns rank at -inf and ``k`` clamps to the live size, so
    they can never surface.  Mutations serialize under a lock and publish
    an immutable snapshot tuple; searches read the snapshot lock-free.
    """

    def __init__(self, dim, feats=None, ids=(), path=None, min_capacity=128):
        import threading

        import numpy as np

        self.dim = int(dim)
        self.path = path
        self._min_capacity = max(1, int(min_capacity))
        self._lock = threading.Lock()
        self._feats = np.zeros((0, self.dim), np.float32)
        self._ids = []
        self._snap = None  # (g_dev [C,D], ids tuple, size)
        if feats is not None:
            self.add(feats, ids)
        else:
            self._publish()

    @property
    def size(self):
        return self._snap[2]

    @property
    def capacity(self):
        return int(self._snap[0].shape[0])

    def _publish(self, new_rows=None):
        """Rebuild the padded device buffer + snapshot (caller holds the
        lock, or is the constructor).

        ``new_rows``: count of freshly APPENDED rows.  When the capacity
        is unchanged, only that block transfers to the device
        (dynamic_update_slice into the existing buffer — a functional
        copy, so in-flight lock-free searches keep their snapshot) —
        enrollment is O(new rows), not O(gallery), in host->device
        traffic, which is seconds per 45k-row re-upload through a
        tunnel.  Removal and capacity growth re-upload in full (rare)."""
        import jax.numpy as jnp
        import numpy as np

        n = len(self._ids)
        cap = self._min_capacity
        while cap < n:
            cap *= 2
        if (new_rows and self._snap is not None
                and cap == int(self._snap[0].shape[0])):
            start = n - new_rows
            # pad the appended block to a power-of-two bucket (bounded
            # compile count); the padding lands in the dead region —
            # zeros, same as a full rebuild — and must fit under the
            # capacity so XLA never clamps the slice onto live rows
            block_rows = 1
            while block_rows < new_rows:
                block_rows *= 2
            if start + block_rows <= cap:
                block = np.zeros((block_rows, self.dim), np.float32)
                block[:new_rows] = self._feats[start:]
                g = _update_rows_fn()(
                    self._snap[0], jnp.asarray(block), np.int32(start)
                )
                self._snap = (g, tuple(self._ids), n)
                return
        padded = np.zeros((cap, self.dim), np.float32)
        padded[:n] = self._feats
        self._snap = (jnp.asarray(padded), tuple(self._ids), n)

    def add(self, feats, ids):
        """Append rows (duplicate ids allowed — a person may have many
        gallery images); returns the new size."""
        import numpy as np

        feats = np.asarray(feats, np.float32)
        ids = [str(i) for i in ids]
        if feats.ndim != 2 or feats.shape[1] != self.dim:
            raise ValueError(
                f"features must be [N, {self.dim}], got {feats.shape}"
            )
        if feats.shape[0] != len(ids):
            raise ValueError(
                f"{feats.shape[0]} features vs {len(ids)} ids"
            )
        # defensive renormalize — ranking assumes unit rows
        feats = feats / np.maximum(
            np.linalg.norm(feats, axis=1, keepdims=True), 1e-12
        )
        with self._lock:
            self._feats = np.concatenate([self._feats, feats])
            self._ids.extend(ids)
            self._publish(new_rows=feats.shape[0])
            return len(self._ids)

    def remove(self, ids):
        """Remove EVERY row whose id is in ``ids``; returns removed count."""
        import numpy as np

        drop = {str(i) for i in ids}
        with self._lock:
            keep = [j for j, i in enumerate(self._ids) if i not in drop]
            removed = len(self._ids) - len(keep)
            if removed:
                self._feats = self._feats[np.asarray(keep, np.int64)] \
                    if keep else np.zeros((0, self.dim), np.float32)
                self._ids = [self._ids[j] for j in keep]
                self._publish()
            return removed

    def save(self, path=None):
        """Atomic npz write (same schema as --out / load_gallery)."""
        import os

        import numpy as np

        path = path or self.path
        if not path:
            raise ValueError("no save path: construct with path= or pass one")
        with self._lock:
            feats, ids = self._feats.copy(), list(self._ids)
        # np.savez appends .npz when the name lacks it — keep the suffix
        tmp = f"{path}.tmp.{os.getpid()}.npz"
        np.savez(tmp, features=feats, ids=np.asarray(ids, dtype=str))
        os.replace(tmp, path)
        return path

    def search(self, query_feats, top_k, rerank=None):
        """-> [N] lists of {"id", "score"}, best first.

        ``rerank`` (dict: top_n/k1/k2/lam — server-configured, see
        --search_rerank_*) re-scores the cosine top-N head with
        k-reciprocal re-ranking (evaluation/rerank.py); the score is then
        the fused similarity ``1 - final_dist`` instead of raw cosine.
        While the gallery is smaller than ``top_n``, the candidate count
        follows power-of-two sizes so enrollment keeps the O(log G)
        compile story."""
        import jax.numpy as jnp
        import numpy as np

        g, ids, n = self._snap  # lock-free consistent snapshot
        nq = int(np.asarray(query_feats).shape[0])
        if n == 0:
            return [[] for _ in range(nq)]
        k = max(1, min(int(top_k), n))
        if rerank and n >= 2:
            from prcv2025reid_tpu.evaluation.rerank import _rerank_full

            top_n = int(rerank.get("top_n", 100))
            if n >= top_n:
                cand = top_n
            else:
                # CEILING power of two (clamped to capacity): every live
                # row must be reachable — the floor form made up to half
                # the enrolled gallery unreachable via re-ranked search.
                # Over-selected slots score -inf (nvalid mask) and are
                # carried as invalid through the local solve: ranked
                # last, zero neighborhood influence.
                cand = 1
                while cand < n:
                    cand *= 2
                cand = min(cand, int(g.shape[0]))
            k = min(k, cand)  # the re-ranked head is the result set
            k1 = min(int(rerank.get("k1", 20)), cand)
            k2 = min(int(rerank.get("k2", 6)), k1 + 1)
            q = jnp.asarray(query_feats, jnp.float32)
            # pad the query batch to a power-of-two bucket (bounded compiles)
            bq = 1
            while bq < nq:
                bq *= 2
            if bq > nq:
                q = jnp.concatenate([q, jnp.repeat(q[-1:], bq - nq, axis=0)])
            # candidate top-k + gather + local solve in ONE dispatch (the
            # live-row count masks padded capacity rows at -inf in-graph)
            ranked, fused = _rerank_full(
                q, g, None, jnp.int32(n),
                jnp.float32(rerank.get("lam", 0.3)), k1, k2, cand,
            )
            idx = np.asarray(ranked)[:nq, :k]
            scores = (1.0 - np.asarray(fused))[:nq, :k]
        else:
            # pad the query batch AND round k up to power-of-two buckets —
            # novel compiles go through the remote service (30 s - 30 min),
            # so the jitted ranking must see O(log) distinct shapes, never
            # one per request size.  kk never exceeds the capacity (itself
            # power-of-two-grown), and the padded -inf columns cannot enter
            # the trimmed top-k head because k <= n live rows outrank them.
            q = jnp.asarray(query_feats, jnp.float32)
            bq = 1
            while bq < nq:
                bq *= 2
            if bq > nq:
                q = jnp.concatenate([q, jnp.repeat(q[-1:], bq - nq, axis=0)])
            kk = 1
            while kk < k:
                kk *= 2
            kk = min(kk, int(g.shape[0]))
            scores, idx = _topk_fn()(q, g, np.int32(n), kk)
            scores, idx = np.asarray(scores)[:nq, :k], np.asarray(idx)[:nq, :k]
        return [
            [
                {"id": ids[int(j)], "score": float(s)}
                for j, s in zip(row_i, row_s)
            ]
            for row_i, row_s in zip(idx, scores)
        ]


def make_server(port, host, config, engine, batch_items=None, gallery=None,
                rerank=None, reloader=None):
    """Build (without starting) the HTTP embedding server — see the module
    docstring for the API.  Concurrent requests coalesce into shared device
    batches via :class:`MicroBatcher` (concurrency belongs in the batch
    dimension).

    ``rerank`` — {"top_n","k1","k2","lam", "default": bool} server-side
    k-reciprocal parameters for /search; requests toggle with
    ``"rerank": true/false`` (falling back to ``default``).

    ``reloader`` — zero-arg callable returning fresh model variables
    (server-side closure over the checkpoint path — clients never supply
    a filesystem path); enables ``POST /admin/reload`` to hot-swap
    weights after a new checkpoint lands, with zero recompiles (the
    serving graphs take variables as an argument)."""
    import base64
    import io
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from PIL import Image

    import threading
    import time as timelib

    valid_mods = tuple(config.vision_modalities)
    MAX_BODY = 64 * 1024 * 1024  # b64 images batch cap; this host is small
    batcher = MicroBatcher(
        engine, batch_items or config.inference_batch_size
    )
    # /metrics state: (route, status) -> [count, total_seconds].  Unknown
    # client paths bucket under "other" so a scanner cannot grow the label
    # set unboundedly.
    metrics_lock = threading.Lock()
    route_stats = {}
    reload_count = [0]
    KNOWN_ROUTES = ("/embed", "/search", "/gallery/add", "/gallery/remove",
                    "/gallery/save", "/admin/reload", "/healthz", "/metrics")

    class BadRequest(ValueError):
        pass

    def _parse(req):
        """Validate the payload into a (group_key, items) pair for the
        batcher (raises BadRequest on any client error)."""
        if "texts" in req:
            if not isinstance(req["texts"], list):
                raise BadRequest("'texts' must be a JSON list of strings")
            return ("texts",), [str(t) for t in req["texts"]]
        if "images_b64" in req:
            if not isinstance(req["images_b64"], list):
                raise BadRequest("'images_b64' must be a JSON list")
            mod = req.get("modality", "vis")
            if mod not in valid_mods:
                raise BadRequest(f"modality {mod!r} not in {valid_mods}")
            try:
                imgs = [
                    Image.open(io.BytesIO(base64.b64decode(s, validate=True)))
                    for s in req["images_b64"]
                ]
                for im in imgs:
                    im.load()  # decode errors surface as 400 here
            except Exception as e:
                raise BadRequest(f"undecodable image: {e}") from e
            return ("images", mod), imgs
        if "queries" in req:
            # multi-modal combo queries (MM-2/3/4): each entry is
            # {"nir": "<b64>", "sk": "<b64>", ..., "text": "caption"}
            if not isinstance(req["queries"], list):
                raise BadRequest("'queries' must be a JSON list of objects")
            parsed = []
            for q in req["queries"]:
                if not isinstance(q, dict) or not q:
                    raise BadRequest(
                        "each query must be a non-empty object of "
                        f"modality->payload; modalities: {valid_mods + ('text',)}"
                    )
                d = {}
                for k, v in q.items():
                    if k == "text":
                        d["text"] = str(v)
                    elif k in valid_mods:
                        try:
                            im = Image.open(
                                io.BytesIO(base64.b64decode(v, validate=True))
                            )
                            im.load()
                        except Exception as e:
                            raise BadRequest(
                                f"undecodable {k} image: {e}"
                            ) from e
                        d[k] = im
                    else:
                        raise BadRequest(
                            f"unknown query modality {k!r}; valid: "
                            f"{valid_mods + ('text',)}"
                        )
                parsed.append(d)
            return ("queries",), parsed
        raise BadRequest("body needs 'texts', 'images_b64' or 'queries'")

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, obj):
            self._last_code = code
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_text(self, code, text):
            self._last_code = code
            body = text.encode()
            self.send_response(code)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _record(self, t0):
            route = self.path if self.path in KNOWN_ROUTES else "other"
            key = (route, getattr(self, "_last_code", 0))
            with metrics_lock:
                st = route_stats.setdefault(key, [0, 0.0])
                st[0] += 1
                st[1] += timelib.perf_counter() - t0

        def _metrics_text(self):
            with metrics_lock:
                snap = {k: list(v) for k, v in route_stats.items()}
            lines = ["# TYPE reid_requests_total counter"]
            for (route, code), (cnt, _) in sorted(snap.items()):
                lines.append(
                    f'reid_requests_total{{route="{route}",code="{code}"}} '
                    f"{cnt}"
                )
            agg = {}
            for (route, _), (_, secs) in snap.items():
                agg[route] = agg.get(route, 0.0) + secs
            lines.append("# TYPE reid_request_seconds_sum counter")
            for route, secs in sorted(agg.items()):
                lines.append(
                    f'reid_request_seconds_sum{{route="{route}"}} {secs:.6f}'
                )
            lines += [
                "# TYPE reid_batch_dispatches_total counter",
                f"reid_batch_dispatches_total {batcher.dispatches}",
                "# TYPE reid_batch_requests_total counter",
                f"reid_batch_requests_total {batcher.requests}",
                "# TYPE reid_gallery_size gauge",
                f"reid_gallery_size {gallery.size if gallery else 0}",
                "# TYPE reid_weights_reloads_total counter",
                f"reid_weights_reloads_total {reload_count[0]}",
            ]
            return "\n".join(lines) + "\n"

        def do_GET(self):
            t0 = timelib.perf_counter()
            try:
                self._get_inner()
            finally:
                self._record(t0)

        def _get_inner(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "fusion_dim": config.fusion_dim,
                    "modalities": list(valid_mods) + ["text"],
                    "image_size": config.image_size,
                    "batch_dispatches": batcher.dispatches,
                    "batch_requests": batcher.requests,
                    "gallery_size": gallery.size if gallery else 0,
                    "weights_reloads": reload_count[0],
                })
            elif self.path == "/metrics":
                # Prometheus text exposition — scrape-ready observability
                self._send_text(200, self._metrics_text())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            t0 = timelib.perf_counter()
            try:
                self._post_inner()
            finally:
                self._record(t0)

        def _post_inner(self):
            routes = ("/embed", "/search", "/gallery/add", "/gallery/remove",
                      "/gallery/save", "/admin/reload")
            if self.path not in routes:
                self._send(404, {"error": "unknown path"})
                return
            if self.path == "/admin/reload":
                # server-side closure over the checkpoint path — a client
                # never supplies a filesystem path
                if reloader is None:
                    self._send(404, {"error": "hot reload is not enabled "
                                     "(server started without a reloader)"})
                    return
                try:
                    new_vars = reloader()
                except Exception as e:  # bad checkpoint is not a crash
                    self._send(500, {"error": "reload failed: "
                                     f"{type(e).__name__}: {e}"})
                    return
                engine.reload(new_vars)
                import hashlib

                import numpy as np

                kern = np.asarray(
                    new_vars["params"]["bn_neck"]["classifier"]["kernel"]
                )
                reload_count[0] += 1
                self._send(200, {
                    "reloaded": True,
                    "weights_fingerprint":
                        hashlib.md5(kern.tobytes()).hexdigest()[:10],
                })
                return
            if self.path != "/embed" and gallery is None:
                self._send(404, {"error": "no gallery loaded — start the "
                                 "server with --serve_gallery feats.npz "
                                 "(a new path starts empty for enrollment)"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY:
                    self._send(413, {"error": f"body exceeds {MAX_BODY} bytes"})
                    return
                try:
                    req = json.loads(self.rfile.read(length) or b"{}")
                    if not isinstance(req, dict):
                        raise BadRequest("body must be a JSON object")
                    if self.path == "/gallery/remove":
                        if not isinstance(req.get("ids"), list):
                            raise BadRequest("'ids' must be a JSON list")
                        removed = gallery.remove(req["ids"])
                        self._send(200, {"removed": removed,
                                         "gallery_size": gallery.size})
                        return
                    if self.path == "/gallery/save":
                        # clients never choose the filesystem path (an
                        # arbitrary-write hazard on exposed hosts) — saves
                        # go to the --serve_gallery path only
                        if "path" in req:
                            raise BadRequest(
                                "'path' is server-side (--serve_gallery)"
                            )
                        try:
                            saved = gallery.save()
                        except ValueError as e:
                            raise BadRequest(str(e)) from e
                        self._send(200, {"saved": saved,
                                         "gallery_size": gallery.size})
                        return
                    key, items = _parse(req)
                    if self.path == "/gallery/add":
                        row_ids = req.get("ids")
                        if not isinstance(row_ids, list):
                            raise BadRequest(
                                "'ids' must be a JSON list (one per row)"
                            )
                        if len(row_ids) != len(items):
                            raise BadRequest(
                                f"{len(items)} rows vs {len(row_ids)} ids"
                            )
                    top_k = req.get("top_k", 10)
                    if self.path == "/search" and not (
                        isinstance(top_k, int)
                        and not isinstance(top_k, bool)  # JSON true is int 1
                        and top_k >= 1
                    ):
                        raise BadRequest("'top_k' must be a positive integer")
                    want_rr = False
                    if self.path == "/search":
                        want_rr = req.get(
                            "rerank", bool(rerank and rerank.get("default"))
                        )
                        if not isinstance(want_rr, bool):
                            raise BadRequest("'rerank' must be a JSON boolean")
                        if want_rr and rerank is None:
                            raise BadRequest(
                                "re-ranking is not enabled on this server "
                                "(start with --search_rerank)"
                            )
                except (BadRequest, json.JSONDecodeError, UnicodeDecodeError) as e:
                    self._send(400, {"error": str(e)})
                    return
                feats = batcher.submit(key, items).result()
                if self.path == "/gallery/add":
                    size = gallery.add(feats, row_ids)
                    self._send(200, {"added": int(feats.shape[0]),
                                     "gallery_size": size})
                    return
                if self.path == "/search":
                    res = gallery.search(
                        feats, top_k, rerank=rerank if want_rr else None
                    )
                    self._send(200, {"results": res,
                                     "reranked": want_rr,
                                     "count": int(feats.shape[0])})
                    return
                self._send(200, {"embeddings": feats.tolist(),
                                 "count": int(feats.shape[0])})
            except BrokenPipeError:
                pass
            except Exception as e:
                # device/compile/server faults are 500s, not the client's fault
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *args):
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.batcher = batcher  # exposed for tests / observability
    return srv


def warmup_engine(config, engine, modalities=None):
    """Compile every serving graph up front (remote compiles here take 30 s -
    30 min, CLAUDE.md) so the readiness line/healthz are truthful."""
    import numpy as np
    from PIL import Image

    embed_pils, embed_texts = engine.embed_pils, engine.embed_texts
    S = config.image_size
    dummy = Image.fromarray(np.zeros((S, S, 3), np.uint8))
    mods = tuple(modalities if modalities is not None
                 else config.vision_modalities)
    for mod in mods:
        embed_pils([dummy], mod)
    embed_texts([""])
    # the full combo graph (every vision modality + text) — the MM-4 query
    # shape; intermediate combos compile on first use (persistent cache)
    engine.embed_queries([{**{m: dummy for m in mods}, "text": ""}])


def run_server(port, host, config, engine, warmup="all", gallery_path=None,
               rerank=None, reloader=None):
    import os

    gallery = None
    if gallery_path:
        if os.path.exists(gallery_path):
            feats, ids = load_gallery(gallery_path)
            if feats.shape[1] != config.fusion_dim:
                raise SystemExit(
                    f"gallery feature dim {feats.shape[1]} != checkpoint "
                    f"fusion_dim {config.fusion_dim} — wrong gallery/"
                    "checkpoint pairing"
                )
            gallery = GalleryStore(config.fusion_dim, feats, ids,
                                   path=gallery_path)
            logging.info("gallery loaded: %d x %d features", *feats.shape)
        else:
            gallery = GalleryStore(config.fusion_dim, path=gallery_path)
            logging.info(
                "gallery path %s does not exist — starting EMPTY for "
                "runtime enrollment (/gallery/add; /gallery/save writes it)",
                gallery_path,
            )
    if warmup != "none":
        logging.info("warming serving graphs (all modalities + text)...")
        warmup_engine(config, engine)
    srv = make_server(port, host, config, engine, gallery=gallery,
                      rerank=rerank, reloader=reloader)
    print(json.dumps({"serving": True, "host": host,
                      "port": srv.server_address[1],
                      "gallery_size": gallery.size if gallery else 0}),
          flush=True)
    srv.serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True, help="checkpoint dir")
    ap.add_argument("--images", default=None, help="glob of image files")
    ap.add_argument("--text", default=None, help="file with one caption per line")
    ap.add_argument(
        "--modality", default="vis",
        help="one of the checkpoint's config.vision_modalities "
        "(validated after the checkpoint loads; default 'vis')",
    )
    ap.add_argument("--out", default=None, help="output .npz (features, ids)")
    ap.add_argument(
        "--batch_size", type=int, default=None,
        help="default = checkpoint config.inference_batch_size (latency-"
        "oriented); B=160 is the measured v5e throughput optimum "
        "(docs/performance.md batch sweep)",
    )
    ap.add_argument("--benchmark", action="store_true", help="print embeds/s and exit")
    ap.add_argument(
        "--block_impl", default=None,
        choices=("xla", "fused", "fused_int8"),
        help="override the block compute path for serving (default = "
        "checkpoint config; docs/performance.md)",
    )
    ap.add_argument(
        "--attn_backend", default=None,
        choices=("xla", "splash", "onesaug"),
        help="override the attention core; 'onesaug' + --gelu_impl=tanh is "
        "the measured-fastest ranking-equivalent serving path on v5e "
        "(3,145 vs 2,465 embeds/s/chip — docs/performance.md round 3)",
    )
    ap.add_argument(
        "--gelu_impl", default=None, choices=("erf", "tanh", "poly"),
        help="override the GELU formulation (tanh keeps the erf out of the "
        "fc2 matmul prologue fusion; bf16-accuracy)",
    )
    ap.add_argument(
        "--fusion_mode", default="model", choices=("model", "weighted"),
        help="how multi-modal combo queries fuse: the model's fusion module "
        "(default) or the reference FeatureExtractor's weighted sum "
        "(text 1.2) — mirrors the eval CLI's --fusion_mode",
    )
    ap.add_argument(
        "--serve", type=int, default=None, metavar="PORT",
        help="run the HTTP embedding server (0 = ephemeral port)",
    )
    ap.add_argument("--serve_host", default="127.0.0.1",
                    help="bind address for --serve (loopback by default)")
    ap.add_argument(
        "--serve_gallery", default=None, metavar="FEATS_NPZ",
        help="features .npz (from a prior --images/--out run) to rank "
        "against — enables POST /search",
    )
    ap.add_argument(
        "--search_rerank", action="store_true",
        help="re-rank every /search with k-reciprocal re-ranking by default "
        "(evaluation/rerank.py; requests override with 'rerank': false). "
        "Without this flag requests may still opt in per call with "
        "'rerank': true using the --search_rerank_* parameters below",
    )
    ap.add_argument("--search_rerank_top_n", type=int, default=100)
    ap.add_argument("--search_rerank_k1", type=int, default=20)
    ap.add_argument("--search_rerank_k2", type=int, default=6)
    ap.add_argument("--search_rerank_lambda", type=float, default=0.3)
    ap.add_argument("--warmup", default="all", choices=("all", "none"),
                    help="compile all serving graphs before announcing "
                    "readiness (--serve only)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from prcv2025reid_tpu.training.train_step import make_combo_embed_step

    config, model, variables = _load_model(
        args.model_path, args.block_impl, args.attn_backend, args.gelu_impl
    )
    B = args.batch_size or config.inference_batch_size
    Mv, S = len(config.vision_modalities), config.image_size
    if args.images and args.modality not in config.vision_modalities:
        raise SystemExit(
            f"--modality {args.modality!r} is not in this checkpoint's "
            f"vision_modalities {tuple(config.vision_modalities)}"
        )
    engine = make_engine(config, model, variables, B,
                         fusion_mode=args.fusion_mode)
    embed_pils, embed_texts, embed_paths = (
        engine.embed_pils, engine.embed_texts, engine.embed_paths
    )

    if args.serve is not None:
        rerank = {
            "top_n": args.search_rerank_top_n,
            "k1": args.search_rerank_k1,
            "k2": args.search_rerank_k2,
            "lam": args.search_rerank_lambda,
            "default": args.search_rerank,
        }
        run_server(args.serve, args.serve_host, config, engine,
                   warmup=args.warmup, gallery_path=args.serve_gallery,
                   rerank=rerank,
                   # POST /admin/reload re-reads the --model_path checkpoint
                   # dir (same serving-path overrides) and hot-swaps weights
                   reloader=lambda: _load_model(
                       args.model_path, args.block_impl, args.attn_backend,
                       args.gelu_impl,
                   )[2])
        return

    def embed_images(paths):
        return embed_paths(paths, args.modality)

    if args.benchmark:
        import jax

        # gallery modality; a custom-modality checkpoint benches its first
        bench_mod = ("vis" if "vis" in config.vision_modalities
                     else config.vision_modalities[0])
        slot = list(config.vision_modalities).index(bench_mod)
        iters = 10
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.normal(size=(B, S, S, 3)), jnp.float32)
        mask = np.zeros((B, Mv), np.float32)
        mask[:, slot] = 1.0
        image_mask = jnp.asarray(mask)
        tokens = jnp.zeros((B, config.text_context_length), jnp.int32)
        text_mask = jnp.zeros((B,), jnp.float32)

        # device throughput: in-jit fori_loop with iteration-dependent input
        # + host-fetch barrier (the repo's measurement rule — comparable to
        # bench.py / docs/performance.md)
        @jax.jit
        def bench_fn(variables, images):
            def body(i, acc):
                x = images + (i.astype(jnp.float32) * 1e-6)
                imgs = jnp.zeros((B, Mv, S, S, 3), x.dtype).at[:, slot].set(x)
                feats = model.apply(
                    variables, imgs, image_mask, tokens, text_mask,
                    (bench_mod,), method=model.encode_subset,
                )
                return acc + feats.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(bench_fn(variables, images))  # compile + warm
        t0 = time.perf_counter()
        checksum = float(bench_fn(variables, images))  # host fetch = barrier
        device_rate = B * iters / (time.perf_counter() - t0)
        assert np.isfinite(checksum)

        # serving-shaped rate: one host dispatch per batch — includes the
        # per-call dispatch/tunnel latency a client of this process pays, so
        # it reads LOWER than the device rate (not a regression)
        fn = make_combo_embed_step(model, (bench_mod,))
        imgs_b = jnp.zeros((B, Mv, S, S, 3), jnp.float32).at[:, slot].set(images)
        batch = {
            "images": imgs_b,
            "image_mask": image_mask,
            "text_tokens": tokens,
            "text_mask": text_mask,
        }
        np.asarray(fn(variables, batch))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(variables, batch)
        float(jnp.sum(out))  # host fetch = completion barrier
        dispatch_rate = B * iters / (time.perf_counter() - t0)
        print(json.dumps({
            "embeds_per_sec": round(device_rate, 2),
            "embeds_per_sec_serving": round(dispatch_rate, 2),
            "batch": B,
            "modality": bench_mod,
        }))
        return

    ids, feats = [], None
    if args.images:
        paths = sorted(globlib.glob(args.images))
        if not paths:
            raise SystemExit(f"no files match {args.images!r}")
        feats = embed_images(paths)
        ids = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    elif args.text:
        with open(args.text) as f:
            captions = [line.rstrip("\n") for line in f if line.strip()]
        feats = embed_texts(captions)
        ids = [str(i) for i in range(len(captions))]
    else:
        raise SystemExit("one of --images / --text / --benchmark is required")

    out = args.out or "embeddings.npz"
    np.savez(out, features=feats, ids=np.asarray(ids))
    logging.info("%d embeddings (%s) -> %s", len(ids), args.modality, out)


if __name__ == "__main__":
    main()
