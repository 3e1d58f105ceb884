#!/usr/bin/env python
"""Retrieval-side benchmark: ranking + re-ranking at competition scale.

bench.py measures the gallery EMBEDDING rate and tools/bench_query.py the
query embedding rate; this tool measures the third cost center — what
happens AFTER embedding: ranking queries against a gallery (the MM
protocol's one-matmul cosine rule, reference train.py:450-479) and the
optional k-reciprocal re-ranking head (evaluation/rerank.py).  Defaults
match the competition's scale: a ~45k-image gallery
(reference docs/竞赛官网信息.md:76-80) of fusion_dim-512 unit features.

Paths measured (all on synthetic unit features — ranking cost depends on
shapes, not values):

- ``rank``        the product ranking graph (f32 ``Q @ G^T`` at
                  Precision.HIGHEST + ``lax.top_k``), device rate via the
                  repo timing rule: a ``lax.fori_loop`` INSIDE one jit with
                  iteration-dependent queries + a host checksum fetch
                  (block_until_ready is unreliable through the tunnel).
- ``rerank``      ``rerank_orders`` wall-clock — the real host-chunked
                  pipeline (fused candidate top-k + gather + the
                  [B, n+1, n+1] dense local solve, one dispatch per
                  chunk), every chunk fetched to host.  The gallery is
                  device-resident (the eval CLI uploads once per
                  protocol; serving keeps it enrolled) — the one-time
                  upload cost is reported separately.
- ``search_e2e``  ``serve_embed.GalleryStore.search`` per-request latency
                  (one host dispatch per call — what a serving client
                  pays), plain and re-ranked, at batch 1 and 16.

Prints one JSON line per path and a final summary line.

Usage:
    python tools/bench_search.py                     # competition defaults
    python tools/bench_search.py --gallery 1024 --queries 64 --iters 2
"""
import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_serve_embed():
    spec = importlib.util.spec_from_file_location(
        "serve_embed",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "serve_embed.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gallery", type=int, default=45056,
                    help="gallery size (default ~ the competition's 45k)")
    ap.add_argument("--dim", type=int, default=512,
                    help="feature dim (default = fusion_dim)")
    ap.add_argument("--queries", type=int, default=1024,
                    help="query batch for the rank/rerank paths")
    ap.add_argument("--top_k", type=int, default=100,
                    help="ranking depth (the submission writes top-100)")
    ap.add_argument("--rerank_top_n", type=int, default=100)
    ap.add_argument("--rerank_k1", type=int, default=20)
    ap.add_argument("--rerank_k2", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10,
                    help="fori_loop iterations / wall-clock repeats")
    ap.add_argument("--paths", default="rank,rerank,search_e2e",
                    help="comma list of: rank, rerank, search_e2e")
    args = ap.parse_args(argv)

    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    G, D, Q, K = args.gallery, args.dim, args.queries, args.top_k
    K = min(K, G)
    rng = np.random.default_rng(0)

    def unit(n):
        f = rng.normal(size=(n, D)).astype(np.float32)
        return f / np.linalg.norm(f, axis=1, keepdims=True)

    g_np, q_np = unit(G), unit(Q)
    t0 = time.perf_counter()
    g_dev = jnp.asarray(g_np)
    float(g_dev[0, 0])  # force the transfer (block_until_ready lies here)
    upload_s = time.perf_counter() - t0
    q_dev = jnp.asarray(q_np)
    results = {}
    paths = [p for p in args.paths.split(",") if p]

    if "rank" in paths:
        iters = args.iters

        @jax.jit
        def rank_loop(q, g):
            def body(i, acc):
                # iteration-dependent queries defeat loop-invariant hoisting
                qq = q + (i.astype(jnp.float32) * 1e-6)
                sim = jnp.dot(
                    qq, g.T, precision=jax.lax.Precision.HIGHEST
                )  # the product ranking rule (evaluation/protocol.py)
                scores, _ = jax.lax.top_k(sim, K)
                return acc + scores.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        float(rank_loop(q_dev, g_dev))  # compile + warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = float(rank_loop(q_dev, g_dev))  # host fetch = barrier
            best = max(best, Q * iters / (time.perf_counter() - t0))
        assert np.isfinite(checksum)
        results["rank"] = {"queries_per_sec": round(best, 1),
                           "gallery": G, "top_k": K, "batch": Q}
        print(json.dumps({"path": "rank", **results["rank"]}))

    if "rerank" in paths:
        from prcv2025reid_tpu.evaluation.rerank import rerank_orders

        rr = dict(top_n=args.rerank_top_n, k1=args.rerank_k1,
                  k2=args.rerank_k2)
        # device-resident gallery (jnp.asarray no-ops on it): the eval CLI
        # pays the gallery upload ONCE per protocol and serving keeps it
        # enrolled, so the per-query rate must not fold the transfer in —
        # through the tunnel here the 45k x 512 f32 upload alone is
        # seconds, and it is reported separately below.
        rerank_orders(q_np, g_dev, **rr)  # compile + warm every bucket
        best = 0.0
        for _ in range(max(3, args.iters // 3)):
            t0 = time.perf_counter()
            out = rerank_orders(q_np, g_dev, **rr)  # returns host arrays
            best = max(best, Q / (time.perf_counter() - t0))
        assert out.shape[0] == Q
        results["rerank"] = {"queries_per_sec": round(best, 1),
                             "gallery_upload_s": round(upload_s, 2),
                             "gallery": G, **rr, "batch": Q}
        print(json.dumps({"path": "rerank", **results["rerank"]}))

    if "search_e2e" in paths:
        serve_embed = _load_serve_embed()
        store = serve_embed.GalleryStore(
            D, g_np, [str(i) for i in range(G)]
        )
        rr_params = {"top_n": args.rerank_top_n, "k1": args.rerank_k1,
                     "k2": args.rerank_k2, "lam": 0.3}
        e2e = {}
        for nb in sorted({1, min(16, Q)}):
            qb = q_np[:nb]
            for label, rrp in (("plain", None), ("rerank", rr_params)):
                store.search(qb, 10, rerank=rrp)  # compile + warm
                best = float("inf")
                for _ in range(max(3, args.iters)):
                    t0 = time.perf_counter()
                    res = store.search(qb, 10, rerank=rrp)
                    best = min(best, time.perf_counter() - t0)
                assert len(res) == nb and res[0]
                e2e[f"b{nb}_{label}_ms"] = round(best * 1e3, 2)
        results["search_e2e"] = {**e2e, "gallery": G, "top_k": 10}
        print(json.dumps({"path": "search_e2e", **results["search_e2e"]}))

    print(json.dumps({"summary": True, "paths": results}))


if __name__ == "__main__":
    main()
