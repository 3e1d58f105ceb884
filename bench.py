#!/usr/bin/env python
"""Benchmark: query embeddings/sec/chip on the full ViT-B/16 Re-ID model.

The driver-set north star (BASELINE.json) is >= 10k query embeds/sec/chip on
TPU (bf16).  The measured path is the real gallery/query embedding used by the
MM protocol: single-modality ('vis') encode through the MER ViT-B/16 trunk +
fusion + BN-neck, L2-normalized.

A non-default compute path (onesaug attention, tanh GELU, fused int8 kernels)
may only become the headline number if it passes BOTH promotion gates vs the
default XLA path:
  1. embedding parity: min cosine >= 0.999 on a probe batch;
  2. ranking equivalence: mean top-100 overlap >= 0.97 AND |mAP delta| <=
     0.005 on a structured synthetic retrieval set (64 ids x 18 instances
     gallery, 128 queries) — the product metric is ranking order
     (reference train.py:450-479), which cosine alone does not pin.

Structure (round 4): the round-3 run timed out before printing anything
because it compiled FIVE model variants (each through a 30 s - 30 min remote
compile service) before the single JSON line.  Now the critical path is
exactly two variants — `xla` (the reference/fallback) and the recorded
round-3 winner `onesaug_tanh` — gated immediately, JSON printed, and only
then (behind PRCV_BENCH_EXTRA=1) are exploratory paths measured.  The
twice-demoted fused_int8 variants are out of the default set; re-checking
them belongs to tools/toolchain_watch.py.  Every phase stamps its wall time
to stderr so a timeout is attributable.

Measurement notes: the dispatch path to the chip can have tens of ms of
per-call latency (remote tunnel) and async readiness signals that make
block_until_ready unreliable, so the loop runs INSIDE one jit (fori_loop with
an iteration-dependent input perturbation so XLA cannot hoist the loop body)
and completion is forced by a host fetch of the final checksum.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

_T0 = time.perf_counter()


def stamp(msg: str):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr)
    sys.stderr.flush()


# measurement-path name -> TrainingConfig overrides.  Every entry changes
# NUMERICS as well as speed, so each is gated before it can win (see above).
IMPL_CONFIG = {
    "xla": {},
    "pallas": {"use_pallas_attention": True},
    "resln": {"use_fused_resln": True},
    "splash": {"attn_backend": "splash"},
    "fused": {"block_impl": "fused"},
    "fused_qkv": {"block_impl": "fused_qkv"},
    "fused_int8": {"block_impl": "fused_int8"},
    "fused_int8_mlp": {"block_impl": "fused_int8_mlp"},
    "fused_int8_mlp_onesaug": {"block_impl": "fused_int8_mlp",
                               "attn_backend": "onesaug"},
    "onesaug": {"attn_backend": "onesaug"},
    "tanhgelu": {"gelu_impl": "tanh"},
    "onesaug_tanh": {"attn_backend": "onesaug", "gelu_impl": "tanh"},
    # gated FLOP reduction (VERDICT r4 #4): EViT-style token keep after
    # block 6 on top of the recorded winner; 126/94 keep 128/96 upper-trunk
    # tokens (tile-friendly).  Inexact — the two gates adjudicate.
    "onesaug_tanh_tome158": {"attn_backend": "onesaug", "gelu_impl": "tanh",
                             "token_keep": 158},
    "onesaug_tanh_tome126": {"attn_backend": "onesaug", "gelu_impl": "tanh",
                             "token_keep": 126},
    "onesaug_tanh_tome94": {"attn_backend": "onesaug", "gelu_impl": "tanh",
                            "token_keep": 94},
    "fused_int8_onesaug": {"block_impl": "fused_int8",
                           "attn_backend": "onesaug"},
}

# ranking-equivalence probe shape (structured so retrieval is meaningful
# even with random weights: instances of one id share a base image)
RANK_IDS, RANK_PER_ID, RANK_QUERIES = 64, 18, 128
RANK_MIN_OVERLAP, RANK_MAX_MAP_DELTA = 0.97, 0.005


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    import os

    on_tpu = jax.default_backend() not in ("cpu",)
    # B=160 measured best for the round-3 winning path (3,184 vs 3,145 at
    # 128, 3,064 at 192 — docs/performance.md batch sweep)
    B = int(os.environ.get("PRCV_BENCH_BATCH", 160 if on_tpu else 4))
    N_ITERS = 10 if on_tpu else 2
    # CRITICAL-PATH candidates only: the recorded round-3 winner.  The
    # fused_int8 variants are twice-demoted by the ranking gate (overlap
    # 0.956-0.958 < 0.97, docs/performance.md) — exploring them is
    # PRCV_BENCH_EXTRA / toolchain_watch territory, not headline-path work.
    default_impls = "onesaug_tanh" if on_tpu else ""
    candidates = [
        s
        for s in os.environ.get("PRCV_BENCH_IMPLS", default_impls).split(",")
        if s and s != "xla"
    ]
    if os.environ.get("PRCV_BENCH_PALLAS", "0") == "1":
        candidates.append("pallas")
    extra_impls = [
        s for s in os.environ.get(
            "PRCV_BENCH_EXTRA_IMPLS",
            "onesaug,fused_int8,fused_int8_onesaug",
        ).split(",")
        if s and s != "xla" and s not in candidates
    ]
    run_extras = os.environ.get("PRCV_BENCH_EXTRA", "0") == "1"
    run_rank_gate = os.environ.get("PRCV_BENCH_RANKGATE", "1") == "1"

    # optional model-family override (clip-vit-base-patch16 is the headline;
    # -patch32 / -large-patch14 document perf breadth, docs/performance.md)
    preset = os.environ.get("PRCV_BENCH_PRESET", "")

    def build(impl: str):
        config = TrainingConfig(
            compute_dtype="bfloat16" if on_tpu else "float32",
            **IMPL_CONFIG[impl],
        )
        if preset:
            from prcv2025reid_tpu.configs import apply_model_preset

            config = apply_model_preset(config, preset)
        model = MultiModalReIDModel(config=config, num_classes=400)
        Mv, S = len(config.vision_modalities), config.image_size
        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng},
            jnp.zeros((2, Mv, S, S, 3), jnp.float32),
            jnp.ones((2, Mv), jnp.float32),
            jnp.zeros((2, config.text_context_length), jnp.int32),
            jnp.ones((2,), jnp.float32),
            train=False,
        )
        images = jax.random.normal(rng, (B, S, S, 3), jnp.float32)
        image_mask = jnp.ones((B, Mv), jnp.float32)
        tokens = jnp.zeros((B, config.text_context_length), jnp.int32)
        text_mask = jnp.ones((B,), jnp.float32)

        @jax.jit
        def bench_fn(variables, images):
            def body(i, acc):
                # iteration-dependent input defeats loop-invariant hoisting
                x = images + (i.astype(jnp.float32) * 1e-6)
                imgs = jnp.zeros((B, Mv, x.shape[1], x.shape[2], 3), x.dtype)
                imgs = imgs.at[:, 0].set(x)
                feats = model.apply(
                    variables, imgs, image_mask, tokens, text_mask,
                    ("vis",), method=model.encode_subset,
                )
                return acc + feats.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, N_ITERS, body, jnp.float32(0.0))

        @jax.jit
        def embed_batch(variables, images):  # [B, S, S, 3] -> L2-normed feats
            imgs = jnp.zeros((B, Mv, S, S, 3), images.dtype)
            imgs = imgs.at[:, 0].set(images)
            f = model.apply(
                variables, imgs, image_mask, tokens, text_mask,
                ("vis",), method=model.encode_subset,
            ).astype(jnp.float32)
            return f / jnp.maximum(
                jnp.linalg.norm(f, axis=1, keepdims=True), 1e-12
            )

        return bench_fn, embed_batch, variables, images, S

    def rank_probe_images(S):
        """Structured retrieval set: per-id base image + per-instance noise."""
        n_ids, per_id, n_q = (
            (RANK_IDS, RANK_PER_ID, RANK_QUERIES) if on_tpu else (4, 4, 8)
        )
        rng = np.random.default_rng(0)
        base = rng.normal(0, 1, (n_ids, S, S, 3)).astype(np.float32)
        g_pids = np.repeat(np.arange(n_ids), per_id)
        gallery = base[g_pids] + 0.15 * rng.normal(
            0, 1, (len(g_pids), S, S, 3)
        ).astype(np.float32)
        q_pids = rng.integers(0, n_ids, n_q)
        queries = base[q_pids] + 0.15 * rng.normal(
            0, 1, (n_q, S, S, 3)
        ).astype(np.float32)
        return gallery, g_pids, queries, q_pids

    def embed_all(embed_batch, variables, images):
        out = []
        for start in range(0, len(images), B):
            chunk = images[start : start + B]
            n = len(chunk)
            if n < B:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], B - n, axis=0)]
                )
            out.append(np.asarray(embed_batch(variables, jnp.asarray(chunk)))[:n])
        return np.concatenate(out)

    def measure(impl: str):
        stamp(f"{impl}: build + compile start")
        bench_fn, embed_batch, variables, images, S = build(impl)
        _ = float(bench_fn(variables, images))  # compile + warm
        stamp(f"{impl}: compile done, measuring")
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = float(bench_fn(variables, images))  # host fetch = barrier
            dt = time.perf_counter() - t0
            assert np.isfinite(checksum)
            best = max(best, B * N_ITERS / dt)
        probe = np.asarray(embed_batch(variables, images), np.float64)[:8]
        stamp(f"{impl}: {best:.1f} embeds/s")
        return best, probe, (embed_batch, variables, S)

    # --- phase 1: the reference path (always the fallback headline) ---
    results, probes, embedders = {}, {}, {}
    try:
        results["xla"], probes["xla"], embedders["xla"] = measure("xla")
    except Exception as e:
        # keep failures attributable for the driver: explicit diagnostic +
        # nonzero exit instead of a raw traceback with no JSON
        stamp(f"xla path failed: {type(e).__name__}: {e}")
        print("bench.py: every measurement path failed (the xla reference "
              "path did not complete) — no JSON emitted", file=sys.stderr)
        sys.exit(1)

    ref = probes["xla"]
    ref_n = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-12)
    rank_ref = {}  # lazily computed xla gallery/query embeddings

    def gate(impl: str, probe, embedder) -> bool:
        """Both promotion gates vs xla; True = may become the headline."""
        out_n = probe / (np.linalg.norm(probe, axis=-1, keepdims=True) + 1e-12)
        cos = float((ref_n * out_n).sum(-1).min())
        stamp(f"{impl} vs xla embedding min-cosine: {cos:.6f}")
        if cos < 0.999:
            stamp(f"{impl} fails the cosine gate — excluded")
            return False
        if not run_rank_gate:
            # measurement-only mode: with the ranking gate off, nothing
            # non-default may become the headline (CLAUDE.md promotion
            # invariant requires BOTH gates)
            stamp(f"{impl} measured but not promotable: ranking gate "
                  "disabled (PRCV_BENCH_RANKGATE=0)")
            return False
        from prcv2025reid_tpu.evaluation.protocol import ranking_equivalence

        if not rank_ref:
            eb, var, S = embedders["xla"]
            gallery, g_pids, queries, q_pids = rank_probe_images(S)
            stamp("ranking probe: embedding xla reference set")
            rank_ref.update(
                images=(gallery, queries), pids=(g_pids, q_pids),
                g=embed_all(eb, var, gallery), q=embed_all(eb, var, queries),
                cache={},
            )
        eb_i, var_i, _ = embedder
        gallery, queries = rank_ref["images"]
        g_pids, q_pids = rank_ref["pids"]
        g_t = embed_all(eb_i, var_i, gallery)
        q_t = embed_all(eb_i, var_i, queries)
        r = ranking_equivalence(
            rank_ref["q"], rank_ref["g"], q_t, g_t, q_pids, g_pids,
            ref_cache=rank_ref["cache"],
        )
        stamp(
            f"{impl} ranking gate: top100-overlap={r['top_overlap']:.4f} "
            f"mAP {r['map_ref']:.4f}->{r['map_test']:.4f} "
            f"(delta {r['map_delta']:.4f})"
        )
        if (r["top_overlap"] < RANK_MIN_OVERLAP
                or r["map_delta"] > RANK_MAX_MAP_DELTA):
            stamp(f"{impl} fails the ranking gate — excluded")
            return False
        return True

    # --- phase 2: candidates, each gated the moment it is measured ---
    for impl in candidates:
        try:
            rate, probe, embedder = measure(impl)
        except Exception as e:
            stamp(f"{impl} path failed: {type(e).__name__}: {e}")
            continue
        if gate(impl, probe, embedder):
            results[impl] = rate
            probes[impl], embedders[impl] = probe, embedder

    # --- phase 3: the headline JSON, before any exploratory work ---
    impl, value = max(results.items(), key=lambda kv: kv[1])
    stamp(f"throughputs (gated): { {k: round(v, 1) for k, v in results.items()} } "
          f"-> using {impl}")
    print(
        json.dumps(
            {
                "metric": "query_embeds_per_sec_per_chip_vitb16",
                "value": round(value, 2),
                "unit": "embeds/sec/chip",
                "vs_baseline": round(value / 10000.0, 4),
            }
        )
    )
    sys.stdout.flush()

    # --- phase 4 (optional): exploratory paths, stderr only ---
    if run_extras:
        for impl in extra_impls:
            try:
                rate, probe, embedder = measure(impl)
            except Exception as e:
                stamp(f"{impl} path failed: {type(e).__name__}: {e}")
                continue
            promotable = gate(impl, probe, embedder)
            stamp(
                f"[extra] {impl}: {rate:.1f} embeds/s "
                f"({'passes' if promotable else 'fails'} gates; headline "
                "candidates are set via PRCV_BENCH_IMPLS)"
            )


if __name__ == "__main__":
    main()
