#!/usr/bin/env python
"""Benchmark: query embeddings/sec/chip on the full ViT-B/16 Re-ID model.

The driver-set north star (BASELINE.json) is >= 10k query embeds/sec/chip on
TPU (bf16).  The measured path is the real gallery/query embedding used by the
MM protocol: single-modality ('vis') encode through the MER ViT-B/16 trunk +
fusion + BN-neck, L2-normalized.

A non-default compute path (fused int8 kernels, onesaug attention, tanh GELU)
may only become the headline number if it passes BOTH promotion gates vs the
default XLA path:
  1. embedding parity: min cosine >= 0.999 on a probe batch;
  2. ranking equivalence: mean top-100 overlap >= 0.97 AND |mAP delta| <=
     0.005 on a structured synthetic retrieval set (64 ids x 18 instances
     gallery, 128 queries) — the product metric is ranking order
     (reference train.py:450-479), which cosine alone does not pin.

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
    "onesaug": {"attn_backend": "onesaug"},
    "tanhgelu": {"gelu_impl": "tanh"},
    "onesaug_tanh": {"attn_backend": "onesaug", "gelu_impl": "tanh"},
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
    # fused_int8 was the round-2 winner; onesaug attention + tanh GELU are
    # the round-3 candidates (docs/performance.md) — all gated below.
    default_impls = "fused_int8,onesaug,onesaug_tanh,fused_int8_onesaug" \
        if on_tpu else ""
    extra_impls = [
        s
        for s in os.environ.get("PRCV_BENCH_IMPLS", default_impls).split(",")
        if s
    ]
    if os.environ.get("PRCV_BENCH_PALLAS", "0") == "1":
        extra_impls.append("pallas")
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
        bench_fn, embed_batch, variables, images, S = build(impl)
        _ = float(bench_fn(variables, images))  # compile + warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = float(bench_fn(variables, images))  # host fetch = barrier
            dt = time.perf_counter() - t0
            assert np.isfinite(checksum)
            best = max(best, B * N_ITERS / dt)
        probe = np.asarray(embed_batch(variables, images), np.float64)[:8]
        return best, probe, (embed_batch, variables, S)

    results, probes, embedders = {}, {}, {}
    for impl in [*extra_impls, "xla"]:
        try:
            results[impl], probes[impl], embedders[impl] = measure(impl)
        except Exception as e:
            print(f"{impl} path failed: {type(e).__name__}: {e}", file=sys.stderr)
    measured = dict(results)  # pre-gate numbers, for the stderr report

    if "xla" not in probes:
        # no reference embeddings — nothing non-default can be validated, so
        # nothing non-default may win
        for impl in list(results):
            if impl != "xla":
                print(f"{impl} excluded: xla reference probe unavailable",
                      file=sys.stderr)
                del results[impl]
    else:
        ref = probes["xla"]
        ref_n = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-12)
        for impl in list(results):
            if impl == "xla":
                continue
            out = probes[impl]
            out_n = out / (np.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
            cos = float((ref_n * out_n).sum(-1).min())
            print(f"{impl} vs xla embedding min-cosine: {cos:.6f}", file=sys.stderr)
            if cos < 0.999:
                print(f"{impl} fails the cosine gate — excluded", file=sys.stderr)
                del results[impl]

        # ranking-equivalence gate for every surviving non-default path
        survivors = [i for i in results if i != "xla"]
        if survivors and not run_rank_gate:
            # measurement-only mode: with the ranking gate off, nothing
            # non-default may become the headline (CLAUDE.md promotion
            # invariant requires BOTH gates) — numbers still print above
            for impl in survivors:
                print(
                    f"{impl} measured but not promotable: ranking gate "
                    "disabled (PRCV_BENCH_RANKGATE=0)",
                    file=sys.stderr,
                )
                del results[impl]
            survivors = []
        if survivors:
            from prcv2025reid_tpu.evaluation.protocol import ranking_equivalence

            eb, var, S = embedders["xla"]
            gallery, g_pids, queries, q_pids = rank_probe_images(S)
            g_ref = embed_all(eb, var, gallery)
            q_ref = embed_all(eb, var, queries)
            ref_cache = {}
            for impl in survivors:
                eb_i, var_i, _ = embedders[impl]
                g_t = embed_all(eb_i, var_i, gallery)
                q_t = embed_all(eb_i, var_i, queries)
                r = ranking_equivalence(
                    q_ref, g_ref, q_t, g_t, q_pids, g_pids,
                    ref_cache=ref_cache,
                )
                print(
                    f"{impl} ranking gate: top100-overlap={r['top_overlap']:.4f} "
                    f"mAP {r['map_ref']:.4f}->{r['map_test']:.4f} "
                    f"(delta {r['map_delta']:.4f})",
                    file=sys.stderr,
                )
                if (r["top_overlap"] < RANK_MIN_OVERLAP
                        or r["map_delta"] > RANK_MAX_MAP_DELTA):
                    print(f"{impl} fails the ranking gate — excluded",
                          file=sys.stderr)
                    del results[impl]

    candidates = {k: v for k, v in results.items() if v}
    if not candidates:
        print("every measurement path failed — see stderr above", file=sys.stderr)
        sys.exit(1)
    impl, value = max(candidates.items(), key=lambda kv: kv[1])
    print(f"throughputs (pre-gate): {measured} -> using {impl}", file=sys.stderr)
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


if __name__ == "__main__":
    main()
