#!/usr/bin/env python
"""Benchmark: query embeddings/sec/chip on the full ViT-B/16 Re-ID model.

The driver-set north star (BASELINE.json) is >= 10k query embeds/sec/chip on
TPU (bf16).  The measured path is the real gallery/query embedding used by the
MM protocol: single-modality ('vis') encode through the MER ViT-B/16 trunk +
fusion + BN-neck, L2-normalized.

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
    B = int(os.environ.get("PRCV_BENCH_BATCH", 128 if on_tpu else 4))
    N_ITERS = 10 if on_tpu else 2
    # extra measurement paths: "pallas" (fused attention), "fused" /
    # "fused_int8" (fused block kernels, ops/fused_block.py).  A non-default
    # path may only become the headline number if its embeddings are
    # retrieval-equivalent to the XLA path (min cosine >= 0.999 on a probe
    # batch) — checked below.
    # fused_int8 is the measured-fastest path (docs/performance.md) and is
    # gated below on embedding equivalence, so it is measured by default
    default_impls = "fused_int8" if on_tpu else ""
    extra_impls = [
        s
        for s in os.environ.get("PRCV_BENCH_IMPLS", default_impls).split(",")
        if s
    ]
    if os.environ.get("PRCV_BENCH_PALLAS", "0") == "1":
        extra_impls.append("pallas")

    # optional model-family override (clip-vit-base-patch16 is the headline;
    # -patch32 / -large-patch14 document perf breadth, docs/performance.md)
    preset = os.environ.get("PRCV_BENCH_PRESET", "")

    def build(impl: str):
        config = TrainingConfig(
            compute_dtype="bfloat16" if on_tpu else "float32",
            use_pallas_attention=(impl == "pallas"),
            use_fused_resln=(impl == "resln"),
            attn_backend="splash" if impl == "splash" else "xla",
            block_impl=impl if impl.startswith("fused") else "xla",
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

        nb = min(8, B)  # parity-probe batch

        @jax.jit
        def embed_once(variables, images):
            imgs = jnp.zeros((nb, Mv, S, S, 3), images.dtype)
            imgs = imgs.at[:, 0].set(images[:nb])
            return model.apply(
                variables,
                imgs,
                image_mask[:nb],
                tokens[:nb],
                text_mask[:nb],
                ("vis",),
                method=model.encode_subset,
            )

        return bench_fn, embed_once, variables, images

    def measure(impl: str):
        bench_fn, embed_once, variables, images = build(impl)
        _ = float(bench_fn(variables, images))  # compile + warm
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = float(bench_fn(variables, images))  # host fetch = barrier
            dt = time.perf_counter() - t0
            assert np.isfinite(checksum)
            best = max(best, B * N_ITERS / dt)
        probe = np.asarray(embed_once(variables, images), np.float64)
        return best, probe

    results, probes = {}, {}
    for impl in [*extra_impls, "xla"]:
        try:
            results[impl], probes[impl] = measure(impl)
        except Exception as e:
            print(f"{impl} path failed: {type(e).__name__}: {e}", file=sys.stderr)

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
                print(f"{impl} fails the parity gate — excluded", file=sys.stderr)
                del results[impl]

    candidates = {k: v for k, v in results.items() if v}
    if not candidates:
        print("every measurement path failed — see stderr above", file=sys.stderr)
        sys.exit(1)
    impl, value = max(candidates.items(), key=lambda kv: kv[1])
    print(f"throughputs: {results} -> using {impl}", file=sys.stderr)
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
