#!/usr/bin/env python
"""Query-side throughput benchmark: the OTHER half of the MM protocol.

bench.py measures the vis-only gallery embedding rate (the volume term —
45k gallery images, BASELINE.md).  The protocol's query side embeds MM-1..4
modality COMBINATIONS — up to 3 vision towers + the text tower + fusion per
query (reference protocol: tools/eval_mm_protocol.py:223-287; per-query
extraction :396-455) — whose throughput was never measured separately.

Measures queries/sec/chip through the real serving graphs
(``encode_subset`` / ``encode_weighted``, the same methods the eval engine
and tools/serve_embed.py dispatch) for:

- ``text``          text tower alone (77-token CLIP text transformer + head)
- ``single_nir``    one non-vis vision tower (== the gallery rate's shape)
- ``quad``          MM-4: nir+sk+cp+text in ONE graph (fusion over 4 slots)
- ``weighted_quad`` the weighted-fusion variant (4 head passes, one trunk
                    pass per modality — encode_weighted semantics)

Timing follows bench.py / CLAUDE.md: a lax.fori_loop INSIDE one jit with
iteration-dependent inputs (block_until_ready is unreliable through the
tunnel), completion forced by a host fetch of the checksum.

Prints one JSON line per path:
    {"path": ..., "queries_per_sec": ..., "batch": ...}
and a final summary line with every result.

Usage:
    python tools/bench_query.py                      # defaults, all paths
    python tools/bench_query.py --attn_backend=onesaug --gelu_impl=tanh
    python tools/bench_query.py --paths text,quad --batch 32
    python tools/bench_query.py --set vision_layers=2 ...   # tiny/CPU runs
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# active modality combos per measured path
PATH_MODS = {
    "text": ("text",),
    "single_nir": ("nir",),
    "quad": ("nir", "sk", "cp", "text"),
    "weighted_quad": ("nir", "sk", "cp", "text"),
}
# text weight 1.2 mirrors the reference FeatureExtractor's weighted fusion
# (tools/eval_mm_protocol.py:133-219)
WEIGHTED_W = {"nir": 1.0, "sk": 1.0, "cp": 1.0, "text": 1.2}
# per-path default batch: text is cheap (77 tokens), quad carries 3 ViT
# towers (~3x the gallery batch's footprint)
DEFAULT_BATCH = {"text": 256, "single_nir": 160, "quad": 64, "weighted_quad": 64}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--paths", default=",".join(PATH_MODS),
                    help="comma list of: " + ", ".join(PATH_MODS))
    ap.add_argument("--batch", type=int, default=None,
                    help="override the per-path default batch size")
    ap.add_argument("--iters", type=int, default=None,
                    help="fori_loop iterations per timing (default 10 on TPU)")
    ap.add_argument("--attn_backend", default=None,
                    choices=("xla", "splash", "onesaug"))
    ap.add_argument("--gelu_impl", default=None, choices=("erf", "tanh", "poly"))
    ap.add_argument("--block_impl", default=None,
                    choices=("xla", "fused", "fused_int8"))
    ap.add_argument("--set", dest="extra", action="append", default=[],
                    metavar="KEY=VALUE", help="extra TrainingConfig override")
    args = ap.parse_args(argv)

    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prcv2025reid_tpu.configs import TrainingConfig, apply_cli_overrides
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel

    on_tpu = jax.default_backend() not in ("cpu",)
    config = TrainingConfig(compute_dtype="bfloat16" if on_tpu else "float32")
    overrides = {
        k: v
        for k, v in (("attn_backend", args.attn_backend),
                     ("gelu_impl", args.gelu_impl),
                     ("block_impl", args.block_impl))
        if v is not None
    }
    if overrides:
        config = config.replace(**overrides)
    if args.extra:
        config = apply_cli_overrides(config, [f"--{kv}" for kv in args.extra])

    model = MultiModalReIDModel(config=config, num_classes=400)
    Mv, S, CTX = len(config.vision_modalities), config.image_size, \
        config.text_context_length
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng},
        jnp.zeros((2, Mv, S, S, 3), jnp.float32),
        jnp.ones((2, Mv), jnp.float32),
        jnp.zeros((2, CTX), jnp.int32),
        jnp.ones((2,), jnp.float32),
        train=False,
    )
    n_iters = args.iters or (10 if on_tpu else 2)

    def measure(path):
        mods = PATH_MODS[path]
        B = args.batch or (DEFAULT_BATCH[path] if on_tpu else 2)
        has_vision = any(m in mods for m in config.vision_modalities)
        # a text-only path never reads the images — don't hold ~600 MB of
        # random pixels on device for it (encode_subset still wants the arg)
        images = (
            jax.random.normal(rng, (B, Mv, S, S, 3), jnp.float32)
            if has_vision
            else jnp.zeros((B, Mv, S, S, 3), jnp.float32)
        )
        image_mask = jnp.asarray(
            np.array([[1.0 if m in mods else 0.0
                       for m in config.vision_modalities]] * B), jnp.float32)
        tokens = jax.random.randint(
            rng, (B, CTX), 1, config.text_vocab_size - 1, jnp.int32)
        text_mask = jnp.full((B,), 1.0 if "text" in mods else 0.0, jnp.float32)

        if path == "weighted_quad":
            weights = tuple(WEIGHTED_W[m] for m in mods)

            def embed(vs, imgs, toks):
                return model.apply(
                    vs, imgs, image_mask, toks, text_mask, mods,
                    weights, method=model.encode_weighted)
        else:

            def embed(vs, imgs, toks):
                return model.apply(
                    vs, imgs, image_mask, toks, text_mask, mods,
                    method=model.encode_subset)

        @jax.jit
        def bench_fn(vs, images, tokens):
            def body(i, acc):
                # iteration-dependent inputs defeat loop-invariant hoisting:
                # images get a tiny additive perturbation; tokens a roll
                # (int ids cannot be perturbed additively without leaving
                # the vocab range)
                imgs = images + (i.astype(jnp.float32) * 1e-6)
                toks = jnp.roll(tokens, i, axis=1)
                feats = embed(vs, imgs, toks)
                return acc + feats.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        checksum = float(bench_fn(variables, images, tokens))  # compile+warm
        assert np.isfinite(checksum), f"{path}: non-finite checksum"
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            checksum = float(bench_fn(variables, images, tokens))
            dt = time.perf_counter() - t0
            assert np.isfinite(checksum)
            best = max(best, B * n_iters / dt)
        return best, B

    results = {}
    for path in [p for p in args.paths.split(",") if p]:
        if path not in PATH_MODS:
            print(f"unknown path {path!r}; choices: {list(PATH_MODS)}",
                  file=sys.stderr)
            continue
        try:
            qps, B = measure(path)
        except Exception as e:  # keep measuring the other paths
            print(f"{path} failed: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        results[path] = round(qps, 2)
        print(json.dumps(
            {"path": path, "queries_per_sec": round(qps, 2), "batch": B}),
            flush=True)
    if not results:
        sys.exit(1)
    print(json.dumps({
        "metric": "query_embeds_per_sec_per_chip",
        "paths": results,
        "config": {k: getattr(config, k)
                   for k in ("attn_backend", "gelu_impl", "block_impl")},
    }))


if __name__ == "__main__":
    main()
