#!/usr/bin/env python
"""Xplane trace of the embed path (the bench.py workload) with an op-level
cost table and a category rollup.

Usage:
    python tools/trace_embed.py [--batch 128] [--block-impl xla|fused|fused_int8]
                                [--iters 6] [--out /tmp/embed_trace]

Prints the per-step op table (ms, % of device time) plus a rollup into
matmul / layernorm-ish / softmax-exp / transpose-copy / other buckets —
the evidence base for docs/performance.md.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--block-impl", default="xla")
    ap.add_argument("--attn-backend", default="xla",
                    choices=("xla", "splash", "onesaug"))
    ap.add_argument("--gelu-impl", default="erf", choices=("erf", "tanh", "poly"))
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", default="/tmp/embed_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache
    from prcv2025reid_tpu.utils.profiling import trace
    from prcv2025reid_tpu.utils.xplane import op_time_breakdown, print_top

    enable_compile_cache()
    on_tpu = jax.default_backend() not in ("cpu",)
    B = args.batch
    config = TrainingConfig(
        compute_dtype="bfloat16" if on_tpu else "float32",
        block_impl=args.block_impl,
        attn_backend=args.attn_backend,
        gelu_impl=args.gelu_impl,
    )
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
    images = jax.random.normal(rng, (B, Mv, S, S, 3), jnp.float32)
    image_mask = jnp.ones((B, Mv), jnp.float32)
    tokens = jnp.zeros((B, config.text_context_length), jnp.int32)
    text_mask = jnp.ones((B,), jnp.float32)

    @jax.jit
    def embed(variables, images):
        return model.apply(
            variables, images, image_mask, tokens, text_mask,
            ("vis",), method=model.encode_subset,
        )

    out = embed(variables, images)
    checksum = float(out.astype(jnp.float32).sum())  # force completion
    print(f"compiled; checksum={checksum:.4f}", file=sys.stderr)

    # dump the matching HLO so tools/hlo_attr.py can join op times to model
    # components (the join is only valid for the same compile)
    os.makedirs(args.out, exist_ok=True)
    hlo_path = os.path.join(args.out, "embed_hlo.txt")
    with open(hlo_path, "w") as f:
        f.write(embed.lower(variables, images).compile().as_text())
    print(f"HLO written to {hlo_path}", file=sys.stderr)

    with trace(args.out):
        for _ in range(args.iters):
            out = embed(variables, images)
        float(out.astype(jnp.float32).sum())

    # only "XLA Ops::" lines are op OCCUPANCY — module/step/async spans
    # overlap them and must not be summed (CLAUDE.md measurement rule)
    table = {
        k: v for k, v in op_time_breakdown(args.out).items()
        if k.startswith("XLA Ops::")
    }
    per_step = {k: v / args.iters for k, v in table.items()}
    print(f"\n=== per-step op table (batch={B}, block_impl={args.block_impl}) ===")
    print_top(per_step, n=40)

    cats = {"matmul": 0.0, "ln/reduce": 0.0, "softmax/exp": 0.0,
            "transpose/copy": 0.0, "pallas": 0.0, "other": 0.0}
    for op, ms in per_step.items():
        name = op.lower()
        if "custom-call" in name or "pallas" in name or "mosaic" in name:
            cats["pallas"] += ms
        elif "dot" in name or "conv" in name:
            cats["matmul"] += ms
        elif "reduce" in name or "norm" in name:
            cats["ln/reduce"] += ms
        elif "exp" in name or "softmax" in name or "divide" in name:
            cats["softmax/exp"] += ms
        elif "transpose" in name or "copy" in name or "bitcast" in name:
            cats["transpose/copy"] += ms
        else:
            cats["other"] += ms
    total = sum(cats.values())
    print("\n=== rollup ===")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {v:9.3f} ms  {100 * v / max(total, 1e-9):5.1f}%  {k}")
    if total > 0:
        print(f"  {total:9.3f} ms  total -> {B / (total / 1e3):.0f} embeds/s "
              f"(device-op time only)")
    else:
        print("  no device 'XLA Ops' found in the trace (CPU run?)")


if __name__ == "__main__":
    main()
