#!/usr/bin/env python
"""Train-step timing + xplane trace at full model size (VERDICT round-1 #4).

Times the real jitted train step (SDM + CE, AdamW, adaptive clip, frozen
backbone per the reference recipe) at a configurable P x K batch, then traces
a few steps and prints the op-level table + category rollup.

Usage:
    python tools/trace_train.py [--pk 8x4] [--steps 20] [--trace-steps 3]
                                [--out /tmp/train_trace] [--no-trace]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pk", default="8x4", help="ids x instances, e.g. 8x4")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--trace-steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/train_trace")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="enable per-block rematerialization (remat_blocks)")
    ap.add_argument("--remat-policy", default="full", choices=("full", "dots"))
    ap.add_argument("--gelu-bwd", default="stored", choices=("remat", "stored"),
                    help="training GELU backward scheduling; default matches "
                         "the production config (configs.gelu_bwd='stored')")
    ap.add_argument("--attn-bwd", default="stored", choices=("remat", "stored"),
                    help="attention backward scheduling: 'remat' recomputes "
                         "QK+softmax instead of storing the [S,S] probs")
    ap.add_argument("--donate", default=True,
                    action=argparse.BooleanOptionalAction,
                    help="donate the train state into the step; default ON to "
                         "match the Trainer (configs.donate_train_state) — "
                         "--no-donate measures the non-aliasing step")
    ap.add_argument("--sdm-impl", default="unrolled",
                    choices=("unrolled", "batched"),
                    help="SDM loss formulation (configs.sdm_impl)")
    ap.add_argument("--nu-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="AdamW second-moment storage dtype "
                         "(configs.opt_nu_dtype)")
    args = ap.parse_args()
    P, K = (int(v) for v in args.pk.split("x"))
    B = P * K

    import jax
    import jax.numpy as jnp
    import numpy as np

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.training.param_groups import build_optimizer
    from prcv2025reid_tpu.training.train_step import TrainState, make_train_step
    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache
    from prcv2025reid_tpu.utils.profiling import trace
    from prcv2025reid_tpu.utils.xplane import op_time_breakdown, print_top

    enable_compile_cache()
    on_tpu = jax.default_backend() not in ("cpu",)
    config = TrainingConfig(
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_ids_per_batch=P,
        instances_per_id=K,
        remat_blocks=args.remat,
        remat_policy=args.remat_policy,
        gelu_bwd=args.gelu_bwd,
        attn_bwd=args.attn_bwd,
        sdm_impl=args.sdm_impl,
        opt_nu_dtype=args.nu_dtype,
    )
    num_classes = 400
    model = MultiModalReIDModel(config=config, num_classes=num_classes)
    Mv, S = len(config.vision_modalities), config.image_size
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, Mv, S, S, 3)), jnp.float32),
        "image_mask": jnp.ones((B, Mv), jnp.float32),
        "text_tokens": jnp.ones((B, config.text_context_length), jnp.int32),
        "text_mask": jnp.ones((B,), jnp.float32),
        "labels": jnp.asarray(np.repeat(np.arange(P), K), jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["images"][:2],
        batch["image_mask"][:2],
        batch["text_tokens"][:2],
        batch["text_mask"][:2],
        train=False,
    )
    tx = build_optimizer(config, variables["params"], steps_per_epoch=100)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
    )
    step_fn = make_train_step(model, tx, config, donate=args.donate)
    sdm_w = jnp.float32(0.1)
    sdm_tau = jnp.float32(config.sdm_init_temperature)

    # compile + 2 warm steps
    state, metrics = step_fn(state, batch, sdm_w, sdm_tau)
    state, metrics = step_fn(state, batch, sdm_w, sdm_tau)
    print(f"warm: loss={float(metrics['total_loss']):.4f} "
          f"ce={float(metrics['ce_loss']):.4f}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, batch, sdm_w, sdm_tau)
    loss = float(metrics["total_loss"])  # host fetch = completion barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    print(f"steady state: {args.steps / dt:.2f} it/s "
          f"({B * args.steps / dt:.1f} samples/s) at P={P} K={K} "
          f"(batch {B}, {Mv} vision modalities + text, "
          f"remat={args.remat}/{args.remat_policy}, donate={args.donate})")

    if args.no_trace:
        return
    with trace(args.out):
        for _ in range(args.trace_steps):
            state, metrics = step_fn(state, batch, sdm_w, sdm_tau)
        float(metrics["total_loss"])

    table = op_time_breakdown(args.out)
    ops = {k[len("XLA Ops::"):]: v / args.trace_steps
           for k, v in table.items() if k.startswith("XLA Ops::")}
    total = sum(ops.values())
    print(f"\n=== per-step op table (P={P} K={K}) — "
          f"{total:.1f} ms device time/step ===")
    print_top(ops, n=30)
    import re
    from collections import defaultdict
    groups = defaultdict(float)
    for op, ms in ops.items():
        base = re.match(r"%([a-zA-Z_\-]+)", op)
        groups[base.group(1) if base else op] += ms
    print("\n=== rollup by fusion kind ===")
    for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v:8.3f} ms {100 * v / total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
