#!/usr/bin/env python
"""SDM symmetry-breaking probe at full model size (round-5 flagship gate).

Round-4/5 flagship runs show the signature: CE descends, the classifier
learns, but sdm_loss sits pinned at ln(B) for 600 steps and val mAP stays
at random.  Hypothesis: at fusion_dim=512 the random-init pairwise cosines
concentrate at 0 +- 1/sqrt(512) ~= 0.044, so at tau=0.18 the SDM softmax is
near-uniform (logit spread ~0.25) and the symmetry-breaking gradient is
tiny — while the tiny probe's 32-dim features (spread ~0.18, logits ~1.0)
break immediately (tests/test_convergence.py, probe_tiny PASS artifacts).

Diagnosis update (tools/diagnose_alignment.py on the failed r4c run): the
flat SDM was not slow symmetry breaking — the VISION TRUNK COLLAPSED.
Same-id and diff-id vis cosines were both +1.0000 (every image -> one
direction; all four vision modalities within 0.95 of each other), while
the text tower stayed id-structured (gap +0.80).  CE descended by leaning
on the text branch through fusion.  So the probe's primary axis is the
TRUNK LEARNING RATE (1e-3 on a 12-layer from-scratch ViT is the collapse
suspect), with tau as the secondary axis.

Per (lr) the train step recompiles (LR is baked into the optimizer); per
(tau, weight) it does NOT (runtime scalars).  For each cell the state is
reset to the SAME random init and stepped N times; the probe reports the
sdm_loss trajectory AND a direct collapse metric — the mean off-diagonal
cosine of the raw vis features (collapse -> 1.0, healthy spread -> ~0).
A fixed batch is the EASIEST possible task (pure memorization), so a
recipe that fails here will never align the real stream —
necessary-not-sufficient, which is exactly what a cheap probe can answer
before a 2-hour flagship run.

Reference purpose anchored: /root/reference/train.py:1647-1696 (the eval/
best-checkpoint loop this gate demonstrates).

Usage:
    python tools/probe_sdm_breaking.py [--pk 8x4] [--steps 150]
        [--taus 0.18,0.10,0.06,0.03] [--weights 0.5,1.0] [--lr 1e-3]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pk", default="8x4")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--every", type=int, default=25,
                    help="record sdm/ce every N steps")
    ap.add_argument("--taus", default="0.18,0.06")
    ap.add_argument("--weights", default="0.5")
    ap.add_argument("--lrs", default="1e-3,3e-4,1e-4",
                    help="base/mer/fusion LR grid (each value is a fresh "
                         "optimizer -> a fresh compile)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims (validates the probe on CPU)")
    ap.add_argument("--out", default=None, help="write JSON here")
    args = ap.parse_args()
    P, K = (int(v) for v in args.pk.split("x"))
    B = P * K
    taus = [float(t) for t in args.taus.split(",")]
    weights = [float(w) for w in args.weights.split(",")]
    lrs = [float(v) for v in args.lrs.split(",")]

    import jax

    if args.cpu or args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.training.param_groups import build_optimizer
    from prcv2025reid_tpu.training.train_step import TrainState, make_train_step
    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()
    on_tpu = jax.default_backend() not in ("cpu",)

    def make_config(lr):
        kw = dict(
            compute_dtype="bfloat16" if on_tpu else "float32",
            num_ids_per_batch=P,
            instances_per_id=K,
            freeze_backbone=False,
            base_learning_rate=lr,
            mer_learning_rate=lr,
            fusion_learning_rate=lr,
            head_learning_rate=3 * lr,
            warmup_epochs=0,  # constant-LR probe: measure at the recipe's peak
            head_lr_warmup_epochs=0,
        )
        if args.tiny:
            kw.update(
                vision_hidden_dim=64, vision_layers=2, vision_heads=4,
                vision_mlp_dim=128, text_hidden_dim=32, text_layers=2,
                text_heads=4, text_mlp_dim=64, text_vocab_size=100,
                text_context_length=16, image_size=32, fusion_dim=32,
                sdm_semantic_dim=32, sdm_num_heads=4, fusion_num_heads=4,
                drop_path=0.0,
            )
        return TrainingConfig(**kw)

    config = make_config(lrs[0])
    num_classes = 96
    model = MultiModalReIDModel(config=config, num_classes=num_classes)
    Mv, S = len(config.vision_modalities), config.image_size
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.normal(size=(B, Mv, S, S, 3)), jnp.float32),
        "image_mask": jnp.ones((B, Mv), jnp.float32),
        "text_tokens": jnp.asarray(
            rng.integers(1, config.text_vocab_size,
                         (B, config.text_context_length)), jnp.int32),
        "text_mask": jnp.ones((B,), jnp.float32),
        "labels": jnp.asarray(np.repeat(np.arange(P), K), jnp.int32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["images"][:2], batch["image_mask"][:2],
        batch["text_tokens"][:2], batch["text_mask"][:2], train=False,
    )
    params0 = jax.tree_util.tree_map(np.asarray, variables["params"])
    bstats0 = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    @jax.jit
    def vis_spread(params, batch_stats):
        """Collapse metric: mean/max off-diagonal cosine of the raw vis
        features (all-collapsed -> 1.0; healthy random spread -> ~0)."""
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["image_mask"],
            batch["text_tokens"], batch["text_mask"], train=False,
        )
        f = out["raw_modality_features"][0].astype(jnp.float32)  # vis [B, D]
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        S = f @ f.T
        off = S - jnp.eye(S.shape[0]) * S
        n = S.shape[0]
        return off.sum() / (n * (n - 1)), jnp.abs(off).max()

    ln_b = math.log(B)
    print(f"ln(B) = {ln_b:.4f}; grid lrs={lrs} taus={taus} "
          f"weights={weights} steps={args.steps}", flush=True)
    results = []
    for lr in lrs:
        config = make_config(lr)
        tx = build_optimizer(config, variables["params"], steps_per_epoch=100)
        step_fn = make_train_step(model, tx, config, donate=True)
        for tau in taus:
            for w in weights:
                state = TrainState.create(
                    jax.tree_util.tree_map(jnp.asarray, params0),
                    jax.tree_util.tree_map(jnp.asarray, bstats0),
                    tx, jax.random.PRNGKey(1),
                )
                sdm_w, sdm_tau = jnp.float32(w), jnp.float32(tau)
                traj = []
                t0 = time.perf_counter()
                for s in range(args.steps):
                    state, metrics = step_fn(state, batch, sdm_w, sdm_tau)
                    if (s + 1) % args.every == 0 or s == 0:
                        traj.append(
                            (s + 1,
                             round(float(metrics["sdm_loss"]), 4),
                             round(float(metrics["ce_loss"]), 4))
                        )
                dt = time.perf_counter() - t0
                cos_mean, cos_max = vis_spread(
                    state.params, state.batch_stats
                )
                cos_mean = round(float(cos_mean), 4)
                final_sdm = traj[-1][1]
                broke = next(
                    (s for s, sdm, _ in traj if sdm < ln_b - 0.2), None
                )
                results.append(
                    {"lr": lr, "tau": tau, "weight": w, "trajectory": traj,
                     "final_sdm": final_sdm, "broke_at_step": broke,
                     "vis_offdiag_cos_mean": cos_mean,
                     "vis_offdiag_cos_max": round(float(cos_max), 4),
                     "wall_s": round(dt, 1)}
                )
                print(f"lr={lr:7.1e} tau={tau:5.2f} w={w:3.1f}: sdm "
                      + " ".join(f"{sdm:.3f}" for _, sdm, _ in traj)
                      + (f"  BROKE@{broke}" if broke else "  pinned")
                      + f"  vis_cos={cos_mean:+.3f}"
                      + f"  ({dt:.0f}s)", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"ln_b": ln_b, "lrs": lrs, "pk": args.pk,
                       "steps": args.steps, "cells": results}, f, indent=1)
        print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
