"""Layered learning rates + backbone freezing as an optax label tree.

Reference: models/model.py:661-729 (get_learnable_params — 6 groups with
per-group LRs) and train.py:1417-1425 (freeze_backbone keeps only LoRA /
fusion / bn_neck / null_tokens trainable).

NOTE on reference fidelity: the reference's freeze regex matches
``feature_mixture`` but its fusion module is named ``feature_fusion`` — so the
fusion (and SDM) modules it *intends* to train are silently frozen at random
init (SURVEY.md §2.7 flags reproducing intent, not bugs).  Here the fusion,
SDM module, BN-neck, LoRA experts and null tokens are trainable under
``freeze_backbone``.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import optax

from prcv2025reid_tpu.configs import TrainingConfig

GROUPS = (
    "clip_backbone",
    "mer_loras",
    "tokenizers",
    "projections",
    "classification_head",
    "other_modules",
    "frozen",
)


def label_for_path(path: Tuple[str, ...], freeze_backbone: bool) -> str:
    """Map a param-tree path to its LR group (models/model.py:661-729)."""
    joined = "/".join(str(p) for p in path)
    if "lora_A" in joined or "lora_B" in joined:
        return "mer_loras"
    if "bn_neck/classifier" in joined:
        return "classification_head"
    if "null_tokens" in joined or joined.startswith(("bn_neck", "fusion", "sdm_module")):
        return "other_modules"
    if freeze_backbone:
        return "frozen"
    if "patch_embed_" in joined:
        return "tokenizers"
    if "vision/proj" in joined or "text_proj" in joined:
        return "projections"
    # shared trunks, text tower, cls/pos embeds
    return "clip_backbone"


def build_label_tree(params, freeze_backbone: bool):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path, _):
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        if keys and keys[0] == "params":
            keys = keys[1:]
        return label_for_path(keys, freeze_backbone)

    return jax.tree_util.tree_map_with_path(label, params)


def group_learning_rates(config: TrainingConfig) -> Dict[str, float]:
    return {
        "clip_backbone": config.base_learning_rate,
        "mer_loras": config.mer_learning_rate,
        "tokenizers": config.tokenizer_learning_rate,
        "projections": config.fusion_learning_rate,
        "classification_head": config.head_learning_rate,
        "other_modules": config.fusion_learning_rate,
        "frozen": 0.0,
    }


def build_optimizer(
    config: TrainingConfig,
    params,
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    """AdamW with per-group LRs x a shared epoch-level warmup-cosine
    multiplier (ratios preserved, reference: train.py:1250-1262,1427-1458).

    Gradient accumulation (train.py:1481-1488) is layered on with
    optax.MultiSteps when configured.
    """
    from prcv2025reid_tpu.training.schedulers import lr_multiplier_jnp

    base_lrs = group_learning_rates(config)

    def make_schedule(base_lr: float):
        def schedule(step):
            epoch = step // max(1, steps_per_epoch)
            return base_lr * lr_multiplier_jnp(
                epoch,
                scheduler=config.scheduler,
                num_epochs=config.num_epochs,
                warmup_epochs=config.warmup_epochs,
                floor=config.lr_floor_ratio,
                step_every=config.step_lr_every,
                step_gamma=config.step_lr_gamma,
                milestones=tuple(config.multistep_milestones),
            )

        return schedule

    transforms = {}
    for g in GROUPS:
        if g == "frozen":
            transforms[g] = optax.set_to_zero()
        else:
            transforms[g] = optax.adamw(
                learning_rate=make_schedule(base_lrs[g]),
                weight_decay=config.weight_decay,
            )

    labels = build_label_tree(params, config.freeze_backbone)
    tx = optax.multi_transform(transforms, labels)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, config.gradient_accumulation_steps)
    return tx


def count_trainable(params, freeze_backbone: bool) -> Dict[str, int]:
    labels = build_label_tree(params, freeze_backbone)
    counts: Dict[str, int] = {g: 0 for g in GROUPS}
    for lbl, leaf in zip(
        jax.tree_util.tree_leaves(labels), jax.tree_util.tree_leaves(params)
    ):
        counts[lbl] += leaf.size
    return counts
