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


def label_for_path(
    path: Tuple[str, ...], freeze_backbone: bool, freeze_text_backbone: bool = False
) -> str:
    """Map a param-tree path to its LR group (models/model.py:661-729).

    ``freeze_text_backbone`` freezes the text tower independently of the
    vision trunk (reference: models/clip_backbone.py:213-215) — the tower
    only, not text_proj.
    """
    joined = "/".join(str(p) for p in path)
    if "lora_A" in joined or "lora_B" in joined:
        return "mer_loras"
    if "bn_neck/classifier" in joined:
        return "classification_head"
    if "null_tokens" in joined or joined.startswith(("bn_neck", "fusion", "sdm_module")):
        return "other_modules"
    if freeze_text_backbone and joined.startswith("encoder/text/"):
        return "frozen"
    if freeze_backbone:
        return "frozen"
    if "patch_embed_" in joined:
        return "tokenizers"
    if "vision/proj" in joined or "text_proj" in joined:
        return "projections"
    # shared trunks, text tower, cls/pos embeds
    return "clip_backbone"


def build_label_tree(params, freeze_backbone: bool, freeze_text_backbone: bool = False):
    def label(path, _):
        keys = tuple(
            k.key if hasattr(k, "key") else str(k) for k in path
        )
        if keys and keys[0] == "params":
            keys = keys[1:]
        return label_for_path(keys, freeze_backbone, freeze_text_backbone)

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


def plateau_scale_transform() -> optax.GradientTransformation:
    """Stateful update scale for the 'plateau' scheduler.

    adamw applies lr to BOTH the adam step and the decoupled weight decay, so
    post-scaling the update by s is exactly lr*s.  The scale lives in the
    optimizer state (leaf name ``plateau_scale``) so the host can write eval-
    mAP-driven drops into it between epochs (reference: train.py:1705-1710
    steps ReduceLROnPlateau on map_avg2).
    """

    def init(params):
        del params
        import jax.numpy as jnp

        return {"plateau_scale": jnp.ones((), jnp.float32)}

    def update(updates, state, params=None):
        del params
        s = state["plateau_scale"]
        return jax.tree.map(lambda u: u * s, updates), state

    return optax.GradientTransformation(init, update)


def set_plateau_scale(opt_state, scale: float):
    """Return opt_state with every ``plateau_scale`` leaf set to ``scale``."""
    import jax.numpy as jnp

    def fn(path, leaf):
        key = getattr(path[-1], "key", None) if path else None
        if key == "plateau_scale":
            return jnp.full_like(leaf, scale)
        return leaf

    return jax.tree_util.tree_map_with_path(fn, opt_state)


def get_plateau_scale(opt_state) -> float:
    found = []

    def fn(path, leaf):
        key = getattr(path[-1], "key", None) if path else None
        if key == "plateau_scale":
            found.append(leaf)
        return leaf

    jax.tree_util.tree_map_with_path(fn, opt_state)
    if not found:
        raise ValueError("opt_state has no plateau_scale leaf (scheduler != 'plateau'?)")
    return float(found[0])


def group_schedules(config: TrainingConfig, steps_per_epoch: int) -> Dict[str, Callable]:
    """Per-group optax LR schedules (optimizer-update count -> lr).

    MultiSteps advances the inner adamw count once per EFFECTIVE update, so
    the epoch is derived from updates-per-epoch = ceil(batches / accum).
    classification_head goes flat at head_learning_rate from 1-based epoch >=
    head_lr_warmup_epochs (reference train.py:1601-1612 pins the head group at
    every epoch start from epoch 2 — net effect is a flat head LR there).
    """
    from prcv2025reid_tpu.training.schedulers import lr_multiplier_jnp

    base_lrs = group_learning_rates(config)
    updates_per_epoch = max(1, -(-steps_per_epoch // config.accum_steps))  # ceil

    def make_schedule(base_lr: float, flat_after: int | None = None):
        def schedule(step):
            import jax.numpy as jnp

            epoch = step // updates_per_epoch
            lr = base_lr * lr_multiplier_jnp(
                epoch,
                scheduler=config.scheduler,
                num_epochs=config.num_epochs,
                warmup_epochs=config.warmup_epochs,
                floor=config.lr_floor_ratio,
                step_every=config.step_lr_every,
                step_gamma=config.step_lr_gamma,
                milestones=tuple(config.multistep_milestones),
            )
            if flat_after is not None:
                # epoch here is 0-based; the reference's pin applies from
                # 1-based epoch >= head_lr_warmup_epochs
                lr = jnp.where(epoch + 1 >= flat_after, base_lr, lr)
            return lr

        return schedule

    return {
        g: make_schedule(
            base_lrs[g],
            config.head_lr_warmup_epochs if g == "classification_head" else None,
        )
        for g in GROUPS
        if g != "frozen"
    }


def adamw_nu_dtype(
    learning_rate,
    weight_decay: float,
    nu_dtype,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """optax.adamw with the second-moment (nu) accumulator STORED in
    ``nu_dtype`` (typically bfloat16).  All decay/bias-correction math runs
    in float32 — only the state buffer between steps is narrowed, halving
    the largest optimizer-state read+write per step.  State structure
    mirrors optax.adamw (chain of scale_by_adam-shaped state,
    add_decayed_weights, scale_by_learning_rate) so checkpoint templates
    line up when the config is consistent."""
    import jax.numpy as jnp

    def init(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        nu = jax.tree.map(lambda p: jnp.zeros(p.shape, nu_dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(updates, state, params=None):
        del params
        mu = jax.tree.map(
            lambda g, m: b1 * m + (1.0 - b1) * g.astype(jnp.float32),
            updates,
            state.mu,
        )
        nu_f32 = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            updates,
            state.nu,
        )
        count = optax.safe_int32_increment(state.count)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c
        out = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu_f32
        )
        nu = jax.tree.map(lambda v: v.astype(nu_dtype), nu_f32)
        return out, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.chain(
        optax.GradientTransformation(init, update),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_learning_rate(learning_rate),
    )


def build_optimizer(
    config: TrainingConfig,
    params,
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    """AdamW with per-group LRs x a shared epoch-level schedule multiplier
    (ratios preserved, reference: train.py:1250-1262,1427-1458).

    - Gradient accumulation via optax.MultiSteps, auto-sized to
      target_effective_batch (config.accum_steps; reference train.py:1481-1488).
      MultiSteps advances the inner adamw count once per EFFECTIVE update, so
      the schedule's epoch is derived from updates-per-epoch, not batches.
    - classification_head: flat head_learning_rate from epoch >=
      head_lr_warmup_epochs (reference train.py:1601-1612 pins the head group
      to 3e-3 at every epoch start from epoch 2 — net effect is a flat head
      LR; before that the shared warmup ramp applies).
    - scheduler='plateau' appends a host-written update scale
      (plateau_scale_transform).
    """
    schedules = group_schedules(config, steps_per_epoch)
    accum = config.accum_steps

    transforms = {}
    for g in GROUPS:
        if g == "frozen":
            transforms[g] = optax.set_to_zero()
        elif config.opt_nu_dtype != "float32":
            import jax.numpy as jnp

            transforms[g] = adamw_nu_dtype(
                learning_rate=schedules[g],
                weight_decay=config.weight_decay,
                nu_dtype=jnp.dtype(config.opt_nu_dtype),
            )
        else:
            transforms[g] = optax.adamw(
                learning_rate=schedules[g],
                weight_decay=config.weight_decay,
            )

    labels = build_label_tree(params, config.freeze_backbone, config.freeze_text_backbone)
    tx = optax.multi_transform(transforms, labels)
    if config.scheduler == "plateau":
        tx = optax.chain(tx, plateau_scale_transform())
    if accum > 1:
        tx = optax.MultiSteps(tx, accum)
    return tx


def count_trainable(
    params, freeze_backbone: bool, freeze_text_backbone: bool = False
) -> Dict[str, int]:
    """Per-group param counts under the SAME labeling the optimizer uses
    (both freeze flags), so the startup report matches what actually trains."""
    labels = build_label_tree(params, freeze_backbone, freeze_text_backbone)
    counts: Dict[str, int] = {g: 0 for g in GROUPS}
    for lbl, leaf in zip(
        jax.tree_util.tree_leaves(labels), jax.tree_util.tree_leaves(params)
    ):
        counts[lbl] += leaf.size
    return counts
