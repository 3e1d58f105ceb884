"""The jitted training step.

Replaces the reference's per-batch Python (train.py:684-1245 hot loop):
forward + loss under one jit, gradient sanitization (train.py:85-96),
non-finite-loss skip (train.py:868-876), and adaptive gradient clipping
(p70 of the last 10 norms x 1.15, clamped to [0.5, 3.0], train.py:996-1001) —
all expressed as masked device computation so nothing synchronizes the host.

Data parallelism: the step is written for jit + GSPMD sharding (batch sharded
over the 'data' mesh axis).  Batch means (loss, BN statistics) are global
means under GSPMD automatically — no explicit collectives needed here; the
mesh wiring lives in prcv2025reid_tpu/parallel.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel, compute_loss

CLIP_WINDOW = 10


# metric-ring channels (per-step in-graph monitor feed, fetched once per
# epoch).  bn_feat_norm / bn_feat_norm_s0 feed the FeatureNormMonitor and
# ce_loss the CE-random check EXACTLY (every step) instead of the round-2
# 1-in-LOG_EVERY sampling.
RING_CHANNELS = (
    "total_loss",
    "ce_loss",
    "sdm_loss",
    "pair_coverage",
    "bn_feat_norm",
    "bn_feat_norm_s0",
)


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    grad_norm_hist: jnp.ndarray  # [CLIP_WINDOW] ring buffer
    grad_norm_count: jnp.ndarray  # scalar int32
    skipped_total: jnp.ndarray  # scalar int32, exact in-graph skip counter
    # [ring_size, len(RING_CHANNELS)] per-step metric ring.  The reference
    # feeds its MAD spike detector / pair-coverage monitor EVERY batch
    # (train.py:933-956); syncing the host every step would stall the TPU, so
    # each step writes one row here (row = step % ring_size) and the trainer
    # fetches the whole ring once per epoch.  Sized to steps_per_epoch.
    metric_ring: jnp.ndarray

    @classmethod
    def create(
        cls,
        params,
        batch_stats,
        tx: optax.GradientTransformation,
        rng,
        ring_size: int = 1,
        clip_window: int = CLIP_WINDOW,
    ):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            rng=rng,
            grad_norm_hist=jnp.zeros((max(1, clip_window),), jnp.float32),
            grad_norm_count=jnp.zeros((), jnp.int32),
            skipped_total=jnp.zeros((), jnp.int32),
            metric_ring=jnp.zeros((max(1, ring_size), len(RING_CHANNELS)), jnp.float32),
        )


def batch_pair_coverage(
    pids: jnp.ndarray, image_mask: jnp.ndarray, text_mask: jnp.ndarray
) -> jnp.ndarray:
    """Fraction of distinct batch identities with BOTH a valid vis and a valid
    non-vis instance — the reference's pair-coverage health line computed
    in-graph with static shapes (intent of train.py:901-931; the reference's
    own 'rgb' string compare never matches, SURVEY.md §2.7).

    Distinct-id statistics without unique(): weight each sample by
    1/count(pid) so every identity contributes exactly once.  Rows with NO
    valid modality at all are excluded from both sides of the ratio — they
    are multi-host padding (parallel/mesh.pad_batch_to fills pid=0/label=-1
    with zero masks) whose phantom identity would otherwise deflate coverage
    on every padded step.
    """
    valid = ((image_mask.sum(axis=1) + text_mask) > 0).astype(jnp.float32)  # [B]
    eq = (pids[:, None] == pids[None, :]).astype(jnp.float32)  # [B, B]
    eq = eq * valid[None, :] * valid[:, None]
    cnt = eq.sum(axis=1)  # valid samples sharing my pid (0 for invalid rows)
    has_vis = (image_mask[:, 0] > 0).astype(jnp.float32)
    has_nonvis = (
        (image_mask[:, 1:].sum(axis=1) > 0) | (text_mask > 0)
    ).astype(jnp.float32)
    id_has_vis = (eq @ has_vis) > 0
    id_has_nonvis = (eq @ has_nonvis) > 0
    covered = (id_has_vis & id_has_nonvis).astype(jnp.float32)
    inv = valid / jnp.maximum(cnt, 1.0)
    return (covered * inv).sum() / jnp.maximum(inv.sum(), 1e-9)


def sanitize_grads(grads):
    """Zero non-finite gradient entries in place (reference: train.py:85-96)."""
    return jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), grads
    )


def make_train_step(
    model: MultiModalReIDModel,
    tx: optax.GradientTransformation,
    config: TrainingConfig,
    donate: bool = False,
) -> Callable:
    """Build train_step(state, batch, sdm_weight, sdm_tau) -> (state, metrics).

    ``enable_modality_dropout`` is static (fixed per epoch by the warmup rule,
    models/model.py:439-442) so both variants compile once each.

    ``donate=True`` donates the input state: XLA aliases the param/optimizer/
    monitor buffers output-over-input instead of double-buffering them, saving
    one full state footprint of peak HBM.  The caller must not touch the
    pre-step state object afterwards (the Trainer rebinds ``self.state``;
    tests that compare old-vs-new state keep the default).
    """

    jit_kwargs: Dict = {"static_argnames": ("enable_modality_dropout",)}
    if donate:
        jit_kwargs["donate_argnums"] = (0,)

    @functools.partial(jax.jit, **jit_kwargs)
    def train_step(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        sdm_weight: jnp.ndarray,
        sdm_tau: jnp.ndarray,
        enable_modality_dropout: bool = False,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(state.rng, state.step)
        rngs = {
            name: jax.random.fold_in(step_rng, i)
            for i, name in enumerate(("dropout", "droppath", "moddrop"))
        }

        def freeze(params):
            """stop_gradient on frozen leaves so XLA dead-code-eliminates
            their weight-gradient matmuls (profiled at ~1/3 of the backward
            under freeze_backbone — optax.set_to_zero alone still computes
            them)."""
            if not (config.freeze_backbone or config.freeze_text_backbone):
                return params
            from prcv2025reid_tpu.training.param_groups import build_label_tree

            labels = build_label_tree(
                params, config.freeze_backbone, config.freeze_text_backbone
            )
            return jax.tree.map(
                lambda lbl, p: jax.lax.stop_gradient(p) if lbl == "frozen" else p,
                labels,
                params,
            )

        def loss_fn(params):
            params = freeze(params)
            outputs, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"],
                batch["image_mask"],
                batch["text_tokens"],
                batch["text_mask"],
                train=True,
                enable_modality_dropout=enable_modality_dropout,
                mutable=["batch_stats"],
                rngs=rngs,
            )
            losses = compute_loss(
                outputs,
                batch["labels"],
                ce_weight=config.ce_weight,
                sdm_weight=sdm_weight,
                sdm_tau=sdm_tau,
                label_smoothing=config.label_smoothing,
                sdm_impl=config.sdm_impl,
            )
            return losses["total_loss"], (losses, outputs, updates["batch_stats"])

        (total_loss, (losses, outputs, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        # --- poisoned-step skip ---
        # The reference checks only the (already force-zeroed) loss
        # (train.py:868-876) and then steps with sanitized gradients — AdamW
        # momentum still drifts on a poisoned batch.  Here the gate also
        # covers non-finite gradients BEFORE sanitization: a NaN anywhere in
        # the backward pass skips the whole update.
        raw_gnorm = optax.global_norm(grads)
        ok = jnp.isfinite(total_loss) & jnp.isfinite(raw_gnorm)
        grads = sanitize_grads(grads)

        # --- adaptive clipping (train.py:996-1001); skipped steps do not
        # pollute the norm history ---
        gnorm = optax.global_norm(grads)
        window = state.grad_norm_hist.shape[0]  # config.adaptive_clip_window
        hist = jnp.where(
            ok,
            state.grad_norm_hist.at[state.grad_norm_count % window].set(gnorm),
            state.grad_norm_hist,
        )
        count = state.grad_norm_count + ok.astype(jnp.int32)
        if config.adaptive_gradient_clip:
            pct = jnp.percentile(hist, 100.0 * config.adaptive_clip_pct)
            adaptive = jnp.clip(
                pct * config.adaptive_clip_margin,
                config.adaptive_clip_min,
                config.adaptive_clip_max,
            )
            # warm-start 1.0 is reference-exact: until >10 norms are recorded
            # the reference also clips at max_norm=1.0 (train.py:996-1001,
            # ``else: adaptive_max_norm = 1.0``).  Deviation that remains: the
            # reference records norms only every NORM_EVERY=200 boundaries, so
            # its window warms up over ~2000 steps; ours fills after
            # CLIP_WINDOW=10 steps (strictly more responsive).
            max_norm = jnp.where(count >= window, adaptive, 1.0)
        else:
            max_norm = jnp.asarray(config.max_grad_norm, jnp.float32)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(gnorm, 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # a skipped step must not move ANYTHING: params (AdamW would still
        # apply momentum + weight decay on zero grads — the reference skips
        # optimizer.step entirely), optimizer state, and BN statistics.
        def keep_old(new, old):
            return jax.tree.map(lambda n, o: jnp.where(ok, n, o), new, old)

        new_params = keep_old(new_params, state.params)
        new_opt_state = keep_old(new_opt_state, state.opt_state)
        new_batch_stats = keep_old(new_batch_stats, state.batch_stats)

        # per-step monitor row — written even on skipped steps (the host
        # spike detector must see poisoned losses; reference train.py:933-956).
        # labels are a per-batch bijection of pids, so coverage is identical
        # when a caller supplies only labels.
        coverage = batch_pair_coverage(
            batch.get("pids", batch["labels"]), batch["image_mask"], batch["text_mask"]
        )
        # a skipped (poisoned) step records NaN in the loss channel: the loss
        # itself may have been force-zeroed by the loss-level finite guards
        # while the *gradients* were non-finite — the host spike detector must
        # still count the event (reference counts non-finite losses as spikes
        # and `continue`s, train.py:868-876,933-956).
        poison = jnp.where(ok, 0.0, jnp.nan)
        bn_norms = jnp.linalg.norm(
            outputs["bn_features"].astype(jnp.float32), axis=1
        )
        ring_row = jnp.stack(
            [
                losses["total_loss"] + poison,
                losses["ce_loss"] + poison,
                losses["sdm_loss"] + poison,
                coverage,
                bn_norms.mean(),
                bn_norms[0],
            ]
        ).astype(jnp.float32)
        ring = state.metric_ring.at[state.step % state.metric_ring.shape[0]].set(
            ring_row
        )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            grad_norm_hist=hist,
            grad_norm_count=count,
            skipped_total=state.skipped_total + (~ok).astype(jnp.int32),
            metric_ring=ring,
        )

        # --- in-graph metrics (fetched at log frequency only) ---
        labels = batch["labels"]
        eff = outputs.get("effective_masks", outputs["feature_masks"])
        valid = (eff.sum(axis=0) > 0) & (labels >= 0)
        preds = jnp.argmax(outputs["logits"], axis=1)
        top1 = ((preds == labels) & valid).sum() / jnp.maximum(valid.sum(), 1)
        feat_norm = jnp.linalg.norm(
            outputs["features"].astype(jnp.float32), axis=1
        ).mean()
        bn_norm = bn_norms.mean()
        metrics = {
            "total_loss": losses["total_loss"],
            "ce_loss": losses["ce_loss"],
            "sdm_loss": losses["sdm_loss"],
            "ce_valid_cnt": losses["ce_valid_cnt"],
            "grad_norm": gnorm,
            "clip_threshold": max_norm,
            "train_top1": top1,
            "feat_norm": feat_norm,
            "bn_feat_norm": bn_norm,
            # sample-0 norm: the reference's L2-normalization sniff input
            # (train.py:1163-1166)
            "bn_feat_norm_s0": bn_norms[0],
            "skipped": (~ok).astype(jnp.float32),
        }
        return new_state, metrics

    return train_step


def make_embed_step(model: MultiModalReIDModel) -> Callable:
    """Jitted eval-time embedding: batch -> L2-normalized bn_features.

    The retrieval feature is ``bn_features`` (train.py:428-448 requires it and
    L2-normalizes).
    """

    @jax.jit
    def embed(params_and_stats, batch):
        outputs = model.apply(
            params_and_stats,
            batch["images"],
            batch["image_mask"],
            batch["text_tokens"],
            batch["text_mask"],
            train=False,
        )
        feats = outputs["bn_features"].astype(jnp.float32)
        return feats / jnp.maximum(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)

    return embed


def make_combo_embed_step(model: MultiModalReIDModel, active: Tuple[str, ...]) -> Callable:
    """Embedding specialized to a static modality combo — computes only the
    towers the combo needs (gallery 'vis' = 1 ViT pass instead of 4)."""
    active = tuple(active)

    @jax.jit
    def embed(params_and_stats, batch):
        feats = model.apply(
            params_and_stats,
            batch["images"],
            batch["image_mask"],
            batch["text_tokens"],
            batch["text_mask"],
            active,
            method=model.encode_subset,
        ).astype(jnp.float32)
        return feats / jnp.maximum(jnp.linalg.norm(feats, axis=1, keepdims=True), 1e-12)

    return embed


def make_weighted_embed_step(
    model: MultiModalReIDModel,
    active: Tuple[str, ...],
    weights: Dict[str, float] | None = None,
) -> Callable:
    """Weighted-sum query fusion — the standalone eval tool's fallback when
    not using the model's fusion (tools/eval_mm_protocol.py:133-219: per-
    modality features combined by fixed weights, text 1.2).  Each active
    modality is embedded alone through the full head (fusion of a single
    token + BNNeck), then the L2-normalized features are weight-summed and
    re-normalized.  One jitted graph with a single stacked trunk pass
    (model.encode_weighted) — round 2 dispatched one encode_subset graph
    per modality."""
    active = tuple(active)
    weights = weights or {}
    w = tuple(float(weights.get(m, 1.2 if m == "text" else 1.0)) for m in active)

    @jax.jit
    def embed(params_and_stats, batch):
        return model.apply(
            params_and_stats,
            batch["images"],
            batch["image_mask"],
            batch["text_tokens"],
            batch["text_mask"],
            active,
            w,
            method=model.encode_weighted,
        )

    return embed
