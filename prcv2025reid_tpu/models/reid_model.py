"""Top-level multi-modal Re-ID model.

Reference: models/model.py (CLIPBasedMultiModalReIDModel).  Differences forced
by the TPU-first design:

- The classifier width (num_classes) is static config — no lazy
  ``set_num_classes`` mutation (models/model.py:310-319); resolve the class
  count before ``init``.
- Missing modalities are handled by *masked blending* with learnable null
  tokens over the full dense batch (feat = mask*enc + (1-mask)*null), instead
  of boolean-index selective encoding + scatter (models/model.py:354-399) —
  identical math, static shapes.
- Modality dropout drops a modality for the whole batch by zeroing its mask
  (the reference removes the modality from the fusion list — equivalent under
  mask-aware attention), never drops 'vis', and reverts entirely if any sample
  would lose all modalities (models/model.py:434-473).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.encoder import UnifiedEncoder


class SemanticDisentanglementModule(nn.Module):
    """Seq-len-1 self-attention + residual + 2-layer projection.

    Reference: models/model.py:19-77.  With a single token the softmax weight
    is exactly 1, so attention reduces to out_proj(v_proj(x)); torch's
    attention-weight dropout (p=0.1) then acts as a per-(sample, head)
    drop-and-rescale on that path, which is reproduced faithfully.
    """

    semantic_dim: int = 512
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        D = x.shape[-1]
        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # q/k projections of the reference's seq-len-1 MHA cancel (softmax of
        # a single logit is 1) and are deliberately not materialized.
        v = nn.Dense(D, name="v_proj", **dense)(x)
        if not deterministic and self.dropout > 0:
            B = x.shape[0]
            head_dim = D // self.num_heads
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(
                self.make_rng("dropout"), keep, (B, self.num_heads, 1)
            ).astype(x.dtype)
            v = (v.reshape(B, self.num_heads, head_dim) * mask / keep).reshape(B, D)
        attn_out = nn.Dense(D, name="attn_out_proj", **dense)(v)
        x = x + attn_out

        h = nn.Dense(self.semantic_dim, name="proj1", **dense)(x)
        h = nn.LayerNorm(name="proj_ln", dtype=self.dtype, param_dtype=self.param_dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.semantic_dim, name="proj2", **dense)(h)


class FeatureFusion(nn.Module):
    """Mask-aware multi-head fusion over modality tokens.

    Reference: models/model.py:81-183.  Includes the all-masked-sample rescue
    (unmask slot 0 and substitute the global mean feature,
    models/model.py:141-149) and the masked mean pool.
    """

    num_heads: int = 8
    mlp_ratio: float = 2.0
    dropout: float = 0.1
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        feats: jnp.ndarray,  # [B, M, D]
        masks: jnp.ndarray,  # [B, M] float (1 = valid)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, M, D = feats.shape
        head_dim = D // self.num_heads
        masks = masks.astype(feats.dtype)

        # --- all-masked rescue (models/model.py:141-149) ---
        all_masked = (masks.sum(axis=1) == 0)  # [B] bool
        any_valid_sample = (~all_masked).astype(feats.dtype)
        denom = jnp.maximum(any_valid_sample.sum() * M, 1.0)
        global_mean = (feats * any_valid_sample[:, None, None]).sum(axis=(0, 1)) / denom
        feats = jnp.where(
            (all_masked[:, None] & (jnp.arange(M) == 0)[None, :])[..., None],
            global_mean[None, None, :],
            feats,
        )
        attn_masks = jnp.where(
            all_masked[:, None], (jnp.arange(M) == 0)[None, :].astype(masks.dtype), masks
        )

        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        q = nn.Dense(D, name="q_proj", **dense)(feats)
        k = nn.Dense(D, name="k_proj", **dense)(feats)
        v = nn.Dense(D, name="v_proj", **dense)(feats)

        def split(t):
            return t.reshape(B, M, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) * head_dim**-0.5
        logits = logits.astype(jnp.float32)
        key_bias = (1.0 - attn_masks[:, None, None, :].astype(jnp.float32)) * -1e9
        weights = jax.nn.softmax(logits + key_bias, axis=-1).astype(feats.dtype)
        if not deterministic and self.dropout > 0:
            weights = nn.Dropout(self.dropout, deterministic=False)(
                weights, rng=self.make_rng("dropout")
            )
        attn = jnp.einsum("bhqk,bhkd->bhqd", weights, split(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(B, M, D)
        attn = nn.Dense(D, name="out_proj", **dense)(attn)

        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.LayerNorm(name="norm1", **ln)(feats + attn)

        h = nn.LayerNorm(name="mlp_ln", **ln)(x)
        h = nn.Dense(int(D * self.mlp_ratio), name="mlp_fc1", **dense)(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(D, name="mlp_fc2", **dense)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm(name="norm2", **ln)(x + h)

        x = jnp.nan_to_num(x, nan=0.0, posinf=1e4, neginf=-1e4)

        # masked mean pool over valid modalities (models/model.py:168-182)
        valid = masks[..., None]
        counts = jnp.maximum(masks.sum(axis=1, keepdims=True), 1.0)
        return (x * valid).sum(axis=1) / counts


class _TorchBatchNorm(nn.Module):
    """BatchNorm with torch.nn.BatchNorm1d's EXACT running-stat semantics.

    flax.linen.BatchNorm feeds the *biased* batch variance into the running
    average; torch normalizes with the biased variance but accumulates the
    UNBIASED one (x n/(n-1)) into ``running_var`` — so eval-mode features of
    a trained model diverge between the two (pinned by
    tests/test_reference_parity.py::TestTrainTrajectoryGoldenParity).
    Variable layout matches flax BatchNorm (params: ``scale``; batch_stats:
    ``mean``/``var``) — the converter contract is unchanged.
    """

    use_running_average: bool
    momentum: float = 0.9  # decay of the running stat (torch momentum=0.1)
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((D,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((D,), jnp.float32)
        )
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.shape[0]
            mean = x.mean(axis=0)
            mean2 = (x * x).mean(axis=0)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1.0 - self.momentum) * unbiased
                )
        return (x - mean) * (jax.lax.rsqrt(var + self.epsilon) * scale)


class BNNeck(nn.Module):
    """BatchNorm -> L2-normalize x8 -> dropout -> bias-free classifier.

    Reference: models/model.py:186-224.  The x8 rescale after L2
    normalization must match exactly for retrieval parity.  The BN bias is
    frozen at zero in the reference — here it simply does not exist.
    Cross-replica batch statistics use ``axis_name`` when set (data-parallel
    BN under shard_map/pmap; under pjit/GSPMD the stats are global already —
    SURVEY.md §7 hard part 2).
    """

    num_classes: int
    dropout: float = 0.5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        bn = _TorchBatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            param_dtype=self.param_dtype,
            name="bn",
        )(x.astype(jnp.float32))
        norm = jnp.maximum(jnp.linalg.norm(bn, axis=1, keepdims=True), 1e-12)
        bn_features = bn / norm * 8.0
        dropped = nn.Dropout(self.dropout, deterministic=not train)(bn_features)
        logits = nn.Dense(
            self.num_classes,
            use_bias=False,
            kernel_init=nn.initializers.normal(0.001),
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="classifier",
        )(dropped)
        return bn_features, logits


class MultiModalReIDModel(nn.Module):
    """Unified encoder + SDM module + fusion + BNNeck + null tokens.

    Reference: models/model.py:227-510 (CLIPBasedMultiModalReIDModel).
    """

    config: TrainingConfig
    num_classes: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        cfg = self.config
        dt = self.dtype if self.dtype is not None else jnp.dtype(cfg.compute_dtype)
        self.encoder = UnifiedEncoder.from_config(cfg, dtype=dt)
        self.sdm_module = SemanticDisentanglementModule(
            dropout=cfg.sdm_dropout,
            semantic_dim=cfg.sdm_semantic_dim,
            num_heads=cfg.sdm_num_heads,
            dtype=dt,
            name="sdm_module",
        )
        self.fusion = FeatureFusion(
            num_heads=cfg.fusion_num_heads,
            mlp_ratio=cfg.fusion_mlp_ratio,
            dropout=cfg.fusion_dropout,
            dtype=dt,
            name="fusion",
        )
        self.bn_neck = BNNeck(
            num_classes=self.num_classes,
            dropout=cfg.dropout_rate,
            axis_name=self.axis_name,
            dtype=dt,
            name="bn_neck",
        )
        # learnable per-modality null tokens, sigma=0.02 (models/model.py:300-303).
        # Sized to the CONFIGURED fusion slots (vision modalities + text), not
        # the global MODALITIES constant — a non-default --modalities value
        # changes M and the row indexing must follow (row i = vision slot i,
        # last row = text); identical to len(MODALITIES) at the defaults.
        self.null_tokens = self.param(
            "null_tokens",
            nn.initializers.normal(0.02),
            (len(cfg.vision_modalities) + 1, cfg.fusion_dim),
            jnp.float32,
        )

    def __call__(
        self,
        images: jnp.ndarray,  # [B, Mv, H, W, 3]
        image_mask: jnp.ndarray,  # [B, Mv] float
        text_tokens: jnp.ndarray,  # [B, S] int32
        text_mask: jnp.ndarray,  # [B] float
        train: bool = False,
        enable_modality_dropout: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        B, Mv = images.shape[:2]
        M = Mv + 1  # + text slot

        # --- encode everything densely (masking handles validity) ---
        vis_feats = self.encoder.encode_vision_stacked(
            images, deterministic=not train
        )  # [B, Mv, D]
        txt_feats = self.encoder.encode_text(text_tokens)  # [B, D]
        feats = jnp.concatenate([vis_feats, txt_feats[:, None, :]], axis=1)  # [B, M, D]
        masks = jnp.concatenate([image_mask, text_mask[:, None]], axis=1)  # [B, M]
        masks = masks.astype(jnp.float32)

        # --- null-token blending (models/model.py:378-399,411-418) ---
        null = self.null_tokens.astype(feats.dtype)[None]  # [1, M, D]
        raw = masks[..., None].astype(feats.dtype) * feats + (
            1.0 - masks[..., None].astype(feats.dtype)
        ) * null

        # --- SDM semantic disentanglement, training only (models/model.py:394-428) ---
        if train or self.is_initializing():
            sem_all = self.sdm_module(
                raw.reshape(B * M, -1), deterministic=not train
            ).reshape(B, M, -1)
            sem = sem_all if train else raw
        else:
            sem = raw

        # --- modality dropout (models/model.py:434-473) ---
        eff_masks = masks
        if train and enable_modality_dropout and cfg.modality_dropout > 0:
            coin = jax.random.uniform(self.make_rng("moddrop"), (M,))
            keep = (coin > cfg.modality_dropout).astype(masks.dtype)
            keep = keep.at[0].set(1.0)  # never drop 'vis'
            kept_count = keep.sum()
            dropped_masks = masks * keep[None, :]
            sample_ok = (dropped_masks.sum(axis=1) > 0) | (masks.sum(axis=1) == 0)
            safe = sample_ok.all() & (kept_count >= cfg.min_modalities)
            eff_masks = jnp.where(safe, dropped_masks, masks)

        fused = self.fusion(sem, eff_masks, deterministic=not train)
        bn_features, logits = self.bn_neck(fused, train=train)

        return {
            "features": fused,
            "raw_modality_features": raw.transpose(1, 0, 2),  # [M, B, D]
            "modality_features": sem.transpose(1, 0, 2),
            "feature_masks": masks.T,  # [M, B]
            "effective_masks": eff_masks.T,
            "bn_features": bn_features,
            "logits": logits,
        }

    def encode_subset(
        self,
        images: jnp.ndarray,  # [B, Mv, H, W, 3]
        image_mask: jnp.ndarray,  # [B, Mv]
        text_tokens: jnp.ndarray,  # [B, S]
        text_mask: jnp.ndarray,  # [B]
        active: Tuple[str, ...],  # static modality names, e.g. ("nir", "text")
    ) -> jnp.ndarray:
        """Eval-time embedding computing ONLY the active modality towers.

        The reference encodes whatever modalities appear in the batch dict one
        by one (models/model.py:355-399); here the active set is static per
        query combo, so each MM combo compiles to a graph with exactly the
        towers it needs (gallery = 1 ViT pass, not 4).  Inactive slots carry
        null tokens with zero masks — identical math to the full forward for
        masked inputs.  Returns L2-ready bn_features.
        """
        cfg = self.config
        B, Mv = images.shape[:2]
        M = Mv + 1
        dt = jnp.dtype(self.dtype) if self.dtype is not None else jnp.dtype(cfg.compute_dtype)

        vis_mods = cfg.vision_modalities
        null = self.null_tokens.astype(dt)
        feats = jnp.broadcast_to(null[None], (B, M, null.shape[-1])).astype(dt)
        masks = jnp.zeros((B, M), jnp.float32)

        # ONE trunk call over all active vision modalities: patchify each
        # active slot, stack to [B*n_act, 197, D] with per-row expert
        # one-hots (same trick as the training path's encode_stacked).
        active_vis = [(mi, mod) for mi, mod in enumerate(vis_mods) if mod in active]
        if active_vis:
            vit = self.encoder.vision
            tokens = jnp.stack(
                [vit.patch_embeds[mod](images[:, mi]) for mi, mod in active_vis],
                axis=0,
            )  # [n_act, B, P, D]
            all_feats = vit.trunk(
                tokens, tuple(mi for mi, _ in active_vis), deterministic=True
            )  # [n_act, B, D]
            for j, (mi, _) in enumerate(active_vis):
                f = all_feats[j]
                m = image_mask[:, mi].astype(jnp.float32)
                blended = (
                    m[:, None].astype(dt) * f + (1 - m[:, None]).astype(dt) * null[mi]
                )
                feats = feats.at[:, mi].set(blended)
                masks = masks.at[:, mi].set(m)
        if "text" in active:
            f = self.encoder.encode_text(text_tokens)
            m = text_mask.astype(jnp.float32)
            blended = m[:, None].astype(dt) * f + (1 - m[:, None]).astype(dt) * null[M - 1]
            feats = feats.at[:, M - 1].set(blended)
            masks = masks.at[:, M - 1].set(m)

        fused = self.fusion(feats, masks, deterministic=True)
        bn_features, _ = self.bn_neck(fused, train=False)
        return bn_features

    def encode_weighted(
        self,
        images: jnp.ndarray,  # [B, Mv, H, W, 3]
        image_mask: jnp.ndarray,  # [B, Mv]
        text_tokens: jnp.ndarray,  # [B, S]
        text_mask: jnp.ndarray,  # [B] float
        active: Tuple[str, ...],  # static modality names
        weights: Tuple[float, ...],  # static, one per active modality
    ) -> jnp.ndarray:
        """Weighted-sum fusion of per-modality embeddings in ONE graph.

        Semantics of the reference's FeatureExtractor weighted mode
        (tools/eval_mm_protocol.py:133-219): each modality embedded ALONE
        through the full head (single-token fusion + BNNeck), L2-normalized,
        weight-summed, re-normalized.  Round 3: all active vision modalities
        share ONE stacked trunk call and the per-modality heads live in the
        same jit (the round-2 path dispatched n_act separate encode_subset
        graphs — ~10 ms tunnel latency each)."""
        cfg = self.config
        B, Mv = images.shape[:2]
        M = Mv + 1
        dt = jnp.dtype(self.dtype) if self.dtype is not None else jnp.dtype(cfg.compute_dtype)
        vis_mods = cfg.vision_modalities
        null = self.null_tokens.astype(dt)

        # one trunk pass over every active vision modality
        per_mod: Dict[str, Tuple[int, jnp.ndarray, jnp.ndarray]] = {}
        active_vis = [(mi, mod) for mi, mod in enumerate(vis_mods) if mod in active]
        if active_vis:
            vit = self.encoder.vision
            tokens = jnp.stack(
                [vit.patch_embeds[mod](images[:, mi]) for mi, mod in active_vis],
                axis=0,
            )
            all_feats = vit.trunk(
                tokens, tuple(mi for mi, _ in active_vis), deterministic=True
            )
            for j, (mi, mod) in enumerate(active_vis):
                per_mod[mod] = (mi, all_feats[j], image_mask[:, mi].astype(jnp.float32))
        if "text" in active:
            per_mod["text"] = (
                M - 1, self.encoder.encode_text(text_tokens),
                text_mask.astype(jnp.float32),
            )

        acc = None
        for mod, w in zip(active, weights):
            slot, f, m = per_mod[mod]
            blended = m[:, None].astype(dt) * f + (1 - m[:, None]).astype(dt) * null[slot]
            feats = jnp.broadcast_to(null[None], (B, M, null.shape[-1])).astype(dt)
            feats = feats.at[:, slot].set(blended)
            masks = jnp.zeros((B, M), jnp.float32).at[:, slot].set(m)
            fused = self.fusion(feats, masks, deterministic=True)
            bn, _ = self.bn_neck(fused, train=False)
            bn = bn.astype(jnp.float32)
            bn = bn / jnp.maximum(jnp.linalg.norm(bn, axis=1, keepdims=True), 1e-12)
            acc = bn * w if acc is None else acc + bn * w
        return acc / jnp.maximum(jnp.linalg.norm(acc, axis=1, keepdims=True), 1e-12)


def compute_loss(
    outputs: Dict[str, jnp.ndarray],
    labels: jnp.ndarray,
    *,
    ce_weight: float = 1.0,
    sdm_weight: float | jnp.ndarray = 0.0,
    sdm_tau: float | jnp.ndarray = 0.2,
    label_smoothing: float = 0.1,
    sdm_impl: str = "unrolled",
) -> Dict[str, jnp.ndarray]:
    """CE + SDM combination (reference: models/model.py:512-659).

    ``sdm_weight`` is the live scheduler value; zero disables the SDM term
    entirely (the warmup gate at models/model.py:552 is applied by the caller
    through the scheduler).  SDM consumes *raw* (pre-SDM-module) modality
    features, matching models/model.py:557,586.

    Masks are the POST-modality-dropout ``effective_masks``: the reference
    removes dropped modalities from ``feature_masks`` before the loss
    (models/model.py:467-469,506), so both CE validity and the SDM loop see
    the dropout result.
    """
    from prcv2025reid_tpu.ops.losses import (
        masked_cross_entropy,
        multimodal_sdm_loss,
        multimodal_sdm_loss_batched,
    )

    masks = outputs.get("effective_masks", outputs["feature_masks"])  # [M, B]
    any_valid = (masks.sum(axis=0) > 0).astype(jnp.float32)  # [B]
    ce_loss, ce_valid_cnt = masked_cross_entropy(
        outputs["logits"], labels, any_valid, label_smoothing
    )

    sdm_fn = (
        multimodal_sdm_loss_batched if sdm_impl == "batched"
        else multimodal_sdm_loss
    )
    sdm = sdm_fn(
        outputs["raw_modality_features"].astype(jnp.float32),
        masks,
        labels,
        tau=sdm_tau,
        vis_slot=0,
    )
    sdm_weight = jnp.asarray(sdm_weight, jnp.float32)
    sdm = jnp.where(sdm_weight > 0, sdm, 0.0)

    ce_loss = jnp.where(jnp.isfinite(ce_loss), ce_loss, 0.0)
    sdm = jnp.where(jnp.isfinite(sdm), sdm, 0.0)
    total = ce_weight * ce_loss + sdm_weight * sdm
    return {
        "total_loss": total,
        "ce_loss": ce_loss,
        "sdm_loss": sdm,
        "contrastive_loss": sdm,
        "ce_valid_cnt": ce_valid_cnt,
    }
