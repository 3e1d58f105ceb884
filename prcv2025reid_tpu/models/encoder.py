"""Unified CLIP encoder: MER vision trunk + text tower + fusion projections.

Reference: models/clip_backbone.py:145-371 (CLIPUnifiedEncoder).  The public
surface is the same two operations — ``encode_vision`` and ``encode_text`` —
but vision encoding additionally exposes the stacked all-modalities form used
by the training step (one trunk call for the whole mixed-modality batch).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.text import TextTower
from prcv2025reid_tpu.models.vit import MERVisionTransformer
from prcv2025reid_tpu.utils.modalities import VISION_MODALITIES


class UnifiedEncoder(nn.Module):
    """encode_vision(images, modality) -> [B, fusion_dim];
    encode_text(tokens) -> [B, fusion_dim]."""

    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    fusion_dim: int = 512
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_mlp_dim: int = 2048
    text_vocab: int = 49408
    context_length: int = 77
    lora_rank: int = 4
    lora_alpha: float = 1.0
    enable_mer: bool = True
    drop_path: float = 0.0
    modalities: Tuple[str, ...] = VISION_MODALITIES
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    mlp_impl: str = "xla"
    resln_impl: str = "xla"
    block_impl: str = "xla"
    gelu_impl: str = "erf"
    gelu_bwd: str = "remat"
    attn_bwd: str = "stored"
    remat_blocks: bool = False
    remat_policy: str = "full"
    token_keep: int = 0  # eval-path token reduction (see configs.py)
    token_reduce_layer: int = 6
    token_reduce_mode: str = "merge"
    token_reduce_train: bool = False  # reduce during training too (fine-tune)

    @classmethod
    def from_config(cls, config: TrainingConfig, dtype=None) -> "UnifiedEncoder":
        return cls(
            embed_dim=config.vision_hidden_dim,
            num_layers=config.vision_layers,
            num_heads=config.vision_heads,
            mlp_dim=config.vision_mlp_dim,
            patch_size=config.patch_size,
            image_size=config.image_size,
            fusion_dim=config.fusion_dim,
            text_width=config.text_hidden_dim,
            text_layers=config.text_layers,
            text_heads=config.text_heads,
            text_mlp_dim=config.text_mlp_dim,
            text_vocab=config.text_vocab_size,
            context_length=config.text_context_length,
            lora_rank=config.mer_lora_rank,
            lora_alpha=config.mer_lora_alpha,
            enable_mer=config.enable_mer,
            drop_path=config.drop_path,
            modalities=config.vision_modalities,
            dtype=dtype if dtype is not None else jnp.dtype(config.compute_dtype),
            attn_impl="auto" if config.use_pallas_attention else config.attn_backend,
            mlp_impl="auto" if config.use_fused_mlp else "xla",
            resln_impl="auto" if config.use_fused_resln else "xla",
            block_impl=config.block_impl,
            gelu_impl=config.gelu_impl,
            gelu_bwd=config.gelu_bwd,
            attn_bwd=config.attn_bwd,
            remat_blocks=config.remat_blocks,
            remat_policy=config.remat_policy,
            token_keep=config.token_keep,
            token_reduce_layer=config.token_reduce_layer,
            token_reduce_mode=config.token_reduce_mode,
            token_reduce_train=config.token_reduce_train,
        )

    def setup(self):
        self.vision = MERVisionTransformer(
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_dim=self.mlp_dim,
            patch_size=self.patch_size,
            image_size=self.image_size,
            fusion_dim=self.fusion_dim,
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            enable_mer=self.enable_mer,
            drop_path=self.drop_path,
            modalities=self.modalities,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            mlp_impl=self.mlp_impl,
            resln_impl=self.resln_impl,
            block_impl=self.block_impl,
            gelu_impl=self.gelu_impl,
            gelu_bwd=self.gelu_bwd,
            attn_bwd=self.attn_bwd,
            remat_blocks=self.remat_blocks,
            remat_policy=self.remat_policy,
            token_keep=self.token_keep,
            token_reduce_layer=self.token_reduce_layer,
            token_reduce_mode=self.token_reduce_mode,
            token_reduce_train=self.token_reduce_train,
        )
        self.text = TextTower(
            vocab_size=self.text_vocab,
            width=self.text_width,
            num_layers=self.text_layers,
            num_heads=self.text_heads,
            mlp_dim=self.text_mlp_dim,
            context_length=self.context_length,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        # 512 -> 512 no-bias projection after the text pooler
        # (reference: models/clip_backbone.py:219,308-311).
        self.text_proj = nn.Dense(
            self.fusion_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="text_proj",
        )

    def encode_vision(
        self, images: jnp.ndarray, modality_id: int, deterministic: bool = True
    ) -> jnp.ndarray:
        return self.vision.encode_single(images, modality_id, deterministic)

    def encode_vision_stacked(
        self, images: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        return self.vision.encode_stacked(images, deterministic)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.text_proj(self.text(tokens))

    def __call__(
        self,
        images: jnp.ndarray,  # [B, Mv, H, W, 3]
        tokens: jnp.ndarray,  # [B, S]
        deterministic: bool = True,
    ):
        vis_feats = self.encode_vision_stacked(images, deterministic)
        txt_feats = self.encode_text(tokens)
        return vis_feats, txt_feats
