"""Vision trunk: per-modality patch embedding + MER transformer stack.

Reference semantics:
- Non-shared per-modality patch embeds, 1-channel for nir/sk with
  RGB->grayscale reduction (models/patch_embeds.py:13-171).
- Trunk: patchify -> +CLS -> +pos-embed -> 12 MER blocks -> final LN -> CLS
  feature (models/clip_backbone.py:254-286).  NOTE: the reference does NOT
  apply CLIP's ``pre_layrnorm`` before the blocks; that deviation from stock
  CLIP is reproduced intentionally for output parity.

TPU-native redesign: patchify is a reshape + matmul (the 16x16/stride-16
"conv" is exactly a linear map on non-overlapping patches) — it lands on the
MXU directly with no convolution windowing.  Modality routing is static: the
stacked input layout [B, Mv, H, W, 3] puts each modality in a fixed slot, so
patch-embed selection is an unrolled (trace-time) loop and the trunk runs ONCE
over the flattened [B*Mv, 197, D] batch with slot-indexed expert one-hots.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from prcv2025reid_tpu.models.mer import MERBlock
from prcv2025reid_tpu.utils.modalities import SINGLE_CHANNEL, VISION_MODALITIES


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[N, H, W, C] -> [N, num_patches, P*P*C] with (i, j, c) ordering inside
    a patch — the layout the converter writes HF conv kernels into."""
    N, H, W, C = images.shape
    P = patch_size
    h, w = H // P, W // P
    x = images.reshape(N, h, P, w, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [N, h, w, P, P, C]
    return x.reshape(N, h * w, P * P * C)


class PatchEmbed(nn.Module):
    """Single-modality patch embedding (reference: models/patch_embeds.py:13-76).

    For 1-channel modalities the RGB input is reduced to grayscale by channel
    mean first (the reference's 3->1 runtime fallback at patch_embeds.py:63-65,
    which is the live path since the host pipeline always emits RGB tensors).
    """

    embed_dim: int
    patch_size: int = 16
    in_chans: int = 3
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        from prcv2025reid_tpu.data.augment import normalize_images_device

        P = self.patch_size
        # uint8 batches normalize on device (host pipeline ships raw pixels);
        # float inputs pass through (already normalized).
        images = normalize_images_device(images)
        if self.in_chans == 1 and images.shape[-1] == 3:
            images = images.mean(axis=-1, keepdims=True)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (P, P, self.in_chans, self.embed_dim),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.embed_dim,), self.param_dtype
        )
        dt = self.dtype or images.dtype
        patches = patchify(images.astype(dt), P)
        w = kernel.reshape(P * P * self.in_chans, self.embed_dim).astype(dt)
        return patches @ w + bias.astype(dt)


class MERVisionTransformer(nn.Module):
    """The MER-routed ViT-B/16 trunk (reference: models/clip_backbone.py:145-286)."""

    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    fusion_dim: int = 512
    lora_rank: int = 4
    lora_alpha: float = 1.0
    enable_mer: bool = True  # config.enable_mer (reference: configs/config.py:27)
    drop_path: float = 0.0
    modalities: Tuple[str, ...] = VISION_MODALITIES
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    mlp_impl: str = "xla"
    resln_impl: str = "xla"
    block_impl: str = "xla"  # see MERBlock.block_impl
    gelu_impl: str = "erf"  # see MERBlock.gelu_impl
    gelu_bwd: str = "remat"  # see MERMlp.gelu_bwd
    attn_bwd: str = "stored"  # see MERAttention.attn_bwd
    # rematerialize each block in the backward (jax.checkpoint): saves only
    # block inputs, recomputing activations during the backward — ~1/3 more
    # forward FLOPs for ~12x less activation memory, enabling larger P*K
    # training batches (config.remat_blocks).
    remat_blocks: bool = False
    remat_policy: str = "full"  # "full" | "dots" (see configs.py)
    # Gated FLOP reduction on the EVAL path (config.token_keep): after block
    # token_reduce_layer, keep only the token_keep patch tokens most similar
    # to CLS (+ one merged token carrying the dropped content in 'merge'
    # mode), shrinking every upper block's [S, D] work.  INEXACT — may only
    # become a headline path through bench.py's two promotion gates
    # (min-cosine + ranking equivalence).  0 = off.  Training never reduces
    # unless token_reduce_train is set: fine-tuning WITH the reduction lets
    # the model concentrate identity evidence in the kept tokens (the
    # ROADMAP standby's token-keep fine-tuning step).  The reduction is
    # differentiable — top-k gather backprops to kept tokens, the merged
    # summary token to all dropped ones — and deterministic (lax.top_k).
    token_keep: int = 0
    token_reduce_layer: int = 6
    token_reduce_mode: str = "merge"  # "merge" | "prune"
    token_reduce_train: bool = False

    def setup(self):
        num_patches = (self.image_size // self.patch_size) ** 2
        self.patch_embeds = {
            mod: PatchEmbed(
                embed_dim=self.embed_dim,
                patch_size=self.patch_size,
                in_chans=1 if mod in SINGLE_CHANNEL else 3,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"patch_embed_{mod}",
            )
            for mod in self.modalities
        }
        self.cls_token = self.param(
            "cls_token",
            nn.initializers.normal(0.02),
            (1, 1, self.embed_dim),
            self.param_dtype,
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (num_patches + 1, self.embed_dim),
            self.param_dtype,
        )
        n_exp = len(self.modalities)
        last = max(1, self.num_layers - 1)
        # static_argnums count self as 0: expert_ids (2) and deterministic
        # (3) are static — and the trunk must pass them POSITIONALLY
        # (jax.checkpoint's static_argnums does not cover kwargs)
        if self.remat_blocks:
            import jax

            policy = (
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                if self.remat_policy == "dots"
                else None  # "full": save block inputs only
            )
            block_cls = nn.remat(MERBlock, static_argnums=(2, 3), policy=policy)
        else:
            block_cls = MERBlock
        # Linearly scaled drop-path per depth (reference: clip_backbone.py:196-207).
        self.blocks = [
            block_cls(
                embed_dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                num_experts=n_exp,
                rank=self.lora_rank,
                alpha=self.lora_alpha,
                drop_path_rate=self.drop_path * (i / last),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                attn_impl=self.attn_impl,
                mlp_impl=self.mlp_impl,
                enable_mer=self.enable_mer,
                block_impl=self.block_impl,
                gelu_impl=self.gelu_impl,
                gelu_bwd=self.gelu_bwd,
                attn_bwd=self.attn_bwd,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]
        from prcv2025reid_tpu.models.mer import LNParams

        self.ln_final = LNParams(
            self.embed_dim, self.param_dtype, name="ln_final"
        )
        self.proj = nn.Dense(
            self.fusion_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )

    def trunk(
        self,
        patch_tokens: jnp.ndarray,  # [G, B, num_patches, D]
        expert_ids: Tuple[int, ...],  # static, one modality id per group
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Shared trunk: CLS + pos + blocks + LN -> [G, B, fusion_dim].

        The group dim carries the static modality routing (one modality per
        group — see models/mer.py for why this layout is the fast path).
        """
        from prcv2025reid_tpu.models.mer import ln_apply

        G, B = patch_tokens.shape[:2]
        dt = self.dtype or patch_tokens.dtype
        cls = jnp.broadcast_to(
            self.cls_token.astype(dt), (G, B, 1, self.embed_dim)
        )
        x = jnp.concatenate([cls, patch_tokens.astype(dt)], axis=2)
        x = x + self.pos_embed.astype(dt)[None, None]

        if deterministic and self._use_fused_resln():
            return self._trunk_fused(x, expert_ids)

        # Only the CLS row of the last block is ever consumed: compute
        # q/out-proj/MLP for that single token (exact math, ~7% of model
        # FLOPs — see MERBlock.cls_only_call).  Round 3 extends this to the
        # TRAINING forward (drop-path applies per-sample masks to the CLS
        # row's residual branches — math stays exact); under remat the last
        # block stays on the plain rematted __call__ (cls_only through the
        # lifted-transform wrapper is not remat-covered).
        reduce_after = (
            self.token_reduce_layer - 1
            if (deterministic or self.token_reduce_train)
            and 0 < self.token_keep < x.shape[2] - 1
            and 0 < self.token_reduce_layer < self.num_layers
            else None
        )
        if deterministic or not self.remat_blocks:
            for i, block in enumerate(self.blocks[:-1]):
                x = block(x, expert_ids, deterministic)
                if i == reduce_after:
                    x = self._reduce_tokens(x)
            cls = self.blocks[-1].cls_only_call(
                x, expert_ids, deterministic
            )
            cls = ln_apply(cls, *self.ln_final())
            return self.proj(cls)

        # training under remat: the reduction sits BETWEEN rematted block
        # calls, so it is stored (not recomputed) — negligible at [G,B,K,D]
        for i, block in enumerate(self.blocks):
            x = block(x, expert_ids, deterministic)
            if i == reduce_after:
                x = self._reduce_tokens(x)
        cls = ln_apply(x[:, :, 0], *self.ln_final())
        return self.proj(cls)

    def _reduce_tokens(self, x: jnp.ndarray) -> jnp.ndarray:
        """EViT-style token reduction: [G, B, S, D] -> [G, B, K+2, D]
        (CLS + top-K patch tokens by CLS-cosine + one merged token), or
        [G, B, K+1, D] in 'prune' mode (dropped tokens discarded).

        Scoring uses cosine(token, CLS) on the current hidden states — no
        attention-core internals needed, so every attention backend
        (xla/onesaug/splash) composes with it.  jax.lax.top_k gives a
        deterministic, static-shape keep set; the merged token carries the
        mean of the dropped tokens so global pooled content survives into
        the upper blocks (EViT's fused-token idea).
        """
        import jax

        G, B, S, D = x.shape
        K = int(self.token_keep)
        xf = x.astype(jnp.float32)
        n = xf / jnp.maximum(
            jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-6
        )
        scores = (n[:, :, 1:] * n[:, :, :1]).sum(-1)  # [G, B, S-1]
        _, idx = jax.lax.top_k(scores, K)  # [G, B, K] patch positions
        kept = jnp.take_along_axis(
            x[:, :, 1:], idx[..., None], axis=2
        )  # [G, B, K, D]
        if self.token_reduce_mode == "prune":
            return jnp.concatenate([x[:, :, :1], kept], axis=2)
        # merge: one token = mean of the dropped patch tokens (total minus
        # kept, in f32 so the subtraction does not cancel in bf16)
        total = xf[:, :, 1:].sum(axis=2)  # [G, B, D]
        kept_sum = jnp.take_along_axis(
            xf[:, :, 1:], idx[..., None], axis=2
        ).sum(axis=2)
        merged = (total - kept_sum) / jnp.maximum(S - 1 - K, 1)
        return jnp.concatenate(
            [x[:, :, :1], kept, merged[:, :, None].astype(x.dtype)], axis=2
        )

    def _use_fused_resln(self) -> bool:
        if self.resln_impl == "xla":
            return False
        if self.resln_impl in ("pallas", "pallas_interpret"):
            return True
        from prcv2025reid_tpu.ops.attention import _pallas_available

        return _pallas_available()

    def _trunk_fused(self, x: jnp.ndarray, expert_ids: Tuple[int, ...]) -> jnp.ndarray:
        """Eval-path trunk with residual+LN fused into one memory pass at
        every LN site (ops/fused_resln.py).  The fusion pairs cross block
        boundaries: block i's mlp residual fuses with block i+1's ln1 (or
        the final LN), so the stream carries (residual x, normalized h).
        """
        from prcv2025reid_tpu.models.mer import ln_apply
        from prcv2025reid_tpu.ops.fused_resln import fused_residual_ln

        interpret = self.resln_impl == "pallas_interpret"
        shape = x.shape
        D = shape[-1]

        def fused(x2, branch2, ln_params):
            scale, bias = ln_params
            xn, h = fused_residual_ln(
                x2.reshape(-1, D),
                branch2.reshape(-1, D),
                scale,
                bias,
                1e-5,
                512,
                interpret,
            )
            return xn.reshape(shape), h.reshape(shape)

        h = ln_apply(x, *self.blocks[0].ln1())
        for i, block in enumerate(self.blocks):
            attn_out = block.attn(h, expert_ids)
            x, h = fused(x, attn_out, block.ln2())
            mlp_out = block.mlp(h, expert_ids)
            next_ln = (
                self.blocks[i + 1].ln1()
                if i + 1 < len(self.blocks)
                else self.ln_final()
            )
            x, h = fused(x, mlp_out, next_ln)
        return self.proj(h[:, :, 0])

    def encode_single(
        self, images: jnp.ndarray, modality_id: int, deterministic: bool = True
    ) -> jnp.ndarray:
        """Encode one modality: images [B, H, W, 3] -> [B, fusion_dim].

        modality_id is a static Python int (slot in VISION_MODALITIES).
        """
        mod = self.modalities[modality_id]
        tokens = self.patch_embeds[mod](images)[None]  # [1, B, P, D]
        return self.trunk(tokens, (modality_id,), deterministic=deterministic)[0]

    def encode_stacked(
        self, images: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """Encode all modalities at once: [B, Mv, H, W, 3] -> [B, Mv, fusion_dim].

        One trunk call over the grouped [Mv, B] batch — the TPU replacement
        for the reference's 4 sequential per-modality forwards
        (models/model.py:355-399).
        """
        B, Mv = images.shape[:2]
        assert Mv == len(self.modalities)
        tokens = jnp.stack(
            [self.patch_embeds[mod](images[:, i]) for i, mod in enumerate(self.modalities)],
            axis=0,
        )  # [Mv, B, P, D]
        feats = self.trunk(tokens, tuple(range(Mv)), deterministic=deterministic)
        return feats.transpose(1, 0, 2)  # [B, Mv, fusion]

    def __call__(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.encode_stacked(images, deterministic=deterministic)
