"""CLIP text tower — faithful JAX implementation of the HF CLIPTextModel the
reference reuses verbatim (models/clip_backbone.py:288-313).

Architecture (openai/clip-vit-base-patch16): vocab 49408, width 512, 12
layers, 8 heads, context 77, quick_gelu activation, causal attention, final
LN, pooled output = hidden state at the EOT token (the argmax token id, HF
CLIPTextModel pooler convention).  The reference projects the pooled output
through ``text_proj`` (512 -> fusion_dim, no bias) — that projection lives in
the unified encoder, not here.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from prcv2025reid_tpu.ops.attention import dot_product_attention


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class TextBlock(nn.Module):
    """Pre-LN causal transformer block matching HF CLIPEncoderLayer."""

    num_heads: int
    mlp_dim: int
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``pad_bias`` exists for callers that need padding-masked attention;
        TextTower deliberately passes None: under CAUSAL masking position i
        attends only to positions <= i, and the pooled output is read at the
        EOT token (= the last real token), so padded positions (all > EOT)
        can never influence it.  HF's CLIPTextModel relies on the same
        invariant when attention_mask is all-ones after right-padding — the
        oracle parity test (tests/test_reference_parity.py) pins it."""
        B, S, D = x.shape
        head_dim = D // self.num_heads
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        dense = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = nn.LayerNorm(name="ln1", **ln)(x)
        q = nn.Dense(D, name="q_proj", **dense)(h)
        k = nn.Dense(D, name="k_proj", **dense)(h)
        v = nn.Dense(D, name="v_proj", **dense)(h)

        def split(t):
            return t.reshape(B, S, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        attn = dot_product_attention(
            split(q), split(k), split(v), causal=True, mask=pad_bias, impl="xla"
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(B, S, D)
        x = x + nn.Dense(D, name="out_proj", **dense)(attn)

        h = nn.LayerNorm(name="ln2", **ln)(x)
        h = nn.Dense(self.mlp_dim, name="fc1", **dense)(h)
        h = quick_gelu(h)
        x = x + nn.Dense(D, name="fc2", **dense)(h)
        return x


class TextTower(nn.Module):
    vocab_size: int = 49408
    width: int = 512
    num_layers: int = 12
    num_heads: int = 8
    mlp_dim: int = 2048
    context_length: int = 77
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.token_embedding = nn.Embed(
            self.vocab_size,
            self.width,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="token_embedding",
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            self.param_dtype,
        )
        self.blocks = [
            TextBlock(
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"block_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.ln_final = nn.LayerNorm(
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="ln_final",
        )

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens [B, S] int32 (padded to context length) -> pooled [B, width].

        Pooling = hidden state at argmax(token id) — the EOT token carries the
        highest id in the CLIP vocab, matching HF pooler_output.
        """
        x = self.token_embedding(tokens)
        S = tokens.shape[1]
        x = x + self.pos_embed[:S].astype(x.dtype)[None]
        for block in self.blocks:
            x = block(x)
        x = self.ln_final(x)
        eot = jnp.argmax(tokens, axis=-1)
        return jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
