"""MER (Modality-Expert Router) layers — TPU-native LoRA routing.

Reference semantics: models/mer_lora.py.  Each linear is a shared trunk plus a
per-modality LoRA (rank 4, alpha 1, B zero-init so delta-W = 0 at step 0).

TPU-native redesign (not a translation): the reference holds a ModuleDict of
per-modality adapters and dispatches on a *string* per forward call
(models/mer_lora.py:80-99) — dynamic Python control flow.  Here all experts
are stacked into dense tensors ``lora_A [M, in, r]`` / ``lora_B [M, r, out]``
and the active expert is selected with a one-hot *mask* on the thin rank
dimension:

    z     = einsum(x, lora_A)          # [..., M, r]   — one matmul, width M*r
    delta = einsum(z * onehot, lora_B) # [..., out]

Two thin matmuls (M*r = 16 columns), static shapes, no gather/scatter; the
whole mixed-modality batch goes through the trunk in ONE call with per-sample
routing.  XLA fuses the masking into the matmuls.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from prcv2025reid_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


class _SharedParams(nn.Module):
    """Holds the shared trunk kernel/bias under the 'shared/{kernel,bias}'
    tree path (converter + freeze-mask compatibility) without computing —
    MERDense fuses the matmul itself."""

    features: int
    use_bias: bool = True
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_dim, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        return kernel, bias


class MERDense(nn.Module):
    """Shared Dense + stacked per-modality LoRA (reference: models/mer_lora.py:52-106).

    MXU-friendly layout: the stacked lora_A [M, in, r] is reshaped to
    [in, M*r] so all experts' down-projections ride ONE thin matmul; expert
    selection is a mask over the M*r=16 rank columns (a one-hot repeated r
    times); the up-projection is one [., M*r] @ [M*r, out] matmul that XLA
    fuses into the residual add.  The shared trunk matmul stays a clean
    [., in] @ [in, out] with 128-aligned output columns.

    Profiling note (v5e, xplane trace): concatenating A onto the shared
    kernel (one 768->784 matmul) looks tighter but forces a batch-minor
    output layout for the downstream split — every trunk projection dropped
    to ~20 TFLOP/s.  Keeping the shared matmul 768-wide restores ~170 TFLOP/s;
    the separate 16-column LoRA matmuls are noise.  Likewise the naive
    einsum '...i,mir->...mr' form materializes [B, S, M, r] with pathological
    layouts.  Don't "re-fuse" this without re-profiling.
    """

    features: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, expert_onehot: jnp.ndarray) -> jnp.ndarray:
        """x: [B, ..., in_dim]; expert_onehot: [B, num_experts] (rows may be
        any convex weights, typically one-hot)."""
        in_dim = x.shape[-1]
        kernel, bias = _SharedParams(
            self.features, self.use_bias, self.param_dtype, name="shared"
        )(in_dim)
        # A: kaiming-uniform like the reference (models/mer_lora.py:37);
        # B: zeros so the adapter is a no-op at init (models/mer_lora.py:38).
        lora_a = self.param(
            "lora_A",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.num_experts, in_dim, self.rank),
            self.param_dtype,
        )
        lora_b = self.param(
            "lora_B",
            nn.initializers.zeros,
            (self.num_experts, self.rank, self.features),
            self.param_dtype,
        )
        dt = self.dtype or x.dtype
        xa = x.astype(dt)
        mr = self.num_experts * self.rank

        y = xa @ kernel.astype(dt)  # clean, 128-aligned trunk matmul

        a2 = lora_a.transpose(1, 0, 2).reshape(in_dim, mr).astype(dt)
        z = xa @ a2  # [..., M*r] — 16 columns, negligible

        # expert mask expanded over the rank columns, expert axis pinned
        mask = jnp.repeat(expert_onehot, self.rank, axis=-1)  # [B, M*r]
        mask = mask.reshape(mask.shape[:1] + (1,) * (x.ndim - 2) + (mr,))
        z = z * mask.astype(dt)

        b2 = lora_b.reshape(mr, self.features).astype(dt)
        y = y + (z @ b2) * (self.alpha / self.rank)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class _MERProjParams(nn.Module):
    """Declares one MER projection's parameters (shared/kernel, shared/bias,
    lora_A, lora_B) WITHOUT computing — used by MERAttention to pack Q/K/V
    into one matmul while keeping the exact MERDense param-tree paths the
    converter and freeze masks rely on."""

    features: int
    num_experts: int
    rank: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, in_dim: int):
        kernel, bias = _SharedParams(
            self.features, True, self.param_dtype, name="shared"
        )(in_dim)
        lora_a = self.param(
            "lora_A",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.num_experts, in_dim, self.rank),
            self.param_dtype,
        )
        lora_b = self.param(
            "lora_B",
            nn.initializers.zeros,
            (self.num_experts, self.rank, self.features),
            self.param_dtype,
        )
        return kernel, bias, lora_a, lora_b


class MERAttention(nn.Module):
    """MHA with MER-routed Q/K/V/out projections (reference: models/mer_lora.py:109-231).

    TPU layout: the three Q/K/V projections pack into ONE [., D] @ [D, 3D]
    matmul (3D = 2304 = 18*128, clean tiling; slice points are 128-aligned so
    XLA keeps feature-minor layouts) plus one packed [., D] @ [D, 3*M*r] LoRA
    down-projection.  The attention core is pluggable (Pallas fused kernel on
    TPU / XLA einsum elsewhere) — the TPU counterpart of the reference's
    SDPA/flash call.
    """

    num_heads: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, expert_onehot: jnp.ndarray) -> jnp.ndarray:
        B, S, D = x.shape
        assert D % self.num_heads == 0
        head_dim = D // self.num_heads
        mr = self.num_experts * self.rank
        dt = self.dtype or x.dtype

        projs = []
        for name in ("q_proj", "k_proj", "v_proj"):
            projs.append(
                _MERProjParams(
                    D, self.num_experts, self.rank, self.param_dtype, name=name
                )(D)
            )

        w_pack = jnp.concatenate([p[0] for p in projs], axis=1).astype(dt)  # [D, 3D]
        b_pack = jnp.concatenate([p[1] for p in projs], axis=0).astype(dt)  # [3D]
        a_pack = jnp.concatenate(
            [p[2].transpose(1, 0, 2).reshape(D, mr) for p in projs], axis=1
        ).astype(dt)  # [D, 3*M*r]

        xa = x.astype(dt)
        qkv = xa @ w_pack + b_pack  # one clean matmul
        z = xa @ a_pack  # [B, S, 3*M*r]

        mask = jnp.repeat(expert_onehot, self.rank, axis=-1)  # [B, M*r]
        mask3 = jnp.tile(mask, (1, 3)).reshape(B, 1, 3 * mr).astype(dt)
        z = z * mask3

        scale = self.alpha / self.rank
        outs = []
        for i, p in enumerate(projs):
            b2 = p[3].reshape(mr, D).astype(dt)
            delta = z[..., i * mr : (i + 1) * mr] @ b2
            outs.append(qkv[..., i * D : (i + 1) * D] + delta * scale)
        q, k, v = outs

        def split(t):
            return t.reshape(B, S, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        out = dot_product_attention(
            split(q), split(k), split(v), impl=self.attn_impl
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        mer = dict(
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        return MERDense(D, name="out_proj", **mer)(out, expert_onehot)


class MERMlp(nn.Module):
    """fc1 -> GELU -> fc2, both MER-routed (reference: models/mer_lora.py:246-280).

    The reference uses torch's exact (erf) GELU, not CLIP's quick_gelu —
    reproduced here deliberately.
    """

    mlp_dim: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, expert_onehot: jnp.ndarray) -> jnp.ndarray:
        D = x.shape[-1]
        mer = dict(
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        h = MERDense(self.mlp_dim, name="fc1", **mer)(x, expert_onehot)
        h = jax.nn.gelu(h, approximate=False)
        return MERDense(D, name="fc2", **mer)(h, expert_onehot)


def drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Stochastic depth on the residual branch (reference: models/clip_backbone.py:126-142)."""
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class MERBlock(nn.Module):
    """Pre-LN transformer block with MER routing + DropPath.

    Reference: models/clip_backbone.py:15-123 (MERTransformerBlock).
    """

    num_heads: int
    mlp_dim: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        expert_onehot: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=self.param_dtype)
        attn_out = MERAttention(
            num_heads=self.num_heads,
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            name="attn",
        )(nn.LayerNorm(name="ln1", **ln)(x), expert_onehot)
        rng1 = (
            self.make_rng("droppath")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = x + drop_path(attn_out, self.drop_path_rate, deterministic, rng1)

        mlp_out = MERMlp(
            mlp_dim=self.mlp_dim,
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="mlp",
        )(nn.LayerNorm(name="ln2", **ln)(x), expert_onehot)
        rng2 = (
            self.make_rng("droppath")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = x + drop_path(mlp_out, self.drop_path_rate, deterministic, rng2)
        return x
