"""MER (Modality-Expert Router) layers — TPU-native LoRA routing.

Reference semantics: models/mer_lora.py.  Each linear is a shared trunk plus a
per-modality LoRA (rank 4, alpha 1, B zero-init so delta-W = 0 at step 0).

TPU-native redesign (not a translation): the reference holds a ModuleDict of
per-modality adapters and dispatches on a *string* per forward call
(models/mer_lora.py:80-99) — dynamic Python control flow.  Here routing is a
STATIC GROUPING: the batch layout always places one modality per group
(stacked slots [G, B, ...] — see vit.py), so each linear folds its LoRA into
per-group effective weights once per call:

    W_eff[g] = W + (alpha/r) * A[id_g] @ B[id_g]      # ~3 GFLOP total/step
    y[g]     = x[g] @ W_eff[g]                        # plain batched matmul

No masks, no side matmuls, no gathers in the hot path — every projection is a
clean dense matmul with 128-aligned shapes, and XLA fuses the tiny W_eff
construction into the weight load.  Routing differentiates through W_eff to
the shared trunk and the selected expert exactly like the reference's
``shared(x) + lora(x)`` (models/mer_lora.py:93-99).

Profiling history (v5e, xplane traces — keep for the next optimizer):
- per-row one-hot mask designs (einsum '...i,mir->...mr', and concat-784
  fused kernels) both produced pathological batch-minor layouts and/or
  ~3.5 ms/step of thin side matmuls;
- the grouped-W_eff form eliminates the entire LoRA hot-path cost.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from prcv2025reid_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype


class _SharedParams(nn.Module):
    """Holds the shared trunk kernel/bias under the 'shared/{kernel,bias}'
    tree path (converter + freeze-mask compatibility) without computing."""

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


def lora_a_init(key, shape, dtype=jnp.float32):
    """Per-expert kaiming_uniform(a=sqrt(5)) exactly as the reference
    (mer_lora.py:12-49: torch's default nn.init on the [rank, in] weight,
    bound 1/sqrt(in_dim)).  A stock variance_scaling on the STACKED
    (M, in, r) tensor would count the expert axis as receptive field and
    shrink every adapter's init by sqrt(M) — silently halving early LoRA
    gradient magnitudes vs the reference at M=4."""
    in_dim = shape[-2]
    bound = float(in_dim) ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _MERProjParams(nn.Module):
    """One MER projection's parameters (shared/kernel, shared/bias, lora_A,
    lora_B) declared without computing — callers build effective weights."""

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
            lora_a_init,
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


def effective_weights(
    kernel: jnp.ndarray,  # [in, out]
    lora_a: jnp.ndarray,  # [M, in, r]
    lora_b: jnp.ndarray,  # [M, r, out]
    expert_ids: Tuple[int, ...],
    scale: float,
    dtype,
) -> jnp.ndarray:
    """[G, in, out] effective kernels for the (static) group expert ids."""
    a = jnp.stack([lora_a[i] for i in expert_ids]).astype(dtype)  # [G, in, r]
    b = jnp.stack([lora_b[i] for i in expert_ids]).astype(dtype)  # [G, r, out]
    delta = jnp.einsum("gir,gro->gio", a, b) * scale
    return kernel.astype(dtype)[None] + delta


class MERDense(nn.Module):
    """Grouped MER linear: x [G, ..., in] + static expert ids -> [G, ..., out].

    Reference: models/mer_lora.py:52-106 (MERLinear).
    """

    features: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    # enable=False (config.enable_mer) bypasses the LoRA delta entirely —
    # shared-trunk-only compute; the adapter params stay declared so the tree
    # (and checkpoints) are interchangeable with the routed model.
    enable: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        expert_ids: Tuple[int, ...],
        fold: bool = True,
        weights_only: bool = False,
    ) -> jnp.ndarray:
        """``fold=True`` (eval/serving): LoRA folds into per-group effective
        kernels — fastest forward.  ``fold=False`` (training): the classic
        thin side path — the backward then produces thin dA/dB matmuls
        instead of a dense [G, in, out] dW_eff per linear (profiled at ~13%
        of the train step).

        ``weights_only=True`` declares the params and returns the folded
        ``(w_eff [G, in, out], bias)`` without computing — the fused block
        kernels (ops/fused_block.py) consume these directly."""
        if not weights_only:
            assert len(expert_ids) == x.shape[0], "one expert id per group"
        in_dim = x.shape[-1]
        kernel, bias = _SharedParams(
            self.features, self.use_bias, self.param_dtype, name="shared"
        )(in_dim)
        lora_a = self.param(
            "lora_A",
            lora_a_init,
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
        ids = tuple(expert_ids)
        if weights_only:
            if self.enable:
                w_eff = effective_weights(
                    kernel, lora_a, lora_b, ids, self.alpha / self.rank, dt
                )
            else:
                w_eff = jnp.broadcast_to(
                    kernel.astype(dt)[None], (len(ids),) + kernel.shape
                )
            return w_eff, (bias.astype(dt) if bias is not None else None)
        xa = x.astype(dt)
        if not self.enable:
            y = xa @ kernel.astype(dt)
        elif fold:
            w_eff = effective_weights(
                kernel, lora_a, lora_b, ids, self.alpha / self.rank, dt
            )
            y = jnp.einsum("g...i,gio->g...o", xa, w_eff)
        else:
            a_sel = jnp.stack([lora_a[i] for i in ids]).astype(dt)
            b_sel = jnp.stack([lora_b[i] for i in ids]).astype(dt)
            y = xa @ kernel.astype(dt)
            z = jnp.einsum("g...i,gir->g...r", xa, a_sel)
            y = y + jnp.einsum("g...r,gro->g...o", z, b_sel) * (self.alpha / self.rank)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class MERAttention(nn.Module):
    """MHA with MER-routed Q/K/V/out projections (reference: models/mer_lora.py:109-231).

    Q/K/V effective kernels concatenate into one [G, D, 3D] so the projection
    is a single grouped matmul (3D = 2304 = 18*128, clean tiling).  The
    attention core is pluggable (Pallas fused kernel on TPU / XLA einsum
    elsewhere) — the TPU counterpart of the reference's SDPA/flash call.
    """

    num_heads: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    # training backward scheduling (configs.attn_bwd): "stored" keeps the
    # [N, H, S, S] softmax probs as autodiff residuals; "remat" wraps the
    # core in jax.checkpoint so the backward recomputes QK + softmax from
    # q/k/v and no [S,S]-sized residual is stored (exact math)
    attn_bwd: str = "stored"
    enable: bool = True  # False = shared-trunk-only (config.enable_mer)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        expert_ids: Tuple[int, ...],
        fold: bool = True,
        weights_only: bool = False,
    ) -> jnp.ndarray:
        G, B, S, D = x.shape
        assert D % self.num_heads == 0
        head_dim = D // self.num_heads
        dt = self.dtype or x.dtype
        scale = self.alpha / self.rank
        ids = tuple(expert_ids)

        proj_params = [
            _MERProjParams(D, self.num_experts, self.rank, self.param_dtype, name=n)(D)
            for n in ("q_proj", "k_proj", "v_proj")
        ]
        b_qkv = jnp.concatenate([p[1].astype(dt) for p in proj_params], axis=0)
        if weights_only:
            # folded weights for the fused block kernels (ops/fused_block.py)
            if self.enable:
                w_qkv = jnp.concatenate(
                    [effective_weights(k_, la, lb, ids, scale, dt)
                     for k_, _, la, lb in proj_params],
                    axis=2,
                )  # [G, D, 3D]
            else:
                w_pack = jnp.concatenate(
                    [k_.astype(dt) for k_, _, _, _ in proj_params], axis=1
                )
                w_qkv = jnp.broadcast_to(w_pack[None], (len(ids),) + w_pack.shape)
            w_out, b_out = MERDense(
                D,
                num_experts=self.num_experts,
                rank=self.rank,
                alpha=self.alpha,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                enable=self.enable,
                name="out_proj",
            )(x, ids, weights_only=True)
            return w_qkv, b_qkv, w_out, b_out
        xa = x.astype(dt)
        if not self.enable:
            w_pack = jnp.concatenate(
                [k_.astype(dt) for k_, _, _, _ in proj_params], axis=1
            )  # [D, 3D]
            qkv = xa @ w_pack + b_qkv
        elif fold:
            w_qkv = jnp.concatenate(
                [effective_weights(k_, la, lb, ids, scale, dt)
                 for k_, _, la, lb in proj_params],
                axis=2,
            )  # [G, D, 3D]
            qkv = jnp.einsum("gbsi,gio->gbso", xa, w_qkv) + b_qkv
        else:
            # training: thin LoRA side paths keep the backward cheap
            w_pack = jnp.concatenate(
                [k_.astype(dt) for k_, _, _, _ in proj_params], axis=1
            )  # [D, 3D]
            a_pack = jnp.concatenate(
                [jnp.stack([la[i] for i in ids]) for _, _, la, _ in proj_params],
                axis=2,
            ).astype(dt)  # [G, D, 3r]
            qkv = xa @ w_pack + b_qkv
            z = jnp.einsum("gbsi,gir->gbsr", xa, a_pack)  # [G, B, S, 3r]
            r = self.rank
            deltas = []
            for j, (_, _, _, lb) in enumerate(proj_params):
                b_sel = jnp.stack([lb[i] for i in ids]).astype(dt)
                deltas.append(
                    jnp.einsum("gbsr,gro->gbso", z[..., j * r : (j + 1) * r], b_sel)
                )
            qkv = qkv + jnp.concatenate(deltas, axis=-1) * scale
        if fold:
            # EVAL: free-reshape unstack instead of jnp.split — the last-axis
            # split materializes three strided copies (~0.8 ms/layer in the
            # round-3 trace); [.., 3, H, Dh] views fuse into the consumer
            # matmuls (probe_attn4: 52 -> 65 TFLOP/s; end-to-end 3,181 ->
            # 3,618 embeds/s).  TRAINING keeps jnp.split: the strided views'
            # scatter-style gradient measured 6.07 vs 6.65 it/s.
            qkv5 = qkv.reshape(G, B, S, 3, self.num_heads, head_dim)
            q, k, v = (
                qkv5[..., 0, :, :], qkv5[..., 1, :, :], qkv5[..., 2, :, :]
            )
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)

        impl = self.attn_impl
        if impl == "auto":
            from prcv2025reid_tpu.ops.attention import _pallas_available

            impl = "pallas" if _pallas_available() else "xla"

        if impl in ("xla", "splash", "onesaug"):
            # transpose-free path: stay in [N, S, H, Dh] and let einsum fold
            # the head split into the matmuls (see xla_attention_bshd);
            # 'splash' swaps in the Mosaic flash kernel (no [S,S] scores in
            # HBM), 'onesaug' the zero-reduction-pass XLA core — same
            # layout contract (ops/attention.py).  TRAINING (fold=False)
            # always uses the reference-exact f32-softmax core: the
            # serving formulations are gated on eval-time ranking
            # equivalence, never on training dynamics (onesaug's no-max exp
            # could overflow under training logit growth).
            from prcv2025reid_tpu.ops.attention import bshd_core

            core = bshd_core(impl if fold else "xla")
            if not fold and self.attn_bwd == "remat":
                # recompute QK + softmax in the backward instead of storing
                # the [G*B, H, S, S] probabilities — the residual that makes
                # attention dominate training HBM (docs/performance.md)
                core = jax.checkpoint(core)

            def merge2(t):  # [G,B,S,H,Dh] (fold) or [G,B,S,D] -> [G*B,S,H,Dh]
                return t.reshape(G * B, S, self.num_heads, head_dim)

            out = core(merge2(q), merge2(k), merge2(v))
            out = out.reshape(G, B, S, D)
        else:
            def split_heads(t):
                return t.reshape(G * B, S, self.num_heads, head_dim).transpose(
                    0, 2, 1, 3
                )

            out = dot_product_attention(
                split_heads(q), split_heads(k), split_heads(v), impl=impl
            )
            out = out.transpose(0, 2, 1, 3).reshape(G, B, S, D)
        return MERDense(
            D,
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            enable=self.enable,
            name="out_proj",
        )(out, ids, fold=fold)


class MERMlp(nn.Module):
    """fc1 -> GELU -> fc2, both MER-routed (reference: models/mer_lora.py:246-280).

    The reference uses torch's exact (erf) GELU, not CLIP's quick_gelu —
    reproduced here deliberately.

    ``impl='pallas'`` routes through the fused VMEM-resident kernel
    (ops/fused_mlp.py) with LoRA pre-folded into per-group weights;
    ``'xla'`` keeps two MERDense matmuls; ``'auto'`` picks pallas on TPU.
    """

    mlp_dim: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    impl: str = "xla"
    enable: bool = True  # False = shared-trunk-only (config.enable_mer)
    # GELU formulation on the FOLDED (eval/serving) forward only; training
    # (fold=False) always uses reference-exact erf (see apply_gelu)
    gelu_impl: str = "erf"
    # training-path backward scheduling for the exact erf: "remat" | "stored"
    # (configs.gelu_bwd; gelu_stored reuses the forward's erf residual)
    gelu_bwd: str = "remat"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        expert_ids: Tuple[int, ...],
        fold: bool = True,
        weights_only: bool = False,
    ) -> jnp.ndarray:
        D = x.shape[-1]

        def folded_weights(dt, ids):
            """Declare fc1/fc2 (same tree paths as the MERDense branch) and
            fold the LoRA into per-group effective kernels — shared by the
            weights_only (fused block kernels) and pallas (fused MLP) paths
            so the folding logic cannot drift between them."""
            scale = self.alpha / self.rank
            k1, b1, a1, lb1 = _MERProjParams(
                self.mlp_dim, self.num_experts, self.rank, self.param_dtype,
                name="fc1",
            )(D)
            k2, b2, a2, lb2 = _MERProjParams(
                D, self.num_experts, self.rank, self.param_dtype, name="fc2"
            )(self.mlp_dim)
            if self.enable:
                w1 = effective_weights(k1, a1, lb1, ids, scale, dt)  # [G, D, F]
                w2 = effective_weights(k2, a2, lb2, ids, scale, dt)  # [G, F, D]
            else:
                w1 = jnp.broadcast_to(k1.astype(dt)[None], (len(ids),) + k1.shape)
                w2 = jnp.broadcast_to(k2.astype(dt)[None], (len(ids),) + k2.shape)
            return w1, b1.astype(dt), w2, b2.astype(dt)

        if weights_only:
            return folded_weights(self.dtype or x.dtype, tuple(expert_ids))
        impl = self.impl
        if impl == "auto":
            from prcv2025reid_tpu.ops.attention import _pallas_available

            impl = "pallas" if _pallas_available() else "xla"
        if not fold or not self.enable:
            impl = "xla"  # fused kernel requires folded, routed weights

        if impl in ("pallas", "pallas_interpret"):
            dt = self.dtype or x.dtype
            w1, b1, w2, b2 = folded_weights(dt, tuple(expert_ids))
            G, B, S, _ = x.shape
            from prcv2025reid_tpu.ops.fused_mlp import fused_mlp

            b1g = jnp.broadcast_to(b1.astype(dt)[None], (G, self.mlp_dim))
            b2g = jnp.broadcast_to(b2.astype(dt)[None], (G, D))
            out = fused_mlp(
                x.astype(dt).reshape(G, B * S, D),
                w1,
                b1g,
                w2,
                b2g,
                256,
                impl == "pallas_interpret",
            )
            return out.reshape(G, B, S, D)

        mer = dict(
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            enable=self.enable,
        )
        h = MERDense(self.mlp_dim, name="fc1", **mer)(x, expert_ids, fold=fold)
        if fold:
            h = apply_gelu(h, self.gelu_impl)
        elif self.gelu_bwd == "stored":
            from prcv2025reid_tpu.ops.kernel_math import gelu_stored

            h = gelu_stored(h)
        else:
            h = apply_gelu(h, "erf")
        return MERDense(D, name="fc2", **mer)(h, expert_ids, fold=fold)


def drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Stochastic depth on the residual branch (reference: models/clip_backbone.py:126-142).

    Per-sample over the [G, B] leading dims.
    """
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = x.shape[:2] + (1,) * (x.ndim - 2)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep


class LNParams(nn.Module):
    """LayerNorm scale/bias params under the nn.LayerNorm tree paths
    ('<name>/scale', '<name>/bias') so callers can apply LN manually or fuse
    it into a kernel."""

    features: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype
        )
        return scale, bias


def ln_apply(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5):
    """Plain layer norm over the last axis, f32 statistics."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def apply_gelu(h: jnp.ndarray, impl: str = "erf") -> jnp.ndarray:
    """GELU by formulation name (configs.TrainingConfig.gelu_impl): "erf" is
    reference-exact; "tanh"/"poly" are bf16-accuracy serving formulations
    that keep the erf out of XLA's fc2-matmul prologue fusion (measured
    83.6 -> 111.4 / 104.3 TFLOP/s on the fc1+gelu+fc2 chain — probe_fc2c,
    docs/performance.md)."""
    if impl == "tanh":
        return jax.nn.gelu(h, approximate=True)
    if impl == "poly":
        from prcv2025reid_tpu.ops.kernel_math import gelu_poly_bf16

        return gelu_poly_bf16(h)
    return jax.nn.gelu(h, approximate=False)


def folded_block_tail(
    attn, x_res, w_out, b_out, ln2_s, ln2_b, w1, b1, w2, b2, gelu_impl="erf",
    dp1=None, dp2=None,
):
    """The folded post-attention half of a pre-LN block, XLA form:
    out-proj + residual + LN2 + MLP + residual.  Grouped leading dim with
    any token layout ([G, B, D] or [G, T, D]); one authority for this math
    (used by MERBlock.cls_only_call and the fused_qkv path).  ``dp1``/``dp2``
    are optional per-sample drop-path keep-masks (already scaled by 1/keep)
    for the attention / MLP residual branches — the training cls-only path
    applies them to the CLS row exactly as the full forward would."""
    proj = jnp.einsum("g...i,gio->g...o", attn, w_out) + b_out
    if dp1 is not None:
        proj = proj * dp1
    x2 = x_res.astype(proj.dtype) + proj
    y = ln_apply(x2, ln2_s, ln2_b)
    h = jnp.einsum("g...i,gif->g...f", y, w1) + b1
    h = apply_gelu(h, gelu_impl)
    mlp_out = jnp.einsum("g...f,gfd->g...d", h, w2) + b2
    if dp2 is not None:
        mlp_out = mlp_out * dp2
    return x2 + mlp_out


class MERBlock(nn.Module):
    """Pre-LN transformer block with MER routing + DropPath.

    Reference: models/clip_backbone.py:15-123 (MERTransformerBlock).
    Operates on grouped activations [G, B, S, D] with static per-group ids.
    Setup-style so the trunk can orchestrate the fused residual+LN stream
    across block boundaries (models/vit.py).
    """

    embed_dim: int
    num_heads: int
    mlp_dim: int
    num_experts: int
    rank: int = 4
    alpha: float = 1.0
    drop_path_rate: float = 0.0
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32
    attn_impl: str = "xla"
    attn_bwd: str = "stored"  # see MERAttention.attn_bwd
    mlp_impl: str = "xla"
    enable_mer: bool = True  # config.enable_mer (reference: configs/config.py:27)
    # "xla" | "fused" | "fused_int8" (+ "_interpret" test variants): the fused
    # settings route the folded eval forward through the two Pallas block
    # kernels (ops/fused_block.py) with XLA attention in between.  int8
    # additionally quantizes every projection (weights per column, activations
    # per row inside the kernels) for the v5e int8 MXU — serving only.
    block_impl: str = "xla"
    # folded-forward GELU formulation (configs.gelu_impl); the Pallas block
    # kernels keep their own in-kernel exact erf regardless
    gelu_impl: str = "erf"
    gelu_bwd: str = "remat"  # training erf backward scheduling (configs.gelu_bwd)

    def setup(self):
        self.ln1 = LNParams(self.embed_dim, self.param_dtype, name="ln1")
        self.ln2 = LNParams(self.embed_dim, self.param_dtype, name="ln2")
        self.attn = MERAttention(
            num_heads=self.num_heads,
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            attn_impl=self.attn_impl,
            attn_bwd=self.attn_bwd,
            enable=self.enable_mer,
            name="attn",
        )
        self.mlp = MERMlp(
            mlp_dim=self.mlp_dim,
            num_experts=self.num_experts,
            rank=self.rank,
            alpha=self.alpha,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            impl=self.mlp_impl,
            enable=self.enable_mer,
            gelu_impl=self.gelu_impl,
            gelu_bwd=self.gelu_bwd,
            name="mlp",
        )

    def __call__(
        self,
        x: jnp.ndarray,
        expert_ids: Tuple[int, ...],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        # eval folds LoRA into the kernels (fast forward); training keeps the
        # thin side path (cheap backward) — see MERDense.
        fold = deterministic
        if fold and self.block_impl != "xla":
            return self._fused_call(x, expert_ids)
        attn_out = self.attn(ln_apply(x, *self.ln1()), expert_ids, fold=fold)
        rng1 = (
            self.make_rng("droppath")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = x + drop_path(attn_out, self.drop_path_rate, deterministic, rng1)

        mlp_out = self.mlp(ln_apply(x, *self.ln2()), expert_ids, fold=fold)
        rng2 = (
            self.make_rng("droppath")
            if (not deterministic and self.drop_path_rate > 0)
            else None
        )
        x = x + drop_path(mlp_out, self.drop_path_rate, deterministic, rng2)
        return x

    def cls_only_call(
        self,
        x: jnp.ndarray,
        expert_ids: Tuple[int, ...],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Exact CLS-row output of the forward: [G,B,S,D] -> [G,B,D].

        The trunk only ever consumes ``x[:, :, 0]`` after the last block
        (models/vit.py), so the last block's q-projection, out-projection and
        MLP are computed for the CLS token alone — k/v still span all tokens.
        Math is identical to ``__call__``'s CLS row (~7% of model FLOPs
        saved; measured in docs/performance.md).  With
        ``deterministic=False`` (training forward, round-3) the per-sample
        drop-path masks are applied to the CLS-row residual branches — the
        k/v inputs come from the block INPUT, so the masked-branch math on
        the CLS row is exactly the full forward's CLS row.  Training always
        uses the reference-exact 'xla' core (see MERAttention)."""
        from prcv2025reid_tpu.ops.attention import bshd_core

        core = bshd_core(
            self.attn_impl
            if (deterministic and self.attn_impl in ("xla", "onesaug"))
            else "xla"
        )
        ids = tuple(expert_ids)
        G, B, S, D = x.shape
        H = self.num_heads
        Dh = D // H
        w_qkv, b_qkv, w_out, b_out = self.attn(x, ids, weights_only=True)
        w1, b1, w2, b2 = self.mlp(x, ids, weights_only=True)
        h = ln_apply(x, *self.ln1())
        # k/v for all tokens; q for the CLS row only
        kv = jnp.einsum("gbsi,gio->gbso", h, w_qkv[:, :, D:]) + b_qkv[D:]
        q = jnp.einsum("gbi,gio->gbo", h[:, :, 0], w_qkv[:, :, :D]) + b_qkv[:D]
        k, v = jnp.split(kv, 2, axis=-1)
        attn = core(
            q.reshape(G * B, 1, H, Dh),
            k.reshape(G * B, S, H, Dh),
            v.reshape(G * B, S, H, Dh),
        ).reshape(G, B, D)
        dp1 = dp2 = None
        if not deterministic and self.drop_path_rate > 0:
            keep = 1.0 - self.drop_path_rate
            dp1 = jax.random.bernoulli(
                self.make_rng("droppath"), keep, (G, B, 1)
            ).astype(x.dtype) / keep
            dp2 = jax.random.bernoulli(
                self.make_rng("droppath"), keep, (G, B, 1)
            ).astype(x.dtype) / keep
        # training keeps exact erf (apply_gelu contract); eval may use the
        # configured serving formulation
        gelu = self.gelu_impl if deterministic else "erf"
        return folded_block_tail(
            attn, x[:, :, 0], w_out, b_out, *self.ln2(), w1, b1, w2, b2,
            gelu_impl=gelu, dp1=dp1, dp2=dp2,
        )

    def _fused_call(
        self, x: jnp.ndarray, expert_ids: Tuple[int, ...]
    ) -> jnp.ndarray:
        """Folded eval forward through the two fused block kernels:
        LN1+QKV (one VMEM pass) -> XLA attention -> out-proj+residual+LN2+
        MLP+residual (one VMEM pass).  See ops/fused_block.py."""
        from prcv2025reid_tpu.ops.fused_block import (
            fused_ln_qkv,
            fused_out_mlp,
            quantize_weight,
        )
        from prcv2025reid_tpu.ops.attention import bshd_core

        interpret = self.block_impl.endswith("_interpret")
        impl = self.block_impl.removesuffix("_interpret")
        # 'fused_int8' quantizes every projection; 'fused_int8_mlp' is the
        # mixed plan — QKV/out-proj bf16, fc1/fc2 int8 (the ranking-gate
        # iteration, VERDICT r3 #3)
        quant = {"fused_int8": "int8", "fused_int8_mlp": "int8_mlp"}.get(
            impl, "bf16"
        )
        ids = tuple(expert_ids)
        G, B, S, D = x.shape
        head_dim = D // self.num_heads

        w_qkv, b_qkv, w_out, b_out = self.attn(x, ids, weights_only=True)
        w1, b1, w2, b2 = self.mlp(x, ids, weights_only=True)
        ln1_s, ln1_b = self.ln1()
        ln2_s, ln2_b = self.ln2()
        b_qkv_g = jnp.broadcast_to(b_qkv[None], (G,) + b_qkv.shape)
        b_out_g = jnp.broadcast_to(b_out[None], (G,) + b_out.shape)
        b1_g = jnp.broadcast_to(b1[None], (G,) + b1.shape)
        b2_g = jnp.broadcast_to(b2[None], (G,) + b2.shape)
        w_qkv_k = w_qkv
        if quant == "int8":
            w_qkv_k = quantize_weight(w_qkv)
            w_out = quantize_weight(w_out)
            w1 = quantize_weight(w1)
            w2 = quantize_weight(w2)
        elif quant == "int8_mlp":
            w1 = quantize_weight(w1)
            w2 = quantize_weight(w2)

        xf = x.reshape(G, B * S, D)
        qkv = fused_ln_qkv(
            xf, ln1_s, ln1_b, w_qkv_k, b_qkv_g,
            "bf16" if quant == "int8_mlp" else quant, 256, interpret,
        )  # [G, B*S, 3D]
        qkv5 = qkv.reshape(G * B, S, 3, self.num_heads, head_dim)
        q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]

        core = bshd_core(
            self.attn_impl if self.attn_impl in ("xla", "onesaug") else "xla"
        )
        attn = core(q, k, v)
        attn = attn.reshape(G, B * S, D)
        if impl == "fused_qkv":
            # kernel A only: out-proj / residual / LN2 / MLP stay on XLA
            out = folded_block_tail(
                attn, xf, w_out, b_out, ln2_s, ln2_b, w1, b1, w2, b2,
                gelu_impl=self.gelu_impl,
            )
            return out.reshape(G, B, S, D)
        y = fused_out_mlp(
            attn, xf, w_out, b_out_g, ln2_s, ln2_b, w1, b1_g, w2, b2_g,
            quant, 256, interpret,
        )
        return y.reshape(G, B, S, D)
