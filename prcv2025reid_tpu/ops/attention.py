"""Multi-head attention core with pluggable backends.

The reference runs attention through torch SDPA/FlashAttention
(models/mer_lora.py:170-190).  The TPU-native equivalents:

- ``xla``: plain einsum attention with fp32 softmax — XLA fuses this well and
  it is the portable default (CPU tests, interpret mode).
- ``pallas``: fused single-block Pallas kernel for the 197-token vision
  sequence (see prcv2025reid_tpu/ops/pallas_attention.py); the sequence fits
  VMEM whole, so one block per (batch, head) is the speed-of-light shape.

All backends take q/k/v shaped [B, H, S, Dh] and return [B, H, S, Dh].
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,  # [B, 1|H, S, S] additive, -inf = drop
) -> jnp.ndarray:
    *_, S, Dh = q.shape
    scale = Dh**-0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    logits = logits.astype(jnp.float32)
    if causal:
        causal_mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        logits = jnp.where(causal_mask[None, None], logits, -1e9)
    if mask is not None:
        logits = logits + mask.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def xla_attention_bshd(
    q: jnp.ndarray,  # [B, S, H, Dh] — natural post-projection layout
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
) -> jnp.ndarray:
    """Attention without explicit head transposes: einsum contracts straight
    from the [B, S, H, Dh] reshape of the projection output, so XLA folds the
    layout change into the matmuls instead of materializing 4 transposed
    copies per layer (profiled win on v5e).  Returns [B, S, H, Dh]."""
    S, Dh = q.shape[1], q.shape[-1]
    scale = Dh**-0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    logits = logits.astype(jnp.float32)
    if causal:
        causal_mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        logits = jnp.where(causal_mask[None, None], logits, -1e9)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def xla_attention_bshd_onesaug(
    q: jnp.ndarray,  # [B, S, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Transpose-free attention with ZERO [S, S] reduction passes: scores
    stay bf16 in HBM, exp runs without max-subtraction (safe for
    |logits|*scale < 88 in f32 — ViT attention logits are O(10)), and the
    softmax denominator rides the PV matmul as an extra ones-column of V, so
    the only ops touching the [S, S] scores are the two matmuls and one
    fused exp.  Measured 14.3 vs 9.4 TFLOP/s for the f32-softmax einsum path
    at model shapes (tools/perf_microbench.py probe_attn3, v5e round 3).

    Numerics: bf16 score storage + unnormalized exp — NOT bit-identical to
    :func:`xla_attention_bshd` (min-cosine > 0.999; bench.py gates it on
    ranking equivalence before it can win).  Returns [B, S, H, Dh]."""
    Dh = q.shape[-1]
    scale = Dh**-0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    p = jnp.exp(s.astype(jnp.float32) * scale).astype(q.dtype)
    v_aug = jnp.concatenate(
        [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1
    )
    o = jnp.einsum("bhqk,bkhe->bqhe", p, v_aug)
    denom = jnp.maximum(o[..., Dh:], 1e-9 if o.dtype == jnp.float32 else 1e-8)
    return o[..., :Dh] / denom


BSHD_CORES = {
    "xla": xla_attention_bshd,
    "onesaug": xla_attention_bshd_onesaug,
}


def bshd_core(impl: str):
    """Resolve an attention-core name to its [B,S,H,Dh] function.  'splash'
    resolves lazily (Mosaic import)."""
    if impl == "splash":
        return splash_attention_bshd
    return BSHD_CORES[impl]


@functools.lru_cache(maxsize=None)
def _pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@functools.lru_cache(maxsize=8)
def _splash_kernel(num_heads: int, seq_len: int, padded: int):
    """Build (once per shape) the upstream splash-attention kernel with the
    197->256 pad handled by a key mask: q rows >= seq_len compute garbage
    that the caller discards; keys >= seq_len are masked for every query."""
    import numpy as np
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    maskarr = np.zeros((padded, padded), dtype=bool)
    maskarr[:, :seq_len] = True
    mk = sm.MultiHeadMask([sm.NumpyMask(maskarr) for _ in range(num_heads)])
    return sk.make_splash_mha_single_device(mk)


def splash_attention_bshd(
    q: jnp.ndarray,  # [B, S, H, Dh]
    k: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Flash-style attention via the upstream Mosaic splash kernel (the TPU
    counterpart of the reference's SDPA/flash call, mer_lora.py:170-190).
    Never materializes the [S, S] scores in HBM.  S is padded to a multiple
    of 128 under a key mask (exact math for the first S rows)."""
    B, S, H, Dh = q.shape
    padded = -(-S // 128) * 128
    kernel = _splash_kernel(H, S, padded)
    pad = ((0, 0), (0, padded - S), (0, 0), (0, 0))
    qt = jnp.pad(q * (Dh**-0.5), pad).transpose(0, 2, 1, 3)
    kt = jnp.pad(k, pad).transpose(0, 2, 1, 3)
    vt = jnp.pad(v, pad).transpose(0, 2, 1, 3)
    out = jax.vmap(kernel)(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)[:, :S].astype(q.dtype)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Dispatch to the best attention backend.

    impl: 'auto' | 'xla' | 'pallas'.  'auto' prefers the Pallas fused kernel
    on TPU for unmasked non-causal attention (the vision trunk hot path) and
    falls back to XLA otherwise.
    """
    if impl == "auto":
        impl = (
            "pallas"
            if (_pallas_available() and mask is None and not causal)
            else "xla"
        )
    if impl == "pallas":
        from prcv2025reid_tpu.ops.pallas_attention import pallas_mha

        return pallas_mha(q, k, v, causal=causal)
    return xla_attention(q, k, v, causal=causal, mask=mask)
