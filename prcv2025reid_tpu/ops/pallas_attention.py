"""Pallas fused attention for the ViT trunk.

The vision sequence is tiny and static (1 CLS + 196 patches = 197 tokens,
head_dim 64 — reference: models/clip_backbone.py:269-273), so the whole
(S, S) score matrix for one (batch, head) pair fits VMEM many times over.
The speed-of-light shape is therefore a SINGLE-BLOCK kernel per (batch, head):
one MXU pass for Q.K^T, an in-register fp32 softmax, one MXU pass for P.V —
the S x S logits never touch HBM.  The XLA fallback materializes the fp32
[B, H, S, S] logits in HBM (measured: it holds the ViT-B/16 embed path to
~18% MXU utilization on v5e), which is what this kernel removes.  TPU
counterpart of the reference's FlashAttention-via-SDPA call
(models/mer_lora.py:170-190).

Sequences are padded to a multiple of 128 (197 -> 256) before the kernel and
padded KEY columns are masked with -1e9 inside it; unaligned shapes trigger
pathological Mosaic compiles and mis-tile the MXU.  Padded QUERY rows compute
garbage that is sliced away on return.

Gradients: ``pallas_mha`` carries a custom VJP whose backward recomputes the
softmax in plain XLA (flash-style recompute; S=197 keeps this cheap), so the
kernel is usable inside the training step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; keep CPU imports working.
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_ALIGN = 128


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, s_actual: int):
    # inputs stay in their native (bf16) dtype — f32 MXU passes are ~6x
    # slower on v5e; accumulation is f32 via preferred_element_type.
    q = q_ref[0]  # [Sp, Dh]
    k = k_ref[0]
    v = v_ref[0]

    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [Sp, Sp] f32

    Sp = logits.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 1)
    mask = col < s_actual
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 0)
        mask = mask & (row >= col)
    logits = jnp.where(mask, logits, -1e9)

    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=1, keepdims=True)

    out = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_mha_fwd_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool, interpret: bool
) -> jnp.ndarray:
    B, H, S, Dh = q.shape
    scale = Dh**-0.5
    Sp = -(-S // _ALIGN) * _ALIGN

    def prep(t):
        t = t.reshape(B * H, S, Dh)
        return jnp.pad(t, ((0, 0), (0, Sp - S), (0, 0))) if Sp != S else t

    qf, kf, vf = prep(q), prep(k), prep(v)

    kernel = functools.partial(_attn_kernel, scale=scale, causal=causal, s_actual=S)
    if _HAS_PLTPU and not interpret:
        block = pl.BlockSpec((1, Sp, Dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    else:
        block = pl.BlockSpec((1, Sp, Dh), lambda i: (i, 0, 0))

    out = pl.pallas_call(
        kernel,
        grid=(B * H,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B * H, Sp, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * Sp * Dh,
            bytes_accessed=4 * B * H * Sp * Dh * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :S, :].reshape(B, H, S, Dh)


def _attn_kernel_batched_heads(
    q_ref, k_ref, v_ref, o_ref, *, scale: float, causal: bool, s_actual: int
):
    """v2 kernel: one program per BATCH item, all H heads batched in one
    dot_general — bigger MXU tiles, H x fewer programs.  Native-dtype MXU
    passes, f32 accumulation + softmax."""
    q = q_ref[0]  # [H, Sp, Dh]
    k = k_ref[0]
    v = v_ref[0]

    logits = (
        jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [H, Sp, Sp] f32

    H, Sp, _ = logits.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (H, Sp, Sp), 2)
    mask = col < s_actual
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (H, Sp, Sp), 1)
        mask = mask & (row >= col)
    logits = jnp.where(mask, logits, -1e9)

    logits = logits - jnp.max(logits, axis=2, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.sum(p, axis=2, keepdims=True)

    out = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, Sp, Dh]
    o_ref[0] = out.astype(o_ref.dtype)


def _pallas_mha_fwd_batched(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, causal: bool, interpret: bool
) -> jnp.ndarray:
    B, H, S, Dh = q.shape
    scale = Dh**-0.5
    Sp = -(-S // _ALIGN) * _ALIGN

    def prep(t):
        return jnp.pad(t, ((0, 0), (0, 0), (0, Sp - S), (0, 0))) if Sp != S else t

    qf, kf, vf = prep(q), prep(k), prep(v)
    kernel = functools.partial(
        _attn_kernel_batched_heads, scale=scale, causal=causal, s_actual=S
    )
    kw = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    block = pl.BlockSpec((1, H, Sp, Dh), lambda i: (i, 0, 0, 0), **kw)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, Dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Sp * Sp * Dh,
            bytes_accessed=4 * B * H * Sp * Dh * q.dtype.itemsize,
            transcendentals=B * H * Sp * Sp,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :, :S, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def pallas_mha(q, k, v, causal: bool = False, interpret: bool = False, kernel_version: int = 2):
    """Fused MHA: q/k/v [B, H, S, Dh] -> [B, H, S, Dh]."""
    if kernel_version == 2:
        return _pallas_mha_fwd_batched(q, k, v, causal, interpret)
    return _pallas_mha_fwd_impl(q, k, v, causal, interpret)


def _fwd(q, k, v, causal, interpret, kernel_version):
    if kernel_version == 2:
        out = _pallas_mha_fwd_batched(q, k, v, causal, interpret)
    else:
        out = _pallas_mha_fwd_impl(q, k, v, causal, interpret)
    return out, (q, k, v)


def _bwd(causal, interpret, kernel_version, res, g):
    """Flash-style recompute backward in XLA (S is small, recompute is cheap).

    dV = P^T g ; dP = g V^T ; dS = P * (dP - rowsum(P * dP)) ;
    dQ = dS K * scale ; dK = dS^T Q * scale.
    """
    q, k, v = res
    Dh = q.shape[-1]
    scale = Dh**-0.5
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * scale
    if causal:
        S = logits.shape[-1]
        mask = jnp.tril(jnp.ones((S, S), dtype=bool))
        logits = jnp.where(mask[None, None], logits, -1e9)
    p = jax.nn.softmax(logits, axis=-1)

    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, kf) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


pallas_mha.defvjp(_fwd, _bwd)
