"""Fused transformer-block kernels for the folded (eval/serving) path.

Round-1 profiling (docs/performance.md) attributed ~39 of 56 ms/step of the
ViT-B/16 embed path to memory-bound elementwise chains: LayerNorm stats
passes (~18 ms), the materialized GELU (~11 ms) and attention softmax
integration (~10 ms).  Everything in a pre-LN ViT block EXCEPT attention is
row-wise over tokens, so the block splits into two Pallas kernels with no
sequence-alignment constraints (S=197 never appears — tokens are flattened):

  Kernel A  ``fused_ln_qkv``:   qkv = LN1(x) @ W_qkv + b
  (XLA attention between the kernels — the transpose-free einsum path that
   won round 1's attention bake-off, ops/attention.py)
  Kernel B  ``fused_out_mlp``:  x2 = x + attn @ W_out + b_out
                                y  = x2 + GELU(LN2(x2) @ W1 + b1) @ W2 + b2

Each kernel makes ONE pass over the activations: LN statistics, the GELU and
the residual adds all happen on VMEM-resident tiles between the matmuls,
eliminating the HBM round trips XLA spends on them.  Weights are
single-buffered VMEM residents (they change only with the group index).

Both kernels also have an int8 variant (``quant='int8'``): v5e's MXU peaks
at 393 TOP/s int8 vs 197 TFLOP/s bf16, and the bf16 matmul roofline alone
caps this model at ~4.6k embeds/s/chip (35 GFLOP/image / 162 TFLOP/s
measured), so int8 is the only route past 5k/chip.  Weights are quantized
per output column offline (``quantize_weight``); activations are quantized
per row dynamically inside the kernel right after the LN/GELU that already
has the row in registers — the quantize pass is free.  Accumulation is
int32, dequantization folds the row/column scales back in f32.

Training never uses these kernels (fold=False keeps the thin-LoRA XLA path
with its cheap backward); a custom VJP recomputing in XLA exists so taking
gradients through an eval forward still works.

Reference parity: this computes exactly MERTransformerBlock's folded math
(/root/reference/models/clip_backbone.py:15-123) — pre-LN, erf GELU
(Abramowitz-Stegun erf, |err|<=1.5e-7), f32 LN statistics.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from prcv2025reid_tpu.ops.kernel_math import (
    SQRT_HALF as _SQRT_HALF,
    gelu_exact as _gelu_exact,
)

_LN_EPS = 1e-5


def _ln_f32(x, scale, bias):
    """f32 LayerNorm over the last axis (reference-exact statistics)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * scale + bias


def _quant_rows(y):
    """Symmetric per-row int8 quantization of an f32 tile already in VMEM."""
    s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.round(y / s).astype(jnp.int8)
    return q, s


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-column symmetric int8 quantization.  w [..., in, out] ->
    (int8 weights, f32 scales [..., 1, out])."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    return jnp.round(wf / s).astype(jnp.int8), s


def _dot(x, w, acc_dtype):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=acc_dtype
    )


# ---------------------------------------------------------------- kernel A


def _ln_qkv_kernel_bf16(x_ref, lns_ref, lnb_ref, w_ref, b_ref, o_ref):
    y = _ln_f32(x_ref[0], lns_ref[0, 0], lnb_ref[0, 0])
    o = _dot(y.astype(x_ref.dtype), w_ref[0], jnp.float32) + b_ref[0, 0]
    o_ref[0] = o.astype(o_ref.dtype)


def _ln_qkv_kernel_int8(x_ref, lns_ref, lnb_ref, wq_ref, ws_ref, b_ref, o_ref):
    y = _ln_f32(x_ref[0], lns_ref[0, 0], lnb_ref[0, 0])
    q, s = _quant_rows(y)
    o32 = _dot(q, wq_ref[0], jnp.int32)
    o = o32.astype(jnp.float32) * s * ws_ref[0, 0] + b_ref[0, 0]
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_ln_qkv_impl(x, ln_scale, ln_bias, w, b, *, quant, block_rows, interpret):
    """x [G, T, D]; ln_* [D]; w [G, D, O] (bf16) or (wq int8, ws f32 [G,1,O]);
    b [G, O] -> qkv [G, T, O]."""
    G, T, D = x.shape
    int8 = quant == "int8"
    if int8:
        wq, ws = w
        O = wq.shape[-1]
    else:
        O = w.shape[-1]
    R = block_rows
    Tp = -(-T // R) * R
    if Tp != T:
        x = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))

    kw = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    wkw = dict(kw)
    if _HAS_PLTPU and not interpret:
        wkw["pipeline_mode"] = pl.Buffered(buffer_count=1)

    lns = ln_scale.astype(jnp.float32).reshape(1, 1, D)
    lnb = ln_bias.astype(jnp.float32).reshape(1, 1, D)
    br = b.astype(jnp.float32).reshape(G, 1, O)

    common = dict(
        grid=(G, Tp // R),
        out_specs=pl.BlockSpec((1, R, O), lambda g, r: (g, r, 0), **kw),
        out_shape=jax.ShapeDtypeStruct((G, Tp, O), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Tp * D * O,
            bytes_accessed=G * Tp * D * x.dtype.itemsize
            + G * Tp * O * x.dtype.itemsize
            + G * D * O * (1 if int8 else 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )
    x_spec = pl.BlockSpec((1, R, D), lambda g, r: (g, r, 0), **kw)
    ln_specs = [
        pl.BlockSpec((1, 1, D), lambda g, r: (0, 0, 0), **kw),
        pl.BlockSpec((1, 1, D), lambda g, r: (0, 0, 0), **kw),
    ]
    b_spec = pl.BlockSpec((1, 1, O), lambda g, r: (g, 0, 0), **kw)
    if int8:
        out = pl.pallas_call(
            _ln_qkv_kernel_int8,
            in_specs=[
                x_spec,
                *ln_specs,
                pl.BlockSpec((1, D, O), lambda g, r: (g, 0, 0), **wkw),
                pl.BlockSpec((1, 1, O), lambda g, r: (g, 0, 0), **kw),
                b_spec,
            ],
            **common,
        )(x, lns, lnb, wq, ws.astype(jnp.float32), br)
    else:
        out = pl.pallas_call(
            _ln_qkv_kernel_bf16,
            in_specs=[
                x_spec,
                *ln_specs,
                pl.BlockSpec((1, D, O), lambda g, r: (g, 0, 0), **wkw),
                b_spec,
            ],
            **common,
        )(x, lns, lnb, w, br)
    return out[:, :T, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_ln_qkv(x, ln_scale, ln_bias, w, b, quant="bf16", block_rows=256,
                 interpret=False):
    """LN(x) @ w + b in one VMEM pass.  x [G,T,D] -> [G,T,O].

    ``quant='int8'``: pass ``w=(wq, ws)`` from :func:`quantize_weight`."""
    return _fused_ln_qkv_impl(
        x, ln_scale, ln_bias, w, b,
        quant=quant, block_rows=block_rows, interpret=interpret,
    )


def _ln_qkv_fwd(x, ln_scale, ln_bias, w, b, quant, block_rows, interpret):
    out = _fused_ln_qkv_impl(
        x, ln_scale, ln_bias, w, b,
        quant=quant, block_rows=block_rows, interpret=interpret,
    )
    return out, (x, ln_scale, ln_bias, w, b)


def _ln_qkv_bwd(quant, block_rows, interpret, res, g):
    # XLA recompute backward — the fused path is eval-only; this exists so
    # jax.grad through an eval forward still works (and for grad parity tests).
    x, ln_scale, ln_bias, w, b = res
    if quant == "int8":
        # loud by design: a silent zero here would make jax.grad through a
        # fused_int8 forward produce zero weight gradients with no warning
        # (int8 weights are a serving-only artifact — train on bf16/xla)
        raise NotImplementedError(
            "gradients w.r.t. int8-quantized weights are unsupported: the "
            "fused_int8 path is serving-only; use block_impl='xla' or "
            "'fused' for any differentiated forward"
        )

    def ref(x, s, bnorm, w_, b_):
        y = _ln_f32(x, s.astype(jnp.float32), bnorm.astype(jnp.float32))
        return jnp.einsum(
            "gti,gio->gto", y, w_.astype(jnp.float32)
        ) + b_[:, None, :].astype(jnp.float32)

    _, vjp = jax.vjp(ref, x.astype(jnp.float32), ln_scale, ln_bias, w, b)
    dx, ds, db, dw, dbias = vjp(g.astype(jnp.float32))
    return (dx.astype(x.dtype), ds.astype(ln_scale.dtype),
            db.astype(ln_bias.dtype), dw.astype(w.dtype),
            dbias.astype(b.dtype))


fused_ln_qkv.defvjp(_ln_qkv_fwd, _ln_qkv_bwd)


# ---------------------------------------------------------------- kernel B


def _out_mlp_kernel_bf16(
    a_ref, x_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
):
    dt = x_ref.dtype
    proj = _dot(a_ref[0], wo_ref[0], jnp.float32) + bo_ref[0, 0]
    x2 = x_ref[0].astype(jnp.float32) + proj
    y = _ln_f32(x2, lns_ref[0, 0], lnb_ref[0, 0])
    h = _dot(y.astype(dt), w1_ref[0], jnp.float32) + b1_ref[0, 0]
    h = _gelu_exact(h)
    o = _dot(h.astype(dt), w2_ref[0], jnp.float32) + b2_ref[0, 0]
    o_ref[0] = (x2 + o).astype(o_ref.dtype)


def _out_mlp_kernel_int8(
    a_ref, x_ref, wo_ref, wos_ref, bo_ref, lns_ref, lnb_ref,
    w1_ref, w1s_ref, b1_ref, w2_ref, w2s_ref, b2_ref, o_ref,
):
    aq, as_ = _quant_rows(a_ref[0].astype(jnp.float32))
    proj = _dot(aq, wo_ref[0], jnp.int32).astype(jnp.float32) * as_ * wos_ref[0, 0]
    x2 = x_ref[0].astype(jnp.float32) + proj + bo_ref[0, 0]
    y = _ln_f32(x2, lns_ref[0, 0], lnb_ref[0, 0])
    yq, ys = _quant_rows(y)
    h = _dot(yq, w1_ref[0], jnp.int32).astype(jnp.float32) * ys * w1s_ref[0, 0]
    h = _gelu_exact(h + b1_ref[0, 0])
    hq, hs = _quant_rows(h)
    o = _dot(hq, w2_ref[0], jnp.int32).astype(jnp.float32) * hs * w2s_ref[0, 0]
    o_ref[0] = (x2 + o + b2_ref[0, 0]).astype(o_ref.dtype)


def _out_mlp_kernel_int8mlp(
    a_ref, x_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
    w1_ref, w1s_ref, b1_ref, w2_ref, w2s_ref, b2_ref, o_ref,
):
    """Mixed plan: out-proj bf16, fc1/fc2 int8 — the MLP is 42% of the step
    and its quantization sits behind an LN (bounded input range), while the
    out-proj feeds the residual stream directly (where int8 error compounds
    across 12 layers — the suspected ranking-gate killer)."""
    proj = _dot(a_ref[0], wo_ref[0], jnp.float32) + bo_ref[0, 0]
    x2 = x_ref[0].astype(jnp.float32) + proj
    y = _ln_f32(x2, lns_ref[0, 0], lnb_ref[0, 0])
    yq, ys = _quant_rows(y)
    h = _dot(yq, w1_ref[0], jnp.int32).astype(jnp.float32) * ys * w1s_ref[0, 0]
    h = _gelu_exact(h + b1_ref[0, 0])
    hq, hs = _quant_rows(h)
    o = _dot(hq, w2_ref[0], jnp.int32).astype(jnp.float32) * hs * w2s_ref[0, 0]
    o_ref[0] = (x2 + o + b2_ref[0, 0]).astype(o_ref.dtype)


def _fused_out_mlp_impl(
    attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2,
    *, quant, block_rows, interpret,
):
    """attn, x [G, T, D]; wo [G, D, D]; w1 [G, D, F]; w2 [G, F, D] (bf16), or
    (wq, ws) pairs for int8.  ``quant='int8_mlp'``: wo stays bf16, only
    w1/w2 are (wq, ws) pairs.  Returns x + proj + MLP(LN2(x + proj))."""
    G, T, D = x.shape
    int8 = quant == "int8"
    int8_mlp = quant == "int8_mlp"
    F = (w1[0] if (int8 or int8_mlp) else w1).shape[-1]
    R = block_rows
    Tp = -(-T // R) * R
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        attn = jnp.pad(attn, pad)
        x = jnp.pad(x, pad)

    kw = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    wkw = dict(kw)
    if _HAS_PLTPU and not interpret:
        wkw["pipeline_mode"] = pl.Buffered(buffer_count=1)

    def row(g_, r_):
        return (g_, r_, 0)

    def gonly(g_, r_):
        return (g_, 0, 0)

    def const(g_, r_):
        return (0, 0, 0)

    lns = ln_scale.astype(jnp.float32).reshape(1, 1, D)
    lnb = ln_bias.astype(jnp.float32).reshape(1, 1, D)
    bor = bo.astype(jnp.float32).reshape(G, 1, D)
    b1r = b1.astype(jnp.float32).reshape(G, 1, F)
    b2r = b2.astype(jnp.float32).reshape(G, 1, D)

    common = dict(
        grid=(G, Tp // R),
        out_specs=pl.BlockSpec((1, R, D), row, **kw),
        out_shape=jax.ShapeDtypeStruct((G, Tp, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Tp * D * (D + 2 * F),
            # weight traffic at true widths: int8_mlp keeps the D*D out-proj
            # at bf16 while fc1/fc2 are int8 (scheduler hint only)
            bytes_accessed=3 * G * Tp * D * x.dtype.itemsize
            + (
                G * (D * D * 2 + 2 * D * F * 1)
                if int8_mlp
                else G * D * (D + 2 * F) * (1 if int8 else 2)
            ),
            transcendentals=G * Tp * F,
        ),
        interpret=interpret,
    )
    a_spec = pl.BlockSpec((1, R, D), row, **kw)
    x_spec = pl.BlockSpec((1, R, D), row, **kw)
    ln_specs = [
        pl.BlockSpec((1, 1, D), const, **kw),
        pl.BlockSpec((1, 1, D), const, **kw),
    ]
    if int8_mlp:
        (w1q, w1s), (w2q, w2s) = w1, w2
        out = pl.pallas_call(
            _out_mlp_kernel_int8mlp,
            in_specs=[
                a_spec,
                x_spec,
                pl.BlockSpec((1, D, D), gonly, **wkw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
                *ln_specs,
                pl.BlockSpec((1, D, F), gonly, **wkw),
                pl.BlockSpec((1, 1, F), gonly, **kw),
                pl.BlockSpec((1, 1, F), gonly, **kw),
                pl.BlockSpec((1, F, D), gonly, **wkw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
            ],
            **common,
        )(
            attn, x, wo, bor, lns, lnb,
            w1q, w1s.astype(jnp.float32), b1r,
            w2q, w2s.astype(jnp.float32), b2r,
        )
    elif int8:
        (woq, wos), (w1q, w1s), (w2q, w2s) = wo, w1, w2
        out = pl.pallas_call(
            _out_mlp_kernel_int8,
            in_specs=[
                a_spec,
                x_spec,
                pl.BlockSpec((1, D, D), gonly, **wkw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
                *ln_specs,
                pl.BlockSpec((1, D, F), gonly, **wkw),
                pl.BlockSpec((1, 1, F), gonly, **kw),
                pl.BlockSpec((1, 1, F), gonly, **kw),
                pl.BlockSpec((1, F, D), gonly, **wkw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
            ],
            **common,
        )(
            attn, x, woq, wos.astype(jnp.float32), bor, lns, lnb,
            w1q, w1s.astype(jnp.float32), b1r,
            w2q, w2s.astype(jnp.float32), b2r,
        )
    else:
        out = pl.pallas_call(
            _out_mlp_kernel_bf16,
            in_specs=[
                a_spec,
                x_spec,
                pl.BlockSpec((1, D, D), gonly, **wkw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
                *ln_specs,
                pl.BlockSpec((1, D, F), gonly, **wkw),
                pl.BlockSpec((1, 1, F), gonly, **kw),
                pl.BlockSpec((1, F, D), gonly, **wkw),
                pl.BlockSpec((1, 1, D), gonly, **kw),
            ],
            **common,
        )(attn, x, wo, bor, lns, lnb, w1, b1r, w2, b2r)
    return out[:, :T, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12))
def fused_out_mlp(attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2,
                  quant="bf16", block_rows=256, interpret=False):
    """x + attn@wo + bo, then + MLP(LN2(·)) — one VMEM pass per row tile.

    ``quant='int8'``: pass each weight as ``(wq, ws)`` from
    :func:`quantize_weight`."""
    return _fused_out_mlp_impl(
        attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2,
        quant=quant, block_rows=block_rows, interpret=interpret,
    )


def _out_mlp_ref_f32(attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2):
    """f32 XLA reference used by the recompute backward."""
    proj = jnp.einsum("gti,gio->gto", attn, wo) + bo[:, None, :]
    x2 = x + proj
    y = _ln_f32(x2, ln_scale.astype(jnp.float32), ln_bias.astype(jnp.float32))
    h = jnp.einsum("gti,gif->gtf", y, w1) + b1[:, None, :]
    h = 0.5 * h * (1.0 + jax.lax.erf(h * _SQRT_HALF))
    return x2 + jnp.einsum("gtf,gfd->gtd", h, w2) + b2[:, None, :]


def _out_mlp_fwd(attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2,
                 quant, block_rows, interpret):
    out = _fused_out_mlp_impl(
        attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2,
        quant=quant, block_rows=block_rows, interpret=interpret,
    )
    return out, (attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2)


def _out_mlp_bwd(quant, block_rows, interpret, res, g):
    attn, x, wo, bo, ln_scale, ln_bias, w1, b1, w2, b2 = res
    int8 = quant in ("int8", "int8_mlp")
    if int8:
        # see _ln_qkv_bwd: grad-through-int8 is unsupported by design
        raise NotImplementedError(
            "gradients w.r.t. int8-quantized weights are unsupported: the "
            "fused_int8 path is serving-only; use block_impl='xla' or "
            "'fused' for any differentiated forward"
        )
    args = (
        attn.astype(jnp.float32), x.astype(jnp.float32),
        wo.astype(jnp.float32), bo.astype(jnp.float32), ln_scale, ln_bias,
        w1.astype(jnp.float32), b1.astype(jnp.float32),
        w2.astype(jnp.float32), b2.astype(jnp.float32),
    )
    _, vjp = jax.vjp(_out_mlp_ref_f32, *args)
    grads = vjp(g.astype(jnp.float32))
    (da, dx, dwo, dbo, ds, db, dw1, db1, dw2, db2) = grads
    dwo, dw1, dw2 = (dwo.astype(wo.dtype), dw1.astype(w1.dtype),
                     dw2.astype(w2.dtype))
    # cotangent dtypes must match the PRIMAL dtypes (the production
    # _fused_call passes bf16 biases; f32 cotangents fail custom_vjp checks)
    return (
        da.astype(attn.dtype), dx.astype(x.dtype), dwo,
        dbo.astype(bo.dtype), ds.astype(ln_scale.dtype),
        db.astype(ln_bias.dtype), dw1, db1.astype(b1.dtype),
        dw2, db2.astype(b2.dtype),
    )


fused_out_mlp.defvjp(_out_mlp_fwd, _out_mlp_bwd)
