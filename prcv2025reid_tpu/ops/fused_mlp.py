"""Pallas fused transformer MLP: fc1 -> exact GELU -> fc2 in one kernel.

Profiled motivation (v5e xplane trace, docs/performance.md): the XLA path
materializes the [B*S, 3072] fc1 activation in HBM and runs GELU as a
separate fusion — ~22 ms/step of the ViT-B/16 embed path (a third of the
runtime).  This kernel keeps the hidden activation in VMEM: per grid step it
computes ``gelu(x_tile @ W1 + b1) @ W2 + b2`` for one row tile with both
weight matrices resident in VMEM (weights are indexed only by the group axis,
so Mosaic's pipeline fetches them once per group, not per row tile).

Weights arrive as per-group EFFECTIVE kernels (LoRA already folded — see
models/mer.py), so the kernel is pure dense math.

VMEM budget at (D=768, F=3072, bf16, R=256): W1+W2 ~9.4 MB + x/out tiles
~0.8 MB + fp32 hidden ~3 MB — fits the ~16 MB/core budget.

Backward: custom VJP recomputing in XLA (training pays the HBM pass; the
eval/serving path — the benchmark metric — is where the fusion matters).
"""
from __future__ import annotations

import functools

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
    INV_SQRT_2PI as _INV_SQRT_2PI,
    SQRT_HALF as _SQRT_HALF,
    gelu_exact as _gelu_exact,
)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]  # [R, D]
    h = (
        jax.lax.dot_general(
            x,
            w1_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[0, 0].astype(jnp.float32)
    )
    h = _gelu_exact(h).astype(x.dtype)
    o = (
        jax.lax.dot_general(
            h,
            w2_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[0, 0].astype(jnp.float32)
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _fused_mlp_impl(x, w1, b1, w2, b2, block_rows: int, interpret: bool):
    G, N, D = x.shape
    F = w1.shape[-1]
    R = block_rows
    Np = -(-N // R) * R
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))

    kw = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    # weights: single-buffered (they only change across the G axis; double
    # buffering them blows the 16 MB VMEM budget at D=768/F=3072)
    wkw = dict(kw)
    if _HAS_PLTPU and not interpret:
        wkw["pipeline_mode"] = pl.Buffered(buffer_count=1)
    # biases carry a singleton row so the (sublane, lane) block dims satisfy
    # TPU tiling (block == full array dims on the last two axes)
    b1r = b1.reshape(G, 1, F)
    b2r = b2.reshape(G, 1, D)
    out = pl.pallas_call(
        _mlp_kernel,
        grid=(G, Np // R),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda g, r: (g, r, 0), **kw),
            pl.BlockSpec((1, D, F), lambda g, r: (g, 0, 0), **wkw),
            pl.BlockSpec((1, 1, F), lambda g, r: (g, 0, 0), **kw),
            pl.BlockSpec((1, F, D), lambda g, r: (g, 0, 0), **wkw),
            pl.BlockSpec((1, 1, D), lambda g, r: (g, 0, 0), **kw),
        ],
        out_specs=pl.BlockSpec((1, R, D), lambda g, r: (g, r, 0), **kw),
        out_shape=jax.ShapeDtypeStruct((G, Np, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * G * Np * D * F,
            bytes_accessed=(
                2 * G * Np * D * x.dtype.itemsize + 2 * G * D * F * w1.dtype.itemsize
            ),
            transcendentals=G * Np * F,
        ),
        interpret=interpret,
    )(x, w1, b1r, w2, b2r)
    return out[:, :N, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_mlp(x, w1, b1, w2, b2, block_rows: int = 256, interpret: bool = False):
    """x [G, N, D]; w1 [G, D, F]; b1 [G, F]; w2 [G, F, D]; b2 [G, D] ->
    [G, N, D].  Exact-erf GELU between the two matmuls."""
    return _fused_mlp_impl(x, w1, b1, w2, b2, block_rows, interpret)


def _fwd(x, w1, b1, w2, b2, block_rows, interpret):
    out = _fused_mlp_impl(x, w1, b1, w2, b2, block_rows, interpret)
    return out, (x, w1, b1, w2, b2)


def _bwd(block_rows, interpret, res, g):
    x, w1, b1, w2, b2 = res
    xf = x.astype(jnp.float32)
    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    gf = g.astype(jnp.float32)

    h_pre = jnp.einsum("gnd,gdf->gnf", xf, w1f) + b1.astype(jnp.float32)[:, None, :]
    cdf = 0.5 * (1.0 + jax.lax.erf(h_pre * _SQRT_HALF))
    h = h_pre * cdf

    dw2 = jnp.einsum("gnf,gnd->gfd", h, gf)
    db2 = gf.sum(axis=1)
    dh = jnp.einsum("gnd,gfd->gnf", gf, w2f)

    pdf = jnp.exp(-0.5 * h_pre * h_pre) * _INV_SQRT_2PI
    dh_pre = dh * (cdf + h_pre * pdf)

    dw1 = jnp.einsum("gnd,gnf->gdf", xf, dh_pre)
    db1 = dh_pre.sum(axis=1)
    dx = jnp.einsum("gnf,gdf->gnd", dh_pre, w1f)
    return (
        dx.astype(x.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.astype(b2.dtype),
    )


fused_mlp.defvjp(_fwd, _bwd)
