"""Pallas fused residual-add + LayerNorm.

Profiled motivation (docs/performance.md): every transformer-block LN costs
~0.73 ms on [128*197, 768] bf16 (~3 memory passes) and is always preceded by
a residual add (another r2w1 pass).  This kernel computes

    x_new = x + branch
    y     = LN(x_new) * scale + bias

in ONE pass over the tile while it sits in VMEM: reads x, branch; writes
x_new, y — the minimum possible HBM traffic for the pair.

Backward: custom VJP in XLA (training re-reads; the serving/eval path is the
throughput metric).
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


def _resln_kernel(x_ref, b_ref, g_ref, bias_ref, xn_ref, y_ref, *, eps: float):
    x = x_ref[0]
    br = b_ref[0]
    xn = x + br
    xn_ref[0] = xn

    xf = xn.astype(jnp.float32)
    mu = xf.mean(axis=1, keepdims=True)
    var = jnp.square(xf - mu).mean(axis=1, keepdims=True)
    norm = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = norm * g_ref[0, 0].astype(jnp.float32) + bias_ref[0, 0].astype(jnp.float32)
    y_ref[0] = y.astype(y_ref.dtype)


def _impl(x, branch, scale, bias, eps: float, block_rows: int, interpret: bool):
    N, D = x.shape
    R = block_rows
    Np = -(-N // R) * R
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0)))
        branch = jnp.pad(branch, ((0, Np - N), (0, 0)))

    kw = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    g2 = scale.reshape(1, 1, D)
    b2 = bias.reshape(1, 1, D)
    xr = x.reshape(1, Np, D)
    br = branch.reshape(1, Np, D)
    xn, y = pl.pallas_call(
        functools.partial(_resln_kernel, eps=eps),
        grid=(Np // R,),
        in_specs=[
            pl.BlockSpec((1, R, D), lambda r: (0, r, 0), **kw),
            pl.BlockSpec((1, R, D), lambda r: (0, r, 0), **kw),
            pl.BlockSpec((1, 1, D), lambda r: (0, 0, 0), **kw),
            pl.BlockSpec((1, 1, D), lambda r: (0, 0, 0), **kw),
        ],
        out_specs=[
            pl.BlockSpec((1, R, D), lambda r: (0, r, 0), **kw),
            pl.BlockSpec((1, R, D), lambda r: (0, r, 0), **kw),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Np, D), x.dtype),
            jax.ShapeDtypeStruct((1, Np, D), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * Np * D,
            bytes_accessed=4 * Np * D * x.dtype.itemsize,
            transcendentals=Np,
        ),
        interpret=interpret,
    )(xr, br, g2, b2)
    return xn[0, :N], y[0, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_residual_ln(
    x, branch, scale, bias, eps: float = 1e-5, block_rows: int = 512, interpret: bool = False
):
    """(x + branch, LN(x + branch)*scale + bias) in one memory pass.

    x/branch [N, D]; scale/bias [D].
    """
    return _impl(x, branch, scale, bias, eps, block_rows, interpret)


def _fwd(x, branch, scale, bias, eps, block_rows, interpret):
    xn, y = _impl(x, branch, scale, bias, eps, block_rows, interpret)
    return (xn, y), (xn, scale)


def _bwd(eps, block_rows, interpret, res, cot):
    xn, scale = res
    g_xn, g_y = cot
    xf = xn.astype(jnp.float32)
    mu = xf.mean(axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.square(xc).mean(axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    norm = xc * inv

    gy = g_y.astype(jnp.float32)
    d_scale = (gy * norm).sum(axis=0)
    d_bias = gy.sum(axis=0)

    # dLN/dx (standard layer-norm backward)
    gh = gy * scale.astype(jnp.float32)
    D = xn.shape[1]
    dx_ln = inv * (gh - gh.mean(axis=1, keepdims=True) - norm * (gh * norm).mean(axis=1, keepdims=True))

    dx = g_xn.astype(jnp.float32) + dx_ln
    return (
        dx.astype(xn.dtype),
        dx.astype(xn.dtype),
        d_scale.astype(scale.dtype),
        d_bias.astype(scale.dtype),
    )


fused_residual_ln.defvjp(_fwd, _bwd)
