"""Shared scalar math for Pallas kernels.

Pallas TPU has no erf primitive; both fused kernels (ops/fused_mlp.py,
ops/fused_block.py) need the exact-GELU used by the reference
(models/mer_lora.py erf GELU, not CLIP's quick_gelu).  One definition here
keeps their parity contracts in lockstep.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SQRT_HALF = 0.7071067811865476
INV_SQRT_2PI = 0.3989422804014327


def erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7)."""
    a1, a2, a3, a4, a5 = (
        0.254829592,
        -0.284496736,
        1.421413741,
        -1.453152027,
        1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    xa = jnp.abs(x)
    t = 1.0 / (1.0 + p * xa)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-xa * xa))


def gelu_exact(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) via :func:`erf_approx`."""
    return 0.5 * x * (1.0 + erf_approx(x * SQRT_HALF))


# Minimax odd polynomial for erf on [0, 2.5] (Lawson-iterated LSQ fit,
# |err| <= 1.7e-3 — inside bf16 rounding of the downstream activations);
# erf is clamped to +/-1 outside (|erf(2.5)| = 0.99959).  Horner on u^2:
# 6 multiplies + 4 adds per element vs the ~30-op exact-erf chain that
# measured 81 -> 47 TFLOP/s when XLA fuses it into the fc2 matmul prologue
# (tools/perf_microbench.py probe_fc2b / docs/performance.md round 3).
_ERF_POLY_BOUND = 2.5
_ERF_POLY_C = (
    1.12030787,  # u^1
    -0.345460773,  # u^3
    0.0788524875,  # u^5
    -0.00982586526,  # u^7
    0.000496800079,  # u^9
)


def _gelu_stored_fwd(x):
    xf = x.astype(jnp.float32)
    c = jax.lax.erf(xf * SQRT_HALF)  # erf computed ONCE, saved as residual
    y = (0.5 * xf * (1.0 + c)).astype(x.dtype)
    return y, (x, c.astype(x.dtype))


def _gelu_stored_bwd(res, g):
    x, c = res
    xf = x.astype(jnp.float32)
    cf = c.astype(jnp.float32)
    # d gelu/dx = Phi(x) + x * phi(x); Phi from the stored erf — the backward
    # contains NO erf, only one exp
    phi = INV_SQRT_2PI * jnp.exp(-0.5 * xf * xf)
    grad = 0.5 * (1.0 + cf) + xf * phi
    return ((g.astype(jnp.float32) * grad).astype(x.dtype),)


@jax.custom_vjp
def gelu_stored(x):
    """Exact-erf GELU whose backward REUSES the forward's erf instead of
    recomputing it: the erf value is saved as a residual (same dtype as x)
    and the VJP needs only one exp.  XLA's default schedule rematerializes
    the ~30-op erf chain inside the fc2 backward fusions (~26 ms/step of
    the round-2 train trace); this trades that recompute for one stored
    [.., mlp_dim] activation per MLP.  Math identical to
    jax.nn.gelu(approximate=False) up to the residual's dtype rounding
    (exact in f32; 1 bf16 ulp on the bf16 training path)."""
    y, _ = _gelu_stored_fwd(x)
    return y


gelu_stored.defvjp(_gelu_stored_fwd, _gelu_stored_bwd)


def gelu_poly_bf16(x):
    """GELU with a bf16-accuracy polynomial erf — the serving-path
    formulation for bf16 activations (gate: bench.py ranking equivalence).
    NOT reference-exact math; training and the golden-parity oracles use
    :func:`gelu_exact` / jax.nn.gelu(approximate=False)."""
    u = jnp.clip(
        (x * SQRT_HALF).astype(jnp.float32), -_ERF_POLY_BOUND, _ERF_POLY_BOUND
    )
    u2 = u * u
    c1, c3, c5, c7, c9 = _ERF_POLY_C
    p = u * (c1 + u2 * (c3 + u2 * (c5 + u2 * (c7 + u2 * c9))))
    p = jnp.clip(p, -1.0, 1.0)
    return (0.5 * x.astype(jnp.float32) * (1.0 + p)).astype(x.dtype)
