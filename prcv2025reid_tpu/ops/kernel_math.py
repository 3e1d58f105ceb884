"""Shared scalar math for Pallas kernels.

Pallas TPU has no erf primitive; both fused kernels (ops/fused_mlp.py,
ops/fused_block.py) need the exact-GELU used by the reference
(models/mer_lora.py erf GELU, not CLIP's quick_gelu).  One definition here
keeps their parity contracts in lockstep.
"""
from __future__ import annotations

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
