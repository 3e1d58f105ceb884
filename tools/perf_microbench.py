#!/usr/bin/env python
"""Roofline microbenchmarks for the ViT-B/16 embed path (v5e, 1 chip).

Answers the round-2 performance questions with isolated, in-jit measurements
(docs/performance.md records the results):

  1. What is the TRUE matmul roofline in FLOP/s (2*M*N*K convention) for
     XLA bf16, XLA int8, Pallas/Mosaic bf16, Pallas/Mosaic int8 at the
     model's shapes?  (Round 1's "9.2k embeds/s speed of light" counted
     MACs, not FLOPs — ViT-B/16 @197 tokens is ~35 GFLOP/image, so the
     bf16 ceiling is ~162e12/35e9 = 4.6k embeds/s; 5k+ requires int8.)
  2. How much does f32-vs-bf16 softmax cost in the XLA attention?
  3. What does a fused LN+quantize epilogue cost vs separate passes?

Timing protocol (CLAUDE.md): lax.fori_loop INSIDE one jit with an
iteration-dependent input so XLA cannot hoist the body; completion forced by
a host fetch of a scalar checksum.  block_until_ready is NOT trusted through
the axon tunnel.

Usage: python tools/perf_microbench.py [probe ...]
Probes: xla_bf16 xla_int8 pallas_bf16 pallas_int8 attn ln_quant all
"""
from __future__ import annotations

import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

import jax as _jax_early

if os.environ.get("PRCV_CPU", "0") == "1":
    # a sitecustomize force-sets JAX_PLATFORMS=axon; override AFTER import
    _jax_early.config.update("jax_platforms", "cpu")

# ViT-B/16 embed-path shapes: rows = B*S = 128*197 = 25216 (pad to 25344),
# the MLP matmul [rows, 768] @ [768, 3072] is the biggest single matmul.
_ON_TPU = _jax_early.default_backend() not in ("cpu",)
M, K, N = (25344, 768, 3072) if _ON_TPU else (512, 768, 3072)
ITERS = 30 if _ON_TPU else 2


def timed(fn, *args, flops_per_iter: float, label: str, unit: str = "TFLOP/s"):
    jfn = jax.jit(fn)
    checksum = float(jfn(*args))  # compile + warm
    assert np.isfinite(checksum), f"{label}: non-finite checksum"
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        float(jfn(*args))  # host fetch = completion barrier
        dt = time.perf_counter() - t0
        best = max(best, flops_per_iter * ITERS / dt)
    print(f"{label:>28s}: {best / 1e12:8.2f} {unit}  "
          f"({ITERS} iters, {flops_per_iter / 1e9:.1f} GFLOP/iter)")
    return best


def probe_xla_bf16():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

    def fn(x, w):
        def body(i, acc):
            xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            y = jnp.dot(xi, w)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return timed(fn, x, w, flops_per_iter=2.0 * M * K * N, label="XLA bf16 matmul")


def probe_xla_int8():
    xq = jax.random.randint(jax.random.PRNGKey(0), (M, K), -127, 127, jnp.int8)
    wq = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 127, jnp.int8)

    def fn(xq, wq):
        def body(i, acc):
            xi = xq + (i % 2).astype(jnp.int8)  # iteration-dependent
            y = jax.lax.dot_general(
                xi, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return timed(fn, xq, wq, flops_per_iter=2.0 * M * K * N,
                 label="XLA int8 matmul", unit="TOP/s")


def _pallas_matmul(x, w, acc_dtype, out_dtype, block_rows=256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        ).astype(out_dtype)

    m, k = x.shape
    n = w.shape[1]
    return pl.pallas_call(
        kernel,
        grid=(m // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, k), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, n), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * k * x.dtype.itemsize + k * n * w.dtype.itemsize
            + m * n * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
    )(x, w)


def probe_pallas_bf16():
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)

    def fn(x, w):
        def body(i, acc):
            xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            y = _pallas_matmul(xi, w, jnp.float32, jnp.bfloat16)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return timed(fn, x, w, flops_per_iter=2.0 * M * K * N,
                 label="Pallas bf16 matmul")


def probe_pallas_int8():
    xq = jax.random.randint(jax.random.PRNGKey(0), (M, K), -127, 127, jnp.int8)
    wq = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 127, jnp.int8)

    def fn(xq, wq):
        def body(i, acc):
            xi = xq + (i % 2).astype(jnp.int8)
            y = _pallas_matmul(xi, wq, jnp.int32, jnp.int32)
            return acc + y[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    return timed(fn, xq, wq, flops_per_iter=2.0 * M * K * N,
                 label="Pallas int8 matmul", unit="TOP/s")


def probe_pallas_sweep():
    """Mosaic matmul rate vs row-block size (the fused block kernels'
    block_rows knob) for bf16 and int8."""
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    xq = jax.random.randint(jax.random.PRNGKey(0), (M, K), -127, 127, jnp.int8)
    wq = jax.random.randint(jax.random.PRNGKey(1), (K, N), -127, 127, jnp.int8)
    for R in (512, 1024, 2112):
        def fn_bf(x, w, R=R):
            def body(i, acc):
                xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                y = _pallas_matmul(xi, w, jnp.float32, jnp.bfloat16, block_rows=R)
                return acc + y[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        timed(fn_bf, x, w, flops_per_iter=2.0 * M * K * N,
              label=f"Pallas bf16 R={R}")

        def fn_i8(xq, wq, R=R):
            def body(i, acc):
                xi = xq + (i % 2).astype(jnp.int8)
                y = _pallas_matmul(xi, wq, jnp.int32, jnp.int32, block_rows=R)
                return acc + y[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        timed(fn_i8, xq, wq, flops_per_iter=2.0 * M * K * N,
              label=f"Pallas int8 R={R}", unit="TOP/s")


def probe_attn():
    """Full-model-shaped attention: [B=128, S=197, H=12, Dh=64], f32 vs bf16
    softmax.  FLOPs = 2*B*H*S*S*Dh*2 (QK^T and PV)."""
    B, S, H, Dh = (128, 197, 12, 64) if _ON_TPU else (4, 197, 12, 64)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, Dh), jnp.bfloat16)
    flops = 2.0 * B * H * S * S * Dh * 2

    def make(softmax_dtype):
        def fn(q, k, v):
            def body(i, acc):
                qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                s = jnp.einsum("bqhd,bkhd->bhqk", qi, k,
                               preferred_element_type=softmax_dtype)
                s = s * (1.0 / np.sqrt(Dh))
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        return fn

    timed(make(jnp.float32), q, k, v, flops_per_iter=flops,
          label="XLA attn f32 softmax")
    timed(make(jnp.bfloat16), q, k, v, flops_per_iter=flops,
          label="XLA attn bf16 softmax")


def probe_attn2():
    """Alternative attention implementations at model shapes — attention is
    45% of the embed step (trace attribution), far off its flop/byte floor."""
    B, S, H, Dh = (128, 197, 12, 64) if _ON_TPU else (4, 197, 12, 64)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, Dh), jnp.bfloat16)
    flops = 2.0 * B * H * S * S * Dh * 2

    def run(name, f):
        def fn(q, k, v):
            def body(i, acc):
                qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                o = f(qi, k, v)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        try:
            timed(fn, q, k, v, flops_per_iter=flops, label=name)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:100]}")

    # jax's own SDPA entry point (XLA may pick a fused TPU path)
    run("jax.nn.dot_product_attention",
        lambda q, k, v: jax.nn.dot_product_attention(q, k, v))

    # current model path for comparison
    from prcv2025reid_tpu.ops.attention import xla_attention_bshd
    run("model xla_attention_bshd", xla_attention_bshd)

    # explicit transposed BHSD layout (the "classic" form)
    def bhsd(q, k, v):
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kt) * (Dh**-0.5)
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vt).transpose(0, 2, 1, 3)
    run("explicit BHSD transposes", bhsd)

    # upstream splash attention kernel (Mosaic); S=197 padded to 256 with a
    # key mask (q rows >=197 compute garbage and are discarded)
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    Sp = 256
    maskarr = np.zeros((Sp, Sp), dtype=bool)
    maskarr[:, :S] = True
    mk = sm.MultiHeadMask([sm.NumpyMask(maskarr) for _ in range(H)])
    kernel = sk.make_splash_mha_single_device(mk)

    def splash(q, k, v):
        pad = ((0, 0), (0, Sp - S), (0, 0), (0, 0))
        qt = jnp.pad(q * (Dh**-0.5), pad).transpose(0, 2, 1, 3)
        kt = jnp.pad(k, pad).transpose(0, 2, 1, 3)
        vt = jnp.pad(v, pad).transpose(0, 2, 1, 3)
        out = jax.vmap(kernel)(qt, kt, vt)
        return out.transpose(0, 2, 1, 3)[:, :S]

    try:
        ref = xla_attention_bshd(q, k, v)
        got = splash(q, k, v)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"splash parity max|err| vs xla: {err:.5f}")
        run("splash attention (Mosaic)", splash)
    except Exception as e:
        print(f"splash: FAILED {type(e).__name__}: {str(e)[:120]}")


def probe_ln_quant():
    """LN -> per-row int8 quantize -> int8 matmul, all-XLA: does the quant
    epilogue fuse, and what does the full quantized linear cost vs bf16?"""
    x = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    scale = jnp.ones((K,), jnp.float32)
    bias = jnp.zeros((K,), jnp.float32)
    # static per-column weight quant
    w_s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    wq = jnp.round(w.astype(jnp.float32) / w_s).astype(jnp.int8)

    def fn(x, wq, w_s):
        def body(i, acc):
            xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            xf = xi.astype(jnp.float32)
            mu = xf.mean(axis=-1, keepdims=True)
            var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
            y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
            x_s = jnp.max(jnp.abs(y), axis=-1, keepdims=True) / 127.0
            yq = jnp.round(y / x_s).astype(jnp.int8)
            o32 = jax.lax.dot_general(
                yq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o = o32.astype(jnp.float32) * x_s * w_s
            return acc + o[0, 0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    timed(fn, x, wq, w_s, flops_per_iter=2.0 * M * K * N,
          label="XLA LN+quant+int8 matmul", unit="TOP/s(effective)")


def probe_ln_variants():
    """Residual+LayerNorm at exact model shapes [1,128,197,768]: the trace
    shows XLA's convert_reduce_fusion costs ~2.05 ms per site (13 sites =
    50% of the embed step) vs a ~0.19 ms traffic bound.  Which formulation
    compiles fast?"""
    shape = (1, 128, 197, 768) if _ON_TPU else (1, 4, 197, 768)
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    br = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    scale = jnp.ones((768,), jnp.float32)
    bias = jnp.zeros((768,), jnp.float32)
    # traffic: read x, branch; write x2, normalized out
    nbytes = 4 * x.size * 2

    def v_current(x, br):
        x2 = x + br
        xf = x2.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return x2, (y * scale + bias).astype(x.dtype)

    def v_fast_var(x, br):
        x2 = x + br
        xf = x2.astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        m2 = jnp.square(xf).mean(axis=-1, keepdims=True)
        var = m2 - jnp.square(mu)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return x2, (y * scale + bias).astype(x.dtype)

    def v_flat2d(x, br):
        x2 = x + br
        xf = x2.reshape(-1, 768).astype(jnp.float32)
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return x2, ((y * scale + bias).astype(x.dtype)).reshape(x.shape)

    def v_bf16_sum(x, br):
        # stats via dtype-accumulated sums straight off the bf16 array
        x2 = x + br
        mu = jnp.mean(x2, axis=-1, keepdims=True, dtype=jnp.float32)
        m2 = jnp.mean(
            x2.astype(jnp.float32) * x2.astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        var = m2 - jnp.square(mu)
        y = (x2.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
        return x2, (y * scale + bias).astype(x.dtype)

    def v_matmul_stats(x, br):
        # stats via MXU: ones-matmul computes sum and sum-of-squares
        x2 = x + br
        xf = x2.astype(jnp.float32)
        ones = jnp.ones((768, 128), jnp.float32) / 768.0
        mu = (xf @ ones)[..., :1]
        m2 = ((xf * xf) @ ones)[..., :1]
        var = m2 - jnp.square(mu)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return x2, (y * scale + bias).astype(x.dtype)

    variants = {
        "current (2-pass var)": v_current,
        "fast var (E[x2]-mu2)": v_fast_var,
        "flattened 2D": v_flat2d,
        "bf16-in f32-acc sums": v_bf16_sum,
        "MXU ones-matmul stats": v_matmul_stats,
    }
    for name, f in variants.items():
        def fn(x, br, f=f):
            def body(i, carry):
                x2, acc = carry
                xi = x2 + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                nx, y = f(xi, br)
                return nx, acc + y[0, 0, 0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
            return acc
        timed(fn, x, br, flops_per_iter=float(nbytes), label=f"res+LN {name}",
              unit="TB/s(traffic)")  # timed() divides by 1e12


def probe_bw():
    """Achievable HBM bandwidth through an elementwise pass (read+write)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (25344, 768), jnp.bfloat16)
    nbytes = float(2 * x.size * x.dtype.itemsize)

    def fn(x):
        def body(i, carry):
            x, acc = carry
            y = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
            return y, acc + y[0, 0].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
        return acc

    timed(fn, x, flops_per_iter=nbytes, label="copy r+w bandwidth",
          unit="TB/s")


def probe_floor():
    """Is there a fixed per-op floor?  Time an elementwise pass at 4 sizes;
    linear scaling = bandwidth-bound, flat = op-overhead-bound."""
    for rows in (1584, 6336, 25344, 101376):
        x = jax.random.normal(jax.random.PRNGKey(0), (rows, 768), jnp.bfloat16)
        nbytes = float(2 * x.size * x.dtype.itemsize)

        def fn(x):
            def body(i, carry):
                x, acc = carry
                y = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                return y, acc + y[0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
            return acc

        timed(fn, x, flops_per_iter=nbytes, label=f"copy r+w rows={rows}",
              unit="TB/s")


def probe_miniblock():
    """Reproduce the in-model residual+LN+matmul pattern that traces at
    2.05 ms/site (convert_reduce_fusion) vs 0.86 ms isolated, and test
    fusion-shape variants against it."""
    shape = (1, 128, 197, 768) if _ON_TPU else (1, 4, 197, 768)
    G, B, S, D = shape
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
    br = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(2), (1, D, 3 * D), jnp.bfloat16)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    # per iter: residual+LN traffic + the qkv matmul
    flops = 2.0 * G * B * S * D * 3 * D

    def ln(xf):
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def v_model(x, br):
        # the model pattern: x2 = x + branch; y = LN(x2); qkv = y @ w
        x2 = x + br
        y = ln(x2.astype(jnp.float32)).astype(x.dtype)
        qkv = jnp.einsum("gbsi,gio->gbso", y, w)
        return x2, qkv

    def v_barrier(x, br):
        x2 = x + br
        x2, = jax.lax.optimization_barrier((x2,))
        y = ln(x2.astype(jnp.float32)).astype(x.dtype)
        qkv = jnp.einsum("gbsi,gio->gbso", y, w)
        return x2, qkv

    def v_flat(x, br):
        x2 = (x + br).reshape(-1, D)
        y = ln(x2.astype(jnp.float32)).astype(x.dtype)
        qkv = (y @ w[0]).reshape(G, B, S, 3 * D)
        return x2.reshape(shape), qkv

    def v_flat_barrier(x, br):
        x2 = (x + br).reshape(-1, D)
        x2, = jax.lax.optimization_barrier((x2,))
        y = ln(x2.astype(jnp.float32)).astype(x.dtype)
        qkv = (y @ w[0]).reshape(G, B, S, 3 * D)
        return x2.reshape(shape), qkv

    for name, f in {
        "model pattern": v_model,
        "opt-barrier": v_barrier,
        "flat 2D": v_flat,
        "flat 2D + barrier": v_flat_barrier,
    }.items():
        def fn(x, br, f=f):
            def body(i, carry):
                x, acc = carry
                xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                x2, qkv = f(xi, br)
                return x2, acc + qkv[0, 0, 0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
            return acc
        timed(fn, x, br, flops_per_iter=flops, label=f"miniblock {name}")


def probe_fc2_fusion():
    """Reproduce the REAL in-model pathology: the fc2 matmul gets the
    residual-add + next-LN statistics fused in as epilogue
    (convert_reduce_fusion, 2.05 ms/site vs ~0.7 ms for a standalone fc2
    dot).  Test optimization_barrier placements that force the dot to emit
    standalone."""
    B, S, D, F = (128, 197, 768, 3072) if _ON_TPU else (4, 197, 768, 3072)
    h = jax.random.normal(jax.random.PRNGKey(0), (1, B, S, F), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, B, S, D), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(2), (1, F, D), jnp.bfloat16) * 0.02
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    flops = 2.0 * B * S * F * D

    def ln(xf):
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def tail(x2):
        y = ln(x2.astype(jnp.float32)).astype(x2.dtype)
        return x2, y

    def v_natural(h, x):
        fc2 = jnp.einsum("gbsf,gfd->gbsd", h, w2)
        return tail(x + fc2)

    def v_barrier_dot(h, x):
        fc2 = jnp.einsum("gbsf,gfd->gbsd", h, w2)
        fc2, = jax.lax.optimization_barrier((fc2,))
        return tail(x + fc2)

    def v_barrier_res(h, x):
        fc2 = jnp.einsum("gbsf,gfd->gbsd", h, w2)
        x2 = x + fc2
        x2, = jax.lax.optimization_barrier((x2,))
        return tail(x2)

    for name, f in {
        "natural (model)": v_natural,
        "barrier after dot": v_barrier_dot,
        "barrier after residual": v_barrier_res,
    }.items():
        def fn(h, x, f=f):
            def body(i, carry):
                x, acc = carry
                hi = h + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                x2, y = f(hi, x)
                return x2, acc + y[0, 0, 0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
            return acc
        timed(fn, h, x, flops_per_iter=flops, label=f"fc2+res+LN {name}")


def probe_attn3():
    """Round-3 attention candidates (VERDICT r2 #1): the XLA core runs ~14 ms
    vs a ~5.6 ms floor.  Levers that were NOT measured in round 2: bf16 score
    storage (the f32 [128,12,197,197] scores cost ~714 MB/step of softmax
    traffic), fewer softmax passes (ones-augmented V folds the normalizer
    into the PV matmul), and feeding 128-aligned shapes so XLA does not
    relayout the odd S=197 per matmul."""
    B, S, H, Dh = (128, 197, 12, 64) if _ON_TPU else (4, 197, 12, 64)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, Dh), jnp.bfloat16)
    flops = 2.0 * B * H * S * S * Dh * 2
    scale = Dh**-0.5

    from prcv2025reid_tpu.ops.attention import xla_attention_bshd

    def v_bf16_store(q, k, v):
        # scores kept bf16 in HBM; softmax statistics still f32 via convert
        # fused into the reductions
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.bfloat16)
        m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
        p = jnp.exp(s.astype(jnp.float32) * scale - m * scale)
        p = (p / p.sum(axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def v_bf16_all(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.bfloat16)
        p = jax.nn.softmax(s * jnp.bfloat16(scale), axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def v_ones_aug(q, k, v):
        # unnormalized exp scores; the softmax denominator rides the PV
        # matmul as an extra ones-column of V — one fewer [S,S] reduction
        # pass.  max subtraction kept (one fused reduce) for range safety.
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.bfloat16)
        m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
        p = jnp.exp((s.astype(jnp.float32) - m) * scale).astype(jnp.bfloat16)
        v_aug = jnp.concatenate(
            [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1
        )
        o = jnp.einsum("bhqk,bkhe->bqhe", p, v_aug)
        return o[..., :Dh] / jnp.maximum(o[..., Dh:], 1e-9)

    def v_ones_aug_nomax(q, k, v):
        # zero [S,S] reduction passes: exp without max subtraction (safe for
        # |logits*scale| < 88 in f32), denominator via the ones column
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.bfloat16)
        p = jnp.exp(s.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        v_aug = jnp.concatenate(
            [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1
        )
        o = jnp.einsum("bhqk,bkhe->bqhe", p, v_aug)
        return o[..., :Dh] / jnp.maximum(o[..., Dh:], 1e-9)

    Sp = 256
    neg = jnp.zeros((Sp,), jnp.float32).at[S:].set(-1e9)

    def v_padded256(q, k, v):
        # feed the matmuls 128-aligned shapes: pad K/V length once, mask the
        # pad keys additively; q rows stay 197
        pad = ((0, 0), (0, Sp - S), (0, 0), (0, 0))
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kp,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s * scale + neg, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vp)

    def v_padded256_bf16(q, k, v):
        pad = ((0, 0), (0, Sp - S), (0, 0), (0, 0))
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kp,
                       preferred_element_type=jnp.bfloat16)
        m = jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True)
        p = jnp.exp((s.astype(jnp.float32) - m) * scale + neg)
        p = (p / p.sum(axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jnp.einsum("bhqk,bkhd->bqhd", p, vp)

    ref = np.asarray(xla_attention_bshd(q, k, v), np.float32)
    variants = {
        "baseline bshd f32 (model)": xla_attention_bshd,
        "bf16 scores, f32 stats": v_bf16_store,
        "bf16 everything": v_bf16_all,
        "ones-aug denom (1 reduce)": v_ones_aug,
        "ones-aug nomax (0 reduce)": v_ones_aug_nomax,
        "padded-256 keys f32": v_padded256,
        "padded-256 bf16 scores": v_padded256_bf16,
    }
    for name, f in variants.items():
        try:
            got = np.asarray(f(q, k, v), np.float32)
            err = float(np.max(np.abs(got - ref)))
        except Exception as e:
            print(f"attn3 {name}: FAILED {type(e).__name__}: {str(e)[:100]}")
            continue

        def fn(q, k, v, f=f):
            def body(i, acc):
                qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                o = f(qi, k, v)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        timed(fn, q, k, v, flops_per_iter=flops,
              label=f"attn3 {name} |err|{err:.4f}")


def probe_fc2b():
    """Is the unexplained ~0.5 ms/site of the in-model fc2+res+LN fusions the
    GELU (erf) being fused into the fc2 matmul's operand load?  Compare fc2
    fed a precomputed h vs fc2(gelu(pre)) where XLA may fold the erf into the
    dot prologue, and test a barrier that forces GELU to materialize."""
    B, S, D, F = (128, 197, 768, 3072) if _ON_TPU else (4, 197, 768, 3072)
    pre = jax.random.normal(jax.random.PRNGKey(0), (1, B, S, F), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, B, S, D), jnp.bfloat16)
    w2 = jax.random.normal(jax.random.PRNGKey(2), (1, F, D), jnp.bfloat16) * 0.02
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    flops = 2.0 * B * S * F * D

    def ln(xf):
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def tail(x2):
        return x2, ln(x2.astype(jnp.float32)).astype(x2.dtype)

    def v_pre_h(h, x):
        fc2 = jnp.einsum("gbsf,gfd->gbsd", h, w2)
        return tail(x + fc2)

    def v_gelu_fused(h, x):
        g = jax.nn.gelu(h, approximate=False)
        fc2 = jnp.einsum("gbsf,gfd->gbsd", g, w2)
        return tail(x + fc2)

    def v_gelu_barrier(h, x):
        g = jax.nn.gelu(h, approximate=False)
        g, = jax.lax.optimization_barrier((g,))
        fc2 = jnp.einsum("gbsf,gfd->gbsd", g, w2)
        return tail(x + fc2)

    for name, f in {
        "fc2(h) precomputed": v_pre_h,
        "fc2(gelu(pre)) fused": v_gelu_fused,
        "fc2(gelu(pre)) +barrier": v_gelu_barrier,
    }.items():
        def fn(h, x, f=f):
            def body(i, carry):
                x, acc = carry
                hi = h + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                x2, y = f(hi, x)
                return x2, acc + y[0, 0, 0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
            return acc
        timed(fn, pre, x, flops_per_iter=flops, label=f"fc2b {name}")


def probe_fc2c():
    """The full MLP chain fc1 -> GELU -> fc2 (+res+LN) at model shapes: what
    does the erf cost inside XLA's chosen fusion, and do cheaper GELU
    formulations (bf16-accurate minimax erf polynomial, tanh approx,
    sigmoid approx) recover it?  fc2b showed gelu-in-fc2-prologue costs
    81 -> 47 TFLOP/s; this measures the end-to-end chain."""
    B, S, D, F = (128, 197, 768, 3072) if _ON_TPU else (4, 197, 768, 3072)
    y = jax.random.normal(jax.random.PRNGKey(0), (1, B, S, D), jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, B, S, D), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(2), (1, D, F), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(3), (1, F, D), jnp.bfloat16) * 0.02
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    flops = 2.0 * B * S * F * D * 2

    def ln(xf):
        mu = xf.mean(axis=-1, keepdims=True)
        var = jnp.square(xf - mu).mean(axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    from prcv2025reid_tpu.ops.kernel_math import gelu_poly_bf16

    def g_erf(h):
        return jax.nn.gelu(h, approximate=False)

    def g_poly(h):
        return gelu_poly_bf16(h)

    def g_tanh(h):
        return jax.nn.gelu(h, approximate=True)

    def g_sig(h):
        return h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(h.dtype)

    for name, g in {"erf": g_erf, "poly9": g_poly, "tanh": g_tanh,
                    "sigmoid": g_sig}.items():
        def f(y, x, g=g):
            h = g(jnp.einsum("gbsi,gif->gbsf", y, w1))
            fc2 = jnp.einsum("gbsf,gfd->gbsd", h, w2)
            x2 = x + fc2
            return x2, ln(x2.astype(jnp.float32)).astype(x2.dtype)

        def fn(y, x, f=f):
            def body(i, carry):
                x, acc = carry
                yi = y + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                x2, out = f(yi, x)
                return x2, acc + out[0, 0, 0, 0].astype(jnp.float32)
            _, acc = jax.lax.fori_loop(0, ITERS, body, (x, jnp.float32(0.0)))
            return acc
        timed(fn, y, x, flops_per_iter=flops, label=f"fc1+gelu({name})+fc2+res+LN")


def probe_gelu_bwd():
    """Train-step MLP chain fwd+bwd at train shapes: does storing the erf
    residual (ops/kernel_math.gelu_stored) beat XLA's backward erf
    rematerialization (the ~26 ms 'GELU recompute chains' of the round-2
    train trace)?"""
    from prcv2025reid_tpu.ops.kernel_math import gelu_stored

    # train shapes: G*B*S rows at 8x4 batch = 4*32*197
    R, D, F = (25216, 768, 3072) if _ON_TPU else (512, 768, 3072)
    x = jax.random.normal(jax.random.PRNGKey(0), (R, D), jnp.bfloat16)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (D, F), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(2), (F, D), jnp.bfloat16) * 0.02
    # fwd 2 matmuls + bwd 4 matmuls (dx1, dw1, dx2, dw2)
    flops = 2.0 * R * D * F * 2 * 3

    def make(g):
        def loss(x, w1, w2):
            h = g(x @ w1)
            y = h @ w2
            return jnp.sum(y.astype(jnp.float32) * y.astype(jnp.float32))

        grad = jax.grad(loss, argnums=(0, 1, 2))

        def fn(x, w1, w2):
            def body(i, acc):
                xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                dx, dw1, dw2 = grad(xi, w1, w2)
                return acc + dx[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        return fn

    timed(make(lambda h: jax.nn.gelu(h, approximate=False)), x, w1, w2,
          flops_per_iter=flops, label="mlp fwd+bwd erf (XLA remat)")
    timed(make(gelu_stored), x, w1, w2,
          flops_per_iter=flops, label="mlp fwd+bwd gelu_stored")
    timed(make(lambda h: jax.nn.gelu(h, approximate=True)), x, w1, w2,
          flops_per_iter=flops, label="mlp fwd+bwd tanh (ref: not exact)")


def probe_attn4():
    """Round-3 follow-up: hlo_attr shows attn/split at ~0.8 ms/layer — the
    last-axis jnp.split of the packed [N,S,3D] QKV materializes three
    strided copies.  Candidates: leading-3-axis projection (the W reshape
    makes q/k/v contiguous views), unsplit packed reshape, and three
    separate projections.  Measures projection + split + onesaug core."""
    B, S, H, Dh = (160, 197, 12, 64) if _ON_TPU else (4, 197, 4, 16)
    D = H * Dh
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (D, 3 * D), jnp.bfloat16) * 0.03
    b = jnp.zeros((3 * D,), jnp.bfloat16)
    flops = 2.0 * B * S * D * 3 * D + 2.0 * B * H * S * S * Dh * 2

    from prcv2025reid_tpu.ops.attention import xla_attention_bshd_onesaug

    def core(q, k, v):
        return xla_attention_bshd_onesaug(
            q.reshape(B, S, H, Dh), k.reshape(B, S, H, Dh),
            v.reshape(B, S, H, Dh),
        )

    def v_split(x):  # current model path
        qkv = jnp.einsum("bsi,io->bso", x, w) + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return core(q, k, v)

    def v_reshape5(x):  # free reshape [B,S,3,H,Dh], strided unstack
        qkv = (jnp.einsum("bsi,io->bso", x, w) + b).reshape(B, S, 3, H, Dh)
        return xla_attention_bshd_onesaug(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        )

    w3 = w.reshape(D, 3, D)
    b3 = b.reshape(3, 1, 1, D)

    def v_lead3(x):  # leading-3 output: q/k/v contiguous views
        qkv = jnp.einsum("bsi,iko->kbso", x, w3) + b3
        return core(qkv[0], qkv[1], qkv[2])

    wq, wk, wv = jnp.split(w, 3, axis=1)
    bq = jnp.zeros((D,), jnp.bfloat16)

    def v_three(x):  # three separate projections, no split
        q = jnp.einsum("bsi,io->bso", x, wq) + bq
        k = jnp.einsum("bsi,io->bso", x, wk) + bq
        v = jnp.einsum("bsi,io->bso", x, wv) + bq
        return core(q, k, v)

    ref = np.asarray(v_split(x), np.float32)
    for name, f in {
        "packed + split (model)": v_split,
        "reshape5 strided unstack": v_reshape5,
        "leading-3 einsum views": v_lead3,
        "three separate projs": v_three,
    }.items():
        err = float(np.max(np.abs(np.asarray(f(x), np.float32) - ref)))

        def fn(x, f=f):
            def body(i, acc):
                xi = x + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                o = f(xi)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        timed(fn, x, flops_per_iter=flops, label=f"attn4 {name} |err|{err:.4f}")


def probe_attn5():
    """Round-3 follow-up #2: the round-3 trace attributes ~4 ms/step to the
    onesaug normalize (div) + reshapes feeding the out projection — the
    [B,S,H,65] PV output is sliced, divided by the denominator column, and
    re-tiled to [B,S,768] before the out-proj matmul.  Candidates fold the
    per-head normalization into the out-proj contraction (zero-padded
    [H,65,D] weight) so the normalized tensor is never materialized.
    Measures the onesaug core + out projection chain."""
    B, S, H, Dh = (160, 197, 12, 64) if _ON_TPU else (4, 197, 4, 16)
    D = H * Dh
    kq, kk, kv, kw = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (B, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, Dh), jnp.bfloat16)
    wo = jax.random.normal(kw, (D, D), jnp.bfloat16) * 0.03
    bo = jnp.zeros((D,), jnp.bfloat16)
    scale = Dh**-0.5
    flops = 2.0 * B * H * S * S * Dh * 2 + 2.0 * B * S * D * D

    def pv65(q, k, v):  # onesaug core up to (unnormalized out, denom col)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        p = jnp.exp(s.astype(jnp.float32) * scale).astype(q.dtype)
        v_aug = jnp.concatenate(
            [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1
        )
        return jnp.einsum("bhqk,bkhe->bqhe", p, v_aug)

    def v_model(q, k, v):  # current: div, slice, reshape, out-proj matmul
        o = pv65(q, k, v)
        denom = jnp.maximum(o[..., Dh:], 1e-8)
        a = (o[..., :Dh] / denom).reshape(B, S, D)
        return jnp.einsum("bsi,io->bso", a, wo) + bo

    wo_h = wo.reshape(H, Dh, D)
    wo65 = jnp.concatenate([wo_h, jnp.zeros((H, 1, D), wo.dtype)], axis=1)

    def v_fold(q, k, v):  # normalization folded into the contraction
        o = pv65(q, k, v)
        r = jnp.maximum(o[..., Dh], 1e-8)
        return jnp.einsum("bqhe,bqh,heD->bqD", o, 1.0 / r, wo65) + bo

    def v_fold_slice(q, k, v):  # slice first, fold div, [H,Dh,D] weight
        o = pv65(q, k, v)
        r = jnp.maximum(o[..., Dh], 1e-8)
        return jnp.einsum("bqhd,bqh,hdD->bqD", o[..., :Dh], 1.0 / r, wo_h) + bo

    def v_einsum4(q, k, v):  # explicit div, reshape-free 4d contraction
        o = pv65(q, k, v)
        denom = jnp.maximum(o[..., Dh:], 1e-8)
        a = o[..., :Dh] / denom
        return jnp.einsum("bqhd,hdD->bqD", a, wo_h) + bo

    ref = np.asarray(v_model(q, k, v), np.float32)
    for name, f in {
        "div+reshape+matmul (model)": v_model,
        "fold-norm [H,65,D] weight": v_fold,
        "fold-norm sliced [H,Dh,D]": v_fold_slice,
        "div + 4d einsum": v_einsum4,
    }.items():
        err = float(np.max(np.abs(np.asarray(f(q, k, v), np.float32) - ref)))

        def fn(q, f=f):
            def body(i, acc):
                qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                o = f(qi, k, v)
                return acc + o[0, 0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

        timed(fn, q, flops_per_iter=flops, label=f"attn5 {name} |err|{err:.4f}")


def probe_attn6():
    """Round-4 last eval-headroom candidate (VERDICT r3 #8): does a
    head-folded [B*H, S, Dh] batched-contraction layout beat the model's
    [B, S, H, Dh] einsum form for the scores/PV pair?  The hypothesis: a
    3-D dot_general with one fused batch dim might tile the odd S=197
    operands differently than the 4-D two-batch-dim form.  All variants
    compute the SAME onesaug-nomax math (ops/attention.py::
    xla_attention_bshd_onesaug); transposes needed to reach a layout are
    timed as part of that variant — they are its real cost."""
    B, S, H, Dh = (160, 197, 12, 64) if _ON_TPU else (4, 197, 4, 16)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, S, H, Dh), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, H, Dh), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, H, Dh), jnp.bfloat16)
    flops = 2.0 * B * H * S * S * Dh * 2
    scale = Dh**-0.5

    from prcv2025reid_tpu.ops.attention import xla_attention_bshd_onesaug

    def _finish(o):  # shared slice/normalize tail, [.., 65] -> [.., 64]
        return o[..., :Dh] / jnp.maximum(o[..., Dh:], 1e-8)

    def v_model(q, k, v):  # current core: 4-D einsums, two batch dims
        return xla_attention_bshd_onesaug(q, k, v)

    def v_headfold(q, k, v):  # [B*H, S, Dh] 3-D dot_general, one batch dim
        qf = q.transpose(0, 2, 1, 3).reshape(B * H, S, Dh)
        kf = k.transpose(0, 2, 1, 3).reshape(B * H, S, Dh)
        vf = v.transpose(0, 2, 1, 3).reshape(B * H, S, Dh)
        s = jnp.einsum("nqd,nkd->nqk", qf, kf)
        p = jnp.exp(s.astype(jnp.float32) * scale).astype(q.dtype)
        v_aug = jnp.concatenate(
            [vf, jnp.ones((B * H, S, 1), vf.dtype)], axis=-1
        )
        o = jnp.einsum("nqk,nke->nqe", p, v_aug)
        return _finish(o).reshape(B, H, S, Dh).transpose(0, 2, 1, 3)

    def v_bhsd(q, k, v):  # explicit [B, H, S, Dh] transposes, 4-D einsums
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kt)
        p = jnp.exp(s.astype(jnp.float32) * scale).astype(q.dtype)
        v_aug = jnp.concatenate(
            [vt, jnp.ones(vt.shape[:-1] + (1,), vt.dtype)], axis=-1
        )
        o = jnp.einsum("bhqk,bhke->bhqe", p, v_aug)
        return _finish(o).transpose(0, 2, 1, 3)

    def v_seqfold(q, k, v):  # fold B into S for the PV only: [H, B*S, 65]
        # scores stay the model form; PV contracts per-head with the whole
        # batch as rows — N=65 lane waste unchanged but M is huge
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        p = jnp.exp(s.astype(jnp.float32) * scale).astype(q.dtype)
        v_aug = jnp.concatenate(
            [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1
        )
        o = jnp.einsum("bhqk,bkhe->bqhe", p, v_aug)
        return _finish(o)

    ref = np.asarray(v_model(q, k, v), np.float32)
    for name, f in {
        "model bshd 4-D einsums": v_model,
        "head-folded [B*H,S,Dh] 3-D": v_headfold,
        "bhsd transposed 4-D": v_bhsd,
        "model-form control": v_seqfold,
    }.items():
        try:
            got = np.asarray(f(q, k, v), np.float32)
            err = float(np.max(np.abs(got - ref)))
        except Exception as e:
            print(f"attn6 {name}: FAILED {type(e).__name__}: {str(e)[:100]}")
            continue

        def fn(q, k, v, f=f):
            def body(i, acc):
                qi = q + (i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3))
                o = f(qi, k, v)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
        timed(fn, q, k, v, flops_per_iter=flops,
              label=f"attn6 {name} |err|{err:.4f}")


PROBES = {
    "attn6": probe_attn6,
    "fc2_fusion": probe_fc2_fusion,
    "attn5": probe_attn5,
    "attn3": probe_attn3,
    "fc2b": probe_fc2b,
    "fc2c": probe_fc2c,
    "gelu_bwd": probe_gelu_bwd,
    "attn4": probe_attn4,
    "xla_bf16": probe_xla_bf16,
    "xla_int8": probe_xla_int8,
    "pallas_bf16": probe_pallas_bf16,
    "pallas_int8": probe_pallas_int8,
    "attn": probe_attn,
    "ln_quant": probe_ln_quant,
    "ln_variants": probe_ln_variants,
    "bw": probe_bw,
    "miniblock": probe_miniblock,
    "floor": probe_floor,
    "attn2": probe_attn2,
    "pallas_sweep": probe_pallas_sweep,
}


def main():
    enable_compile_cache()
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(PROBES)
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    for name in names:
        try:
            PROBES[name]()
        except Exception as e:  # one broken probe must not kill the rest
            print(f"probe {name} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
