"""Parity tests for the fused block kernels (ops/fused_block.py).

Interpret mode on CPU; the real-chip speed story lives in
docs/performance.md.  Oracles are plain-JAX f32 reimplementations of the
folded block math (the same math the XLA MERBlock path computes).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.ops.fused_block import (
    _ln_f32,
    fused_ln_qkv,
    fused_out_mlp,
    quantize_weight,
)

G, T, D, F = 2, 70, 64, 128  # small but non-aligned T exercises padding


def _rand(key, shape, scale=1.0):
    return (jax.random.normal(jax.random.PRNGKey(key), shape) * scale).astype(
        jnp.float32
    )


@pytest.fixture(scope="module")
def data():
    return dict(
        x=_rand(0, (G, T, D)),
        attn=_rand(1, (G, T, D)),
        lns=1.0 + 0.1 * _rand(2, (D,)),
        lnb=0.1 * _rand(3, (D,)),
        wqkv=_rand(4, (G, D, 3 * D), 0.1),
        bqkv=0.1 * _rand(5, (G, 3 * D)),
        wo=_rand(6, (G, D, D), 0.1),
        bo=0.1 * _rand(7, (G, D)),
        w1=_rand(8, (G, D, F), 0.1),
        b1=0.1 * _rand(9, (G, F)),
        w2=_rand(10, (G, F, D), 0.1),
        b2=0.1 * _rand(11, (G, D)),
    )


def _qkv_oracle(d):
    y = _ln_f32(d["x"], d["lns"], d["lnb"])
    return jnp.einsum("gti,gio->gto", y, d["wqkv"]) + d["bqkv"][:, None, :]


def _out_mlp_oracle(d, wo=None, w1=None, w2=None):
    wo = d["wo"] if wo is None else wo
    w1 = d["w1"] if w1 is None else w1
    w2 = d["w2"] if w2 is None else w2
    x2 = d["x"] + jnp.einsum("gti,gio->gto", d["attn"], wo) + d["bo"][:, None, :]
    y = _ln_f32(x2, d["lns"], d["lnb"])
    h = jnp.einsum("gti,gif->gtf", y, w1) + d["b1"][:, None, :]
    h = 0.5 * h * (1.0 + jax.lax.erf(h * 0.7071067811865476))
    return x2 + jnp.einsum("gtf,gfd->gtd", h, w2) + d["b2"][:, None, :]


def test_ln_qkv_bf16_parity(data):
    out = fused_ln_qkv(
        data["x"], data["lns"], data["lnb"], data["wqkv"], data["bqkv"],
        "bf16", 32, True,
    )
    np.testing.assert_allclose(out, _qkv_oracle(data), rtol=2e-5, atol=2e-5)


def test_ln_qkv_int8_close(data):
    wq = quantize_weight(data["wqkv"])
    out = fused_ln_qkv(
        data["x"], data["lns"], data["lnb"], wq, data["bqkv"], "int8", 32, True
    )
    ref = _qkv_oracle(data)
    # int8 is approximate: check strong cosine alignment per row
    of = np.asarray(out, np.float64).reshape(-1, 3 * D)
    rf = np.asarray(ref, np.float64).reshape(-1, 3 * D)
    cos = (of * rf).sum(-1) / (
        np.linalg.norm(of, axis=-1) * np.linalg.norm(rf, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, cos.min()


def test_out_mlp_bf16_parity(data):
    out = fused_out_mlp(
        data["attn"], data["x"], data["wo"], data["bo"], data["lns"],
        data["lnb"], data["w1"], data["b1"], data["w2"], data["b2"],
        "bf16", 32, True,
    )
    np.testing.assert_allclose(out, _out_mlp_oracle(data), rtol=3e-5, atol=3e-5)


def test_out_mlp_int8_close(data):
    wo = quantize_weight(data["wo"])
    w1 = quantize_weight(data["w1"])
    w2 = quantize_weight(data["w2"])
    out = fused_out_mlp(
        data["attn"], data["x"], wo, data["bo"], data["lns"], data["lnb"],
        w1, data["b1"], w2, data["b2"], "int8", 32, True,
    )
    ref = _out_mlp_oracle(data)
    of = np.asarray(out, np.float64).reshape(-1, D)
    rf = np.asarray(ref, np.float64).reshape(-1, D)
    cos = (of * rf).sum(-1) / (
        np.linalg.norm(of, axis=-1) * np.linalg.norm(rf, axis=-1) + 1e-12
    )
    assert cos.min() > 0.995, cos.min()


def test_out_mlp_int8_mlp_closer_than_int8(data):
    """The mixed plan (out-proj bf16, fc1/fc2 int8) must be strictly more
    accurate than all-int8 — it removes two quantization stages (attn rows +
    out-proj columns) from the residual stream."""
    wo_q = quantize_weight(data["wo"])
    w1 = quantize_weight(data["w1"])
    w2 = quantize_weight(data["w2"])
    out_mixed = fused_out_mlp(
        data["attn"], data["x"], data["wo"], data["bo"], data["lns"],
        data["lnb"], w1, data["b1"], w2, data["b2"], "int8_mlp", 32, True,
    )
    out_full = fused_out_mlp(
        data["attn"], data["x"], wo_q, data["bo"], data["lns"], data["lnb"],
        w1, data["b1"], w2, data["b2"], "int8", 32, True,
    )
    ref = np.asarray(_out_mlp_oracle(data), np.float64).reshape(-1, D)

    def min_cos(o):
        of = np.asarray(o, np.float64).reshape(-1, D)
        return (
            (of * ref).sum(-1)
            / (np.linalg.norm(of, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-12)
        ).min()

    cm, cf = min_cos(out_mixed), min_cos(out_full)
    assert cm > 0.998, cm
    assert cm >= cf, (cm, cf)


def test_grad_with_bf16_inputs_has_primal_dtypes(data):
    """The production _fused_call passes bf16 weights AND biases; the custom
    VJP must return cotangents in the primal dtypes or JAX rejects them
    (regression: bias cotangents were forced to f32)."""
    cast = {k: v.astype(jnp.bfloat16) for k, v in data.items()}

    def loss_qkv(x, w, b):
        return fused_ln_qkv(
            x, cast["lns"], cast["lnb"], w, b, "bf16", 32, True
        ).astype(jnp.float32).sum()

    gx, gw, gb = jax.grad(loss_qkv, argnums=(0, 1, 2))(
        cast["x"], cast["wqkv"], cast["bqkv"]
    )
    assert gx.dtype == gw.dtype == gb.dtype == jnp.bfloat16
    assert all(bool(jnp.isfinite(g.astype(jnp.float32)).all()) for g in (gx, gw, gb))

    def loss_mlp(attn, bo, b1, b2):
        return fused_out_mlp(
            attn, cast["x"], cast["wo"], bo, cast["lns"], cast["lnb"],
            cast["w1"], b1, cast["w2"], b2, "bf16", 32, True,
        ).astype(jnp.float32).sum()

    ga, gbo, gb1, gb2 = jax.grad(loss_mlp, argnums=(0, 1, 2, 3))(
        cast["attn"], cast["bo"], cast["b1"], cast["b2"]
    )
    assert ga.dtype == gbo.dtype == gb1.dtype == gb2.dtype == jnp.bfloat16


def test_config_rejects_typoed_paths():
    from prcv2025reid_tpu.configs import TrainingConfig

    with pytest.raises(ValueError, match="block_impl"):
        TrainingConfig(block_impl="fused-int8")
    with pytest.raises(ValueError, match="attn_backend"):
        TrainingConfig(attn_backend="spash")
    TrainingConfig(block_impl="fused_int8", attn_backend="splash")  # valid


def test_ln_qkv_grad_matches_xla(data):
    def fused(x, s, b):
        return fused_ln_qkv(
            x, s, b, data["wqkv"], data["bqkv"], "bf16", 32, True
        ).sum()

    def ref(x, s, b):
        y = _ln_f32(x, s, b)
        return (
            jnp.einsum("gti,gio->gto", y, data["wqkv"])
            + data["bqkv"][:, None, :]
        ).sum()

    gf = jax.grad(fused, argnums=(0, 1, 2))(data["x"], data["lns"], data["lnb"])
    gr = jax.grad(ref, argnums=(0, 1, 2))(data["x"], data["lns"], data["lnb"])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def _small_trunk(block_impl):
    from prcv2025reid_tpu.models.vit import MERVisionTransformer

    return MERVisionTransformer(
        embed_dim=64,
        num_layers=2,
        num_heads=4,
        mlp_dim=128,
        patch_size=16,
        image_size=32,
        fusion_dim=32,
        modalities=("vis", "nir"),
        block_impl=block_impl,
    )


def test_model_fused_block_matches_xla():
    """Same params, block_impl='fused_interpret' vs 'xla' through the real
    trunk: identical embeddings (bf16-free CPU test, f32 math)."""
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    ref_model = _small_trunk("xla")
    variables = ref_model.init(jax.random.PRNGKey(1), imgs)
    ref = ref_model.apply(variables, imgs)
    out = _small_trunk("fused_interpret").apply(variables, imgs)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_model_fused_qkv_matches_xla():
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    ref_model = _small_trunk("xla")
    variables = ref_model.init(jax.random.PRNGKey(1), imgs)
    ref = ref_model.apply(variables, imgs)
    out = _small_trunk("fused_qkv_interpret").apply(variables, imgs)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_model_fused_int8_close_to_xla():
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    ref_model = _small_trunk("xla")
    variables = ref_model.init(jax.random.PRNGKey(1), imgs)
    ref = np.asarray(ref_model.apply(variables, imgs), np.float64)
    out = np.asarray(
        _small_trunk("fused_int8_interpret").apply(variables, imgs), np.float64
    )
    ref_flat = ref.reshape(-1, ref.shape[-1])
    out_flat = out.reshape(-1, out.shape[-1])
    cos = (ref_flat * out_flat).sum(-1) / (
        np.linalg.norm(ref_flat, axis=-1) * np.linalg.norm(out_flat, axis=-1)
        + 1e-12
    )
    assert cos.min() > 0.99, cos.min()


def test_model_fused_int8_mlp_closer_than_int8():
    """Through the real 2-layer trunk the mixed plan's worst-row cosine to
    the xla output must be at least the all-int8 path's."""
    imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
    ref_model = _small_trunk("xla")
    variables = ref_model.init(jax.random.PRNGKey(1), imgs)
    ref = np.asarray(ref_model.apply(variables, imgs), np.float64)
    ref_flat = ref.reshape(-1, ref.shape[-1])

    def min_cos(block_impl):
        out = np.asarray(
            _small_trunk(block_impl).apply(variables, imgs), np.float64
        ).reshape(-1, ref.shape[-1])
        return (
            (ref_flat * out).sum(-1)
            / (np.linalg.norm(ref_flat, axis=-1) * np.linalg.norm(out, axis=-1)
               + 1e-12)
        ).min()

    cm = min_cos("fused_int8_mlp_interpret")
    cf = min_cos("fused_int8_interpret")
    assert cm > 0.995, cm
    assert cm >= cf, (cm, cf)


def test_out_mlp_grad_matches_xla(data):
    def fused(attn, x):
        return fused_out_mlp(
            attn, x, data["wo"], data["bo"], data["lns"], data["lnb"],
            data["w1"], data["b1"], data["w2"], data["b2"], "bf16", 32, True,
        ).sum()

    def ref(attn, x):
        return _out_mlp_oracle({**data, "attn": attn, "x": x}).sum()

    gf = jax.grad(fused, argnums=(0, 1))(data["attn"], data["x"])
    gr = jax.grad(ref, argnums=(0, 1))(data["attn"], data["x"])
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
