"""Fused residual+LN kernel and the fused-stream trunk path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.models.encoder import UnifiedEncoder
from prcv2025reid_tpu.ops.fused_resln import fused_residual_ln


class TestKernel:
    def test_matches_dense_math(self, rng):
        N, D = 37, 16
        x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(D,)) + 1.0, jnp.float32)
        bias = jnp.asarray(rng.normal(size=(D,)), jnp.float32)
        xn, y = fused_residual_ln(x, b, g, bias, 1e-5, 16, True)
        want_xn = x + b
        xf = want_xn
        mu = xf.mean(axis=1, keepdims=True)
        var = jnp.square(xf - mu).mean(axis=1, keepdims=True)
        want_y = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + bias
        np.testing.assert_allclose(np.asarray(xn), np.asarray(want_xn), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(y), np.asarray(want_y), rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference(self, rng):
        N, D = 12, 8
        x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
        g = jnp.asarray(rng.normal(size=(D,)) + 1.0, jnp.float32)
        bias = jnp.asarray(rng.normal(size=(D,)), jnp.float32)

        def loss_fused(x, b, g, bias):
            xn, y = fused_residual_ln(x, b, g, bias, 1e-5, 8, True)
            return (xn * 0.3).sum() + (y * 0.7).sum()

        def loss_ref(x, b, g, bias):
            xn = x + b
            mu = xn.mean(axis=1, keepdims=True)
            var = jnp.square(xn - mu).mean(axis=1, keepdims=True)
            y = (xn - mu) * jax.lax.rsqrt(var + 1e-5) * g + bias
            return (xn * 0.3).sum() + (y * 0.7).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, b, g, bias)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, b, g, bias)
        for a, c in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=2e-4, atol=2e-4)


class TestFusedTrunk:
    def test_fused_stream_matches_unfused(self, rng):
        kw = dict(
            embed_dim=64, num_layers=3, num_heads=4, mlp_dim=128,
            image_size=32, patch_size=16, fusion_dim=32,
            text_width=32, text_layers=1, text_heads=4, text_mlp_dim=64,
            text_vocab=100, context_length=8, dtype=jnp.float32,
            attn_impl="xla", mlp_impl="xla",
        )
        enc_x = UnifiedEncoder(resln_impl="xla", **kw)
        enc_f = UnifiedEncoder(resln_impl="pallas_interpret", **kw)
        imgs = jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32)
        toks = jnp.zeros((2, 8), jnp.int32)
        params = enc_x.init(jax.random.PRNGKey(0), imgs, toks)
        vx, _ = enc_x.apply(params, imgs, toks)
        vf, _ = enc_f.apply(params, imgs, toks)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=2e-4, atol=2e-4)

    def test_param_trees_identical(self):
        kw = dict(
            embed_dim=32, num_layers=2, num_heads=4, mlp_dim=64,
            image_size=32, patch_size=16, fusion_dim=32,
            text_width=32, text_layers=1, text_heads=4, text_mlp_dim=64,
            text_vocab=100, context_length=8, dtype=jnp.float32,
        )
        imgs = jnp.zeros((1, 4, 32, 32, 3))
        toks = jnp.zeros((1, 8), jnp.int32)
        a = UnifiedEncoder(resln_impl="xla", **kw).init(jax.random.PRNGKey(0), imgs, toks)
        b = UnifiedEncoder(resln_impl="pallas_interpret", **kw).init(
            jax.random.PRNGKey(0), imgs, toks
        )
        ta = jax.tree.map(lambda v: v.shape, a)
        tb = jax.tree.map(lambda v: v.shape, b)
        assert ta == tb
