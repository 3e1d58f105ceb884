"""Fused MLP kernel: interpret-mode parity with the XLA MERMlp path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.models.mer import MERMlp
from prcv2025reid_tpu.ops.fused_mlp import fused_mlp


class TestFusedMlpKernel:
    def test_matches_dense_math(self, rng):
        G, N, D, F = 2, 37, 16, 32
        x = jnp.asarray(rng.normal(size=(G, N, D)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(G, D, F)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(G, F)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(G, F, D)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(G, D)) * 0.1, jnp.float32)
        got = fused_mlp(x, w1, b1, w2, b2, 16, True)
        h = jax.nn.gelu(
            jnp.einsum("gnd,gdf->gnf", x, w1) + b1[:, None], approximate=False
        )
        want = jnp.einsum("gnf,gfd->gnd", h, w2) + b2[:, None]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_row_padding(self, rng):
        """N not a multiple of block_rows pads internally and slices back."""
        G, N, D, F = 1, 10, 8, 16
        x = jnp.asarray(rng.normal(size=(G, N, D)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(G, D, F)), jnp.float32)
        b1 = jnp.zeros((G, F))
        w2 = jnp.asarray(rng.normal(size=(G, F, D)), jnp.float32)
        b2 = jnp.zeros((G, D))
        got = fused_mlp(x, w1, b1, w2, b2, 8, True)
        assert got.shape == (G, N, D)
        assert np.isfinite(np.asarray(got)).all()

    def test_gradients_match_xla(self, rng):
        G, N, D, F = 1, 12, 8, 16
        x = jnp.asarray(rng.normal(size=(G, N, D)), jnp.float32)
        w1 = jnp.asarray(rng.normal(size=(G, D, F)) * 0.2, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(G, F)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(G, F, D)) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(G, D)) * 0.1, jnp.float32)

        def loss_fused(*args):
            return fused_mlp(*args, 8, True).sum()

        def loss_ref(x, w1, b1, w2, b2):
            h = jax.nn.gelu(
                jnp.einsum("gnd,gdf->gnf", x, w1) + b1[:, None], approximate=False
            )
            return (jnp.einsum("gnf,gfd->gnd", h, w2) + b2[:, None]).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


class TestMERMlpImpls:
    def test_pallas_path_matches_xla_path(self, rng):
        G, B, S, D, F = 2, 3, 5, 16, 32
        x = jnp.asarray(rng.normal(size=(G, B, S, D)), jnp.float32)
        mlp_x = MERMlp(mlp_dim=F, num_experts=4, dtype=jnp.float32, impl="xla")
        params = mlp_x.init(jax.random.PRNGKey(0), x, (0, 2))
        want = mlp_x.apply(params, x, (0, 2))
        mlp_p = MERMlp(mlp_dim=F, num_experts=4, dtype=jnp.float32, impl="pallas_interpret")
        got = mlp_p.apply(params, x, (0, 2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    def test_param_tree_identical_across_impls(self):
        x = jnp.zeros((1, 2, 3, 16))
        a = MERMlp(mlp_dim=32, num_experts=4, impl="xla").init(jax.random.PRNGKey(0), x, (0,))
        b = MERMlp(mlp_dim=32, num_experts=4, impl="pallas_interpret").init(
            jax.random.PRNGKey(0), x, (0,)
        )
        ta = jax.tree.map(lambda v: (v.shape, str(v.dtype)), a)
        tb = jax.tree.map(lambda v: (v.shape, str(v.dtype)), b)
        assert ta == tb
