"""Pallas attention kernels — interpret-mode correctness on CPU (the real
kernel is exercised on TPU; both code paths share the kernel bodies)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.ops.attention import xla_attention
from prcv2025reid_tpu.ops.pallas_attention import pallas_mha


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("shape", [(2, 4, 197, 64), (1, 2, 64, 32)])
def test_matches_xla(version, shape, rng):
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    got = pallas_mha(q, k, v, False, True, version)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("version", [1, 2])
def test_causal_matches_xla(version, rng):
    shape = (1, 2, 33, 16)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    got = pallas_mha(q, q, q, True, True, version)
    want = xla_attention(q, q, q, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_gradients_match_xla(rng):
    shape = (1, 2, 37, 16)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)

    def loss_pallas(q, k, v):
        return pallas_mha(q, k, v, False, True, 2).sum()

    def loss_xla(q, k, v):
        return xla_attention(q, k, v).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
