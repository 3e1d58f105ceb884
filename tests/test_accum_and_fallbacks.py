"""Gradient accumulation, weighted-fusion fallback, multi-host helpers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
from prcv2025reid_tpu.parallel.mesh import (
    create_mesh,
    make_global_batch,
    process_local_indices,
)
from prcv2025reid_tpu.training.param_groups import build_optimizer
from prcv2025reid_tpu.training.train_step import (
    TrainState,
    make_train_step,
    make_weighted_embed_step,
)

from conftest import TINY_BASE

TINY = dict(TINY_BASE)


def _batch(B=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": jnp.asarray(rng.normal(size=(B, 4, 32, 32, 3)), jnp.float32),
        "image_mask": jnp.ones((B, 4), jnp.float32),
        "text_tokens": jnp.ones((B, 16), jnp.int32).at[:, 3].set(99),
        "text_mask": jnp.ones(B, jnp.float32),
        "labels": jnp.asarray([0, 0, 1, 1][:B], jnp.int32),
    }


def _setup(config):
    model = MultiModalReIDModel(config=config, num_classes=3, dtype=jnp.float32)
    b = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        b["images"],
        b["image_mask"],
        b["text_tokens"],
        b["text_mask"],
        train=False,
    )
    tx = build_optimizer(config, variables["params"], steps_per_epoch=10)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
    )
    return model, tx, state


class TestGradAccumulation:
    def test_params_update_only_at_boundary(self):
        config = TrainingConfig(**{**TINY, "gradient_accumulation_steps": 2})
        model, tx, state = _setup(config)
        step = make_train_step(model, tx, config)
        b = _batch()

        s1, _ = step(state, b, jnp.float32(0.0), jnp.float32(0.2))
        lora0 = state.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        lora1 = s1.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        np.testing.assert_array_equal(np.asarray(lora0), np.asarray(lora1))

        s2, _ = step(s1, b, jnp.float32(0.0), jnp.float32(0.2))
        lora2 = s2.params["encoder"]["vision"]["block_0"]["attn"]["q_proj"]["lora_B"]
        assert np.abs(np.asarray(lora2) - np.asarray(lora0)).max() > 0


class TestWeightedEmbed:
    def test_weighted_fusion_fallback(self):
        config = TrainingConfig(**TINY)
        model, tx, state = _setup(config)
        b = _batch()
        vars_ = {"params": state.params, "batch_stats": state.batch_stats}
        emb = make_weighted_embed_step(model, ("nir", "text"))
        feats = emb(vars_, b)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feats), axis=1), 1.0, rtol=1e-5
        )
        # must equal manual weighted sum of single-modality embeddings
        from prcv2025reid_tpu.training.train_step import make_combo_embed_step

        f_nir = np.asarray(make_combo_embed_step(model, ("nir",))(vars_, b))
        f_txt = np.asarray(make_combo_embed_step(model, ("text",))(vars_, b))
        want = f_nir * 1.0 + f_txt * 1.2
        want /= np.linalg.norm(want, axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(feats), want, rtol=1e-4, atol=1e-5)


class TestMultiHostHelpers:
    def test_make_global_batch_single_process(self):
        mesh = create_mesh()
        b = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
        g = make_global_batch(b, mesh)
        np.testing.assert_array_equal(np.asarray(g["x"]), b["x"])

    def test_process_local_indices(self):
        sl = process_local_indices(16, process_index=1, process_count=4)
        assert sl == slice(4, 8)
