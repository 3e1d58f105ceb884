"""Mesh / sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4
tier e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
from prcv2025reid_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    pad_batch_to,
    replicate_state,
    shard_batch,
)
from prcv2025reid_tpu.parallel.ranking import sharded_topk, topk_reference
from prcv2025reid_tpu.training.param_groups import build_optimizer
from prcv2025reid_tpu.training.train_step import TrainState, make_train_step

TINY = dict(
    vision_hidden_dim=64,
    vision_layers=2,
    vision_heads=4,
    vision_mlp_dim=128,
    text_hidden_dim=32,
    text_layers=2,
    text_heads=4,
    text_mlp_dim=64,
    text_vocab_size=100,
    text_context_length=16,
    image_size=32,
    fusion_dim=32,
    sdm_semantic_dim=32,
    sdm_num_heads=4,
    fusion_num_heads=4,
    compute_dtype="float32",
    use_pallas_attention=False,
    drop_path=0.0,
)


class TestMesh:
    def test_create_mesh_all_devices(self):
        mesh = create_mesh()
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_shard_batch_layout(self):
        mesh = create_mesh()
        batch = {"x": np.ones((16, 3), np.float32)}
        sharded = shard_batch(batch, mesh)
        assert sharded["x"].sharding.spec == batch_sharding(mesh).spec

    def test_pad_batch(self):
        b = {"images": np.ones((6, 2)), "labels": np.zeros(6, np.int32)}
        p = pad_batch_to(b, 8)
        assert p["images"].shape == (8, 2)
        assert p["labels"][-1] == -1
        assert p["images"][-1].sum() == 0


class TestShardedTopK:
    def test_matches_reference(self, rng):
        mesh = create_mesh()
        q = rng.normal(size=(5, 16)).astype(np.float32)
        g = rng.normal(size=(100, 16)).astype(np.float32)
        scores, idx = sharded_topk(jnp.asarray(q), jnp.asarray(g), 10, mesh)
        ref_scores, ref_idx = topk_reference(q, g, 10)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)

    def test_gallery_not_divisible_by_mesh(self, rng):
        mesh = create_mesh()
        q = rng.normal(size=(3, 8)).astype(np.float32)
        g = rng.normal(size=(37, 8)).astype(np.float32)  # 37 % 8 != 0
        scores, idx = sharded_topk(jnp.asarray(q), jnp.asarray(g), 5, mesh)
        ref_scores, ref_idx = topk_reference(q, g, 5)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_tie_break_prefers_lower_index(self):
        mesh = create_mesh()
        q = np.asarray([[1.0, 0.0]], np.float32)
        g = np.tile(np.asarray([[1.0, 0.0]], np.float32), (16, 1))  # all tied
        _, idx = sharded_topk(jnp.asarray(q), jnp.asarray(g), 4, mesh)
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3])


class TestDataParallelTrainStep:
    def test_sharded_step_matches_single_device(self):
        """The SAME jitted step must give identical results with batch
        sharded over 8 devices vs. replicated on 1 — GSPMD handles the
        collectives; numerics must not drift."""
        config = TrainingConfig(**TINY)
        model = MultiModalReIDModel(config=config, num_classes=4, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        B = 8
        batch = {
            "images": rng.normal(size=(B, 4, 32, 32, 3)).astype(np.float32),
            "image_mask": np.ones((B, 4), np.float32),
            "text_tokens": np.ones((B, 16), np.int32),
            "text_mask": np.ones(B, np.float32),
            "labels": np.arange(B, dtype=np.int32) % 4,
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            batch["images"],
            batch["image_mask"],
            batch["text_tokens"],
            batch["text_mask"],
            train=False,
        )
        tx = build_optimizer(config, variables["params"], steps_per_epoch=10)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
        )
        step_fn = make_train_step(model, tx, config)

        # single device
        _, m_single = step_fn(state, jax.tree.map(jnp.asarray, batch),
                              jnp.float32(0.2), jnp.float32(0.2))

        # 8-device mesh
        mesh = create_mesh()
        state_r = replicate_state(state, mesh)
        batch_s = shard_batch(batch, mesh)
        new_state, m_mesh = step_fn(state_r, batch_s, jnp.float32(0.2), jnp.float32(0.2))

        for k in ("total_loss", "ce_loss", "sdm_loss", "train_top1"):
            np.testing.assert_allclose(
                float(m_single[k]), float(m_mesh[k]), rtol=1e-4, atol=1e-5
            )
        # params after the step must be replicated-consistent
        leaf = jax.tree_util.tree_leaves(new_state.params)[0]
        assert np.isfinite(np.asarray(leaf)).all()
