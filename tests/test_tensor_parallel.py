"""Tensor parallelism (parallel/tp.py) on the 8-device virtual CPU mesh.

A 2-D ('data', 'model') mesh shards qkv/fc1 kernels column-parallel and
out_proj/fc2 row-parallel (Megatron-style) purely via GSPMD param placement.
These tests pin (a) the spec rules, (b) that a TP-placed train step and eval
embed reproduce the 1-D data-parallel numerics, and (c) that params really
are distributed (shard shapes smaller than the leaf)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
from prcv2025reid_tpu.parallel.mesh import (
    MODEL_AXIS,
    create_mesh,
    data_axis_size,
    shard_batch,
)
from prcv2025reid_tpu.parallel.ranking import sharded_topk, topk_reference
from prcv2025reid_tpu.parallel.tp import (
    shard_state,
    shard_variables,
    tree_partition_specs,
)
from prcv2025reid_tpu.training.param_groups import build_optimizer
from prcv2025reid_tpu.training.train_step import (
    TrainState,
    make_combo_embed_step,
    make_train_step,
)

from conftest import TINY_BASE

TINY = dict(TINY_BASE)


def _make_model_and_batch(num_classes=4, B=8):
    config = TrainingConfig(**TINY)
    model = MultiModalReIDModel(config=config, num_classes=num_classes, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.normal(size=(B, 4, 32, 32, 3)).astype(np.float32),
        "image_mask": np.ones((B, 4), np.float32),
        "text_tokens": np.ones((B, 16), np.int32),
        "text_mask": np.ones(B, np.float32),
        "labels": np.arange(B, dtype=np.int32) % num_classes,
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["images"],
        batch["image_mask"],
        batch["text_tokens"],
        batch["text_mask"],
        train=False,
    )
    return config, model, batch, variables


def _tp_mesh(model_size=2):
    return create_mesh(model_axis_size=model_size)


class TestPartitionSpecRules:
    def test_vision_mer_projections(self):
        _, _, _, variables = _make_model_and_batch()
        specs = tree_partition_specs(variables["params"], model_size=2)
        flat = {
            "/".join(str(k.key) for k in path): spec
            for path, spec in jax.tree_util.tree_flatten_with_path(
                specs, is_leaf=lambda x: isinstance(x, P)
            )[0]
        }
        qkv_kernels = [k for k in flat if "q_proj" in k and k.endswith("shared/kernel")]
        assert qkv_kernels, f"no MER q_proj kernels found in {list(flat)[:5]}"
        for k in qkv_kernels:
            assert flat[k] == P(None, MODEL_AXIS), (k, flat[k])
        for k in flat:
            if "attn" in k and "out_proj" in k and k.endswith("shared/kernel"):
                assert flat[k] == P(MODEL_AXIS, None), (k, flat[k])
            if "mlp" in k and "fc1" in k and k.endswith("shared/kernel"):
                assert flat[k] == P(None, MODEL_AXIS), (k, flat[k])
            if "mlp" in k and "fc2" in k and k.endswith("shared/kernel"):
                assert flat[k] == P(MODEL_AXIS, None), (k, flat[k])
            # LoRA legs: column-parallel shards B's output, row-parallel A's input
            if "fc1" in k and k.endswith("lora_B"):
                assert flat[k] == P(None, None, MODEL_AXIS), (k, flat[k])
            if "fc2" in k and k.endswith("lora_A"):
                assert flat[k] == P(None, MODEL_AXIS, None), (k, flat[k])
            if "fc1" in k and k.endswith("lora_A"):
                assert flat[k] == P(), (k, flat[k])
            # non-projection leaves stay replicated
            if "ln1" in k or "ln_final" in k or "patch_embed" in k:
                assert flat[k] == P(), (k, flat[k])

    def test_indivisible_dims_fall_back_to_replicated(self):
        _, _, _, variables = _make_model_and_batch()
        # model_size 7 divides none of the tiny dims (64/128) -> all replicated
        specs = tree_partition_specs(variables["params"], model_size=7)
        for spec in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P)
        ):
            assert spec == P()


class TestTensorParallelNumerics:
    @pytest.fixture(scope="class")
    def setup(self):
        config, model, batch, variables = _make_model_and_batch()
        tx = build_optimizer(config, variables["params"], steps_per_epoch=10)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
        )
        return config, model, batch, variables, tx, state

    def test_train_step_matches_data_parallel(self, setup):
        config, model, batch, variables, tx, state = setup
        step_fn = make_train_step(model, tx, config)

        mesh_dp = create_mesh()  # 1-D over all 8 devices
        s_dp = shard_state(state, mesh_dp)  # replicated (no model axis)
        new_dp, m_dp = step_fn(
            s_dp, shard_batch(batch, mesh_dp), jnp.float32(0.2), jnp.float32(0.2)
        )

        mesh_tp = _tp_mesh(2)  # (4, 2): 4-way data x 2-way tensor
        assert data_axis_size(mesh_tp) == 4
        s_tp = shard_state(state, mesh_tp)
        new_tp, m_tp = step_fn(
            s_tp, shard_batch(batch, mesh_tp), jnp.float32(0.2), jnp.float32(0.2)
        )

        for k in ("total_loss", "ce_loss", "sdm_loss", "train_top1"):
            np.testing.assert_allclose(
                float(m_dp[k]), float(m_tp[k]), rtol=1e-4, atol=1e-5, err_msg=k
            )
        # updated params must agree leaf-by-leaf (f32 end to end)
        flat_dp = jax.tree_util.tree_leaves_with_path(new_dp.params)
        flat_tp = jax.tree_util.tree_leaves_with_path(new_tp.params)
        for (p1, a), (p2, b) in zip(flat_dp, flat_tp):
            assert p1 == p2
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=jax.tree_util.keystr(p1),
            )

    def test_params_actually_sharded(self, setup):
        config, model, batch, variables, tx, state = setup
        mesh_tp = _tp_mesh(2)
        s_tp = shard_state(state, mesh_tp)
        flat = jax.tree_util.tree_leaves_with_path(s_tp.params)
        sharded_leaves = 0
        for path, leaf in flat:
            key = jax.tree_util.keystr(path)
            shard_shape = leaf.sharding.shard_shape(leaf.shape)
            if "['fc1']" in key and key.endswith("['kernel']"):
                assert shard_shape[-1] == leaf.shape[-1] // 2, key
            if shard_shape != leaf.shape:
                sharded_leaves += 1
        assert sharded_leaves >= 8, f"only {sharded_leaves} leaves sharded"
        # optimizer moments follow the same placement (same tree key names)
        opt_flat = jax.tree_util.tree_leaves_with_path(s_tp.opt_state)
        opt_sharded = sum(
            1
            for _, leaf in opt_flat
            if hasattr(leaf, "sharding")
            and leaf.sharding.shard_shape(leaf.shape) != leaf.shape
        )
        assert opt_sharded >= 8, f"only {opt_sharded} optimizer leaves sharded"

    def test_eval_embed_matches_single_device(self, setup):
        config, model, batch, variables, tx, state = setup
        embed = make_combo_embed_step(model, ("vis",))
        ref = np.asarray(embed(variables, jax.tree.map(jnp.asarray, batch)))

        mesh_tp = _tp_mesh(2)
        v_tp = shard_variables(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            mesh_tp,
        )
        out = np.asarray(embed(v_tp, shard_batch(batch, mesh_tp)))
        np.testing.assert_allclose(ref, out, rtol=1e-4, atol=1e-5)


class TestRankingOn2DMesh:
    def test_sharded_topk_matches_oracle(self, rng):
        q = rng.normal(size=(6, 16)).astype(np.float32)
        g = rng.normal(size=(40, 16)).astype(np.float32)
        mesh = _tp_mesh(2)
        scores, idx = sharded_topk(jnp.asarray(q), jnp.asarray(g), 10, mesh)
        ref_scores, ref_idx = topk_reference(q, g, 10)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)


class TestMeshCreation:
    def test_2d_mesh_from_config(self):
        cfg = TrainingConfig(
            **TINY, mesh_shape=(4, 2), mesh_axis_names=("data", "model")
        )
        mesh = create_mesh(cfg)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)
        assert data_axis_size(mesh) == 4

    def test_batch_divisibility_shrinks_data_axis_only(self):
        # batch 6 with m=2: data axis shrinks 4 -> 3, model stays 2
        mesh = create_mesh(model_axis_size=2, batch_size=6)
        assert mesh.devices.shape == (3, 2)

    def test_indivisible_model_axis_raises(self):
        with pytest.raises(ValueError):
            create_mesh(model_axis_size=3)  # 8 % 3 != 0

    def test_cli_mesh_shape_parses_ints(self):
        # mesh_shape defaults to () which carries no element type — the CLI
        # parser must still yield ints (a string tuple breaks create_mesh)
        from prcv2025reid_tpu.configs import apply_cli_overrides

        cfg = apply_cli_overrides(
            TrainingConfig(**TINY),
            ["--mesh_shape=4,2", "--mesh_axis_names=data,model"],
        )
        assert cfg.mesh_shape == (4, 2)
        assert cfg.mesh_axis_names == ("data", "model")
