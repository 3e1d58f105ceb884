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

from conftest import TINY_BASE

TINY = dict(TINY_BASE)


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
        # gallery-padding sentinels must not leak into the returned scores
        np.testing.assert_allclose(np.asarray(scores), ref_scores, rtol=1e-5)

    def test_tie_break_prefers_lower_index(self):
        mesh = create_mesh()
        q = np.asarray([[1.0, 0.0]], np.float32)
        g = np.tile(np.asarray([[1.0, 0.0]], np.float32), (16, 1))  # all tied
        _, idx = sharded_topk(jnp.asarray(q), jnp.asarray(g), 4, mesh)
        np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3])


class TestShardedMetrics:
    def test_mesh_metrics_equal_single_device(self, rng):
        """VERDICT round-1 #2: mesh ranking must give bit-equal metrics."""
        from prcv2025reid_tpu.evaluation.protocol import compute_retrieval_metrics

        mesh = create_mesh()
        q = rng.normal(size=(21, 16)).astype(np.float32)  # 21 % 8 != 0 -> padding
        g = rng.normal(size=(50, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        q_pids = rng.integers(0, 7, 21)
        g_pids = rng.integers(0, 7, 50)
        single = compute_retrieval_metrics(q, q_pids, g, g_pids)
        meshed = compute_retrieval_metrics(q, q_pids, g, g_pids, mesh=mesh)
        for k in single:
            assert single[k] == pytest.approx(meshed[k], rel=1e-6), k

    def test_mesh_metrics_with_exclusion(self, rng):
        from prcv2025reid_tpu.evaluation.protocol import compute_retrieval_metrics

        mesh = create_mesh()
        q = rng.normal(size=(10, 8)).astype(np.float32)
        g = rng.normal(size=(30, 8)).astype(np.float32)
        q_pids = rng.integers(0, 4, 10)
        g_pids = rng.integers(0, 4, 30)
        exclude = rng.random((10, 30)) < 0.1
        single = compute_retrieval_metrics(q, q_pids, g, g_pids, exclude)
        meshed = compute_retrieval_metrics(q, q_pids, g, g_pids, exclude, mesh=mesh)
        for k in single:
            assert single[k] == pytest.approx(meshed[k], rel=1e-6), k

    def test_mesh_metrics_small_chunks(self, rng):
        """Chunked + padded + sharded must still equal the plain path."""
        from prcv2025reid_tpu.evaluation.protocol import compute_retrieval_metrics

        mesh = create_mesh()
        q = rng.normal(size=(13, 8)).astype(np.float32)
        g = rng.normal(size=(20, 8)).astype(np.float32)
        q_pids = rng.integers(0, 3, 13)
        g_pids = rng.integers(0, 3, 20)
        single = compute_retrieval_metrics(q, q_pids, g, g_pids, query_chunk=5)
        meshed = compute_retrieval_metrics(
            q, q_pids, g, g_pids, query_chunk=5, mesh=mesh
        )
        for k in single:
            assert single[k] == pytest.approx(meshed[k], rel=1e-6), k


class TestMultiHostFeed:
    """process_local slicing: the per-process local batches must reassemble
    into exactly the single-process global batch (VERDICT round-1 #3)."""

    def _pipeline(self, tiny_dataset, tokenizer, pi, pc):
        from prcv2025reid_tpu.data.pipeline import HostPipeline
        from prcv2025reid_tpu.data.sampler import PKBatchSampler

        sampler = PKBatchSampler(tiny_dataset, 4, 2, seed=7, steps_per_epoch=3)
        return HostPipeline(
            tiny_dataset,
            sampler,
            tokenizer,
            num_workers=0,
            seed=123,
            modality_dropout=0.0,
            process_index=pi,
            process_count=pc,
        )

    def test_slices_reassemble_global_batch(self, tiny_dataset, tiny_tokenizer):
        single = list(self._pipeline(tiny_dataset, tiny_tokenizer, 0, 1))
        parts = [list(self._pipeline(tiny_dataset, tiny_tokenizer, pi, 2)) for pi in (0, 1)]
        assert len(single) == len(parts[0]) == len(parts[1])
        for b_all, b0, b1 in zip(single, *parts):
            # indices/labels/masks reassemble exactly (augment RNG is
            # per-process, so pixels differ — identity stream must not)
            for key in ("labels", "pids", "indices", "image_mask", "text_mask"):
                glued = np.concatenate([b0[key], b1[key]])
                np.testing.assert_array_equal(glued, b_all[key], err_msg=key)

    def test_padding_when_not_divisible(self, tiny_dataset, tiny_tokenizer):
        from prcv2025reid_tpu.data.pipeline import HostPipeline
        from prcv2025reid_tpu.data.sampler import PKBatchSampler

        sampler = PKBatchSampler(tiny_dataset, 3, 2, seed=7, steps_per_epoch=2)  # B=6
        parts = []
        for pi in range(4):  # 6 % 4 != 0 -> per-process 2 with padding
            pipe = HostPipeline(
                tiny_dataset, sampler, tiny_tokenizer, num_workers=0, seed=1,
                modality_dropout=0.0, process_index=pi, process_count=4,
            )
            sampler.load_state_dict({"rng_state": PKBatchSampler(
                tiny_dataset, 3, 2, seed=7).rng.bit_generator.state})
            parts.append(list(pipe))
        for batches in zip(*parts):
            sizes = {b["labels"].shape[0] for b in batches}
            assert sizes == {2}  # equal local slices
            # padded rows carry label -1 and zero masks
            last = batches[-1]
            assert last["labels"][-1] == -1
            assert last["image_mask"][-1].sum() == 0

    def test_global_batch_assembly_on_mesh(self, tiny_dataset, tiny_tokenizer):
        """make_global_batch on the single-process path shards the leading dim."""
        from prcv2025reid_tpu.parallel.mesh import make_global_batch

        mesh = create_mesh()
        pipe = self._pipeline(tiny_dataset, tiny_tokenizer, 0, 1)
        batch = next(iter(pipe))
        g = make_global_batch(batch, mesh)
        assert g["labels"].shape[0] == batch["labels"].shape[0]
        assert g["images"].sharding.spec == batch_sharding(mesh).spec


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


class TestShardedSubmissionExport:
    """VERDICT r2 #4: the submission-export EMBEDDING must shard over the
    mesh like evaluate_protocol's does, and the mesh CSV must be
    byte-identical to the single-device one."""

    def test_csv_byte_identical_mesh_vs_single(self, tiny_data_config, tmp_path):
        from prcv2025reid_tpu.data.dataset import MultiModalDataset
        from prcv2025reid_tpu.data.tokenizer import HashTokenizer
        from prcv2025reid_tpu.evaluation.protocol import export_submission_csv
        from prcv2025reid_tpu.training.train_step import make_embed_step

        config = tiny_data_config.replace(**TINY)
        ds = MultiModalDataset(config, "val")
        model = MultiModalReIDModel(config=config, num_classes=6, dtype=jnp.float32)
        B = 8  # same batch size both runs: the query-sample RNG stream is
        # consumed per collated row, so batch size is part of determinism
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((B, 4, 32, 32, 3)),
            jnp.ones((B, 4)),
            jnp.ones((B, 16), jnp.int32),
            jnp.ones(B),
            train=False,
        )
        embed = make_embed_step(model)
        tok = HashTokenizer(100, 16)

        p_single = str(tmp_path / "single.csv")
        n1 = export_submission_csv(
            embed, variables, ds, tok, p_single, batch_size=B,
            k_values=(1, 2), top_k=3,
        )

        mesh = create_mesh()
        vars_r = replicate_state(variables, mesh)
        p_mesh = str(tmp_path / "mesh.csv")
        n2 = export_submission_csv(
            embed, vars_r, ds, tok, p_mesh, batch_size=B,
            k_values=(1, 2), top_k=3,
            mesh=mesh, sharding=batch_sharding(mesh),
        )
        assert n1 == n2 > 0
        assert open(p_single).read() == open(p_mesh).read()
