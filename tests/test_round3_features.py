"""Round-3 feature tests: cache-tag completeness, gallery-cache eviction,
loud int8 grad failure, eval-batch mesh padding, ranking-equivalence gate.

(VERDICT r2 "Next round" items 5, 7 and the ADVICE r2 findings.)
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig


# ----- ADVICE r2: cache tag must cover every numerics-affecting selector ----


class TestCacheTag:
    def _tag(self, config):
        from prcv2025reid_tpu.evaluation.protocol import checkpoint_cache_tag

        params = {
            "bn_neck": {"classifier": {"kernel": np.ones((4, 4), np.float32)}}
        }
        return checkpoint_cache_tag(params, "base", step=7, config=config)

    def test_default_config_plain_tag(self):
        tag = self._tag(TrainingConfig())
        assert "block_impl" not in tag and "attn_backend" not in tag

    @pytest.mark.parametrize(
        "field,value",
        [
            ("block_impl", "fused_int8"),
            ("attn_backend", "splash"),
            ("use_pallas_attention", True),
            ("use_fused_resln", True),
            ("use_fused_mlp", True),
            ("gelu_impl", "tanh"),
            ("compute_dtype", "float32"),
            ("token_keep", 94),
            ("token_reduce_mode", "prune"),
        ],
    )
    def test_numerics_selectors_change_tag(self, field, value):
        base = self._tag(TrainingConfig())
        changed = self._tag(TrainingConfig(**{field: value}))
        assert changed != base, field
        assert field in changed

    def test_weights_change_tag(self):
        from prcv2025reid_tpu.evaluation.protocol import checkpoint_cache_tag

        cfg = TrainingConfig()
        p1 = {"bn_neck": {"classifier": {"kernel": np.ones((4, 4), np.float32)}}}
        p2 = {"bn_neck": {"classifier": {"kernel": np.zeros((4, 4), np.float32)}}}
        assert checkpoint_cache_tag(p1, "b", step=1, config=cfg) != (
            checkpoint_cache_tag(p2, "b", step=1, config=cfg)
        )


# ----- VERDICT r2 weak #3: gallery cache eviction -----


class TestGalleryCacheEviction:
    def test_save_evicts_beyond_keep_newest(self, tmp_path):
        from prcv2025reid_tpu.evaluation.protocol import GalleryCache

        feats = np.ones((3, 4), np.float32)
        pids = np.arange(3)
        for i in range(6):
            cache = GalleryCache(str(tmp_path), f"tag{i}", keep_newest=3)
            cache.save([0, 1, 2], feats, pids)
            os.utime(
                cache._path([0, 1, 2]), (1_000_000 + i, 1_000_000 + i)
            )  # deterministic mtimes on coarse filesystems
        left = sorted(f for f in os.listdir(tmp_path) if f.endswith(".npz"))
        assert len(left) == 3
        # newest tags survive
        assert any("tag5" in f for f in left)
        assert not any("tag0" in f for f in left)

    def test_current_tag_always_survives(self, tmp_path):
        """The just-written file must survive eviction even when it is NOT
        among the keep_newest by mtime (the protect clause in _evict)."""
        from prcv2025reid_tpu.evaluation.protocol import GalleryCache

        feats = np.ones((2, 4), np.float32)
        pids = np.arange(2)
        cache = GalleryCache(str(tmp_path), "mine", keep_newest=1)
        cache.save([0, 1], feats, pids)
        # plant a NEWER competing file directly (no save -> no eviction pass)
        # and back-date ours, so ours falls beyond keep_newest=1 by mtime
        other_path = os.path.join(str(tmp_path), "gallery_other_2_x.npz")
        np.savez(other_path, feats=feats, pids=pids)
        os.utime(cache._path([0, 1]), (1_000_000, 1_000_000))
        os.utime(other_path, (2_000_000, 2_000_000))
        cache._evict(protect=cache._path([0, 1]))
        # ours is the eviction candidate (oldest, beyond keep_newest) but the
        # protect clause keeps it; the newer file stays within keep_newest
        assert cache.load([0, 1]) is not None
        assert os.path.exists(other_path)
        # sanity: without protection pointing at it, the oldest file goes
        cache._evict(protect=other_path)
        assert cache.load([0, 1]) is None


# ----- ADVICE r2: grad through int8 kernels must raise, not silently zero ----


class TestInt8GradRaises:
    def test_ln_qkv_int8_grad_raises(self):
        from prcv2025reid_tpu.ops.fused_block import fused_ln_qkv, quantize_weight

        x = jnp.ones((1, 8, 16))
        lns = jnp.ones((16,))
        lnb = jnp.zeros((16,))
        w = quantize_weight(jnp.ones((1, 16, 32)) * 0.1)
        b = jnp.zeros((1, 32))

        def loss(x):
            return fused_ln_qkv(x, lns, lnb, w, b, "int8", 8, True).sum()

        with pytest.raises(NotImplementedError, match="serving-only"):
            jax.grad(loss)(x)

    def test_out_mlp_int8_grad_raises(self):
        from prcv2025reid_tpu.ops.fused_block import fused_out_mlp, quantize_weight

        attn = jnp.ones((1, 8, 16))
        x = jnp.ones((1, 8, 16))
        wo = quantize_weight(jnp.ones((1, 16, 16)) * 0.1)
        w1 = quantize_weight(jnp.ones((1, 16, 32)) * 0.1)
        w2 = quantize_weight(jnp.ones((1, 32, 16)) * 0.1)
        lns = jnp.ones((16,))
        lnb = jnp.zeros((16,))

        def loss(attn):
            return fused_out_mlp(
                attn, x, wo, jnp.zeros((1, 16)), lns, lnb,
                w1, jnp.zeros((1, 32)), w2, jnp.zeros((1, 16)),
                "int8", 8, True,
            ).sum()

        with pytest.raises(NotImplementedError, match="serving-only"):
            jax.grad(loss)(attn)

    def test_bf16_grad_still_works(self):
        from prcv2025reid_tpu.ops.fused_block import fused_ln_qkv

        x = jnp.ones((1, 8, 16))
        g = jax.grad(
            lambda x: fused_ln_qkv(
                x, jnp.ones((16,)), jnp.zeros((16,)),
                jnp.ones((1, 16, 32)) * 0.1, jnp.zeros((1, 32)),
                "bf16", 8, True,
            ).sum()
        )(x)
        assert np.isfinite(np.asarray(g)).all()


# ----- round-3 perf paths: onesaug attention + non-exact GELU -----


class TestOnesaugAttention:
    def test_matches_xla_core_f32(self):
        from prcv2025reid_tpu.ops.attention import (
            xla_attention_bshd,
            xla_attention_bshd_onesaug,
        )

        q = jax.random.normal(jax.random.PRNGKey(0), (3, 17, 4, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (3, 17, 4, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (3, 17, 4, 8))
        ref = xla_attention_bshd(q, k, v)
        got = xla_attention_bshd_onesaug(q, k, v)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_model_trunk_matches_xla(self):
        from prcv2025reid_tpu.models.vit import MERVisionTransformer

        def trunk(attn_impl):
            return MERVisionTransformer(
                embed_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                patch_size=16, image_size=32, fusion_dim=32,
                modalities=("vis", "nir"), attn_impl=attn_impl,
            )

        imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
        variables = trunk("xla").init(jax.random.PRNGKey(1), imgs)
        ref = trunk("xla").apply(variables, imgs)
        got = trunk("onesaug").apply(variables, imgs)
        np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)

    def test_training_forces_exact_core(self):
        """attn_backend=onesaug is a SERVING formulation: the training
        forward (fold=False) must use the reference-exact xla core — a
        user copying the bench-promoted serving flags into train.py must
        not change training numerics."""
        from prcv2025reid_tpu.models.vit import MERVisionTransformer

        def trunk(impl):
            return MERVisionTransformer(
                embed_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                patch_size=16, image_size=32, fusion_dim=32,
                modalities=("vis", "nir"), attn_impl=impl,
            )

        imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
        variables = trunk("xla").init(jax.random.PRNGKey(1), imgs)
        a = trunk("xla").apply(variables, imgs, deterministic=False)
        b = trunk("onesaug").apply(variables, imgs, deterministic=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGeluImpl:
    def _trunk(self, gelu_impl):
        from prcv2025reid_tpu.models.vit import MERVisionTransformer

        return MERVisionTransformer(
            embed_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
            patch_size=16, image_size=32, fusion_dim=32,
            modalities=("vis", "nir"), gelu_impl=gelu_impl,
        )

    @pytest.mark.parametrize("impl", ["tanh", "poly"])
    def test_model_close_to_erf(self, impl):
        imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
        variables = self._trunk("erf").init(jax.random.PRNGKey(1), imgs)
        ref = np.asarray(self._trunk("erf").apply(variables, imgs), np.float64)
        got = np.asarray(self._trunk(impl).apply(variables, imgs), np.float64)
        rf = ref.reshape(-1, ref.shape[-1])
        gf = got.reshape(-1, got.shape[-1])
        cos = (rf * gf).sum(-1) / (
            np.linalg.norm(rf, axis=-1) * np.linalg.norm(gf, axis=-1) + 1e-12
        )
        assert cos.min() > 0.9995, cos.min()

    def test_training_path_stays_exact_erf(self):
        # fold=False (training) must use exact erf regardless of gelu_impl:
        # the non-deterministic forward of a tanh-configured trunk equals the
        # erf-configured one bit-for-bit (same rngs, drop_path=0)
        imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
        variables = self._trunk("erf").init(jax.random.PRNGKey(1), imgs)
        a = self._trunk("erf").apply(variables, imgs, deterministic=False)
        b = self._trunk("tanh").apply(variables, imgs, deterministic=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gelu_poly_accuracy(self):
        from prcv2025reid_tpu.ops.kernel_math import gelu_poly_bf16

        x = jnp.linspace(-12.0, 12.0, 9601)
        ref = jax.nn.gelu(x, approximate=False)
        got = gelu_poly_bf16(x)
        assert float(jnp.max(jnp.abs(got - ref))) < 3.5e-3

    def test_config_rejects_typo(self):
        with pytest.raises(ValueError, match="gelu_impl"):
            TrainingConfig(gelu_impl="gauss")


# ----- VERDICT r2 #5: ranking-equivalence gate -----


class TestRankingEquivalence:
    def _feats(self, n_ids=16, per_id=8, n_q=32, dim=24, sigma=0.2, seed=0):
        rng = np.random.default_rng(seed)
        base = rng.normal(0, 1, (n_ids, dim))
        g_pids = np.repeat(np.arange(n_ids), per_id)
        g = base[g_pids] + sigma * rng.normal(0, 1, (len(g_pids), dim))
        q_pids = rng.integers(0, n_ids, n_q)
        q = base[q_pids] + sigma * rng.normal(0, 1, (n_q, dim))

        def norm(a):
            return a / np.linalg.norm(a, axis=1, keepdims=True)

        return norm(q), norm(g), q_pids, g_pids

    def test_identical_paths_pass(self):
        from prcv2025reid_tpu.evaluation.protocol import ranking_equivalence

        q, g, qp, gp = self._feats()
        r = ranking_equivalence(q, g, q, g, qp, gp, topk=20)
        assert r["top_overlap"] == 1.0
        assert r["map_delta"] == 0.0
        assert r["map_ref"] > 0.5  # structured set: retrieval is meaningful

    def test_perturbed_path_detected(self):
        from prcv2025reid_tpu.evaluation.protocol import ranking_equivalence

        q, g, qp, gp = self._feats()
        rng = np.random.default_rng(1)
        q2 = q + 0.3 * rng.normal(0, 1, q.shape)
        q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
        r = ranking_equivalence(q, g, q2, g, qp, gp, topk=20)
        assert r["top_overlap"] < 0.97

    def test_fused_int8_ranking_equivalent(self):
        """The serving int8 path must be ranking-equivalent to XLA through a
        real (small) trunk — the bench promotion gate as a unit test."""
        from prcv2025reid_tpu.evaluation.protocol import ranking_equivalence
        from prcv2025reid_tpu.models.vit import MERVisionTransformer

        def trunk(block_impl):
            return MERVisionTransformer(
                embed_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                patch_size=16, image_size=32, fusion_dim=32,
                modalities=("vis",), block_impl=block_impl,
            )

        rng = np.random.default_rng(0)
        n_ids, per_id, n_q = 6, 4, 8
        base = rng.normal(0, 1, (n_ids, 32, 32, 3)).astype(np.float32)
        g_pids = np.repeat(np.arange(n_ids), per_id)
        gallery = base[g_pids] + 0.15 * rng.normal(
            0, 1, (len(g_pids), 32, 32, 3)
        ).astype(np.float32)
        q_pids = rng.integers(0, n_ids, n_q)
        queries = base[q_pids] + 0.15 * rng.normal(
            0, 1, (n_q, 32, 32, 3)
        ).astype(np.float32)

        variables = trunk("xla").init(
            jax.random.PRNGKey(1), jnp.asarray(gallery[:2, None])
        )

        def embed(impl, imgs):
            f = np.asarray(
                trunk(impl).apply(variables, jnp.asarray(imgs[:, None]))[:, 0],
                np.float64,
            )
            return f / np.linalg.norm(f, axis=1, keepdims=True)

        r = ranking_equivalence(
            embed("xla", queries), embed("xla", gallery),
            embed("fused_int8_interpret", queries),
            embed("fused_int8_interpret", gallery),
            q_pids, g_pids, topk=10,
        )
        assert r["top_overlap"] >= 0.9, r
        assert r["map_delta"] <= 0.02, r


# ----- VERDICT r2 #8: remaining reference monitors -----


class TestRound3Monitors:
    def test_batch_composition(self):
        from prcv2025reid_tpu.training.monitors import batch_composition

        pids = np.array([1, 1, 2, 2, 3, -1])  # -1 = multi-host padding row
        image_mask = np.array([
            [1, 1, 0, 0],  # id1: vis + nir
            [1, 0, 0, 0],
            [1, 0, 0, 0],  # id2: vis only (no text)
            [1, 0, 0, 0],
            [0, 1, 0, 0],  # id3: nonvis only
            [0, 0, 0, 0],
        ], np.float32)
        text_mask = np.zeros(6, np.float32)
        c = batch_composition(pids, image_mask, text_mask)
        assert c["num_ids"] == 3
        assert c["both"] == 1 and c["vis_only"] == 1 and c["nonvis_only"] == 1
        assert c["avg_instances_per_id"] == pytest.approx(5 / 3)

    def test_batch_count_report(self):
        from prcv2025reid_tpu.training.monitors import BatchCountReport

        r = BatchCountReport(10)
        for n in (9, 10, 11):
            r.record_epoch(n)
        s = r.summary()
        assert s["avg_batches"] == pytest.approx(10.0)
        assert s["estimate_accuracy"] == pytest.approx(1.0)
        assert s["stable"]
        assert BatchCountReport(5).summary() == {}

    def test_quick_scan(self, tiny_dataset):
        from prcv2025reid_tpu.data.dataset import quick_scan

        s = quick_scan(tiny_dataset)
        assert s["scanned"] == len(tiny_dataset.records)
        assert s["per_modality"]["vis"] > 0
        assert s["pair_ratio"] > 0.9  # synthetic set is fully paired
        assert s["legacy_names"] == []

    def test_quick_scan_detects_legacy_dirs(self, tiny_data_config, tmp_path):
        import shutil

        from prcv2025reid_tpu.data.dataset import MultiModalDataset, quick_scan

        root = str(tmp_path / "legacy_root")
        shutil.copytree(tiny_data_config.data_root, root)
        os.makedirs(os.path.join(root, "rgb"))
        cfg = tiny_data_config.replace(
            data_root=root, json_file=os.path.join(root, "text_annos.json")
        )
        s = quick_scan(MultiModalDataset(cfg, "train"))
        assert s["legacy_names"] == ["rgb"]

    def test_ring_has_feat_norm_channels(self):
        from prcv2025reid_tpu.training.train_step import RING_CHANNELS

        assert "bn_feat_norm" in RING_CHANNELS
        assert "bn_feat_norm_s0" in RING_CHANNELS


# ----- checkpoint restore with reader-template ring sizes (eval CLI path) ----


class TestRestoreRingAdaptation:
    def test_restore_with_default_ring_template(self, tmp_path):
        """The eval CLI builds its TrainState template with default ring
        sizes; restoring a checkpoint written with per-run ring sizes must
        work (regression: orbax item metadata is absent for cross-process
        reads and write_shape is per-shard, so the non-strict retry is the
        mechanism)."""
        import optax

        from prcv2025reid_tpu.training.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )
        from prcv2025reid_tpu.training.train_step import TrainState

        params = {"w": jnp.ones((3, 3))}
        tx = optax.sgd(0.1)
        writer = TrainState.create(
            params, {}, tx, jax.random.PRNGKey(0), ring_size=5, clip_window=7
        )
        writer = writer.replace(step=jnp.asarray(42, jnp.int32))
        save_checkpoint(str(tmp_path), writer, {"epoch": 3, "best_map": 0.5})

        reader_template = TrainState.create(
            params, {}, tx, jax.random.PRNGKey(0)
        )  # default ring_size=1 — shapes mismatch
        state, host = restore_checkpoint(str(tmp_path), reader_template)
        assert int(state.step) == 42
        assert host["epoch"] == 3
        np.testing.assert_array_equal(np.asarray(state.params["w"]), np.ones((3, 3)))


# ----- round-3: CLS-only TRAINING forward (exact math incl. drop-path) -----


class TestClsOnlyTrainForward:
    def _trunk(self, drop_path=0.0, **kw):
        from prcv2025reid_tpu.models.vit import MERVisionTransformer

        return MERVisionTransformer(
            embed_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
            patch_size=16, image_size=32, fusion_dim=32,
            modalities=("vis", "nir"), drop_path=drop_path, **kw,
        )

    def test_train_forward_equals_eval_at_zero_droppath(self):
        imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
        t = self._trunk()
        v = t.init(jax.random.PRNGKey(1), imgs)
        a = np.asarray(t.apply(v, imgs, deterministic=True))
        b = np.asarray(t.apply(v, imgs, deterministic=False))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)

    def test_droppath_train_forward_finite_and_stochastic(self):
        imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
        t = self._trunk(drop_path=0.5)
        v = t.init(jax.random.PRNGKey(1), imgs)
        outs = [
            np.asarray(t.apply(
                v, imgs, deterministic=False,
                rngs={"droppath": jax.random.PRNGKey(s)},
            ))
            for s in (0, 1)
        ]
        assert np.isfinite(outs[0]).all() and np.isfinite(outs[1]).all()
        assert np.abs(outs[0] - outs[1]).max() > 1e-4  # masks actually applied

    def test_droppath_grads_flow_to_last_block(self):
        imgs = jax.random.normal(jax.random.PRNGKey(0), (3, 2, 32, 32, 3))
        t = self._trunk(drop_path=0.2)
        v = t.init(jax.random.PRNGKey(1), imgs)

        def loss(params):
            y = t.apply(
                {"params": params}, imgs, deterministic=False,
                rngs={"droppath": jax.random.PRNGKey(7)},
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(v["params"])
        g_last = g["block_1"]["mlp"]["fc2"]["shared"]["kernel"]
        assert np.abs(np.asarray(g_last)).max() > 0
        assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(
            jax.tree.map(np.asarray, g)
        ))


class TestGeluStored:
    def test_forward_and_grad_match_exact(self):
        from prcv2025reid_tpu.ops.kernel_math import gelu_stored

        x = jnp.linspace(-8.0, 8.0, 2001)
        np.testing.assert_allclose(
            np.asarray(gelu_stored(x)),
            np.asarray(jax.nn.gelu(x, approximate=False)),
            rtol=1e-5, atol=1e-6,
        )
        g1 = jax.grad(lambda x: gelu_stored(x).sum())(x)
        g2 = jax.grad(lambda x: jax.nn.gelu(x, approximate=False).sum())(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-6)

    def test_trunk_grads_equal_under_stored_bwd(self):
        from prcv2025reid_tpu.models.vit import MERVisionTransformer

        def trunk(bwd):
            return MERVisionTransformer(
                embed_dim=64, num_layers=2, num_heads=4, mlp_dim=128,
                patch_size=16, image_size=32, fusion_dim=32,
                modalities=("vis", "nir"), gelu_bwd=bwd,
            )

        imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 32, 32, 3))
        v = trunk("remat").init(jax.random.PRNGKey(1), imgs)

        def loss(bwd):
            return lambda p: jnp.sum(
                trunk(bwd).apply({"params": p}, imgs, deterministic=False)
                .astype(jnp.float32) ** 2
            )

        g0 = jax.grad(loss("remat"))(v["params"])
        g1 = jax.grad(loss("stored"))(v["params"])
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_config_rejects_typo(self):
        with pytest.raises(ValueError, match="gelu_bwd"):
            TrainingConfig(gelu_bwd="cached")


class TestBenchImplConfigs:
    def test_every_impl_config_constructs(self):
        """Every bench measurement path must map to a valid TrainingConfig
        (typos in IMPL_CONFIG would silently drop a path at measure time)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
        )
        bench = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench)
        for impl, overrides in bench.IMPL_CONFIG.items():
            cfg = TrainingConfig(**overrides)
            assert cfg is not None, impl


class TestToolchainWatchParsing:
    def test_probe_output_parsing(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "toolchain_watch",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "toolchain_watch.py"),
        )
        tw = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tw)
        # the exact stdout format of perf_microbench.timed(), through the
        # REAL parser run_probes uses
        text = (
            "some unrelated: line\n"
            "             XLA int8 matmul:   146.23 TOP/s  (30 iters, 119.0 GFLOP/iter)\n"
            "           Pallas bf16 matmul:    81.05 TFLOP/s  (30 iters)\n"
            "          XLA bf16 matmul: not-a-number\n"
        )
        out = tw.parse_probe_stdout(text)
        assert out["xla_int8"] == pytest.approx(146.23e12)
        assert out["pallas_bf16"] == pytest.approx(81.05e12)
        assert out["xla_bf16"] is None  # malformed reading -> miss, not crash
        assert out["pallas_int8"] is None  # absent probe

    def test_changed_probe_requires_reproduction(self):
        """A single noisy excursion outside tolerance must be re-measured;
        only a deviation that reproduces is kept (measured case: xla_int8
        122T one run, 141T the next, recorded 146T)."""
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "toolchain_watch",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "toolchain_watch.py"),
        )
        tw = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(tw)
        good = {n: rec for n, rec in tw.RECORDED.items()}

        # noisy excursion on one probe; second run back at the record
        noisy = dict(good, xla_int8=122e12)
        calls = []

        def rerun():
            calls.append(1)
            return dict(good)

        out, evidence = tw.confirm_probes(dict(noisy), rerun)
        assert calls, "deviation must trigger a confirm run"
        assert out["xla_int8"] == good["xla_int8"]  # excursion discarded

        # real move: both runs deviate -> the deviating reading survives,
        # marked as genuinely reproduced
        moved = dict(good, pallas_bf16=150e12)
        out, evidence = tw.confirm_probes(dict(moved), lambda: dict(moved))
        assert out["pallas_bf16"] == 150e12
        assert evidence["pallas_bf16"] == "reproduced on 2 runs"

        # rerun produced NO reading for the deviating probe: the reading is
        # kept but must NOT be labeled as reproduced
        out, evidence = tw.confirm_probes(
            dict(moved), lambda: dict(good, pallas_bf16=None)
        )
        assert out["pallas_bf16"] == 150e12
        assert "SINGLE" in evidence["pallas_bf16"]

        # missing on BOTH runs: stays None with honest evidence
        gone = dict(good, pallas_bf16=None)
        out, evidence = tw.confirm_probes(dict(gone), lambda: dict(gone))
        assert out["pallas_bf16"] is None
        assert "either run" in evidence["pallas_bf16"]

        # all probes at the record: no confirm run at all
        calls.clear()
        out, evidence = tw.confirm_probes(dict(good), rerun)
        assert not calls and out == good and evidence == {}
