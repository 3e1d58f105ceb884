"""Tests for diagnostics, profiling utils, cached tokenizer, and the
convert-CLI npz round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.data.tokenizer import CachedTokenizer, HashTokenizer, build_tokenizer
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
from prcv2025reid_tpu.tools.diagnose import activation_report, summarize
from prcv2025reid_tpu.utils.profiling import StepTimer, cost_summary

from conftest import TINY_BASE

TINY = dict(TINY_BASE)


class TestDiagnose:
    def test_activation_report(self):
        config = TrainingConfig(**TINY)
        model = MultiModalReIDModel(config=config, num_classes=5, dtype=jnp.float32)
        B = 2
        batch = {
            "images": jnp.ones((B, 4, 32, 32, 3)),
            "image_mask": jnp.ones((B, 4)),
            "text_tokens": jnp.ones((B, 16), jnp.int32).at[:, 3].set(99),
            "text_mask": jnp.ones(B),
        }
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            batch["images"],
            batch["image_mask"],
            batch["text_tokens"],
            batch["text_mask"],
            train=False,
        )
        report = activation_report(model, variables, batch)
        assert len(report) > 10
        # trunk blocks and fusion must appear
        assert any("block_0" in k for k in report)
        assert any("fusion" in k for k in report)
        for e in report.values():
            assert e["nonfinite"] == 0
        lines = summarize(report)
        assert len(lines) == len(report)


class TestProfiling:
    def test_step_timer(self):
        t = StepTimer(warmup=1)
        for _ in range(5):
            t.tick()
        assert len(t.times) == 3
        assert t.steps_per_sec() > 0

    def test_cost_summary(self):
        f = jax.jit(lambda x: x @ x)
        x = jnp.ones((64, 64))
        out = cost_summary(f, x)
        assert out.get("flops", 0) > 0


class TestCachedTokenizer:
    def test_matches_inner(self):
        inner = HashTokenizer(100, 16)
        cached = CachedTokenizer(inner)
        texts = ["a b", "c d", "a b", ""]
        np.testing.assert_array_equal(cached(texts), inner(texts))
        # second call hits the cache
        np.testing.assert_array_equal(cached(texts), inner(texts))
        assert len(cached._cache) == 3

    def test_build_tokenizer_wraps(self):
        tok = build_tokenizer(None, 100, 16)
        assert isinstance(tok, CachedTokenizer)


class TestBenchQuery:
    def test_all_paths_produce_finite_rates(self, capsys):
        """tools/bench_query.py measures every query path on tiny dims."""
        import importlib.util
        import json as jsonlib
        import os

        spec = importlib.util.spec_from_file_location(
            "bench_query",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "bench_query.py"),
        )
        bench_query = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench_query)
        bench_query.main(
            [f"--set={k}={v}" for k, v in TINY.items()
             if k not in ("use_pallas_attention",)]
            + ["--iters=1"]
        )
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
        summary = jsonlib.loads(lines[-1])
        assert set(summary["paths"]) == {
            "text", "single_nir", "quad", "weighted_quad"
        }
        assert all(v > 0 for v in summary["paths"].values())


class TestBenchSearch:
    def test_all_paths_produce_finite_numbers(self, capsys):
        """tools/bench_search.py measures rank/rerank/search_e2e on tiny
        shapes (the full-scale defaults are a real-chip measurement)."""
        import importlib.util
        import json as jsonlib
        import os

        spec = importlib.util.spec_from_file_location(
            "bench_search",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "bench_search.py"),
        )
        bench_search = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(bench_search)
        bench_search.main([
            "--gallery=64", "--dim=8", "--queries=16", "--top_k=5",
            "--rerank_top_n=16", "--rerank_k1=4", "--rerank_k2=2",
            "--iters=1",
        ])
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
        summary = jsonlib.loads(lines[-1])
        assert set(summary["paths"]) == {"rank", "rerank", "search_e2e"}
        assert summary["paths"]["rank"]["queries_per_sec"] > 0
        assert summary["paths"]["rerank"]["queries_per_sec"] > 0
        e2e = summary["paths"]["search_e2e"]
        assert e2e["b1_plain_ms"] > 0 and e2e["b16_rerank_ms"] > 0


class TestExportServing:
    def test_roundtrip_matches_live_model(self):
        """tools/export_serving.py: serialized StableHLO artifacts
        deserialize in a fresh Exported (no model code on the consumer
        path) and agree exactly with the live jitted embed graphs —
        weights travel as baked-in constants."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "export_serving",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "export_serving.py"),
        )
        export_serving = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(export_serving)

        from prcv2025reid_tpu.training.train_step import make_combo_embed_step

        config = TrainingConfig(**TINY)
        model = MultiModalReIDModel(config=config, num_classes=3)
        B, Mv, S = 2, len(config.vision_modalities), config.image_size
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((B, Mv, S, S, 3), jnp.float32),
            jnp.ones((B, Mv), jnp.float32),
            jnp.zeros((B, config.text_context_length), jnp.int32),
            jnp.ones((B,), jnp.float32),
            train=False,
        )
        graphs = export_serving.export_graphs(
            config, model, variables, B,
            graphs=["gallery_vis", "text", "quad"], platforms=("cpu",),
        )
        assert graphs["quad"][1] == tuple(config.vision_modalities) + (
            "text",
        )
        rng = np.random.default_rng(0)
        batch = {
            "images": rng.normal(size=(B, Mv, S, S, 3)).astype(np.float32),
            "image_mask": np.ones((B, Mv), np.float32),
            "text_tokens": rng.integers(
                0, config.text_vocab_size,
                size=(B, config.text_context_length), dtype=np.int32,
            ),
            "text_mask": np.ones((B,), np.float32),
        }
        for name, (ex, mods) in graphs.items():
            ex2 = jax.export.deserialize(ex.serialize())
            assert ex2.platforms == ("cpu",)
            got = np.asarray(ex2.call(batch))
            want = np.asarray(
                make_combo_embed_step(model, mods)(variables, batch)
            )
            assert got.shape == (B, config.fusion_dim)
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=name)
            # normalized features — the serving contract
            np.testing.assert_allclose(
                np.linalg.norm(got, axis=1), 1.0, atol=1e-4
            )

    def test_weighted_fusion_mode(self):
        """fusion_mode='weighted' exports multi-modal graphs through the
        reference FeatureExtractor's weighted sum — same dispatch rule as
        the live server."""
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "export_serving_w",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "export_serving.py"),
        )
        export_serving = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(export_serving)

        from prcv2025reid_tpu.training.train_step import (
            make_weighted_embed_step,
        )

        config = TrainingConfig(**TINY)
        model = MultiModalReIDModel(config=config, num_classes=3)
        B, Mv, S = 2, len(config.vision_modalities), config.image_size
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((B, Mv, S, S, 3), jnp.float32),
            jnp.ones((B, Mv), jnp.float32),
            jnp.zeros((B, config.text_context_length), jnp.int32),
            jnp.ones((B,), jnp.float32),
            train=False,
        )
        graphs = export_serving.export_graphs(
            config, model, variables, B, graphs=["quad"],
            platforms=("cpu",), fusion_mode="weighted",
        )
        ex, mods = graphs["quad"]
        rng = np.random.default_rng(1)
        batch = {
            "images": rng.normal(size=(B, Mv, S, S, 3)).astype(np.float32),
            "image_mask": np.ones((B, Mv), np.float32),
            "text_tokens": rng.integers(
                0, config.text_vocab_size,
                size=(B, config.text_context_length), dtype=np.int32,
            ),
            "text_mask": np.ones((B,), np.float32),
        }
        got = np.asarray(jax.export.deserialize(ex.serialize()).call(batch))
        want = np.asarray(
            make_weighted_embed_step(model, mods)(variables, batch)
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_unknown_graph_is_loud(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "export_serving2",
            os.path.join(os.path.dirname(__file__), "..", "tools",
                         "export_serving.py"),
        )
        export_serving = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(export_serving)
        config = TrainingConfig(**TINY)
        model = MultiModalReIDModel(config=config, num_classes=3)
        with pytest.raises(SystemExit, match="unknown graphs"):
            export_serving.export_graphs(
                config, model, {}, 2, graphs=["nope"]
            )


class TestConvertCLI:
    def test_npz_export(self, tmp_path):
        """convert_clip.main writes a flat npz from a random HF snapshot."""
        pytest.importorskip("transformers")
        import torch
        from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, CLIPVisionConfig

        torch.manual_seed(0)
        cfg = CLIPConfig(
            text_config=CLIPTextConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, vocab_size=100, max_position_embeddings=16,
                projection_dim=32,
            ).to_dict(),
            vision_config=CLIPVisionConfig(
                hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                num_attention_heads=4, image_size=32, patch_size=16,
                projection_dim=32,
            ).to_dict(),
            projection_dim=32,
        )
        model = CLIPModel(cfg)
        snap = tmp_path / "snap"
        snap.mkdir()
        torch.save(model.state_dict(), snap / "pytorch_model.bin")

        from prcv2025reid_tpu.tools.convert_clip import load_hf_state_dict

        sd = load_hf_state_dict(str(snap))
        assert "vision_model.embeddings.class_embedding" in sd
        assert sd["visual_projection.weight"].shape == (32, 64)
