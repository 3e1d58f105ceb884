"""Evaluation protocol tests: metric oracle parity, plan building/filtering,
end-to-end protocol on the synthetic dataset, submission export."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.data.dataset import MultiModalDataset
from prcv2025reid_tpu.data.tokenizer import HashTokenizer
from prcv2025reid_tpu.evaluation.protocol import (
    GalleryCache,
    build_query_plans,
    compute_retrieval_metrics,
    evaluate_protocol,
    export_submission_csv,
    filter_plans,
)
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
from prcv2025reid_tpu.training.train_step import make_embed_step


def _np_map_oracle(q_feats, q_pids, g_feats, g_pids):
    """Brute-force AP oracle implementing the published mAP definition."""
    sim = q_feats @ g_feats.T
    aps, top1 = [], 0.0
    n_valid = 0
    for i in range(len(q_pids)):
        order = np.argsort(-sim[i])
        matches = (g_pids[order] == q_pids[i]).astype(float)
        top1 += matches[0]
        if matches.sum() == 0:
            continue
        n_valid += 1
        cum = np.cumsum(matches)
        prec = cum / np.arange(1, len(matches) + 1)
        aps.append((prec * matches).sum() / matches.sum())
    return (
        float(np.sum(aps) / max(1, n_valid)),
        float(top1 / len(q_pids)),
    )


class TestMetrics:
    def test_matches_oracle(self, rng):
        q = rng.normal(size=(10, 8)).astype(np.float32)
        g = rng.normal(size=(20, 8)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        g /= np.linalg.norm(g, axis=1, keepdims=True)
        q_pids = rng.integers(0, 5, 10)
        g_pids = rng.integers(0, 5, 20)
        got = compute_retrieval_metrics(q, q_pids, g, g_pids)
        want_map, want_top1 = _np_map_oracle(q, q_pids, g, g_pids)
        np.testing.assert_allclose(got["mAP"], want_map, rtol=1e-5)
        np.testing.assert_allclose(got["top1"], want_top1, rtol=1e-5)

    def test_perfect_retrieval(self):
        feats = np.eye(4, dtype=np.float32)
        pids = np.arange(4)
        m = compute_retrieval_metrics(feats, pids, feats, pids)
        assert m["mAP"] == 1.0
        assert m["top1"] == 1.0
        assert m["cmc1"] == 1.0

    def test_query_without_relevant_excluded_from_map(self, rng):
        q = rng.normal(size=(3, 8)).astype(np.float32)
        g = rng.normal(size=(5, 8)).astype(np.float32)
        q_pids = np.asarray([0, 1, 99])  # pid 99 absent from gallery
        g_pids = np.asarray([0, 0, 1, 1, 2])
        got = compute_retrieval_metrics(q, q_pids, g, g_pids)
        want_map, _ = _np_map_oracle(q, q_pids, g, g_pids)
        np.testing.assert_allclose(got["mAP"], want_map, rtol=1e-5)

    def test_same_image_exclusion(self):
        """With exclusion, the identical item cannot be retrieved."""
        q = np.asarray([[1.0, 0.0, 0.0]], np.float32)
        g = np.asarray(
            [[1.0, 0.0, 0.0], [0.9, 0.1, 0.0], [0.5, 0.0, 0.0]], np.float32
        )
        q_pids = np.asarray([0])
        g_pids = np.asarray([0, 1, 0])
        no_excl = compute_retrieval_metrics(q, q_pids, g, g_pids)
        assert no_excl["top1"] == 1.0
        exclude = np.asarray([[True, False, False]])
        m = compute_retrieval_metrics(q, q_pids, g, g_pids, exclude=exclude)
        assert m["top1"] == 0.0  # self-match dropped, pid-1 item ranks first
        assert m["mAP"] == pytest.approx(0.5)  # remaining positive at rank 2
        # the O(Nq) index form (gallery position per query, -1 = none) must
        # agree with the dense matrix exactly
        m_idx = compute_retrieval_metrics(
            q, q_pids, g, g_pids, exclude=np.asarray([0], np.int32)
        )
        assert m_idx == m

    def test_index_exclusion_matches_dense(self, rng):
        """Random single-position exclusions: index form == dense form."""
        q = rng.normal(size=(9, 8)).astype(np.float32)
        g = rng.normal(size=(13, 8)).astype(np.float32)
        q_pids = rng.integers(0, 4, 9)
        g_pids = rng.integers(0, 4, 13)
        idx = rng.integers(-1, 13, 9).astype(np.int32)  # -1 = no exclusion
        dense = np.zeros((9, 13), bool)
        for r, c in enumerate(idx):
            if c >= 0:
                dense[r, c] = True
        a = compute_retrieval_metrics(q, q_pids, g, g_pids, exclude=dense)
        b = compute_retrieval_metrics(q, q_pids, g, g_pids, exclude=idx)
        assert a == b


class TestPlans:
    def test_all_15_combos(self):
        plans = build_query_plans()
        assert len(plans) == 15
        names = [n for n, _ in plans]
        assert "single/nir" in names
        assert "quad/nir+sk+cp+text" in names
        assert "double/nir+sk" in names

    def test_whitelist_filter(self):
        plans = build_query_plans()
        kept = filter_plans(
            plans,
            ["single/nir", "single/sk", "single/cp", "single/text", "quad/nir+sk+cp+text"],
        )
        assert len(kept) == 5
        kept2 = filter_plans(plans, ["double/*"])
        assert len(kept2) == 6


from conftest import TINY_BASE

TINY = dict(TINY_BASE)


@pytest.fixture(scope="module")
def eval_setup(tiny_data_config):
    config = tiny_data_config.replace(**TINY)
    ds = MultiModalDataset(config, "val")
    model = MultiModalReIDModel(config=config, num_classes=6, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    B = 4
    variables = model.init(
        {"params": rng},
        jnp.zeros((B, 4, 32, 32, 3)),
        jnp.ones((B, 4)),
        jnp.ones((B, 16), jnp.int32),
        jnp.ones(B),
        train=False,
    )
    embed = make_embed_step(model)
    tok = HashTokenizer(100, 16)
    return config, ds, variables, embed, tok


class TestProtocol:
    def test_end_to_end(self, eval_setup):
        config, ds, variables, embed, tok = eval_setup
        out = evaluate_protocol(
            embed,
            variables,
            ds,
            tok,
            batch_size=4,
            include_patterns=config.eval_include_patterns,
        )
        assert set(out["detail"]) == {
            "single/nir",
            "single/sk",
            "single/cp",
            "single/text",
            "quad/nir+sk+cp+text",
        }
        assert 0.0 <= out["map_single"] <= 1.0
        assert out["map_avg2"] == pytest.approx(
            (out["map_single"] + out["map_quad"]) / 2
        )
        for d in out["detail"].values():
            assert d["num_queries"] == len(ds)

    def test_gallery_cache_roundtrip(self, eval_setup, tmp_path):
        config, ds, variables, embed, tok = eval_setup
        cache = GalleryCache(str(tmp_path), "t1")
        calls = {"n": 0}

        def counting_embed(variables, batch):
            calls["n"] += 1
            return embed(variables, batch)

        out1 = evaluate_protocol(
            counting_embed, variables, ds, tok, batch_size=4,
            include_patterns=["single/nir"], cache=cache,
        )
        first_run_calls = calls["n"]
        # second run must ACTUALLY hit the cache: same values, and the
        # gallery embed batches never run again (only the query embeds do)
        out2 = evaluate_protocol(
            counting_embed, variables, ds, tok, batch_size=4,
            include_patterns=["single/nir"], cache=cache,
        )
        assert out1["detail"]["single/nir"]["mAP"] == pytest.approx(
            out2["detail"]["single/nir"]["mAP"]
        )
        assert calls["n"] - first_run_calls < first_run_calls, (
            "second run re-embedded the gallery — cache load missed"
        )
        assert any(f.startswith("gallery_t1") for f in os.listdir(tmp_path))

    def test_submission_csv(self, eval_setup, tmp_path):
        config, ds, variables, embed, tok = eval_setup
        path = str(tmp_path / "submission.csv")
        n = export_submission_csv(
            embed, variables, ds, tok, path, batch_size=4, k_values=(1,), top_k=3
        )
        lines = open(path).read().strip().split("\n")
        assert lines[0] == "query_key,ranked_gallery_ids"
        assert len(lines) == n + 1
        key, ranked = lines[1].split(",")
        pid, mods, stem = key.split("|")
        assert mods in ("nir", "sk", "cp", "text")
        assert len(ranked.split(" ")) == 3
