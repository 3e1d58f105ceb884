"""k-reciprocal re-ranking (evaluation/rerank.py): oracle parity, the
lam=1 identity, exclusion, mesh equality, metric boosting, protocol +
submission integration, and a structured case where re-ranking must beat
plain cosine (the reason the feature exists)."""
import os

import jax
import numpy as np
import pytest

from prcv2025reid_tpu.evaluation.protocol import (
    compute_retrieval_metrics,
    evaluate_protocol,
    export_submission_csv,
)
from prcv2025reid_tpu.evaluation.rerank import rerank_orders


def _unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _np_rerank_oracle(qf, cf, k1, k2, lam):
    """Straight-line single-query implementation of the same local
    k-reciprocal algorithm (sets + loops) — the readable form of what the
    batched jit computes."""
    f = np.concatenate([qf[None], cf], axis=0).astype(np.float32)
    n = len(f)
    dist = 1.0 - f @ f.T
    d_sel = dist - 2.0 * np.eye(n, dtype=np.float32)
    k_need = min(k1 + 1, n)
    topk = np.argsort(d_sel, axis=1, kind="stable")[:, :k_need]
    nbr = [set(row) for row in topk]
    kh = min(max(k1 // 2, 1) + 1, k_need)
    nbr_h = [set(row[:kh]) for row in topk]
    R = [set(j for j in nbr[i] if i in nbr[j]) for i in range(n)]
    Rh = [set(j for j in nbr_h[i] if i in nbr_h[j]) for i in range(n)]
    r_star = []
    for i in range(n):
        s = set(R[i])
        for j in R[i]:
            if len(Rh[j] & R[i]) >= (2.0 / 3.0) * len(Rh[j]):
                s |= Rh[j]
        r_star.append(s)
    V = np.zeros((n, n), np.float32)
    for i in range(n):
        for t in r_star[i]:
            V[i, t] = np.exp(-max(dist[i, t], 0.0))
        V[i] /= max(V[i].sum(), 1e-12)
    if k2 > 1:
        k2e = min(k2, k_need)
        V = np.stack([V[topk[i][:k2e]].mean(axis=0) for i in range(n)])
    minsum = np.minimum(V[:1], V).sum(axis=1)
    maxsum = np.maximum(V[:1], V).sum(axis=1)
    jac = 1.0 - minsum / np.maximum(maxsum, 1e-12)
    final = (1.0 - lam) * jac[1:] + lam * dist[0, 1:]
    return np.argsort(final, kind="stable")


def _clustered(rng, n_ids=8, per_id=6, dim=16, sigma=0.05):
    centers = _unit(rng.normal(size=(n_ids, dim))).astype(np.float32)
    g_feats, g_pids = [], []
    for pid in range(n_ids):
        pts = _unit(centers[pid] + sigma * rng.normal(size=(per_id, dim)))
        g_feats.append(pts)
        g_pids += [pid] * per_id
    return centers, np.concatenate(g_feats).astype(np.float32), np.asarray(g_pids)


class TestRerankCore:
    def test_matches_loop_oracle(self, rng):
        q = _unit(rng.normal(size=(7, 16))).astype(np.float32)
        g = _unit(rng.normal(size=(40, 16))).astype(np.float32)
        got = rerank_orders(q, g, top_n=24, k1=8, k2=3, lam=0.3,
                            query_chunk=4)
        sim = q @ g.T
        for i in range(len(q)):
            cand = np.argsort(-sim[i], kind="stable")[:24]
            perm = _np_rerank_oracle(q[i], g[cand], k1=8, k2=3, lam=0.3)
            np.testing.assert_array_equal(got[i], cand[perm])

    def test_lambda_one_is_plain_cosine(self, rng):
        q = _unit(rng.normal(size=(5, 8))).astype(np.float32)
        g = _unit(rng.normal(size=(30, 8))).astype(np.float32)
        got = rerank_orders(q, g, top_n=10, k1=5, k2=2, lam=1.0)
        want = np.argsort(-(q @ g.T), axis=1, kind="stable")[:, :10]
        np.testing.assert_array_equal(got, want)

    def test_exclusion_never_surfaces(self, rng):
        q = _unit(rng.normal(size=(6, 8))).astype(np.float32)
        # gallery position i IS query i (self-match would be rank 1)
        g = np.concatenate([q, _unit(rng.normal(size=(20, 8)))]).astype(
            np.float32
        )
        excl = np.arange(6, dtype=np.int32)
        got = rerank_orders(q, g, top_n=12, k1=5, k2=2, lam=0.3,
                            excl_idx=excl)
        for i in range(6):
            assert excl[i] not in got[i]
        # without exclusion the self-match is top-1 everywhere
        plain = rerank_orders(q, g, top_n=12, k1=5, k2=2, lam=0.3)
        assert (plain[:, 0] == np.arange(6)).all()

    def test_exclusion_never_surfaces_small_gallery(self, rng):
        """Regression: with Ng <= top_n the candidate top-k spanned the
        WHOLE gallery, forcing the -inf-masked excluded column into the
        candidate set — where it re-ranked straight to the top (it is the
        query's own image).  Under exclusion the head now shrinks to
        Ng - 1, so the excluded position is never selected."""
        q = _unit(rng.normal(size=(6, 8))).astype(np.float32)
        g = np.concatenate([q, _unit(rng.normal(size=(10, 8)))]).astype(
            np.float32
        )
        excl = np.arange(6, dtype=np.int32)
        got = rerank_orders(q, g, top_n=100, k1=5, k2=2, lam=0.3,
                            excl_idx=excl)
        assert got.shape == (6, 15)  # Ng - 1 columns under exclusion
        for i in range(6):
            assert excl[i] not in got[i]
        # rows with excl = -1 in the same batch keep their self-match
        excl2 = np.array([0, -1, 2, -1, 4, -1], np.int32)
        got2 = rerank_orders(q, g, top_n=100, k1=5, k2=2, lam=0.3,
                             excl_idx=excl2)
        for i in (0, 2, 4):
            assert excl2[i] not in got2[i]
        for i in (1, 3, 5):
            assert got2[i, 0] == i

    def test_invalid_slots_equal_trimmed_gallery(self, rng):
        """Over-selected candidates (padded capacity rows past ``nvalid``
        — the serving GalleryStore case) must carry zero influence: the
        real candidates' re-ranked order and fused distances equal those
        of the unpadded gallery, and the invalid slots sort last."""
        import jax.numpy as jnp

        from prcv2025reid_tpu.evaluation.rerank import _rerank_full

        q = _unit(rng.normal(size=(4, 8))).astype(np.float32)
        g = _unit(rng.normal(size=(11, 8))).astype(np.float32)
        gpad = np.zeros((16, 8), np.float32)
        gpad[:11] = g
        ranked_pad, fused_pad = _rerank_full(
            jnp.asarray(q), jnp.asarray(gpad), None, jnp.int32(11),
            jnp.float32(0.3), 5, 2, 16,
        )
        ranked_ref, fused_ref = _rerank_full(
            jnp.asarray(q), jnp.asarray(g), None, None,
            jnp.float32(0.3), 5, 2, 11,
        )
        np.testing.assert_array_equal(
            np.asarray(ranked_pad)[:, :11], np.asarray(ranked_ref)
        )
        np.testing.assert_allclose(
            np.asarray(fused_pad)[:, :11], np.asarray(fused_ref), rtol=1e-5
        )
        # the 5 invalid slots sit at the tail with the sentinel distance
        assert (np.asarray(fused_pad)[:, 11:] > 1e5).all()
        assert (np.asarray(ranked_pad)[:, 11:] >= 11).all()

    def test_top_n_clamps_to_gallery(self, rng):
        q = _unit(rng.normal(size=(3, 8))).astype(np.float32)
        g = _unit(rng.normal(size=(9, 8))).astype(np.float32)
        got = rerank_orders(q, g, top_n=100, k1=20, k2=6, lam=0.3)
        assert got.shape == (3, 9)
        # every row is a permutation of the full gallery
        for row in got:
            assert sorted(row.tolist()) == list(range(9))

    def test_mesh_matches_single_device(self, rng):
        from prcv2025reid_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        assert mesh.devices.size == 8  # conftest forces 8 virtual devices
        q = _unit(rng.normal(size=(37, 16))).astype(np.float32)
        g = _unit(rng.normal(size=(50, 16))).astype(np.float32)
        a = rerank_orders(q, g, top_n=16, k1=6, k2=3, lam=0.3,
                          query_chunk=16)
        b = rerank_orders(q, g, top_n=16, k1=6, k2=3, lam=0.3,
                          query_chunk=16, mesh=mesh)
        np.testing.assert_array_equal(a, b)

    def test_improves_map_on_clustered_data(self):
        """The reason the feature exists: queries contaminated toward a
        distractor identity rank distractor images first under raw cosine,
        but the distractors are not k-reciprocal (their neighborhoods are
        their own tight cluster) — re-ranking restores the true identity."""
        rng = np.random.default_rng(7)
        centers, g_feats, g_pids = _clustered(rng)
        n_ids = len(centers)
        q_feats, q_pids = [], []
        for pid in range(n_ids):
            other = (pid + 1) % n_ids
            q = centers[pid] + 0.8 * centers[other] + 0.05 * rng.normal(
                size=centers.shape[1]
            )
            q_feats.append(_unit(q))
            q_pids.append(pid)
        q_feats = np.stack(q_feats).astype(np.float32)
        q_pids = np.asarray(q_pids)

        plain = compute_retrieval_metrics(q_feats, q_pids, g_feats, g_pids)
        boost = rerank_orders(q_feats, g_feats, top_n=24, k1=6, k2=3,
                              lam=0.3)
        reranked = compute_retrieval_metrics(
            q_feats, q_pids, g_feats, g_pids, boost_idx=boost
        )
        assert reranked["mAP"] > plain["mAP"] + 0.02, (
            f"rerank {reranked['mAP']:.4f} vs plain {plain['mAP']:.4f}"
        )

    def test_empty_inputs(self):
        got = rerank_orders(np.zeros((0, 8), np.float32),
                            np.zeros((5, 8), np.float32))
        assert got.shape[0] == 0


class TestBoostMetrics:
    def test_identity_boost_preserves_metrics(self, rng):
        q = _unit(rng.normal(size=(9, 8))).astype(np.float32)
        g = _unit(rng.normal(size=(25, 8))).astype(np.float32)
        q_pids = rng.integers(0, 5, 9)
        g_pids = rng.integers(0, 5, 25)
        plain = compute_retrieval_metrics(q, q_pids, g, g_pids)
        topk = np.argsort(-(q @ g.T), axis=1, kind="stable")[:, :10]
        boosted = compute_retrieval_metrics(
            q, q_pids, g, g_pids, boost_idx=topk
        )
        for k in ("mAP", "top1", "cmc1", "cmc5", "cmc10"):
            assert boosted[k] == pytest.approx(plain[k], abs=1e-6)

    def test_boost_actually_reorders(self, rng):
        # put each query's TRUE match last in a reversed boost: top1 drops
        q = _unit(rng.normal(size=(6, 8))).astype(np.float32)
        g = np.concatenate([q, _unit(rng.normal(size=(14, 8)))]).astype(
            np.float32
        )
        q_pids = np.arange(6)
        g_pids = np.concatenate([np.arange(6), 100 + np.arange(14)])
        plain = compute_retrieval_metrics(q, q_pids, g, g_pids)
        assert plain["top1"] == pytest.approx(1.0)
        topk = np.argsort(-(q @ g.T), axis=1, kind="stable")[:, :5]
        reversed_boost = topk[:, ::-1].copy()
        worse = compute_retrieval_metrics(
            q, q_pids, g, g_pids, boost_idx=reversed_boost
        )
        assert worse["top1"] == pytest.approx(0.0)
        assert worse["mAP"] < plain["mAP"]


from prcv2025reid_tpu.configs import TrainingConfig  # noqa: E402
from prcv2025reid_tpu.data.dataset import MultiModalDataset  # noqa: E402
from prcv2025reid_tpu.data.tokenizer import HashTokenizer  # noqa: E402
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel  # noqa: E402
from prcv2025reid_tpu.training.train_step import make_embed_step  # noqa: E402

from conftest import TINY_BASE  # noqa: E402


@pytest.fixture(scope="module")
def proto_setup(tiny_data_config):
    import jax.numpy as jnp

    config = tiny_data_config.replace(**dict(TINY_BASE))
    ds = MultiModalDataset(config, "val")
    model = MultiModalReIDModel(config=config, num_classes=6,
                                dtype=jnp.float32)
    B = 4
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, 4, 32, 32, 3)),
        jnp.ones((B, 4)),
        jnp.ones((B, 16), jnp.int32),
        jnp.ones(B),
        train=False,
    )
    return config, ds, variables, make_embed_step(model), HashTokenizer(100, 16)


class TestProtocolIntegration:
    def test_evaluate_protocol_rerank(self, proto_setup):
        config, ds, variables, embed, tok = proto_setup
        rr = {"top_n": 6, "k1": 3, "k2": 2, "lam": 0.3}
        out = evaluate_protocol(
            embed, variables, ds, tok, batch_size=4,
            include_patterns=["single/nir"], rerank=rr,
        )
        d = out["detail"]["single/nir"]
        assert "mAP_plain" in d and 0.0 <= d["mAP"] <= 1.0
        # lam=1.0 re-ranking must reproduce the plain metrics exactly
        out_id = evaluate_protocol(
            embed, variables, ds, tok, batch_size=4,
            include_patterns=["single/nir"],
            rerank={"top_n": 6, "k1": 3, "k2": 2, "lam": 1.0},
        )
        d_id = out_id["detail"]["single/nir"]
        assert d_id["mAP"] == pytest.approx(d_id["mAP_plain"], abs=1e-6)

    def test_submission_rerank_matches_direct(self, proto_setup, tmp_path):
        config, ds, variables, embed, tok = proto_setup
        rr = {"top_n": 4, "k1": 3, "k2": 2, "lam": 0.3}
        path = str(tmp_path / "sub.csv")
        n = export_submission_csv(
            embed, variables, ds, tok, path, batch_size=4, k_values=(1,),
            top_k=4, rerank=rr,
        )
        lines = open(path).read().strip().split("\n")
        assert lines[0] == "query_key,ranked_gallery_ids"
        assert len(lines) == n + 1
        # reproduce one plan's ranking directly through rerank_orders
        from prcv2025reid_tpu.evaluation.protocol import embed_samples

        gallery_indices = [i for i, r in enumerate(ds.records) if r.vis]
        g_feats, _ = embed_samples(
            embed, variables, ds, gallery_indices, tok, 4
        )
        q_indices = [
            i for i, r in enumerate(ds.records) if "nir" in r.modalities()
        ]
        q_feats, _ = embed_samples(
            embed, variables, ds, q_indices, tok, 4, modalities=("nir",)
        )
        want = rerank_orders(q_feats, g_feats, **rr)
        g_ids = [
            os.path.splitext(os.path.basename(ds.records[i].anchor_vis))[0]
            for i in gallery_indices
        ]
        nir_rows = [
            ln for ln in lines[1:] if ln.split(",")[0].split("|")[1] == "nir"
        ]
        assert len(nir_rows) == len(q_indices)
        for qi, ln in enumerate(nir_rows):
            ranked = ln.split(",")[1].split(" ")
            assert ranked == [g_ids[j] for j in want[qi]]
