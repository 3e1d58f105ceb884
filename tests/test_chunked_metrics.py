"""Chunked retrieval metrics must be chunk-size invariant."""
import numpy as np

from prcv2025reid_tpu.evaluation.protocol import compute_retrieval_metrics


def test_chunk_invariance(rng):
    q = rng.normal(size=(37, 16)).astype(np.float32)
    g = rng.normal(size=(50, 16)).astype(np.float32)
    q_pids = rng.integers(0, 8, 37)
    g_pids = rng.integers(0, 8, 50)
    full = compute_retrieval_metrics(q, q_pids, g, g_pids, query_chunk=64)
    tiny = compute_retrieval_metrics(q, q_pids, g, g_pids, query_chunk=5)
    for k in ("mAP", "top1", "cmc1", "cmc5", "cmc10"):
        np.testing.assert_allclose(full[k], tiny[k], rtol=1e-6)


def test_chunk_invariance_with_exclusion(rng):
    q = rng.normal(size=(20, 8)).astype(np.float32)
    g = rng.normal(size=(30, 8)).astype(np.float32)
    q_pids = rng.integers(0, 5, 20)
    g_pids = rng.integers(0, 5, 30)
    exclude = rng.random((20, 30)) < 0.1
    full = compute_retrieval_metrics(q, q_pids, g, g_pids, exclude, query_chunk=64)
    tiny = compute_retrieval_metrics(q, q_pids, g, g_pids, exclude, query_chunk=3)
    np.testing.assert_allclose(full["mAP"], tiny["mAP"], rtol=1e-6)
