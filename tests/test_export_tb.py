"""npz export round trip + TensorBoard history export."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prcv2025reid_tpu.tools.export_params import npz_to_params, params_to_npz
from prcv2025reid_tpu.training.monitors import MetricsHistory


def test_npz_round_trip(tmp_path, rng):
    tree = {
        "params": {
            "a": jnp.asarray(rng.normal(size=(3, 4)), jnp.float32),
            "nested": {"b": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros(4)}},
    }
    path = str(tmp_path / "m.npz")
    params_to_npz(path, tree)
    back = npz_to_params(path, tree)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        tree,
        back,
    )


def test_npz_shape_mismatch_raises(tmp_path):
    tree = {"a": jnp.zeros((2, 2))}
    path = str(tmp_path / "m.npz")
    params_to_npz(path, tree)
    with pytest.raises(ValueError):
        npz_to_params(path, {"a": jnp.zeros((3, 3))})
    with pytest.raises(ValueError):
        npz_to_params(path, {"b": jnp.zeros((2, 2))})


def test_tensorboard_export(tmp_path):
    pytest.importorskip("tensorboardX")
    hist = MetricsHistory(str(tmp_path / "tb"), tag_prefix="train/")
    hist.append({"epoch": 1, "total_loss": 2.5, "note": "string-skipped"})
    hist.append({"epoch": 2, "total_loss": 1.5})
    files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in files)
    hist.to_csv(str(tmp_path / "h.csv"))
    assert os.path.exists(tmp_path / "h.csv")
