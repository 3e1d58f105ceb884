"""End-to-end trainer test on the synthetic ORBench tree (SURVEY.md §4 tier d):
train a tiny model for 2 epochs, evaluate, checkpoint, and resume."""
import os

import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.training.trainer import Trainer

from conftest import TINY_BASE

TINY = {
    **TINY_BASE,
    "num_epochs": 2,
    "warmup_epochs": 1,
    "num_ids_per_batch": 2,
    "instances_per_id": 2,
    "steps_per_epoch": 3,
    "num_workers": 0,
    "eval_sample_ratio": 1.0,
    "eval_batch_size": 4,
    "save_freq": 50,
}


@pytest.fixture()
def trainer_config(tiny_data_config, tmp_path):
    return tiny_data_config.replace(
        **TINY,
        save_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        eval_cache_dir=str(tmp_path / "cache"),
    )


def test_fit_and_resume(trainer_config):
    trainer = Trainer(trainer_config)
    result = trainer.fit()
    assert "best_map" in result
    assert 0.0 <= result["best_map"] <= 1.0
    assert result["final"]["map_avg2"] >= 0.0
    # histories written
    assert os.path.exists(os.path.join(trainer_config.log_dir, "train_history.csv"))
    assert os.path.exists(os.path.join(trainer_config.log_dir, "eval_history.csv"))
    rows = open(os.path.join(trainer_config.log_dir, "train_history.csv")).read().strip().split("\n")
    assert len(rows) == 3  # header + 2 epochs
    # latest + best checkpoints exist
    assert os.path.isdir(os.path.join(trainer_config.save_dir, "latest"))

    step_after = int(trainer.state.step)
    assert step_after == 2 * trainer_config.steps_per_epoch

    # --- resume: a fresh trainer picks up after the last epoch ---
    trainer2 = Trainer(trainer_config)
    assert trainer2.maybe_resume()
    assert trainer2.start_epoch == 3
    assert int(trainer2.state.step) == step_after
    assert trainer2.best_map == trainer.best_map
    # histories reloaded: a resumed run must append to the prior epochs, not
    # erase them on its first epoch-end rewrite
    assert [r["epoch"] for r in trainer2.train_history.rows] == [1, 2]
    assert len(trainer2.eval_history.rows) >= 1


def test_eval_cli_split_reconstruction(trainer_config):
    """The standalone eval CLI defaults to the reference behavior (every
    identity under dataset_root); --eval_split val reconstructs the
    trainer's ID-disjoint split from the checkpoint config so the numbers
    are comparable to training-time eval."""
    import sys

    trainer = Trainer(trainer_config)
    trainer.fit()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import eval_mm_protocol

    common = [
        "--dataset_root", trainer_config.data_root,
        "--json_file", trainer_config.json_file,
        "--model_path", os.path.join(trainer_config.save_dir, "latest"),
        "--cache_dir", trainer_config.eval_cache_dir,
        "--batch_size", "4",
    ]
    r_all = eval_mm_protocol.main(common)
    r_val = eval_mm_protocol.main(common + ["--eval_split", "val"])
    for r in (r_all, r_val):
        assert 0.0 <= r["map_avg2"] <= 1.0
        assert len(r["detail"]) == 15

    def n_queries(r):
        return sum(d["num_queries"] for d in r["detail"].values())

    # the reconstructed val split ranks strictly fewer queries than the
    # full root, and no more than the trainer's own val universe
    assert n_queries(r_val) < n_queries(r_all)
    assert (r_val["detail"]["single/nir"]["num_queries"]
            <= len(trainer.val_ds.records))


def test_smoke_test_preserves_sampler_stream(trainer_config):
    """smoke_test must not advance the checkpointable sampler RNG — epoch 1
    sees the exact batch stream it would without the smoke test."""
    trainer = Trainer(trainer_config)
    before = trainer.sampler.state_dict()
    trainer.smoke_test()
    assert trainer.sampler.state_dict() == before


def test_crop_relaxation_state_roundtrips(trainer_config):
    """The epoch-5 augmentation relaxation persists through host_state so a
    resumed run keeps the relaxed distribution."""
    trainer = Trainer(trainer_config)
    assert trainer._host_state(1)["crop_relaxed"] is False
    trainer._relax_augmentation()
    assert trainer.train_ds.transform.crop_scale_min == pytest.approx(0.6)
    assert trainer._host_state(5)["crop_relaxed"] is True


def test_train_loss_metrics_sane(trainer_config):
    trainer = Trainer(trainer_config)
    m = trainer.train_epoch(1)
    assert m["steps"] == trainer_config.steps_per_epoch
    assert np.isfinite(m["total_loss"])
    assert m["sdm_weight"] == 0.0  # epoch 1 = SDM warmup
    m2 = trainer.train_epoch(2, m)
    assert m2["sdm_weight"] == pytest.approx(0.1)  # schedule starts
    assert 0.0 <= m2["stability_score"] <= 1.0
    assert 0.0 <= m2["pair_coverage_mavg"] <= 1.0
