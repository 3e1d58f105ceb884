"""End-to-end learning test: a tiny model trained on id-correlated synthetic
data must beat chance retrieval on the TRAIN identities.

This is the strongest correctness oracle in the suite: it fails if the loss
masking, label mapping, sampler pairing, BN-neck, or retrieval plumbing is
subtly wrong, even when every unit test passes (SURVEY.md §4 tier d).
"""
import numpy as np
import pytest

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.data.dataset import MultiModalDataset
from prcv2025reid_tpu.evaluation.protocol import evaluate_protocol

from conftest import TINY_BASE

TINY = dict(
    **{**TINY_BASE, "vision_hidden_dim": 32, "vision_mlp_dim": 64,
       "text_layers": 1},
    dropout_rate=0.0,
    fusion_dropout=0.0,
    modality_dropout=0.0,
    num_epochs=6,
    warmup_epochs=1,
    num_ids_per_batch=3,
    instances_per_id=2,
    # 16 (not 8): the reference-exact lora_A init (bound 1/sqrt(in), 2x the
    # old stacked-variance_scaling value at these tiny dims) shifts the toy
    # trajectory; 8-step epochs left mAP at ~0.46 vs 0.84+ here — margins
    # probed in round 3
    steps_per_epoch=16,
    num_workers=0,
    eval_sample_ratio=1.0,
    eval_batch_size=6,
    save_freq=100,
    do_eval=False,
    # backbone trains too (random init, tiny model) so learning is feasible
    freeze_backbone=False,
    base_learning_rate=1e-3,
    mer_learning_rate=1e-3,
    tokenizer_learning_rate=1e-3,
    fusion_learning_rate=1e-3,
    head_learning_rate=3e-3,
    random_erase=0.0,
    color_jitter=False,
    crop_scale_min=0.9,
)


@pytest.mark.slow
def test_training_learns_retrieval(tiny_data_config, tmp_path):
    from prcv2025reid_tpu.training.trainer import Trainer

    config = tiny_data_config.replace(
        **TINY,
        save_dir=str(tmp_path / "ckpt"),
        log_dir=str(tmp_path / "logs"),
        eval_cache_dir=str(tmp_path / "cache"),
    )
    trainer = Trainer(config)

    # evaluate on the TRAIN split (memorization check): gallery/query from
    # the same identities the model sees during training
    def eval_train_split():
        variables = {
            "params": trainer.state.params,
            "batch_stats": trainer.state.batch_stats,
        }
        return evaluate_protocol(
            None,
            variables,
            trainer.train_ds,
            trainer.tokenizer,
            batch_size=6,
            include_patterns=["single/nir"],
            embed_factory=trainer.embed_factory,
        )

    before = eval_train_split()["detail"]["single/nir"]["mAP"]

    metrics = None
    for epoch in range(1, config.num_epochs + 1):
        metrics = trainer.train_epoch(epoch, metrics)
        assert np.isfinite(metrics["total_loss"])

    after = eval_train_split()["detail"]["single/nir"]["mAP"]

    # 5 train ids, ~2 relevant of 10 gallery items -> chance mAP ~0.3;
    # a learning model should clearly exceed both chance and its init
    assert after > before + 0.05 or after > 0.85, (before, after)
    assert after > 0.5, (before, after)
