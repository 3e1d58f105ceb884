#!/usr/bin/env python
"""Training entry point (reference: train.py::train_multimodal_reid).

Usage:
    python train.py [--key=value ...]

Every TrainingConfig field is overridable, e.g.:
    python train.py --data_root=/data/orbench --num_epochs=60 \
        --clip_weights_path=/ckpts/clip-vit-base-patch16
"""
import logging
import sys


def main(argv=None):
    from prcv2025reid_tpu.configs import TrainingConfig, apply_cli_overrides
    from prcv2025reid_tpu.training.trainer import Trainer

    argv = list(sys.argv[1:] if argv is None else argv)
    config = TrainingConfig()
    for arg in list(argv):
        if arg.startswith("--model_preset="):
            from prcv2025reid_tpu.configs import apply_model_preset

            config = apply_model_preset(config, arg.split("=", 1)[1])
            argv.remove(arg)
    config = apply_cli_overrides(config, argv)

    # multi-host: must run before anything touches devices (a lazily
    # initialized backend cannot be re-initialized) — utils/distributed.py
    from prcv2025reid_tpu.utils.distributed import (
        initialize_from_config,
        is_main_process,
    )

    initialize_from_config(config)

    import os

    os.makedirs(config.log_dir, exist_ok=True)
    # only process 0 writes training.log (log_dir may be shared storage);
    # every process still logs to its own console stream
    handlers = [logging.StreamHandler()]
    if is_main_process():
        handlers.append(
            logging.FileHandler(f"{config.log_dir}/training.log", delay=True)
        )
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=handlers,
    )

    trainer = Trainer(config)
    result = trainer.fit()
    logging.info("training done: %s", result)
    return result


if __name__ == "__main__":
    main()
