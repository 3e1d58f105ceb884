"""Checkpoint <-> flat .npz conversion for serving.

Orbax checkpoints are directory trees tied to the training stack; serving and
external tools want a single flat file.  This exports {params, batch_stats}
(the inference state) to one .npz keyed by '/'-joined tree paths, and loads
it back into a matching tree template.

CLI:
    python -m prcv2025reid_tpu.tools.export_params \
        --model_path ./checkpoints/best --out model.npz
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def params_to_npz(path: str, variables: Dict) -> str:
    """Returns the actual written path (np.savez appends '.npz' silently)."""
    import flax.traverse_util as tu

    if not path.endswith(".npz"):
        path = path + ".npz"
    flat = tu.flatten_dict(variables, sep="/")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})
    return path


def npz_to_params(path: str, template: Dict) -> Dict:
    """Load a flat npz into the structure of ``template`` (shapes checked)."""
    import flax.traverse_util as tu
    import jax.numpy as jnp

    z = np.load(path)
    flat_t = tu.flatten_dict(template, sep="/")
    out = {}
    missing = [k for k in flat_t if k not in z.files]
    extra = [k for k in z.files if k not in flat_t]
    if missing or extra:
        raise ValueError(f"npz/tree mismatch: missing={missing[:5]} extra={extra[:5]}")
    for k, tv in flat_t.items():
        arr = z[k]
        if tuple(arr.shape) != tuple(np.shape(tv)):
            raise ValueError(f"shape mismatch at {k}: {arr.shape} vs {np.shape(tv)}")
        out[k] = jnp.asarray(arr)
    return tu.unflatten_dict({tuple(k.split("/")): v for k, v in out.items()})


def main(argv=None):
    import argparse
    import json
    import os

    import jax
    import jax.numpy as jnp

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.training.checkpoint import restore_checkpoint
    from prcv2025reid_tpu.training.param_groups import build_optimizer
    from prcv2025reid_tpu.training.train_step import TrainState

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args(argv)

    with open(os.path.join(args.model_path, "host_state.json")) as f:
        host = json.load(f)
    config = TrainingConfig.from_json(host["config"])
    model = MultiModalReIDModel(config=config, num_classes=host["num_classes"])
    B, S, Mv = 2, config.image_size, len(config.vision_modalities)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, Mv, S, S, 3), jnp.float32),
        jnp.ones((B, Mv), jnp.float32),
        jnp.zeros((B, config.text_context_length), jnp.int32),
        jnp.ones((B,), jnp.float32),
        train=False,
    )
    tx = build_optimizer(config, variables["params"], steps_per_epoch=1)
    template = TrainState.create(
        variables["params"], variables["batch_stats"], tx, jax.random.PRNGKey(1)
    )
    ckpt_path = os.path.abspath(args.model_path)  # abspath strips any trailing /
    state, _ = restore_checkpoint(
        os.path.dirname(ckpt_path), template, name=os.path.basename(ckpt_path)
    )
    written = params_to_npz(
        args.out, {"params": state.params, "batch_stats": state.batch_stats}
    )
    print(f"wrote {written}")


if __name__ == "__main__":
    main()
