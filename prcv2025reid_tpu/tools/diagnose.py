"""Model diagnostics: activation-norm probes + zero-feature detection.

The reference's (stale) debug_prenorm_zero.py probed per-layer activation
norms with forward hooks to hunt zero/exploding features (SURVEY.md §2.7:
its *ideas* inform the rebuild's debugging tools).  The JAX equivalent uses
flax's ``capture_intermediates`` — no hooks, one extra forward.

Usage (library):
    from prcv2025reid_tpu.tools.diagnose import activation_report
    report = activation_report(model, variables, batch)

CLI:
    python -m prcv2025reid_tpu.tools.diagnose --model_path ./checkpoints/best \
        --dataset_root /data/orbench
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def activation_report(
    model,
    variables,
    batch: Dict,
    *,
    zero_threshold: float = 1e-6,
    explode_threshold: float = 1e3,
) -> Dict[str, Dict]:
    """Run one eval forward capturing every module output; return per-path
    {mean_norm, max_abs, zero_fraction, flagged}."""
    outputs, state = model.apply(
        variables,
        batch["images"],
        batch["image_mask"],
        batch["text_tokens"],
        batch["text_mask"],
        train=False,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    flat = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, (tuple, list)):
            for i, v in enumerate(tree):
                walk(v, path + (str(i),))
        else:
            flat["/".join(path)] = tree

    walk(state["intermediates"], ())

    report = {}
    for path, arr in flat.items():
        if not hasattr(arr, "shape") or arr.size == 0:
            continue
        a = np.asarray(arr, np.float32)
        row_norms = np.linalg.norm(a.reshape(a.shape[0], -1), axis=1) if a.ndim > 1 else np.abs(a)
        entry = {
            "shape": tuple(a.shape),
            "mean_norm": float(row_norms.mean()),
            "max_abs": float(np.abs(a).max()),
            "zero_fraction": float((np.abs(a) < zero_threshold).mean()),
            "nonfinite": int((~np.isfinite(a)).sum()),
        }
        entry["flagged"] = bool(
            entry["nonfinite"] > 0
            or entry["zero_fraction"] > 0.99
            or entry["max_abs"] > explode_threshold
        )
        report[path] = entry
    return report


def summarize(report: Dict[str, Dict], only_flagged: bool = False) -> List[str]:
    lines = []
    for path, e in sorted(report.items()):
        if only_flagged and not e["flagged"]:
            continue
        flag = " <-- FLAGGED" if e["flagged"] else ""
        lines.append(
            f"{path}: shape={e['shape']} norm={e['mean_norm']:.3g} "
            f"max|x|={e['max_abs']:.3g} zeros={e['zero_fraction']:.1%} "
            f"nonfinite={e['nonfinite']}{flag}"
        )
    return lines


def main(argv=None):
    import argparse
    import json as _json
    import os

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--json_file", default=None)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--only_flagged", action="store_true")
    args = ap.parse_args(argv)

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.data.dataset import MultiModalDataset
    from prcv2025reid_tpu.data.pipeline import collate
    from prcv2025reid_tpu.data.tokenizer import build_tokenizer
    from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
    from prcv2025reid_tpu.training.checkpoint import restore_checkpoint
    from prcv2025reid_tpu.training.param_groups import build_optimizer
    from prcv2025reid_tpu.training.train_step import TrainState

    with open(os.path.join(args.model_path, "host_state.json")) as f:
        host = _json.load(f)
    config = TrainingConfig.from_json(host["config"]).replace(
        data_root=args.dataset_root,
        json_file=args.json_file or os.path.join(args.dataset_root, "text_annos.json"),
    )
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
    ds = MultiModalDataset(config, "val")
    tok = build_tokenizer(
        config.tokenizer_vocab_path, config.text_vocab_size, config.text_context_length
    )
    rng = np.random.default_rng(0)
    samples = [ds.get_sample(i, rng) for i in range(min(args.batch_size, len(ds)))]
    batch = collate(samples, tok)
    report = activation_report(
        model, {"params": state.params, "batch_stats": state.batch_stats}, batch
    )
    print("\n".join(summarize(report, only_flagged=args.only_flagged)))


if __name__ == "__main__":
    main()
