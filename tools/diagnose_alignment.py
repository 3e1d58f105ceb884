#!/usr/bin/env python
"""Cross-modal alignment diagnostic for a trained checkpoint.

Answers the question the flagship probe's flat SDM curve raises (round-4/5
evidence: CE descends, classifier top-1 rises, SDM sits at ln(B), val mAP
stays at random): is the TRUNK learning identity structure at all (vis-vis
same-id cosine above diff-id), and is only the CROSS-modal alignment
(nir/sk/cp/text vs vis) failing — or is nothing moving outside the
classifier head?

Loads a checkpoint dir (host_state.json + orbax state), embeds a balanced
sample of the dataset per modality with the PER-MODALITY raw features (the
exact tensors the SDM loss consumes), and prints a same-id vs diff-id
cosine panel per modality pair.

Usage:
    python tools/diagnose_alignment.py --model_path /tmp/fp_full/ckpt/best \
        --dataset_root /tmp/fp_full/orbench [--cpu] [--ids 24]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--ids", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import serve_embed

    from prcv2025reid_tpu.data.dataset import MultiModalDataset
    from prcv2025reid_tpu.data.pipeline import collate
    from prcv2025reid_tpu.data.tokenizer import build_tokenizer
    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()
    config, model, variables = serve_embed._load_model(args.model_path)
    config = config.replace(
        data_root=args.dataset_root,
        json_file=os.path.join(args.dataset_root, "text_annos.json"),
    )
    ds = MultiModalDataset(config, "train")
    tok = build_tokenizer(
        config.tokenizer_vocab_path,
        config.text_vocab_size,
        config.text_context_length,
    )

    rng = np.random.default_rng(0)
    # 2 samples per id, first --ids ids -> same-id pairs exist per modality
    by_pid = {}
    for i, rec in enumerate(ds.records):
        by_pid.setdefault(rec.pid, []).append(i)
    pids = sorted(by_pid)[: args.ids]
    idxs = [i for p in pids for i in by_pid[p][:2]]
    samples = [ds.get_sample(i, rng, modality_dropout=None) for i in idxs]
    batch = collate(samples, tok)
    B = len(idxs)
    labels = np.asarray(batch["labels"])

    @jax.jit
    def fwd(variables, images, image_mask, tokens, text_mask):
        out = model.apply(
            variables, images, image_mask, tokens, text_mask, train=False
        )
        return out["raw_modality_features"], out["feature_masks"]

    feats, masks = fwd(
        variables,
        jnp.asarray(batch["images"]),
        jnp.asarray(batch["image_mask"]),
        jnp.asarray(batch["text_tokens"]),
        jnp.asarray(batch["text_mask"]),
    )
    feats = np.asarray(feats, np.float64)  # [M, B, D]
    masks = np.asarray(masks)  # [M, B]
    mods = list(config.vision_modalities) + ["text"]
    fn = feats / np.maximum(
        np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12
    )

    same = labels[:, None] == labels[None, :]
    eye = np.eye(B, dtype=bool)
    print(f"{B} samples, {len(pids)} ids — cosine panel "
          "(same-id mean / diff-id mean / gap):")
    for a, ma in enumerate(mods):
        for b, mb in enumerate(mods):
            if b < a:
                continue
            valid = (masks[a][:, None] * masks[b][None, :]) > 0
            off = valid & ~eye if a == b else valid
            S = fn[a] @ fn[b].T
            s_same = S[same & off]
            s_diff = S[~same & off]
            if s_same.size == 0 or s_diff.size == 0:
                continue
            gap = s_same.mean() - s_diff.mean()
            flag = " <-- ALIGNED" if gap > 0.05 else ""
            print(f"  {ma:>4s} x {mb:<4s}: {s_same.mean():+.4f} / "
                  f"{s_diff.mean():+.4f} / gap {gap:+.4f}{flag}")


if __name__ == "__main__":
    main()
