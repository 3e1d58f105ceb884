#!/usr/bin/env python
"""Ahead-of-time serving artifact: jax.export (StableHLO) graph bundles.

The serving CLI (tools/serve_embed.py) is a live-Python server; this tool
produces the DEPLOYMENT shape: each serving graph — gallery embed, text
embed, single-modality and full-combo query embeds — exported as a
serialized StableHLO module with the checkpoint's weights baked in as
constants.  A consumer needs ``jax.export.deserialize`` and the target
platform's jaxlib — NO model code, checkpoint loader, tokenizer, or
config — and the artifact is immune to model-code drift: the graph that
was validated is the graph that serves.  (The reference has no
deployment story beyond running its torch repo; this is the TPU-native
equivalent of a SavedModel/TorchScript export.)

Each graph takes a batch dict (the serve_embed batch schema) and returns
L2-normalized fp32 ``[B, fusion_dim]`` features:

    {"images":      f32 [B, n_mods, S, S, 3],
     "image_mask":  f32 [B, n_mods],
     "text_tokens": i32 [B, context_length],
     "text_mask":   f32 [B]}

Layout of ``--out_dir``:
    manifest.json      {"graphs": {name: {"file", "modalities", "batch",
                        "platforms", "fusion_dim"}}, "config": {...}}
    <name>.stablehlo   serialized jax.export.Exported bytes

Usage:
    python tools/export_serving.py --model_path ckpt/best --out_dir art/
    python tools/export_serving.py --model_path ... --out_dir art/ --verify
    # consumer side (no repo code needed):
    #   ex = jax.export.deserialize(open("art/gallery_vis.stablehlo","rb").read())
    #   feats = ex.call(batch)
"""
import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export_graphs(config, model, variables, batch_size, graphs=None,
                  platforms=("cpu", "tpu"), fusion_mode="model"):
    """-> {name: (Exported, modalities tuple)} for the requested graphs.

    Default graph set: ``gallery_vis`` (the 45k-image volume path), every
    single non-vis modality, ``text``, and ``quad`` (every vision modality
    + text — the MM-4 query).  Weights are baked in as constants, so the
    export is the whole serving contract.  ``fusion_mode="weighted"``
    exports multi-modal combos through the reference FeatureExtractor's
    weighted sum instead of the model's fusion module (same dispatch rule
    as the live server/eval CLI: single-modality graphs are identical
    either way)."""
    import jax

    from prcv2025reid_tpu.training.train_step import (
        make_combo_embed_step,
        make_weighted_embed_step,
    )

    if fusion_mode not in ("model", "weighted"):
        raise SystemExit(f"unknown fusion_mode {fusion_mode!r}")

    mods_by_name = {"gallery_vis": ("vis",), "text": ("text",),
                    "quad": tuple(config.vision_modalities) + ("text",)}
    for m in config.vision_modalities:
        if m != "vis":
            mods_by_name[f"single_{m}"] = (m,)
    names = list(mods_by_name) if graphs is None else list(graphs)
    valid = tuple(config.vision_modalities) + ("text",)
    for n in names:
        # arbitrary combos export as e.g. combo_nir+text (MM-2/3 queries)
        if n.startswith("combo_") and n not in mods_by_name:
            mods = tuple(m for m in valid if m in n[len("combo_"):].split("+"))
            if mods:
                mods_by_name[n] = mods
    unknown = [n for n in names if n not in mods_by_name]
    if unknown:
        raise SystemExit(
            f"unknown graphs {unknown}; available: {sorted(mods_by_name)} "
            "or combo_<mod+mod+...>"
        )

    B, Mv, S = batch_size, len(config.vision_modalities), config.image_size
    import jax.numpy as jnp

    batch_spec = {
        "images": jax.ShapeDtypeStruct((B, Mv, S, S, 3), jnp.float32),
        "image_mask": jax.ShapeDtypeStruct((B, Mv), jnp.float32),
        "text_tokens": jax.ShapeDtypeStruct(
            (B, config.text_context_length), jnp.int32
        ),
        "text_mask": jax.ShapeDtypeStruct((B,), jnp.float32),
    }
    out = {}
    for name in names:
        mods = mods_by_name[name]
        if fusion_mode == "weighted" and len(mods) > 1:
            step = make_weighted_embed_step(model, mods)
        else:
            step = make_combo_embed_step(model, mods)

        def fn(batch, _step=step):
            return _step(variables, batch)  # weights -> artifact constants

        out[name] = (
            jax.export.export(jax.jit(fn), platforms=tuple(platforms))(
                batch_spec
            ),
            mods,
        )
    return out


def write_bundle(out_dir, config, model, variables, batch_size, graphs=None,
                 platforms=("cpu", "tpu"), fusion_mode="model"):
    """Export + write the artifact bundle (manifest.json + *.stablehlo +
    the tokenizer vocab when the checkpoint has one); -> the manifest
    dict.  The consumer contract is the manifest plus
    ``jax.export.deserialize`` — see tools/serve_artifact.py for a full
    HTTP server running from a bundle alone."""
    import shutil

    exported = export_graphs(config, model, variables, batch_size,
                             graphs=graphs, platforms=platforms,
                             fusion_mode=fusion_mode)
    os.makedirs(out_dir, exist_ok=True)
    # self-contained text path: a trained model's captions MUST go through
    # the same BPE vocab it trained with — ship it in the bundle so the
    # consumer cannot silently hash-tokenize (data/tokenizer.py invariant)
    tok_rel = None
    vocab_dir = getattr(config, "tokenizer_vocab_path", None)
    if vocab_dir:
        if os.path.isfile(vocab_dir):
            vocab_dir = os.path.dirname(vocab_dir)
        tok_dir = os.path.join(out_dir, "tokenizer")
        os.makedirs(tok_dir, exist_ok=True)
        for fname in ("vocab.json", "merges.txt"):
            src = os.path.join(vocab_dir, fname)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(tok_dir, fname))
                tok_rel = "tokenizer"
    manifest = {"graphs": {}, "config": {
        "fusion_dim": config.fusion_dim,
        "image_size": config.image_size,
        "vision_modalities": list(config.vision_modalities),
        "text_context_length": config.text_context_length,
        "text_vocab_size": config.text_vocab_size,
        "block_impl": config.block_impl,
        "attn_backend": config.attn_backend,
        "gelu_impl": config.gelu_impl,
        "fusion_mode": fusion_mode,
        "tokenizer": tok_rel,
    }}
    for name, (ex, mods) in exported.items():
        blob = ex.serialize()
        fname = f"{name}.stablehlo"
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(blob)
        manifest["graphs"][name] = {
            "file": fname,
            "modalities": list(mods),
            "batch": batch_size,
            "platforms": list(platforms),
            "fusion_dim": config.fusion_dim,
            "sha256": hashlib.sha256(blob).hexdigest(),
            "bytes": len(blob),
        }
        print(json.dumps({"exported": name, "bytes": len(blob)}))
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True, help="checkpoint dir")
    ap.add_argument("--out_dir", required=True)
    ap.add_argument(
        "--batch_size", type=int, default=None,
        help="static batch of the exported graphs (default = checkpoint "
        "config.inference_batch_size; B=160 is the measured v5e optimum)",
    )
    ap.add_argument(
        "--graphs", default=None,
        help="comma list (default: gallery_vis, every single non-vis "
        "modality, text, quad)",
    )
    ap.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma list of target platforms compiled into each artifact",
    )
    ap.add_argument(
        "--block_impl", default=None, choices=("xla", "fused", "fused_int8"),
    )
    ap.add_argument(
        "--attn_backend", default=None, choices=("xla", "splash", "onesaug"),
        help="serving-path override (onesaug+tanh is the gated serving "
        "recommendation — docs/performance.md)",
    )
    ap.add_argument(
        "--gelu_impl", default=None, choices=("erf", "tanh", "poly"),
    )
    ap.add_argument(
        "--fusion_mode", default="model", choices=("model", "weighted"),
        help="multi-modal combo fusion: the model's fusion module (default) "
        "or the reference FeatureExtractor's weighted sum (text 1.2) — "
        "mirrors the live server's --fusion_mode",
    )
    ap.add_argument(
        "--verify", action="store_true",
        help="after writing: deserialize every artifact from disk, run it "
        "on random inputs, and require exact agreement with the live model",
    )
    args = ap.parse_args(argv)

    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "serve_embed",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "serve_embed.py"),
    )
    serve_embed = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_embed)

    config, model, variables = serve_embed._load_model(
        args.model_path, args.block_impl, args.attn_backend, args.gelu_impl
    )
    B = args.batch_size or config.inference_batch_size
    graphs = args.graphs.split(",") if args.graphs else None
    platforms = tuple(p for p in args.platforms.split(",") if p)
    manifest = write_bundle(args.out_dir, config, model, variables, B,
                            graphs=graphs, platforms=platforms,
                            fusion_mode=args.fusion_mode)

    if args.verify:
        import jax
        import numpy as np

        from prcv2025reid_tpu.training.train_step import (
            make_combo_embed_step,
            make_weighted_embed_step,
        )

        rng = np.random.default_rng(0)
        Mv, S = len(config.vision_modalities), config.image_size
        batch = {
            "images": rng.normal(size=(B, Mv, S, S, 3)).astype(np.float32),
            "image_mask": (rng.random((B, Mv)) > 0.5).astype(np.float32),
            "text_tokens": rng.integers(
                0, config.text_vocab_size,
                size=(B, config.text_context_length), dtype=np.int32,
            ),
            "text_mask": np.ones((B,), np.float32),
        }
        for name, meta in manifest["graphs"].items():
            with open(os.path.join(args.out_dir, meta["file"]), "rb") as f:
                ex = jax.export.deserialize(f.read())
            got = np.asarray(ex.call(batch))
            mods = tuple(meta["modalities"])
            if args.fusion_mode == "weighted" and len(mods) > 1:
                step = make_weighted_embed_step(model, mods)
            else:
                step = make_combo_embed_step(model, mods)
            want = np.asarray(step(variables, batch))
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=name)
            print(json.dumps({"verified": name, "max_abs_err":
                              float(np.abs(got - want).max())}))
        print(json.dumps({"verify": "ok", "graphs": len(manifest["graphs"])}))


if __name__ == "__main__":
    main()
