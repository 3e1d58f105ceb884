"""HF CLIP -> native parameter-tree conversion.

Reproduces the reference's weight surgery (models/clip_backbone.py:224-252,
models/patch_embeds.py:78-106,150-167, models/mer_lora.py:101-106):

- 4 per-modality patch-embed copies from CLIP's patch conv; 1-channel
  modalities (nir/sk) take the channel-mean of the RGB kernel; every non-vis
  copy gets sigma=0.02 kernel noise (and sigma=0.01 bias noise) to break
  symmetry.
- CLS token + positional embedding cloned from the vision embeddings.
- All 12 vision blocks: LN1/LN2, Q/K/V/out projections, and MLP fc1/fc2 into
  the MER *shared* trunks; LoRA leaves stay at their framework init (A random,
  B zero => delta-W = 0, models/mer_lora.py:36-38).
- Vision final LN from ``post_layernorm``; vision_proj from
  ``visual_projection``; text tower copied wholesale; text_proj from
  ``text_projection``.

Input is a flat ``{hf_key: np.ndarray}`` state dict (from a torch CLIPModel's
``state_dict()`` or a safetensors/npz file); output is the framework's flax
param tree.  Torch Linear weights are [out, in] and are transposed to flax's
[in, out]; conv kernels [D, C, P, P] are re-laid-out to the patchify
(P, P, C, D) order (see prcv2025reid_tpu/models/vit.py:patchify).
"""
from __future__ import annotations

import copy
from typing import Dict, Mapping

import numpy as np

from prcv2025reid_tpu.utils.modalities import SINGLE_CHANNEL, VISION_MODALITIES

NOISE_KERNEL_STD = 0.02  # reference: models/patch_embeds.py:162
NOISE_BIAS_STD = 0.01  # reference: models/patch_embeds.py:166


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax kernel [in, out]."""
    return np.ascontiguousarray(w.T)


def _assign(tree: Dict, key: str, value, path: str):
    """Overwrite a template leaf with shape validation + dtype preservation.

    The template's dtype wins (param_dtype=f32 contract) so an fp16
    safetensors dump cannot silently downgrade training numerics, and a
    checkpoint/preset mismatch (e.g. patch32 weights into a patch16 template)
    fails HERE with the offending path instead of at model apply."""
    cur = np.asarray(tree[key])
    value = np.asarray(value)
    if value.shape != cur.shape:
        raise ValueError(
            f"shape mismatch at {path}/{key}: template {cur.shape} vs "
            f"checkpoint {value.shape} — wrong model preset for this CLIP "
            "checkpoint?"
        )
    tree[key] = value.astype(cur.dtype)


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a CLIP checkpoint from a local HF snapshot dir / file.

    Supports: a directory containing model.safetensors or pytorch_model.bin,
    a direct .safetensors / .bin / .npz path, or an HF repo id (e.g.
    ``openai/clip-vit-base-patch16`` = config.clip_model_name; resolved via
    transformers from the LOCAL cache only — the reference downloads at
    models/clip_backbone.py:170, but this environment has no egress).
    """
    import os

    if not os.path.exists(path) and "/" in path and not path.endswith(
        (".safetensors", ".bin", ".npz")
    ):
        import transformers

        model = transformers.CLIPModel.from_pretrained(path, local_files_only=True)
        return state_dict_from_torch_model(model)
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no checkpoint file found under {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def state_dict_from_torch_model(model) -> Dict[str, np.ndarray]:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def convert_clip_params(
    hf: Mapping[str, np.ndarray],
    params: Dict,
    seed: int = 0,
    modalities=VISION_MODALITIES,
) -> Dict:
    """Write CLIP weights into an initialized UnifiedEncoder param tree.

    ``params`` is the tree returned by ``UnifiedEncoder.init(...)`` —
    ``{'params': {'vision': ..., 'text': ..., 'text_proj': ...}}`` or the
    inner dict.  Returns a deep-copied updated tree (same structure).
    """
    out_root = copy.deepcopy(params)
    out = out_root["params"] if "params" in out_root else out_root
    rng = np.random.default_rng(seed)

    vis = out["vision"]

    # --- patch embeds (models/patch_embeds.py:78-106,150-167) ---
    conv = hf["vision_model.embeddings.patch_embedding.weight"]  # [D, C, P, P]
    kernel_rgb = conv.transpose(2, 3, 1, 0)  # [P, P, C, D]
    kernel_gray = conv.mean(axis=1, keepdims=True).transpose(2, 3, 1, 0)  # [P, P, 1, D]
    for mod in modalities:
        k = kernel_gray if mod in SINGLE_CHANNEL else kernel_rgb
        k = k.copy()
        pe = vis[f"patch_embed_{mod}"]
        bias = np.zeros_like(np.asarray(pe["bias"]))
        if mod != "vis":
            k = k + rng.normal(0, NOISE_KERNEL_STD, k.shape)
            bias = bias + rng.normal(0, NOISE_BIAS_STD, bias.shape)
        _assign(pe, "kernel", k, f"vision/patch_embed_{mod}")
        _assign(pe, "bias", bias, f"vision/patch_embed_{mod}")

    # --- cls / pos (models/clip_backbone.py:184-192) ---
    _assign(vis, "cls_token",
            hf["vision_model.embeddings.class_embedding"].reshape(1, 1, -1),
            "vision")
    _assign(vis, "pos_embed",
            hf["vision_model.embeddings.position_embedding.weight"], "vision")

    # --- vision blocks (models/clip_backbone.py:87-123) ---
    n_layers = sum(1 for k in vis if k.startswith("block_"))
    for i in range(n_layers):
        blk = vis[f"block_{i}"]
        p = f"vision_model.encoder.layers.{i}."
        at = f"vision/block_{i}"
        _assign(blk["ln1"], "scale", hf[p + "layer_norm1.weight"], at + "/ln1")
        _assign(blk["ln1"], "bias", hf[p + "layer_norm1.bias"], at + "/ln1")
        _assign(blk["ln2"], "scale", hf[p + "layer_norm2.weight"], at + "/ln2")
        _assign(blk["ln2"], "bias", hf[p + "layer_norm2.bias"], at + "/ln2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _assign(blk["attn"][proj]["shared"], "kernel",
                    _t(hf[p + f"self_attn.{proj}.weight"]), f"{at}/attn/{proj}")
            _assign(blk["attn"][proj]["shared"], "bias",
                    hf[p + f"self_attn.{proj}.bias"], f"{at}/attn/{proj}")
        for fc in ("fc1", "fc2"):
            _assign(blk["mlp"][fc]["shared"], "kernel",
                    _t(hf[p + f"mlp.{fc}.weight"]), f"{at}/mlp/{fc}")
            _assign(blk["mlp"][fc]["shared"], "bias",
                    hf[p + f"mlp.{fc}.bias"], f"{at}/mlp/{fc}")

    # --- vision final LN + projection (models/clip_backbone.py:241-252) ---
    _assign(vis["ln_final"], "scale", hf["vision_model.post_layernorm.weight"],
            "vision/ln_final")
    _assign(vis["ln_final"], "bias", hf["vision_model.post_layernorm.bias"],
            "vision/ln_final")
    _assign(vis["proj"], "kernel", _t(hf["visual_projection.weight"]),
            "vision/proj")

    # --- text tower (copied wholesale; models/clip_backbone.py:212-215,288-313) ---
    txt = out["text"]
    _assign(txt["token_embedding"], "embedding",
            hf["text_model.embeddings.token_embedding.weight"],
            "text/token_embedding")
    _assign(txt, "pos_embed",
            hf["text_model.embeddings.position_embedding.weight"], "text")
    n_text = sum(1 for k in txt if k.startswith("block_"))
    for i in range(n_text):
        blk = txt[f"block_{i}"]
        p = f"text_model.encoder.layers.{i}."
        at = f"text/block_{i}"
        _assign(blk["ln1"], "scale", hf[p + "layer_norm1.weight"], at + "/ln1")
        _assign(blk["ln1"], "bias", hf[p + "layer_norm1.bias"], at + "/ln1")
        _assign(blk["ln2"], "scale", hf[p + "layer_norm2.weight"], at + "/ln2")
        _assign(blk["ln2"], "bias", hf[p + "layer_norm2.bias"], at + "/ln2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _assign(blk[proj], "kernel", _t(hf[p + f"self_attn.{proj}.weight"]),
                    f"{at}/{proj}")
            _assign(blk[proj], "bias", hf[p + f"self_attn.{proj}.bias"],
                    f"{at}/{proj}")
        for fc in ("fc1", "fc2"):
            _assign(blk[fc], "kernel", _t(hf[p + f"mlp.{fc}.weight"]),
                    f"{at}/{fc}")
            _assign(blk[fc], "bias", hf[p + f"mlp.{fc}.bias"], f"{at}/{fc}")
    _assign(txt["ln_final"], "scale", hf["text_model.final_layer_norm.weight"],
            "text/ln_final")
    _assign(txt["ln_final"], "bias", hf["text_model.final_layer_norm.bias"],
            "text/ln_final")
    _assign(out["text_proj"], "kernel", _t(hf["text_projection.weight"]),
            "text_proj")

    return out_root


def main(argv=None):
    """CLI: convert a local HF CLIP snapshot to a native .npz param dump."""
    import argparse

    import jax
    import jax.numpy as jnp

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.models.encoder import UnifiedEncoder

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clip_path", required=True, help="local HF snapshot dir or file")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    config = TrainingConfig()
    enc = UnifiedEncoder.from_config(config, dtype=jnp.float32)
    rng = jax.random.PRNGKey(args.seed)
    imgs = jnp.zeros((1, len(config.vision_modalities), config.image_size, config.image_size, 3))
    toks = jnp.zeros((1, config.text_context_length), jnp.int32)
    params = enc.init(rng, imgs, toks)

    hf = load_hf_state_dict(args.clip_path)
    converted = convert_clip_params(hf, params, seed=args.seed)

    import flax.traverse_util as tu

    flat = tu.flatten_dict(converted, sep="/")
    np.savez(args.out, **{k: np.asarray(v) for k, v in flat.items()})
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
