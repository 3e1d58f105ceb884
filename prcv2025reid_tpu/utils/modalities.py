"""Modality canonicalization and fixed orderings.

Reference: datasets/dataset.py:62-93 (CANON_DS / canon_mod / IMG_MODALITIES).

The TPU framework fixes a *static* modality ordering because batches are
dense ``[B, M, ...]`` tensors with slot index == modality id; all routing in
the encoder keys off these integer ids, never strings.
"""
from __future__ import annotations

from typing import Dict, Iterable, List, Optional

# Canonical names, fixed order. Vision slots come first so that slot index in
# the stacked image tensor equals the vision modality id.
VISION_MODALITIES = ("vis", "nir", "sk", "cp")
MODALITIES = VISION_MODALITIES + ("text",)

VISION_MODALITY_ID: Dict[str, int] = {m: i for i, m in enumerate(VISION_MODALITIES)}
MODALITY_ID: Dict[str, int] = {m: i for i, m in enumerate(MODALITIES)}

# Which vision modalities are single-channel (patchified from grayscale).
# Reference: models/patch_embeds.py:122-125 (nir/sk are 1-channel).
SINGLE_CHANNEL = ("nir", "sk")

# Alias map: dataset names / legacy names -> canonical.
# Reference: datasets/dataset.py:62-80 (CANON_DS).
_ALIASES: Dict[str, str] = {
    "vis": "vis", "rgb": "vis", "visible": "vis",
    "nir": "nir", "ir": "nir", "infrared": "nir",
    "sk": "sk", "sketch": "sk",
    "cp": "cp", "cpencil": "cp", "cp_drawing": "cp", "colorpencil": "cp",
    "text": "text", "txt": "text", "caption": "text",
}


def canon_mod(name: str) -> Optional[str]:
    """Map any alias to a canonical modality name; None if unknown."""
    if name is None:
        return None
    return _ALIASES.get(str(name).strip().lower())


def canon_mods(names: Iterable[str]) -> List[str]:
    out = []
    for n in names:
        c = canon_mod(n)
        if c is not None and c not in out:
            out.append(c)
    return out


def is_truthy(v) -> bool:
    """Truthiness helper for mask-ish annotation fields.

    Reference: datasets/dataset.py:82-93 (_truthy).
    """
    if isinstance(v, bool):
        return v
    if v is None:
        return False
    if isinstance(v, (int, float)):
        return v != 0
    if isinstance(v, str):
        return v.strip().lower() in ("1", "true", "yes", "y", "t")
    try:
        return len(v) > 0
    except TypeError:
        return bool(v)
