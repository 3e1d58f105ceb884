"""Host-side image augmentation (PIL + numpy).

Reference: datasets/dataset.py:259-307 (ModalityAugmentation) —
train: RandomResizedCrop(scale 0.8-1.0) + HFlip(0.5) + ColorJitter(0.2/0.2)
+ ImageNet normalize + RandomErasing(p=0.3); val: resize + normalize.

Output layout is NHWC float32 (TPU-friendly), not torch's CHW.
All randomness flows through an explicit numpy Generator so the pipeline is
reproducible and checkpointable (SURVEY.md §7 hard part 3).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _random_resized_crop_params(
    rng: np.random.Generator,
    width: int,
    height: int,
    scale: Tuple[float, float],
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
):
    """Sample (left, top, w, h) a la torchvision RandomResizedCrop."""
    area = width * height
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            left = int(rng.integers(0, width - w + 1))
            top = int(rng.integers(0, height - h + 1))
            return left, top, w, h
    # center-crop fallback
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = height, int(round(height * ratio[1]))
    else:
        w, h = width, height
    return (width - w) // 2, (height - h) // 2, w, h


class ImageTransform:
    """Train/val transform: PIL image -> normalized float32 [H, W, 3]."""

    def __init__(
        self,
        image_size: int = 224,
        train: bool = False,
        crop_scale_min: float = 0.8,
        flip: bool = True,
        color_jitter: float = 0.2,
        random_erase: float = 0.3,
    ):
        self.image_size = image_size
        self.train = train
        self.crop_scale_min = crop_scale_min
        self.flip = flip
        self.color_jitter = color_jitter
        self.random_erase = random_erase

    def set_crop_scale_min(self, value: float):
        """Augmentation relaxation hook (reference: train.py:1630-1644)."""
        self.crop_scale_min = value

    def __call__(
        self, img: Image.Image, rng: Optional[np.random.Generator] = None
    ) -> np.ndarray:
        S = self.image_size
        if self.train and rng is not None:
            left, top, w, h = _random_resized_crop_params(
                rng, img.width, img.height, (self.crop_scale_min, 1.0)
            )
            img = img.resize((S, S), Image.BILINEAR, box=(left, top, left + w, top + h))
            if self.flip and rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            x = np.asarray(img, np.float32) / 255.0
            if self.color_jitter > 0:
                # brightness then contrast, random order & factors (torchvision semantics)
                b = rng.uniform(1 - self.color_jitter, 1 + self.color_jitter)
                c = rng.uniform(1 - self.color_jitter, 1 + self.color_jitter)
                if rng.random() < 0.5:
                    x = np.clip(x * b, 0, 1)
                    gray = x.mean()
                    x = np.clip((x - gray) * c + gray, 0, 1)
                else:
                    gray = x.mean()
                    x = np.clip((x - gray) * c + gray, 0, 1)
                    x = np.clip(x * b, 0, 1)
        else:
            img = img.resize((S, S), Image.BILINEAR)
            x = np.asarray(img, np.float32) / 255.0

        x = (x - IMAGENET_MEAN) / IMAGENET_STD

        if self.train and rng is not None and self.random_erase > 0:
            if rng.random() < self.random_erase:
                x = self._erase(x, rng)
        return x

    @staticmethod
    def _erase(
        x: np.ndarray,
        rng: np.random.Generator,
        scale=(0.02, 0.33),
        ratio=(0.3, 3.3),
    ) -> np.ndarray:
        H, W = x.shape[:2]
        area = H * W
        for _ in range(10):
            target = area * rng.uniform(*scale)
            aspect = math.exp(rng.uniform(math.log(ratio[0]), math.log(ratio[1])))
            h = int(round(math.sqrt(target * aspect)))
            w = int(round(math.sqrt(target / aspect)))
            if h < H and w < W:
                top = int(rng.integers(0, H - h + 1))
                left = int(rng.integers(0, W - w + 1))
                x = x.copy()
                x[top : top + h, left : left + w] = 0.0
                return x
        return x
