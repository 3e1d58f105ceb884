"""prcv2025reid_tpu — TPU-native multi-modal person Re-ID framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
LingmaFuture/PRCV2025REID (reference at /root/reference):

- CLIP ViT-B/16 unified encoder with MER (Modality-Expert Router) LoRA
  adapters, non-shared per-modality patch embeddings, and the CLIP text tower
  (reference: models/clip_backbone.py, models/mer_lora.py,
  models/patch_embeds.py).
- SDM vis-anchored cross-modal alignment loss + BN-Neck ID classification
  (reference: models/sdm_loss.py, models/model.py).
- Strict P x K modality-paired batching, ORBench-style dataset handling
  (reference: datasets/dataset.py).
- Competition MM-1..4 retrieval protocol + submission export
  (reference: train.py:503-639, tools/eval_mm_protocol.py).

Design is TPU-first: one batched encoder call routes all vision modalities
through a shared trunk with stacked-LoRA expert selection (static shapes, no
per-modality Python dispatch), losses are fully mask-based, evaluation is a
sharded matmul + top-k over a jax.sharding.Mesh, and the hot attention path
has a Pallas fused kernel.
"""

__version__ = "0.1.0"

from prcv2025reid_tpu.configs import TrainingConfig  # noqa: F401
from prcv2025reid_tpu.utils.modalities import (  # noqa: F401
    MODALITIES,
    VISION_MODALITIES,
    canon_mod,
)
