"""Typed configuration for the TPU Re-ID framework.

Single source of truth for every hyperparameter, mirroring the reference's
``TrainingConfig`` (reference: configs/config.py:7-185) but with the
getattr-with-divergent-defaults pattern eliminated: every consumer reads a
declared, typed field.  TPU/JAX-specific knobs (mesh shape, dtype policy,
Pallas toggles) are new fields with no reference counterpart.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class TrainingConfig:
    # ----- data (reference: configs/config.py:10-16) -----
    data_root: str = "./data/train"
    json_file: str = "./data/train/text_annos.json"
    val_ratio: float = 0.2
    seed: int = 42

    # ----- model (reference: configs/config.py:18-48) -----
    clip_model_name: str = "openai/clip-vit-base-patch16"
    clip_weights_path: Optional[str] = None  # local HF snapshot / .npz; None = random init
    fusion_dim: int = 512
    vision_hidden_dim: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    vision_mlp_dim: int = 3072
    text_hidden_dim: int = 512
    text_layers: int = 12
    text_heads: int = 8
    text_mlp_dim: int = 2048
    text_vocab_size: int = 49408
    text_context_length: int = 77
    patch_size: int = 16
    image_size: int = 224

    # MER (reference: configs/config.py:26-29)
    enable_mer: bool = True
    mer_lora_rank: int = 4
    mer_lora_alpha: float = 1.0

    modalities: Tuple[str, ...] = ("vis", "nir", "sk", "cp", "text")
    freeze_text_backbone: bool = False
    drop_path: float = 0.15
    dropout_rate: float = 0.5

    # ----- batching (reference: configs/config.py:50-61) -----
    num_ids_per_batch: int = 3  # P
    instances_per_id: int = 2  # K (>=2 to guarantee vis/non-vis pairing)
    allow_id_reuse: bool = True
    sampling_fallback: bool = True  # soft-id fill + bucket swap when strong pool is short
    min_modal_coverage: float = 0.8  # warn when strong-id coverage drops below
    force_modal_pairs: bool = True  # per-id K//2 vis + K-K//2 non-vis split
    # None = auto-size to target_effective_batch (reference: train.py:1481-1488
    # accum = max(1, 16 // batch_size)); an explicit int overrides.
    gradient_accumulation_steps: Optional[int] = None
    target_effective_batch: int = 16  # reference: train.py:1481-1488
    freeze_backbone: bool = True
    num_epochs: int = 60
    steps_per_epoch: Optional[int] = None  # None = derived from sampler estimate

    # ----- layered learning rates (reference: configs/config.py:65-77) -----
    base_learning_rate: float = 5e-6  # CLIP shared trunk
    mer_learning_rate: float = 2e-5  # LoRA experts
    tokenizer_learning_rate: float = 2e-5  # non-shared patch embeds
    fusion_learning_rate: float = 2e-5  # projections / fusion / other
    head_learning_rate: float = 3e-3  # classifier head
    head_lr_warmup_epochs: int = 2  # head LR step-down start epoch
    weight_decay: float = 1e-4
    warmup_epochs: int = 5
    scheduler: str = "cosine"  # cosine | step | multistep | plateau (train.py:1490-1524)
    lr_floor_ratio: float = 0.01  # warmup start / cosine floor (reference: train.py:1250-1262)
    step_lr_every: int = 20  # 'step' scheduler period (epochs after warmup)
    step_lr_gamma: float = 0.1
    multistep_milestones: Tuple[int, ...] = (30, 50)
    # 'plateau' = ReduceLROnPlateau on eval map_avg2 (reference: train.py:1504-1510,
    # mode='max', factor=0.5, patience=8, threshold=0.001 rel, min_lr=base*0.001)
    plateau_factor: float = 0.5
    plateau_patience: int = 8
    plateau_threshold: float = 0.001
    plateau_min_scale: float = 0.001

    # stability (reference: configs/config.py:80-82, train.py:975-1045)
    adaptive_gradient_clip: bool = True
    max_grad_norm: float = 0.5
    adaptive_clip_min: float = 0.5
    adaptive_clip_max: float = 3.0
    adaptive_clip_pct: float = 0.70
    adaptive_clip_margin: float = 1.15
    adaptive_clip_window: int = 10
    # AdamW second-moment (nu) accumulator STORAGE dtype: "float32" (default)
    # or "bfloat16" (decay/bias-correction math stays f32; only the state
    # buffer is narrowed, halving its per-step HBM read+write traffic).
    # Promoted only through a same-day A/B pair + the trajectory-closeness
    # test (docs/performance.md train table).
    opt_nu_dtype: str = "float32"

    # ----- losses (reference: configs/config.py:84-116,173) -----
    ce_weight: float = 1.0
    label_smoothing: float = 0.1
    sdm_weight_warmup_epochs: int = 1
    sdm_weight_schedule: Tuple[float, ...] = (0.1, 0.3, 0.5)
    sdm_weight_initial: float = 0.1
    sdm_weight_final: float = 0.5
    sdm_weight_max: float = 0.5
    # SDM loss formulation: "unrolled" (default — one graph per non-vis
    # modality, reference-shaped) or "batched" (one vmapped [M-1,B,B] pass;
    # same math, measured in ops/losses.multimodal_sdm_loss_batched).
    sdm_impl: str = "unrolled"
    # The live SDM weight before the scheduler's first epoch-driven update
    # (reference: models/model.py:294 reads it at init; train.py:836-850 falls
    # back to it when scheduler metrics are missing).  0.0 = warmup-silent.
    contrastive_weight: float = 0.0
    # the reference hard-codes p=0.1 for BOTH SDM dropout sites (attention-
    # weight dropout and the projection dropout, models/model.py:19-45);
    # configurable here so deterministic golden-parity tests can zero it
    sdm_dropout: float = 0.1
    sdm_semantic_dim: int = 512
    sdm_num_heads: int = 8
    sdm_temperature: float = 0.2
    sdm_init_temperature: float = 0.18
    sdm_final_temperature: float = 0.16
    sdm_fallback_temperature: float = 0.20
    sdm_temp_warmup_epochs: int = 3

    # fusion module (reference: configs/config.py:112-114)
    fusion_num_heads: int = 8
    fusion_mlp_ratio: float = 2.0
    fusion_dropout: float = 0.1

    # ----- augmentation (reference: configs/config.py:119-122, datasets/dataset.py:259-307) -----
    random_flip: bool = True
    random_crop: bool = True
    crop_scale_min: float = 0.8  # relaxed to 0.6 at epoch 5 when stable (train.py:1630-1644)
    color_jitter: bool = True
    color_jitter_strength: float = 0.2
    random_erase: float = 0.3

    # modality dropout (reference: configs/config.py:124-127)
    modality_dropout: float = 0.15
    modality_dropout_warmup_epochs: int = 3
    min_modalities: int = 1

    # pair coverage health line (reference: configs/config.py:136-137)
    pair_coverage_target: float = 0.85
    pair_coverage_window: int = 100

    # ----- host pipeline -----
    # -1 = auto-size to the host: cpu_count - 1 decode workers (the main
    # process needs a core for collate/tokenize/dispatch), clamped to [1, 32].
    # The reference hardcodes 2 (train.py:1388-1396) — measured here, ONE
    # core decodes ~66 samples/s (native) against a chip that trains at
    # 229 samples/s and embeds 3,618/s: docs/data_pipeline.md has the
    # cores-per-chip budget.  0 = in-process (tests/debug).
    num_workers: int = -1
    prefetch_batches: int = 2
    tokenizer_vocab_path: Optional[str] = None  # CLIP vocab.json/merges.txt dir; None = hashed fallback

    # ----- save / eval (reference: configs/config.py:146-171) -----
    save_dir: str = "./checkpoints"
    log_dir: str = "./logs"
    save_freq: int = 20
    # overlap checkpoint storage writes with the next epoch's compute; the
    # device->host copy inside orbax save is synchronous either way, so the
    # donated train state is never raced (training/checkpoint.py)
    async_checkpoint: bool = True
    # (the reference's ``eval_freq`` field is dead even there — train.py:1532
    # clobbers it with eval_every_n_epoch — so it is not carried over)
    eval_sample_ratio: float = 0.3
    eval_include_patterns: Tuple[str, ...] = (
        "single/nir",
        "single/sk",
        "single/cp",
        "single/text",
        "quad/nir+sk+cp+text",
    )
    eval_every_n_epoch: int = 1
    do_eval: bool = True
    eval_cache_dir: str = "./.eval_cache"
    eval_cache_tag: str = "val_v1"
    eval_batch_size: int = 64
    inference_batch_size: int = 8  # serving-mode embed batch (tools/serve_embed.py)
    # best-mAP checkpoint location; None = "<save_dir>/best"
    best_model_path: Optional[str] = None
    tensorboard: bool = True  # scalar export to <log_dir>/tb (tensorboardX)

    # ----- TPU-specific (no reference counterpart) -----
    compute_dtype: str = "bfloat16"  # trunk compute; losses/stats stay fp32
    param_dtype: str = "float32"
    # mesh axis sizes; empty = auto (all visible devices, 1-D data-parallel).
    # Any non-empty value is honored, so --mesh_shape=1 really pins ONE device
    # (with the old (1,) default an explicit 1 was indistinguishable from
    # "unset" and silently used every device).  Tensor parallelism:
    # --mesh_shape=4,2 --mesh_axis_names=data,model shards qkv/fc1
    # column-parallel + out_proj/fc2 row-parallel over the 2nd axis
    # (parallel/tp.py; Megatron-style via GSPMD param placement)
    mesh_shape: Tuple[int, ...] = ()
    mesh_axis_names: Tuple[str, ...] = ("data",)
    # Pallas fused attention: measured SLOWER than the transpose-free XLA
    # einsum path on v5e at S=197 (docs/performance.md); kernels kept for
    # future tuning. 'False' selects the XLA path everywhere.
    # ----- multi-host runtime (no reference counterpart; SURVEY §5.8) -----
    # "off" (default) = single-process.  "auto" = jax.distributed.initialize()
    # only when a coordinator is discoverable (flag below or a managed-pod env
    # var) — safe to bake into launch scripts.  "on" = always initialize
    # (bare-metal multi-host: also set the three flags below on each host).
    # utils/distributed.py; train.py calls this before any device use.
    distributed: str = "off"
    coordinator_address: Optional[str] = None  # process 0's host:port
    num_processes: Optional[int] = None  # world size; None = auto-detect
    process_id: Optional[int] = None  # this process's rank; None = auto-detect
    use_pallas_attention: bool = False
    # attention core backend when use_pallas_attention is off: "xla" (einsum,
    # default), "splash" (upstream Mosaic flash kernel, S padded to 128
    # multiples under a key mask), or "onesaug" (XLA core with bf16 score
    # storage, no-max exp and the softmax denominator folded into the PV
    # matmul as a ones-column of V — zero [S,S] reduction passes; measured
    # 1.5x the einsum core at model shapes, min-cosine-gated in bench.py).
    # docs/performance.md has all the measurements.
    attn_backend: str = "xla"
    # GELU formulation on the folded (eval/serving) forward: "erf"
    # (reference-exact, jax.nn.gelu approximate=False), "tanh" (jax's
    # approximate GELU — max |err| 4.7e-4, measured fastest), or "poly"
    # (bf16-accuracy minimax erf polynomial, ops/kernel_math.gelu_poly_bf16).
    # XLA fuses the exact erf into the fc2 matmul prologue at 81 -> 47
    # TFLOP/s; tanh/poly recover it (fc1+gelu+fc2 chain measured 83.6 erf /
    # 111.4 tanh / 104.3 poly TFLOP/s — docs/performance.md round 3).
    # Training always uses exact erf; bench.py gates non-exact GELU on
    # embedding parity + ranking equivalence before it can win.
    gelu_impl: str = "erf"
    # TRAINING-path GELU backward scheduling: "stored" (default —
    # ops/kernel_math.gelu_stored: the forward's erf is saved as a residual
    # and the backward reuses it; exact math up to the residual's dtype
    # rounding; measured 6.65 vs 6.43 it/s at the 8x4 recipe batch) or
    # "remat" (XLA rematerializes the erf chain — no extra activation
    # memory; use for very large P*K where the ~155 MB/layer residuals
    # would not fit alongside the activations).
    gelu_bwd: str = "stored"
    # TRAINING-path attention backward scheduling: "stored" (XLA keeps the
    # [N, H, S, S] softmax probabilities as residuals — zero recompute) or
    # "remat" (jax.checkpoint on the attention core: the backward recomputes
    # QK + softmax from q/k/v, so no [S,S]-sized residual is ever stored —
    # attention activations are what make 64x4 not fit in 16 GB HBM,
    # docs/performance.md train table).  Exact math either way.
    attn_bwd: str = "stored"
    # Pallas fused fc1-gelu-fc2 kernel: measured SLOWER than XLA on v5e (the
    # erf GELU is VPU-bound and Mosaic serializes it against the MXU); kept
    # for future scheduling work. docs/performance.md has the numbers.
    use_fused_mlp: bool = False
    # Pallas fused residual+LayerNorm on the eval trunk: measured slower than
    # XLA even in isolation on this toolchain (0.91 vs 0.75 ms — Mosaic
    # elementwise codegen); see docs/performance.md. Kept for future tuning.
    use_fused_resln: bool = False
    # Fused block kernels for the folded eval/serving forward
    # (ops/fused_block.py): "xla" (default), "fused" (bf16 — LN/GELU/residual
    # fused into the matmul kernels, one VMEM pass each side of attention),
    # "fused_int8" (additionally int8-quantized matmuls for the v5e int8 MXU;
    # serving only — bench.py gates it on embedding parity vs the bf16 path).
    block_impl: str = "xla"
    # Native C++ host decode: JPEG decode + crop + resize in one pass through
    # data/native/image_decode.cpp (libjpeg + PIL-matching resampler); builds
    # on first use, falls back to PIL per-image when unavailable.
    use_native_decode: bool = False
    # Donate the train state into the jitted train step (XLA aliases the
    # param/optimizer/monitor buffers in place instead of allocating a fresh
    # copy each step).  Saves one full state footprint of peak HBM
    # (params + AdamW m/v, ~3x params) — the margin that lets large P*K
    # recipes keep gelu_bwd=stored.  The Trainer enables this; direct
    # make_train_step callers opt in (tests reuse pre-step state objects).
    donate_train_state: bool = True
    # jax.checkpoint on every transformer block: the backward recomputes
    # block activations instead of keeping them live — ~1/3 more forward
    # FLOPs for ~12x less activation memory, enabling larger P*K batches.
    remat_blocks: bool = False
    # remat granularity: "full" saves only block inputs; "dots" saves matmul
    # outputs and recomputes just the elementwise chains (LN/GELU) in the
    # backward — less recompute, less memory saving.
    remat_policy: str = "full"
    rank_topk: int = 100  # submission export depth (tools/eval_mm_protocol.py:629-643)
    # Gated FLOP reduction on the EVAL trunk (EViT-style, VERDICT r4 #4):
    # after block token_reduce_layer, keep the token_keep patch tokens most
    # cosine-similar to CLS, plus one merged token carrying the mean of the
    # dropped ones ('merge') or nothing ('prune').  INEXACT: may only become
    # the bench headline through BOTH promotion gates (min-cosine >= 0.999
    # AND ranking equivalence).  0 = off.  Training never reduces tokens
    # unless token_reduce_train is set (below).
    token_keep: int = 0
    token_reduce_layer: int = 6
    token_reduce_mode: str = "merge"  # 'merge' | 'prune'
    # Apply the token reduction during TRAINING too (fine-tune WITH the
    # reduction so the model concentrates identity evidence in the kept
    # tokens — the ROADMAP standby's "token-keep fine-tuning" step).  The
    # reduction is differentiable: gradients flow to the kept tokens through
    # the top-k gather and to all dropped tokens through the merged summary
    # token.  Top-k is deterministic, so resume stays bit-reproducible.
    # Default off: zero-shot reduction on a model trained full-token fails
    # the ranking gate (docs/performance.md round-5 table).
    token_reduce_train: bool = False

    # populated at runtime
    num_classes: Optional[int] = None

    @property
    def batch_size(self) -> int:
        """P*K, never set manually (reference: configs/config.py:54)."""
        return self.num_ids_per_batch * self.instances_per_id

    @property
    def accum_steps(self) -> int:
        """Resolved gradient-accumulation steps: auto-sized so
        batch_size * accum >= target_effective_batch when not set explicitly
        (reference: train.py:1481-1488, accum = max(1, 16 // batch))."""
        if self.gradient_accumulation_steps is not None:
            return max(1, int(self.gradient_accumulation_steps))
        return max(1, self.target_effective_batch // max(1, self.batch_size))

    @property
    def vision_modalities(self) -> Tuple[str, ...]:
        return tuple(m for m in self.modalities if m != "text")

    def __post_init__(self):
        # loud rejection of typoed compute-path selectors: these are raw
        # string CLI flags, and a silent fallback would serve the wrong path
        from prcv2025reid_tpu.utils.modalities import MODALITIES

        unknown_mods = [m for m in self.modalities if m not in MODALITIES]
        if unknown_mods:
            raise ValueError(
                f"unknown modalities {unknown_mods}; valid: {list(MODALITIES)}"
            )
        if len(set(self.modalities)) != len(self.modalities):
            raise ValueError(f"duplicate modalities: {self.modalities}")
        if not self.modalities or self.modalities[0] != "vis":
            # slot 0 is a structural anchor: the SDM loss anchors on vis_slot=0
            # and modality dropout never drops slot 0 (models/reid_model.py)
            raise ValueError(
                f"modalities must start with 'vis', got {self.modalities}"
            )
        if "text" in self.modalities and self.modalities[-1] != "text":
            # the model reserves the FINAL fusion slot for the text tower
            raise ValueError(
                f"'text' must be the last modality, got {self.modalities}"
            )
        valid_block = {"xla", "fused", "fused_int8", "fused_int8_mlp",
                       "fused_qkv", "fused_interpret", "fused_int8_interpret",
                       "fused_int8_mlp_interpret", "fused_qkv_interpret"}
        if self.block_impl not in valid_block:
            raise ValueError(
                f"block_impl={self.block_impl!r}; valid: {sorted(valid_block)}"
            )
        valid_attn = {"xla", "splash", "onesaug"}
        if self.attn_backend not in valid_attn:
            raise ValueError(
                f"attn_backend={self.attn_backend!r}; valid: {sorted(valid_attn)}"
            )
        if self.use_pallas_attention and self.attn_backend != "xla":
            # both flags select the attention core; silently preferring one
            # would benchmark/serve the wrong path (UnifiedEncoder.from_config
            # maps use_pallas_attention -> attn_impl='auto')
            raise ValueError(
                "use_pallas_attention=True conflicts with "
                f"attn_backend={self.attn_backend!r} — pick one attention core"
            )
        if self.distributed not in ("off", "auto", "on"):
            raise ValueError(
                f"distributed={self.distributed!r}; valid: ['auto', 'off', 'on']"
            )
        if self.gelu_impl not in ("erf", "tanh", "poly"):
            raise ValueError(
                f"gelu_impl={self.gelu_impl!r}; valid: ['erf', 'poly', 'tanh']"
            )
        if self.gelu_bwd not in ("remat", "stored"):
            raise ValueError(
                f"gelu_bwd={self.gelu_bwd!r}; valid: ['remat', 'stored']"
            )
        if self.attn_bwd not in ("remat", "stored"):
            raise ValueError(
                f"attn_bwd={self.attn_bwd!r}; valid: ['remat', 'stored']"
            )
        if self.remat_policy not in ("full", "dots"):
            raise ValueError(
                f"remat_policy={self.remat_policy!r}; valid: ['dots', 'full']"
            )
        if self.opt_nu_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"opt_nu_dtype={self.opt_nu_dtype!r}; valid: "
                "['bfloat16', 'float32']"
            )
        if self.sdm_impl not in ("unrolled", "batched"):
            raise ValueError(
                f"sdm_impl={self.sdm_impl!r}; valid: ['batched', 'unrolled']"
            )
        if self.token_reduce_mode not in ("merge", "prune"):
            raise ValueError(
                f"token_reduce_mode={self.token_reduce_mode!r}; valid: "
                "['merge', 'prune']"
            )
        if self.token_keep < 0:
            raise ValueError(f"token_keep={self.token_keep} must be >= 0")
        if self.token_keep and not (
            0 < self.token_reduce_layer < self.vision_layers
        ):
            raise ValueError(
                f"token_reduce_layer={self.token_reduce_layer} must be in "
                f"[1, vision_layers-1={self.vision_layers - 1}]"
            )
        if self.token_reduce_train and self.token_keep == 0:
            # a silent no-op here would "train with reduction" without
            # reducing anything — loud rejection like the impl selectors
            raise ValueError(
                "token_reduce_train=True requires token_keep > 0"
            )
        if self.num_workers < -1:
            raise ValueError(
                f"num_workers={self.num_workers} (use -1 for auto, 0 for "
                "in-process, or a positive worker count)"
            )

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def replace(self, **kw) -> "TrainingConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)

    @classmethod
    def from_json(cls, s: str) -> "TrainingConfig":
        raw = json.loads(s)
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in raw.items():
            if k not in fields:
                continue
            if isinstance(v, list):
                v = tuple(v)
            kw[k] = v
        return cls(**kw)


# ----- model presets (CLIP families the encoder/converter support) -----
# The reference hard-codes ViT-B/16 (configs/config.py:19); the encoder here
# is dimension-generic, so other CLIP families are config presets.
MODEL_PRESETS = {
    "clip-vit-base-patch16": dict(
        clip_model_name="openai/clip-vit-base-patch16",
        vision_hidden_dim=768, vision_layers=12, vision_heads=12,
        vision_mlp_dim=3072, patch_size=16,
        text_hidden_dim=512, text_layers=12, text_heads=8, text_mlp_dim=2048,
        fusion_dim=512,
    ),
    "clip-vit-base-patch32": dict(
        clip_model_name="openai/clip-vit-base-patch32",
        vision_hidden_dim=768, vision_layers=12, vision_heads=12,
        vision_mlp_dim=3072, patch_size=32,
        text_hidden_dim=512, text_layers=12, text_heads=8, text_mlp_dim=2048,
        fusion_dim=512,
    ),
    "clip-vit-large-patch14": dict(
        clip_model_name="openai/clip-vit-large-patch14",
        vision_hidden_dim=1024, vision_layers=24, vision_heads=16,
        vision_mlp_dim=4096, patch_size=14,
        text_hidden_dim=768, text_layers=12, text_heads=12, text_mlp_dim=3072,
        fusion_dim=768,
    ),
}


def apply_model_preset(config: TrainingConfig, preset: str) -> TrainingConfig:
    if preset not in MODEL_PRESETS:
        raise ValueError(f"unknown model preset {preset!r}; have {sorted(MODEL_PRESETS)}")
    return config.replace(**MODEL_PRESETS[preset])


def apply_cli_overrides(config: TrainingConfig, argv: List[str]) -> TrainingConfig:
    """Apply ``--key=value`` CLI overrides onto a config.

    The reference has no CLI for training (SURVEY.md 5.6); this closes that gap
    with typed parsing driven by the dataclass field types.
    """
    fields = {f.name: f for f in dataclasses.fields(TrainingConfig)}
    updates = {}
    for arg in argv:
        if not arg.startswith("--"):
            raise ValueError(f"unrecognized argument: {arg!r} (expected --key=value)")
        if "=" not in arg:
            key, raw = arg[2:], "true"
        else:
            key, raw = arg[2:].split("=", 1)
        key = key.replace("-", "_")
        if key not in fields:
            raise ValueError(f"unknown config field: {key!r}")
        updates[key] = _parse_value(raw, config, key)
    return config.replace(**updates)


def _parse_value(raw: str, config: TrainingConfig, key: str):
    current = getattr(config, key)
    if isinstance(current, bool):
        return raw.lower() in ("1", "true", "yes", "on")
    if isinstance(current, int):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        items = [x for x in raw.split(",") if x]
        if current and isinstance(current[0], float):
            return tuple(float(x) for x in items)
        if current and isinstance(current[0], int):
            return tuple(int(x) for x in items)
        if not current:
            # empty default (e.g. mesh_shape=()) carries no element type —
            # infer per item so --mesh_shape=4,2 yields ints, not strings
            def _coerce(x):
                try:
                    return int(x)
                except ValueError:
                    try:
                        return float(x)
                    except ValueError:
                        return x

            return tuple(_coerce(x) for x in items)
        return tuple(items)
    if current is None:
        if raw.lower() in ("none", "null", ""):
            return None
        try:
            return int(raw)
        except ValueError:
            return raw
    return raw
