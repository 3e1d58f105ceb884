"""The training orchestrator — the TPU counterpart of
train.py::train_multimodal_reid (reference: train.py:1264-1783).

Wires: dataset split -> strict P x K pipeline -> model init (+ optional CLIP
weights) -> layered-LR optimizer -> epoch loop with SDM scheduling, health
monitors, per-epoch whitelist eval, best/periodic checkpointing, TRUE resume,
and CSV histories.  All heavy compute is inside the jitted train/embed steps;
the loop touches device values only at log frequency.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from prcv2025reid_tpu.configs import TrainingConfig
from prcv2025reid_tpu.data.pipeline import HostPipeline, prefetch_to_device
from prcv2025reid_tpu.data.sampler import PKBatchSampler
from prcv2025reid_tpu.data.split import create_split_datasets, verify_split_integrity
from prcv2025reid_tpu.data.tokenizer import build_tokenizer
from prcv2025reid_tpu.data.dataset import analyze_sampling_capability
from prcv2025reid_tpu.evaluation.protocol import GalleryCache, evaluate_protocol
from prcv2025reid_tpu.models.reid_model import MultiModalReIDModel
from prcv2025reid_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    data_axis_size,
)
from prcv2025reid_tpu.parallel.tp import shard_state
from prcv2025reid_tpu.training.checkpoint import (
    finalize_pending_saves,
    latest_checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from prcv2025reid_tpu.training.monitors import (
    BatchCountReport,
    CEDiagnostics,
    FeatureNormMonitor,
    MetricsHistory,
    PairCoverageMonitor,
    SpikeDetector,
    batch_composition,
)
from prcv2025reid_tpu.training.param_groups import (
    build_optimizer,
    count_trainable,
    set_plateau_scale,
)
from prcv2025reid_tpu.training.schedulers import PlateauScheduler, SDMScheduler
from prcv2025reid_tpu.utils.distributed import is_main_process
from prcv2025reid_tpu.training.train_step import (
    RING_CHANNELS,
    TrainState,
    make_combo_embed_step,
    make_train_step,
)

LOG_EVERY = 100  # fetch device metrics at this cadence (train.py:1119-1120)

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, config: TrainingConfig, mesh=None):
        self.config = config
        os.makedirs(config.save_dir, exist_ok=True)
        os.makedirs(config.log_dir, exist_ok=True)

        # --- data (train.py:1276-1404) ---
        self.train_ds, self.val_ds, pid2label = create_split_datasets(config)
        verify_split_integrity(self.train_ds, self.val_ds)
        self.num_classes = len(pid2label)
        report = analyze_sampling_capability(self.train_ds)
        if not report["pairable"]:
            raise RuntimeError(
                f"no pairable identities — training cannot proceed: {report}"
            )
        logger.info("sampling capability: %s", report)
        from prcv2025reid_tpu.data.dataset import quick_scan

        scan = quick_scan(self.train_ds)
        logger.info("quick_scan: %s", scan)
        if scan["legacy_names"]:
            logger.warning(
                "legacy modality directory names in data_root: %s — "
                "normalization did not run (reference dataset.py:158-185)",
                scan["legacy_names"],
            )

        self.tokenizer = build_tokenizer(
            config.tokenizer_vocab_path,
            config.text_vocab_size,
            config.text_context_length,
        )
        self.sampler = PKBatchSampler(
            self.train_ds,
            config.num_ids_per_batch,
            config.instances_per_id,
            allow_id_reuse=config.allow_id_reuse,
            seed=config.seed,
            steps_per_epoch=config.steps_per_epoch,
            force_modal_pairs=config.force_modal_pairs,
            sampling_fallback=config.sampling_fallback,
            min_modal_coverage=config.min_modal_coverage,
        )
        # model-level dropout handles modality dropout; the per-sample path
        # stays off so masks reflect data availability
        self.pipeline = HostPipeline(
            self.train_ds,
            self.sampler,
            self.tokenizer,
            num_workers=config.num_workers,
            prefetch=config.prefetch_batches,
            seed=config.seed,
            modality_dropout=0.0,
        )

        # --- mesh + model (train.py:1406-1425) ---
        self.mesh = (
            mesh
            if mesh is not None
            else create_mesh(config, batch_size=config.batch_size)
        )
        self.model = MultiModalReIDModel(config=config, num_classes=self.num_classes)
        rng = jax.random.PRNGKey(config.seed)
        B = config.batch_size
        S = config.image_size
        variables = self.model.init(
            {"params": rng},
            jnp.zeros((B, len(config.vision_modalities), S, S, 3), jnp.float32),
            jnp.ones((B, len(config.vision_modalities)), jnp.float32),
            jnp.zeros((B, config.text_context_length), jnp.int32),
            jnp.ones((B,), jnp.float32),
            train=False,
        )
        params = variables["params"]
        if config.clip_weights_path:
            from prcv2025reid_tpu.tools.convert_clip import (
                convert_clip_params,
                load_hf_state_dict,
            )

            # "hf" = resolve via the model name the preset declares
            # (reference loads by name at models/clip_backbone.py:170)
            src = (
                config.clip_model_name
                if config.clip_weights_path == "hf"
                else config.clip_weights_path
            )
            hf = load_hf_state_dict(src)
            enc_tree = {"params": params["encoder"]}
            converted = convert_clip_params(hf, enc_tree, seed=config.seed)
            params = dict(params)
            params["encoder"] = converted["params"]
            logger.info("loaded CLIP weights from %s", config.clip_weights_path)

        steps_per_epoch = len(self.sampler)
        if config.accum_steps > 1:
            logger.info(
                "gradient accumulation: %d x %d = effective batch %d "
                "(target %d, reference train.py:1481-1488)",
                config.batch_size,
                config.accum_steps,
                config.batch_size * config.accum_steps,
                config.target_effective_batch,
            )
        self.tx = build_optimizer(config, params, steps_per_epoch)
        self.state = TrainState.create(
            params,
            variables["batch_stats"],
            self.tx,
            jax.random.PRNGKey(config.seed + 1),
            ring_size=steps_per_epoch,
            clip_window=config.adaptive_clip_window,
        )
        # 1-D mesh: replicated; 2-D (data, model): tensor-parallel placement
        self.state = shard_state(self.state, self.mesh)
        self.train_step = make_train_step(
            self.model, self.tx, config, donate=config.donate_train_state
        )
        self._embed_cache: Dict = {}

        counts = count_trainable(
            params, config.freeze_backbone, config.freeze_text_backbone
        )
        logger.info("param groups: %s", counts)

        # --- host-side state ---
        self.sdm_scheduler = SDMScheduler.from_config(config)
        self.spike_detector = SpikeDetector()
        self.pair_coverage = PairCoverageMonitor(
            window=config.pair_coverage_window, target=config.pair_coverage_target
        )
        self.ce_diag = CEDiagnostics(self.num_classes)
        self.feat_norm_monitor = FeatureNormMonitor()
        self.batch_counts = BatchCountReport(len(self.sampler))
        self.plateau = (
            PlateauScheduler.from_config(config) if config.scheduler == "plateau" else None
        )
        # separate event dirs per history — tensorboardX names event files by
        # whole-second timestamp, so two writers in one dir collide.
        # Multi-host: only process 0 writes event files / CSV histories
        # (log_dir may be shared storage; N writers of whole-file rewrites
        # are a race) — every process still ACCUMULATES history rows so a
        # later promotion to main (resume on new topology) has them.
        tb = config.tensorboard and is_main_process()
        self.train_history = MetricsHistory(
            os.path.join(config.log_dir, "tb", "train") if tb else None,
            tag_prefix="train/",
        )
        self.eval_history = MetricsHistory(
            os.path.join(config.log_dir, "tb", "eval") if tb else None,
            tag_prefix="eval/",
        )
        self.start_epoch = 1
        self.best_map = 0.0
        self._crop_relaxed = False

    def _relax_augmentation(self):
        """Crop scale 0.8 -> 0.6 (train.py:1630-1644); worker processes hold
        a pickled dataset copy, so they must be refreshed to see the change."""
        self._crop_relaxed = True
        self.train_ds.transform.set_crop_scale_min(0.6)
        self.pipeline.refresh_workers()
        logger.info("augmentation relaxed: crop scale 0.8 -> 0.6")

    # ----- embed fns, one per modality combo -----

    def embed_factory(self, modalities):
        key = tuple(modalities)
        if key not in self._embed_cache:
            self._embed_cache[key] = make_combo_embed_step(self.model, key)
        return self._embed_cache[key]

    # ----- resume -----

    def maybe_resume(self) -> bool:
        if not latest_checkpoint_exists(self.config.save_dir):
            return False
        self.state, host = restore_checkpoint(self.config.save_dir, self.state)
        # restored arrays may land with checkpoint-topology shardings — re-place
        # on THIS mesh (no-op when they already match)
        self.state = shard_state(self.state, self.mesh)
        self.start_epoch = host["epoch"] + 1
        self.best_map = host["best_map"]
        self.sdm_scheduler.load_state_dict(host["sdm_scheduler"])
        self.spike_detector.load_state_dict(host["spike_detector"])
        self.sampler.load_state_dict(host["sampler"])
        if self.plateau is not None and host.get("plateau"):
            self.plateau.load_state_dict(host["plateau"])
        if host.get("crop_relaxed"):
            self._relax_augmentation()  # re-apply the relaxed distribution
        # reload histories: to_csv rewrites whole files, so without this a
        # resumed run's first epoch-end write would erase every prior row
        self.train_history.load_csv(
            os.path.join(self.config.log_dir, "train_history.csv")
        )
        self.eval_history.load_csv(
            os.path.join(self.config.log_dir, "eval_history.csv")
        )
        logger.info("resumed from epoch %d (best mAP %.4f)", host["epoch"], self.best_map)
        return True

    def _host_state(self, epoch: int) -> Dict:
        return {
            "epoch": epoch,
            "best_map": self.best_map,
            "sdm_scheduler": self.sdm_scheduler.state_dict(),
            "spike_detector": self.spike_detector.state_dict(),
            "sampler": self.sampler.state_dict(),
            "plateau": self.plateau.state_dict() if self.plateau is not None else None,
            "crop_relaxed": self._crop_relaxed,
            "num_classes": self.num_classes,
            "config": self.config.to_json(),
        }

    # ----- epoch loop -----

    def train_epoch(self, epoch: int, train_metrics_prev: Optional[Dict] = None) -> Dict:
        cfg = self.config
        self.pipeline.set_epoch(epoch)
        # single authority for the live (weight, tau) — see SDMScheduler.get_parameters
        sdm_weight, sdm_tau = self.sdm_scheduler.get_parameters(
            epoch, train_metrics_prev or {}
        )
        enable_moddrop = epoch > cfg.modality_dropout_warmup_epochs

        sums: Dict[str, float] = {}
        n_steps = 0
        n_logged = 0
        skipped_before = int(self.state.skipped_total)
        step_before = int(self.state.step)
        t0 = time.time()

        def _log_metrics(metrics):
            nonlocal n_logged
            fetched = {k: float(v) for k, v in metrics.items()}
            for k, v in fetched.items():
                sums[k] = sums.get(k, 0.0) + v
            n_logged += 1

        last = None
        for batch in prefetch_to_device(
            self.pipeline, size=cfg.prefetch_batches, mesh=self.mesh
        ):
            self.state, metrics = self.train_step(
                self.state,
                batch,
                jnp.float32(sdm_weight),
                jnp.float32(sdm_tau),
                enable_modality_dropout=enable_moddrop,
            )
            n_steps += 1
            last = metrics
            # the batch-composition debug panel of the reference's early
            # epochs (train.py:783-830): host-side from the small batch
            # leaves, first 3 batches of the first 3 epochs only
            if epoch <= 3 and n_steps <= 3:
                comp = batch_composition(
                    batch.get("pids", batch["labels"]),
                    batch["image_mask"],
                    batch["text_mask"],
                )
                logger.info(
                    "[batch-composition] epoch=%d batch=%d: %d ids, "
                    "%.1f inst/id (K-1 pos ~%.1f), vis+nonvis=%d, "
                    "vis-only=%d, nonvis-only=%d",
                    epoch, n_steps - 1, comp["num_ids"],
                    comp["avg_instances_per_id"],
                    comp["avg_instances_per_id"] - 1,
                    comp["both"], comp["vis_only"], comp["nonvis_only"],
                )
            # loss/top1 console feed at reduced cadence; every EXACT monitor
            # (spikes, coverage, CE, feat norms) reads the in-graph metric
            # ring at epoch end (reference updates per batch, train.py:933-956)
            if n_steps % LOG_EVERY == 0 or n_steps == 1:
                _log_metrics(metrics)
                last = None
        if last is not None:
            _log_metrics(last)

        # --- epoch-end ring fetch: one host sync for all n_steps rows ---
        ring = np.asarray(self.state.metric_ring)
        take = min(n_steps, ring.shape[0])
        idxs = (step_before + np.arange(n_steps))[-take:] % ring.shape[0]
        rows = ring[idxs]  # [take, len(RING_CHANNELS)] (train_step.py)
        ce_random_steps = 0
        feat_warn = None
        for row in rows:
            self.spike_detector.update(float(row[0]))
            self.pair_coverage.update_value(float(row[3]))
            if np.isfinite(row[1]) and self.ce_diag.is_random(float(row[1])):
                ce_random_steps += 1
            warn = self.feat_norm_monitor.check(
                float(row[5]), float(row[4]), epoch
            )
            if warn:
                feat_warn = warn
        if epoch > 2 and len(rows) and ce_random_steps > len(rows) // 2:
            logger.warning(
                "CE near random baseline ln(%d)=%.3f on %d/%d steps — "
                "check labels/pairing",
                self.num_classes, self.ce_diag.random_baseline,
                ce_random_steps, len(rows),
            )
        if feat_warn:
            logger.warning(feat_warn)
        finite = np.isfinite(rows[:, 0]) if len(rows) else np.zeros(0, bool)
        ring_means = (
            rows[finite].mean(axis=0)
            if finite.any()
            else np.zeros(len(RING_CHANNELS), np.float32)
        )

        avg = {k: v / max(1, n_logged) for k, v in sums.items()}
        elapsed = time.time() - t0
        # classifier |W| monitor (reference: train.py:1048-1058) — fetched
        # once per epoch, never in the hot loop
        cls_kernel = self.state.params["bn_neck"]["classifier"]["kernel"]
        head_weight_norm = float(np.linalg.norm(np.asarray(cls_kernel)))
        out = {
            "epoch": epoch,
            "steps": n_steps,
            "steps_per_sec": n_steps / max(elapsed, 1e-9),
            "sdm_weight": sdm_weight,
            "sdm_tau": sdm_tau,
            "stability_score": self.spike_detector.stability_score,
            "pair_coverage_mavg": self.pair_coverage.moving_average,
            "head_weight_norm": head_weight_norm,
            # exact: accumulated in-graph, fetched once per epoch
            "skipped_steps": int(self.state.skipped_total) - skipped_before,
            # exact per-epoch loss means over EVERY step (metric ring), not
            # the 1-in-LOG_EVERY samples
            "total_loss": float(ring_means[0]),
            "ce_loss": float(ring_means[1]),
            "sdm_loss": float(ring_means[2]),
            **{k: avg.get(k, 0.0) for k in ("train_top1", "grad_norm")},
        }
        # SDM anomaly response (train.py:1614-1628)
        if out["sdm_loss"] > 5.0 or out["sdm_loss"] < 0.0:
            self.sdm_scheduler.decrease_weight("sdm loss anomaly")
        return out

    def _gallery_cache(self) -> GalleryCache:
        """Parameter-fingerprinted cache tag so features are reused only for
        byte-identical weights on the same compute path (the final full-ratio
        eval after the last epoch's eval hits this; a resumed re-eval of the
        same checkpoint also does)."""
        from prcv2025reid_tpu.evaluation.protocol import checkpoint_cache_tag

        tag = checkpoint_cache_tag(
            self.state.params, self.config.eval_cache_tag,
            step=int(self.state.step), config=self.config,
        )
        return GalleryCache(self.config.eval_cache_dir, tag)

    def evaluate(self, epoch: Optional[int] = None, sample_ratio: Optional[float] = None) -> Dict:
        cfg = self.config
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        # embedding batches must split evenly over the mesh; rather than
        # silently de-parallelizing the embed (round-2 behavior), round the
        # batch up to the next device multiple — embed_samples pads the last
        # chunk to batch_size anyway, so the padded size is transparent.
        eval_bs = cfg.eval_batch_size
        n_dev = data_axis_size(self.mesh)
        if n_dev > 1 and eval_bs % n_dev != 0:
            eval_bs = -(-eval_bs // n_dev) * n_dev
            logger.warning(
                "eval_batch_size=%d does not divide the %d-device mesh — "
                "padded up to %d so the embed stays sharded",
                cfg.eval_batch_size, n_dev, eval_bs,
            )
        result = evaluate_protocol(
            None,
            variables,
            self.val_ds,
            self.tokenizer,
            batch_size=eval_bs,
            include_patterns=cfg.eval_include_patterns,
            cache=self._gallery_cache(),
            sample_ratio=sample_ratio if sample_ratio is not None else cfg.eval_sample_ratio,
            seed=cfg.seed,
            embed_factory=self.embed_factory,
            sharding=(batch_sharding(self.mesh) if n_dev > 1 else None),
            mesh=self.mesh,  # sharded ranking (compute_retrieval_metrics)
        )
        if epoch is not None:
            logger.info(
                "[EVAL] epoch=%d mAP(avg2)=%.4f single=%.4f quad=%.4f",
                epoch,
                result["map_avg2"],
                result["map_single"],
                result["map_quad"],
            )
        return result

    def smoke_test(self):
        """One real batch through the model before the epoch loop; abort on
        failure (reference: train.py:1460-1474).

        The batch is built directly (sampler draw + collate) rather than via
        ``next(iter(self.pipeline))``: iterating the pipeline would burn a
        full epoch of the checkpointable sampler RNG in list(sampler) and
        leave num_workers+prefetch decoded batches as abandoned in-flight
        work; the sampler state is snapshot-restored so epoch 1 sees the
        exact stream it would have without the smoke test."""
        from prcv2025reid_tpu.data.pipeline import collate

        snap = self.sampler.state_dict()
        indices = self.sampler.sample_batch()
        self.sampler.load_state_dict(snap)
        rng = np.random.default_rng(0)
        samples = [
            self.train_ds.get_sample(i, rng, modality_dropout=0.0)
            for i in indices
        ]
        batch = collate(samples, self.tokenizer)
        variables = {"params": self.state.params, "batch_stats": self.state.batch_stats}
        out = self.model.apply(
            variables,
            jnp.asarray(batch["images"]),
            jnp.asarray(batch["image_mask"]),
            jnp.asarray(batch["text_tokens"]),
            jnp.asarray(batch["text_mask"]),
            train=False,
        )
        if not bool(jnp.isfinite(out["logits"]).all()):
            raise RuntimeError("forward smoke test produced non-finite logits")
        logger.info(
            "forward smoke test OK: logits %s, bn_features %s",
            out["logits"].shape,
            out["bn_features"].shape,
        )

    def fit(self) -> Dict:
        cfg = self.config
        resumed = self.maybe_resume()
        if not resumed:
            self.smoke_test()
        try:
            return self._fit_loop()
        finally:
            # an async save may still be in flight (its sidecar lands only
            # on commit) — make the last checkpoint durable even on error
            finalize_pending_saves()

    def _fit_loop(self) -> Dict:
        cfg = self.config
        block = not cfg.async_checkpoint
        train_metrics: Optional[Dict] = None
        for epoch in range(self.start_epoch, cfg.num_epochs + 1):
            train_metrics = self.train_epoch(epoch, train_metrics)
            self.batch_counts.record_epoch(train_metrics["steps"])
            self.train_history.append(train_metrics)
            logger.info("epoch %d: %s", epoch, train_metrics)

            # augmentation relaxation AFTER epoch 5, on epoch 5's OWN
            # stability score (reference train.py:1630-1644 runs in the outer
            # loop, so epoch 5 itself still trains at the tight crop); the
            # flag persists through checkpoints so a resumed run keeps the
            # relaxed distribution
            if (epoch == 5 and not self._crop_relaxed
                    and train_metrics.get("stability_score", 0.0) > 0.8):
                self._relax_augmentation()

            if cfg.do_eval and epoch % cfg.eval_every_n_epoch == 0:
                eval_metrics = self.evaluate(epoch)
                row = {k: v for k, v in eval_metrics.items() if k != "detail"}
                row["epoch"] = epoch
                self.eval_history.append(row)
                if eval_metrics["map_avg2"] > self.best_map:
                    self.best_map = eval_metrics["map_avg2"]
                    best_path = cfg.best_model_path or os.path.join(
                        cfg.save_dir, "best"
                    )
                    best_abs = os.path.abspath(best_path)
                    save_checkpoint(
                        os.path.dirname(best_abs),
                        self.state,
                        self._host_state(epoch),
                        name=os.path.basename(best_abs),
                        block=block,
                    )
                    logger.info(
                        "new best mAP %.4f — checkpoint saved to %s",
                        self.best_map,
                        best_path,
                    )
                # SDM weight escalation gate (train.py:1614-1622)
                if self.sdm_scheduler.can_increase_weight(epoch, train_metrics, eval_metrics):
                    self.sdm_scheduler.increase_weight()
                # plateau LR drops on eval mAP (reference: train.py:1705-1710)
                if self.plateau is not None:
                    scale = self.plateau.step(eval_metrics["map_avg2"])
                    self.state = self.state.replace(
                        opt_state=set_plateau_scale(self.state.opt_state, scale)
                    )
                    if scale < 1.0:
                        logger.info("plateau LR scale: %.5f", scale)

            save_checkpoint(
                cfg.save_dir, self.state, self._host_state(epoch), block=block
            )
            if epoch % cfg.save_freq == 0:
                save_checkpoint(
                    cfg.save_dir, self.state, self._host_state(epoch),
                    name=f"epoch_{epoch}", block=block,
                )
            if is_main_process():
                self.train_history.to_csv(
                    os.path.join(cfg.log_dir, "train_history.csv")
                )
                self.eval_history.to_csv(
                    os.path.join(cfg.log_dir, "eval_history.csv")
                )

        # sampler-stability report (train.py:1766-1783)
        batch_report = self.batch_counts.summary()
        if batch_report:
            logger.info(
                "batch-count report: estimate=%d actual avg=%.1f "
                "range=[%d, %d] accuracy=%.1f%% cv=%.3f (%s)",
                batch_report["estimated_batches"], batch_report["avg_batches"],
                batch_report["min_batches"], batch_report["max_batches"],
                100 * batch_report["estimate_accuracy"],
                batch_report["batch_cv"],
                "stable" if batch_report["stable"] else "fluctuating",
            )
        # final full-ratio eval (train.py:1727-1748)
        final = self.evaluate(cfg.num_epochs, sample_ratio=1.0) if cfg.do_eval else {}
        return {
            "best_map": self.best_map,
            "batch_report": batch_report,
            "final": {k: v for k, v in final.items() if k != "detail"},
        }
