#!/usr/bin/env python
"""One-command validation harness for a real ORBench-layout dataset.

The moment real data lands, this runs the full product path against it —
train one epoch -> MM-protocol eval -> submission CSV — and checks every
output artifact's schema, so comparison against the reference's expected
mAP ranges (BASELINE.md) is a single command (round-1 VERDICT item #10).

Usage:
    python tools/dryrun_real_data.py --data_root /data/orbench \
        [--json_file .../text_annos.json] [--work_dir /tmp/dryrun] \
        [--epochs 1] [--full-size] [--clip_weights_path ...]

By default the model is shrunk (fast smoke of the DATA path); pass
--full-size for the real ViT-B/16.  Exit code 0 = every check passed.
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = dict(
    vision_hidden_dim=64, vision_layers=2, vision_heads=4, vision_mlp_dim=128,
    text_hidden_dim=32, text_layers=2, text_heads=4, text_mlp_dim=64,
    fusion_dim=32, sdm_semantic_dim=32, sdm_num_heads=4, fusion_num_heads=4,
    drop_path=0.0,
)

CHECKS = []


def check(name, ok, detail=""):
    CHECKS.append((name, bool(ok), detail))
    print(f"  [{'OK' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--json_file", default=None)
    ap.add_argument("--work_dir", default="./dryrun_out")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--steps_per_epoch", type=int, default=None,
                    help="cap steps for a quick pass; None = full epoch")
    ap.add_argument("--full-size", action="store_true",
                    help="real ViT-B/16 dims instead of the smoke model")
    ap.add_argument("--clip_weights_path", default=None)
    ap.add_argument("--eval_sample_ratio", type=float, default=0.3)
    ap.add_argument(
        "--set", dest="extra", action="append", default=[], metavar="KEY=VALUE",
        help="extra TrainingConfig override, repeatable (e.g. "
        "--set use_native_decode=true --set block_impl=fused_int8)",
    )
    ap.add_argument(
        "--rerank", action="store_true",
        help="also run phase 3/4 with k-reciprocal re-ranking (the mAP "
        "booster the submission would actually ship with)",
    )
    args = ap.parse_args(argv)

    from prcv2025reid_tpu.utils.jax_setup import enable_compile_cache

    enable_compile_cache()

    from prcv2025reid_tpu.configs import TrainingConfig
    from prcv2025reid_tpu.training.trainer import Trainer

    work = os.path.abspath(args.work_dir)
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)

    overrides = dict(
        data_root=args.data_root,
        json_file=args.json_file or os.path.join(args.data_root, "text_annos.json"),
        num_epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        save_dir=os.path.join(work, "ckpt"),
        log_dir=os.path.join(work, "logs"),
        eval_cache_dir=os.path.join(work, "cache"),
        eval_sample_ratio=args.eval_sample_ratio,
        clip_weights_path=args.clip_weights_path,
        num_workers=min(2, os.cpu_count() or 1),
    )
    if not args.full_size:
        overrides.update(SMALL)
    config = TrainingConfig(**overrides)
    if args.extra:
        # reuse the train-CLI parser so types/validation behave identically
        from prcv2025reid_tpu.configs import apply_cli_overrides

        config = apply_cli_overrides(config, [f"--{kv}" for kv in args.extra])

    print("== phase 1: data preflight ==")
    trainer = Trainer(config)  # raises on unpairable data
    from prcv2025reid_tpu.data.dataset import analyze_sampling_capability

    rep = analyze_sampling_capability(trainer.train_ds)
    check("dataset pairable", rep["pairable"], str(rep))
    check("val split non-empty", len(trainer.val_ds.records) > 0,
          f"{len(trainer.val_ds.records)} records")

    print("== phase 2: train ==")
    result = trainer.fit()
    check("fit returned best_map", "best_map" in result, str(result.get("best_map")))
    hist = os.path.join(config.log_dir, "train_history.csv")
    ok_hist = os.path.exists(hist) and len(open(hist).readlines()) >= args.epochs + 1
    check("train_history.csv rows", ok_hist, hist)
    check("latest checkpoint", os.path.isdir(os.path.join(config.save_dir, "latest")))

    print("== phase 3: MM-1..4 eval (full protocol) ==")
    from prcv2025reid_tpu.evaluation.protocol import (
        evaluate_protocol,
        export_submission_csv,
    )

    from prcv2025reid_tpu.parallel.mesh import batch_sharding

    eval_vars = {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats}
    # shard the embed over the mesh exactly like Trainer.evaluate: batch
    # rounded up to a device multiple + batch_sharding (otherwise each batch
    # runs replicated on every device)
    n_dev = trainer.mesh.devices.size
    eval_bs = -(-config.eval_batch_size // n_dev) * n_dev
    eval_sharding = batch_sharding(trainer.mesh) if n_dev > 1 else None
    rerank = {"top_n": 100, "k1": 20, "k2": 6, "lam": 0.3} \
        if args.rerank else None
    metrics = evaluate_protocol(
        None, eval_vars, trainer.val_ds, trainer.tokenizer,
        batch_size=eval_bs,
        include_patterns=None,
        exclude_same_image=True,
        sample_ratio=args.eval_sample_ratio,
        embed_factory=trainer.embed_factory,
        sharding=eval_sharding,
        mesh=trainer.mesh,
        rerank=rerank,
    )
    for key in ("map_single", "map_quad", "map_avg2", "mm1_map", "mm4_map",
                "cmc1", "cmc5", "cmc10"):
        check(f"metric {key} in [0,1]",
              key in metrics and 0.0 <= metrics[key] <= 1.0,
              f"{metrics.get(key)}")
    check("all 15 MM combos evaluated", len(metrics["detail"]) == 15,
          f"{sorted(metrics['detail'])}")
    if rerank:
        check("re-ranked detail carries mAP_plain",
              all("mAP_plain" in d for d in metrics["detail"].values()))

    print("== phase 4: submission export ==")
    sub = os.path.join(work, "submission.csv")
    n = export_submission_csv(
        None, eval_vars, trainer.val_ds, trainer.tokenizer, sub,
        batch_size=eval_bs, top_k=config.rank_topk,
        embed_factory=trainer.embed_factory, mesh=trainer.mesh,
        sharding=eval_sharding, rerank=rerank,
    )
    lines = open(sub).read().strip().split("\n")
    check("submission row count", len(lines) == n + 1, f"{n} rows")
    check("submission header", lines[0] == "query_key,ranked_gallery_ids")
    ok_rows = all(
        "," in ln and len(ln.split(",")[0].split("|")) == 3 for ln in lines[1:3]
    )
    check("query_key schema pid|mods|stem", ok_rows, lines[1][:60] if n else "")
    n_gallery = sum(1 for r in trainer.val_ds.records if r.vis)
    depth = len(lines[1].split(",")[1].split()) if n else 0
    check("ranking depth == min(rank_topk, gallery)",
          depth == min(config.rank_topk, n_gallery), f"{depth}")

    with open(os.path.join(work, "dryrun_report.json"), "w") as f:
        json.dump(
            {
                "checks": [{"name": c, "ok": o, "detail": d} for c, o, d in CHECKS],
                "metrics": {k: v for k, v in metrics.items() if k != "detail"},
                "detail": metrics["detail"],
                "best_map": result.get("best_map"),
            },
            f, indent=2, default=float,
        )
    failed = [c for c, o, _ in CHECKS if not o]
    print(f"== {'ALL CHECKS PASSED' if not failed else 'FAILED: ' + ', '.join(failed)} ==")
    print(f"report: {work}/dryrun_report.json")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
