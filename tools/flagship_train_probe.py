#!/usr/bin/env python
"""Sustained full-size training probe on the real chip (VERDICT r3 #4).

Round 3's 7.17 it/s came from tools/trace_train.py step timing on a static
batch; "trains at full size on TPU" was an inference.  This probe makes it a
measurement: a REAL `train.py` run — host pipeline, P x K sampler, SDM/CE,
eval, checkpointing — at full ViT-B/16 size on a synthetic ORBench tree,
with a genuine mid-run checkpoint+resume (two invocations sharing save_dir).

Phases:
  1. train.py for the first `--epochs1` epochs (fresh run),
  2. train.py again with `--epochs` total — Trainer.maybe_resume restores
     the latest checkpoint and continues the SAME schedule/data stream,
  3. assertions: history has every epoch exactly once (resume did not
     restart), the loss trajectory descends, eval mAP beats the random
     baseline, and the artifacts (train/eval CSVs) are copied to --artifacts.

Host caveat (measured, docs/data_pipeline.md): this container has ONE core,
so the end-to-end it/s here is HOST-BOUND (~1-2 it/s against the chip's
same-day device rate from trace_train.py) — the probe prints both and the
budget doc explains the gap.  Synthetic source images are written small
(64 px) to keep decode close to real ORBench person-crop cost.

Usage:
    python tools/flagship_train_probe.py --work /tmp/flagship \
        [--epochs1 3] [--epochs 5] [--steps 60] [--artifacts docs/artifacts]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


_CPU_SHIM = """import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, r"{repo}")
if __name__ == "__main__":
    import runpy
    sys.argv = ["train.py"] + sys.argv[1:]
    runpy.run_path(r"{train_py}", run_name="__main__")
"""


def run_train(args, num_epochs: int, work: str, root: str) -> float:
    """One train.py invocation (subprocess: jax re-initializes per phase,
    which is what makes phase 2 a REAL resume-from-disk).  Returns wall s."""
    entry = os.path.join(REPO, "train.py")
    if args.tiny or args.cpu:
        # the environment force-selects the TPU platform; tiny/cpu modes must
        # run on CPU, which requires flipping the jax config AFTER import —
        # so launch through a real shim file (spawn-safe: __main__ guard)
        entry = os.path.join(work, "_train_cpu_shim.py")
        with open(entry, "w") as f:
            f.write(_CPU_SHIM.format(
                repo=REPO, train_py=os.path.join(REPO, "train.py")
            ))
    cmd = [
        sys.executable,
        entry,
        f"--data_root={root}",
        f"--json_file={os.path.join(root, 'text_annos.json')}",
        f"--num_epochs={num_epochs}",
        f"--steps_per_epoch={args.steps}",
        "--num_ids_per_batch=8",
        "--instances_per_id=4",
        f"--save_dir={work}/ckpt",
        f"--log_dir={work}/logs",
        f"--eval_cache_dir={work}/eval_cache",
        # one cheap-but-real eval pattern: gallery (vis) + nir queries.
        # Every combo is its own full-size jit through the remote compile
        # service — the full 5-pattern whitelist belongs to real runs.
        "--eval_include_patterns=single/nir",
        "--eval_sample_ratio=1.0",
        "--eval_batch_size=64",
        "--save_freq=100",
    ] + list(args.train_flag)
    if args.tiny:
        # CPU-sized model for validating the probe ORCHESTRATION (resume,
        # assertions, artifacts) without the chip; the flagship claim only
        # comes from a run without --tiny
        cmd += [
            "--vision_hidden_dim=64", "--vision_layers=2", "--vision_heads=4",
            "--vision_mlp_dim=128", "--text_hidden_dim=32", "--text_layers=2",
            "--text_heads=4", "--text_mlp_dim=64", "--text_vocab_size=100",
            "--text_context_length=16", "--image_size=32", "--fusion_dim=32",
            "--sdm_semantic_dim=32", "--sdm_num_heads=4", "--fusion_num_heads=4",
            "--compute_dtype=float32", "--drop_path=0.0", "--eval_batch_size=8",
        ]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=7200)
    dt = time.perf_counter() - t0
    tail = "\n".join(proc.stdout.splitlines()[-12:] + proc.stderr.splitlines()[-12:])
    print(f"[probe] train.py ({num_epochs} epochs) rc={proc.returncode} "
          f"in {dt:.0f}s\n{tail}", flush=True)
    if proc.returncode != 0:
        raise SystemExit(f"train.py failed (rc={proc.returncode})")
    return dt


def read_csv(path: str):
    with open(path) as f:
        return list(csv.DictReader(f))


def _random_map_mc(n_gallery: int, n_relevant: int, trials: int = 20000):
    """E[mAP] of a uniformly random ranking with R relevant of N items."""
    import numpy as np

    rng = np.random.default_rng(0)
    hits = np.sort(
        np.argsort(
            rng.random((trials, n_gallery)), axis=1
        )[:, :n_relevant] + 1, axis=1
    )  # ranks of the R relevant items per trial
    # careful: the above places R *random distinct ranks*; sorting makes
    # them the ordered hit positions, exactly a random permutation's
    prec = np.arange(1, n_relevant + 1) / hits
    return float(prec.mean(axis=1).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/flagship_probe")
    ap.add_argument("--epochs1", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--ids", type=int, default=48)
    ap.add_argument("--anchors", type=int, default=6)
    ap.add_argument("--artifacts", default=None,
                    help="copy train/eval history CSVs here on success")
    ap.add_argument("--artifact-prefix", default="flagship_",
                    help="filename prefix for the copied artifacts (lets "
                         "A/B arms land next to the baseline run's files)")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe --work before running")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model on CPU — validates the probe itself")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU at whatever dims --train-flag sets "
                         "(scale-bisection between --tiny and the chip run)")
    ap.add_argument("--assert-only", action="store_true",
                    help="skip training; re-run the assertions/artifact copy "
                         "against the CSVs already in --work (for gate fixes "
                         "after a completed run)")
    ap.add_argument("--train-flag", action="append", default=[],
                    help="extra --key=value flags passed through to train.py "
                         "(repeatable).  The from-scratch probe needs "
                         "--train-flag=--freeze_backbone=false: the frozen-"
                         "trunk production recipe presumes CLIP weights, and "
                         "with a random trunk only the LoRA/head path trains "
                         "— measured val mAP stays AT the random-ranking "
                         "baseline (0.16 for the default probe gallery)")
    args = ap.parse_args()

    if args.fresh and os.path.isdir(args.work):
        shutil.rmtree(args.work)
    os.makedirs(args.work, exist_ok=True)
    root = os.path.join(args.work, "orbench")
    if not os.path.exists(os.path.join(root, "text_annos.json")):
        from prcv2025reid_tpu.utils.synthetic import make_synthetic_orbench

        make_synthetic_orbench(
            root, num_ids=args.ids, anchors_per_id=args.anchors, img_size=64
        )
        print(f"[probe] synthetic ORBench at {root}: {args.ids} ids x "
              f"{args.anchors} anchors", flush=True)

    if args.assert_only:
        t1 = t2 = 0.0
    else:
        t1 = run_train(args, args.epochs1, args.work, root)
        t2 = run_train(args, args.epochs, args.work, root)

    train_hist = read_csv(f"{args.work}/logs/train_history.csv")
    eval_hist = read_csv(f"{args.work}/logs/eval_history.csv")

    # 1. resume continuity: each epoch exactly once, in order
    epochs = [int(r["epoch"]) for r in train_hist]
    assert epochs == list(range(1, args.epochs + 1)), (
        f"resume broke the epoch stream: {epochs}"
    )
    # 2. loss descends.  CE, not total: the SDM weight RAMPS over epochs
    # ([0.1, 0.3, 0.5] schedule), so total_loss is not monotone even on a
    # perfect run — CE has a fixed weight and pins optimization progress.
    first, last = float(train_hist[0]["ce_loss"]), float(train_hist[-1]["ce_loss"])
    assert last < first, f"CE loss did not descend: {first:.4f} -> {last:.4f}"
    # 3. eval mAP beats random.  Random-ranking mAP on a gallery with n_rel
    # relevant of N items is ~n_rel/N; here every id has `anchors` vis
    # images in the val gallery -> baseline ~= 1/val_ids.
    def _map(row):
        # map_mm_avg averages the patterns this run actually evaluated;
        # map_avg2 assumes the quad pattern ran (it is 0 under a reduced
        # --eval_include_patterns whitelist, which would halve the reading)
        for k in ("map_mm_avg", "map_single", "map_avg2"):
            if row.get(k) and float(row[k]) > 0:
                return float(row[k])
        raise KeyError(f"no mAP column in eval row: {row}")

    maps = [_map(r) for r in eval_hist]
    assert maps, "no eval rows"
    # the honest baseline is the EXPECTED mAP of a random permutation for
    # this gallery composition (R relevant of N) — NOT 1/val_ids, which
    # understates it badly at small galleries (R=6 of N=60 -> E[mAP]=0.156,
    # Monte-Carlo; a reading of 0.16 therefore means "random", not "2x
    # random").  Gate: best epoch must clear random by a real margin.
    val_ids = max(1, round(args.ids * 0.2))
    random_map = _random_map_mc(val_ids * args.anchors, args.anchors)
    assert max(maps) > random_map + 0.08, (
        f"eval mAP {max(maps):.4f} does not beat the random-ranking "
        f"baseline ({random_map:.4f}) by the 0.08 margin"
    )
    sps = [float(r["steps_per_sec"]) for r in train_hist[1:]]  # row 1 holds compile
    summary = {
        "epochs": epochs,
        "ce_first": first,
        "ce_last": last,
        "total_loss": [float(r["total_loss"]) for r in train_hist],
        "sdm_weight": [float(r["sdm_weight"]) for r in train_hist],
        "eval_mAP": maps,
        "random_map_baseline": round(random_map, 4),
        "steps_per_sec": sps,
        "wall_s_phase1": round(t1, 1),
        "wall_s_phase2_resumed": round(t2, 1),
        "resume_verified": True,
    }
    print("[probe] PASS " + json.dumps(summary), flush=True)

    if args.artifacts:
        os.makedirs(args.artifacts, exist_ok=True)
        pre = args.artifact_prefix
        for name in ("train_history.csv", "eval_history.csv"):
            shutil.copy(f"{args.work}/logs/{name}",
                        os.path.join(args.artifacts, f"{pre}{name}"))
        with open(os.path.join(args.artifacts, f"{pre}summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(f"[probe] artifacts -> {args.artifacts}", flush=True)


if __name__ == "__main__":
    main()
