#!/usr/bin/env python
"""Same-day A/B matrix for train-step candidates (VERDICT r4 #2).

Runs tools/trace_train.py --no-trace once per configuration, SEQUENTIALLY
in subprocesses (never two live TPU processes — CLAUDE.md), and prints a
same-day table.  The point is the promotion discipline from
docs/performance.md: candidates are only promoted against a baseline
measured in the SAME session, because this toolchain drifts ~15% between
rounds at identical configs (round-3 -> round-4).

Matrix (each row one compile):
  8x4:  stored baseline | remat | remat+sdm_batched | remat+nu_bf16 | remat+both
  32x4: stored baseline | stored+sdm_batched | stored+nu_bf16
(attn_bwd=remat is the 8x4 candidate from round 4; at 32x4 it measured
slower, so 32x4 pairs run against the stored baseline.)

Usage:
    python tools/train_ab.py [--steps 30] [--out /tmp/train_ab.json]
    python tools/train_ab.py --rows 8x4:stored 8x4:remat   # subset
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

ROWS = {
    "8x4:stored": ["--pk", "8x4", "--attn-bwd", "stored"],
    "8x4:remat": ["--pk", "8x4", "--attn-bwd", "remat"],
    "8x4:remat+sdm_batched": ["--pk", "8x4", "--attn-bwd", "remat",
                              "--sdm-impl", "batched"],
    "8x4:remat+nu_bf16": ["--pk", "8x4", "--attn-bwd", "remat",
                          "--nu-dtype", "bfloat16"],
    "8x4:remat+both": ["--pk", "8x4", "--attn-bwd", "remat",
                       "--sdm-impl", "batched", "--nu-dtype", "bfloat16"],
    "32x4:stored": ["--pk", "32x4", "--attn-bwd", "stored"],
    "32x4:sdm_batched": ["--pk", "32x4", "--attn-bwd", "stored",
                         "--sdm-impl", "batched"],
    "32x4:nu_bf16": ["--pk", "32x4", "--attn-bwd", "stored",
                     "--nu-dtype", "bfloat16"],
}


def run_row(name: str, extra, steps: int):
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "trace_train.py"),
         "--no-trace", "--steps", str(steps), *extra],
        capture_output=True, text=True, timeout=3600,
    )
    wall = time.perf_counter() - t0
    its = None
    for line in proc.stdout.splitlines():
        if line.startswith("steady state:"):
            try:
                its = float(line.split(":")[1].split()[0])
            except (ValueError, IndexError):
                pass
    status = "ok" if proc.returncode == 0 and its is not None else "FAIL"
    print(f"[ab +{wall:6.0f}s] {name}: {its} it/s ({status})", flush=True)
    if status == "FAIL":
        tail = "\n".join(proc.stdout.splitlines()[-5:]
                         + proc.stderr.splitlines()[-5:])
        print(tail, flush=True)
    return its


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--out", default="/tmp/train_ab.json")
    ap.add_argument("--rows", nargs="*", default=list(ROWS),
                    help=f"subset of {list(ROWS)}")
    args = ap.parse_args()

    results = {}
    for name in args.rows:
        results[name] = run_row(name, ROWS[name], args.steps)
        with open(args.out, "w") as f:  # checkpoint after every row
            json.dump(results, f, indent=1)

    print("\n== same-day table ==")
    for scale in ("8x4", "32x4"):
        base = results.get(f"{scale}:stored")
        for name, its in results.items():
            if not name.startswith(scale) or its is None:
                continue
            rel = f" ({(its - base) / base:+.1%} vs stored)" if base else ""
            print(f"  {name:>24s}: {its:6.2f} it/s{rel}")
    print(f"[ab] results -> {args.out}")


if __name__ == "__main__":
    main()
