#!/usr/bin/env python
"""Join an xplane trace with the compiled HLO's op_name metadata to
attribute device time to model components.

The trace gives per-HLO-op occupancy (%fusion.897 -> ms); the HLO text gives
each op's jax source scope (op_name="jit(embed)/.../block_8/mlp/fc2/...").
Joining the two answers "where does the time go" in model terms instead of
fusion-kind terms.

Usage:
    python tools/hlo_attr.py --hlo /tmp/embed_hlo.txt --trace /tmp/embed_trace \
        [--iters 6] [--depth 2]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_hlo_opnames(hlo_path: str) -> dict:
    """%instruction_name -> op_name metadata scope (or '' if none)."""
    out = {}
    pat = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=.*?"
                     r'metadata=\{[^}]*?op_name="([^"]*)"')
    for line in open(hlo_path):
        m = pat.match(line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def component_of(op_name: str, depth: int) -> str:
    """Reduce 'jit(embed)/Model.method/vision.trunk/block_8/mlp/fc2/...' to a
    stable component key: block index collapsed, trailing op dropped."""
    if not op_name:
        return "(no metadata)"
    parts = op_name.split("/")
    # drop the jit(...) prefix and the trailing primitive
    parts = [p for p in parts[1:] if p]
    parts = [re.sub(r"block_\d+", "block_*", p) for p in parts]
    keep = []
    for p in parts:
        keep.append(p)
        # cut after the depth-th structural component below the trunk
        if len(keep) >= depth + 2:
            break
    return "/".join(keep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", required=True)
    ap.add_argument("--trace", required=True)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--depth", type=int, default=2)
    args = ap.parse_args()

    from prcv2025reid_tpu.utils.xplane import op_time_breakdown

    names = parse_hlo_opnames(args.hlo)
    table = op_time_breakdown(args.trace)
    ops = {k[len("XLA Ops::"):]: v / args.iters
           for k, v in table.items() if k.startswith("XLA Ops::")}

    comp = defaultdict(float)
    unmatched = 0.0
    for op, ms in ops.items():
        inst = op.split(" ", 1)[0].lstrip("%").rstrip(" =")
        scope = names.get(inst)
        if scope is None:
            unmatched += ms
            comp["(not in HLO text)"] += ms
        else:
            comp[component_of(scope, args.depth)] += ms
    total = sum(ops.values())
    if total <= 0:
        print("no device 'XLA Ops' found in the trace — wrong --trace path "
              "or a host-only profile")
        return
    print(f"total device time/step: {total:.2f} ms "
          f"({unmatched:.2f} ms unmatched)")
    for k, v in sorted(comp.items(), key=lambda kv: -kv[1]):
        print(f"  {v:8.3f} ms {100 * v / total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
