#!/usr/bin/env python
"""Submission CSV generator (reference README.md:109 references
tools/generate_submission.py, absent from its tree — rebuilt here).

Usage:
    python tools/generate_submission.py --dataset_root /data/orbench \
        --model_path ./checkpoints/best --out submission.csv
"""
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (prcv2025reid_tpu pkg)
sys.path.insert(0, _HERE)  # tools/ (eval_mm_protocol module)


def main(argv=None):
    import eval_mm_protocol  # reuse the full CLI with submission forced on

    argv = sys.argv[1:] if argv is None else list(argv)
    if "--submission" not in " ".join(argv):
        out = "submission.csv"
        for i, a in enumerate(list(argv)):
            if a == "--out":
                out = argv[i + 1]
                argv[i : i + 2] = []
                break
            if a.startswith("--out="):
                out = a.split("=", 1)[1]
                argv.remove(a)
                break
        argv += ["--submission", out]
    return eval_mm_protocol.main(argv)


if __name__ == "__main__":
    main()
