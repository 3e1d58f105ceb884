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
    import argparse

    import eval_mm_protocol  # reuse the full CLI with submission forced on

    argv = sys.argv[1:] if argv is None else list(argv)
    # translate --out into eval_mm_protocol's --submission (argparse handles
    # every malformed spelling: missing value, --out=..., repeats)
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--out", default=None)
    ap.add_argument("--submission", default=None)
    ns, rest = ap.parse_known_args(argv)
    out = ns.submission or ns.out or "submission.csv"
    return eval_mm_protocol.main(rest + ["--submission", out])


if __name__ == "__main__":
    main()
