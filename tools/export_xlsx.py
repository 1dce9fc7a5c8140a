"""Export the committed evidence JSONs as Excel workbooks.

Thin wrapper over :mod:`zeronotesamba_tpu.experiments.report_xlsx` (the
builders live in the package so ``python -m zeronotesamba_tpu export-xlsx``
shares them).  Pure CPU, no JAX — safe to run any time:

    python tools/export_xlsx.py [--src results/synthetic] [--out results/synthetic/xlsx]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from zeronotesamba_tpu.experiments.report_xlsx import export  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="results/synthetic")
    ap.add_argument("--out", default="results/synthetic/xlsx")
    args = ap.parse_args()
    print(json.dumps(export(args.src, args.out)))


if __name__ == "__main__":
    main()
