"""Score aggregator CLI.

Mirrors /root/reference/eval.py (LongBench) and eval_ruler.py:

  python -m pyramidkv_tpu.runners.eval --results_dir results_long_bench/<model>_<cap>
  python -m pyramidkv_tpu.runners.eval --results_dir results_ruler/<model>_<cap> --suite ruler

Writes per-dataset ``metrics.json`` and an aggregate ``results.csv`` with
one row per method (missing predictions score -1 — eval.py:175-179).
"""

from __future__ import annotations

import argparse
import os

from ..evalsuite.report import (
    REPORT_METHODS,
    canonical_method_name,
    score_prediction_file,
    score_ruler_file,
    write_results_csv,
)
from ..evalsuite.tasks import LONGBENCH_EN_TASKS, RULER_TASKS


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", type=str, required=True)
    p.add_argument("--suite", type=str, default="longbench",
                   choices=["longbench", "ruler"])
    p.add_argument("--longbench_e", action="store_true")
    p.add_argument("--methods", type=str, nargs="*", default=None)
    return p.parse_args()


def _discover_extra_methods(results_dir: str, datasets) -> "list[str]":
    """Prediction files beyond the reference's fixed row list (eval.py:99-110)
    — adakv / headkv / minference / quant variants — become extra rows."""
    known = {m.lower() for m in REPORT_METHODS}
    extra = set()
    for ds in datasets:
        d = os.path.join(results_dir, ds)
        if not os.path.isdir(d):
            continue
        for fn in os.listdir(d):
            if fn.endswith(".json") and fn != "metrics.json":
                name = fn[:-5]
                if name.lower() not in known:
                    extra.add(name)
    return sorted(extra)


def main():
    args = parse_args()
    # accept CLI method strings in either casing — prediction files are
    # written under the reference's canonical names (SnapKV.json, ...)
    methods = ([canonical_method_name(m) for m in args.methods]
               if args.methods else None)
    if args.suite == "ruler":
        datasets = [
            d for d in RULER_TASKS
            if os.path.isdir(os.path.join(args.results_dir, d))
        ] or list(RULER_TASKS)
        if methods is None:
            methods = list(REPORT_METHODS) + _discover_extra_methods(
                args.results_dir, datasets)
        rows = write_results_csv(
            args.results_dir, datasets, methods, scorer=score_ruler_file
        )
    else:
        datasets = [
            d for d in LONGBENCH_EN_TASKS
            if os.path.isdir(os.path.join(args.results_dir, d))
        ] or list(LONGBENCH_EN_TASKS)
        if methods is None:
            methods = list(REPORT_METHODS) + _discover_extra_methods(
                args.results_dir, datasets)
        rows = write_results_csv(
            args.results_dir, datasets, methods, scorer=score_prediction_file
        )
    for row in rows:
        print(",".join(str(x) for x in row))


if __name__ == "__main__":
    main()
