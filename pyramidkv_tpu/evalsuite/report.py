"""Score aggregation: per-dataset metrics.json + cross-method results.csv.

Behavioral spec: /root/reference/eval.py — per-example score is the MAX over
ground truths (:66-75); trec/triviaqa/samsum/lsht predictions are cut at the
first newline (:55-56, :73-74); LongBench-E buckets by example length
(:48-64); missing method dirs score -1 instead of failing (:175-179).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Optional

from .metrics import DATASET_METRICS, string_match_all
from .tasks import FIRST_LINE_TASKS

#: the method rows of the reference's results.csv (eval.py:99-110)
REPORT_METHODS = (
    "FullKV", "random", "SnapKV", "StreamingLLM", "H2O",
    "PyramidKV", "CAM", "L2Norm", "ThinK",
)

#: lowercase CLI method string -> the reference's results.csv spelling,
#: so the runners' prediction files are named exactly what the scorer
#: scans for (eval.py:99-110). Methods beyond the reference's row list
#: (adakv/headkv/minference) keep their CLI spelling.
_CANONICAL = {m.lower(): m for m in REPORT_METHODS}


def canonical_method_name(method: str) -> str:
    return _CANONICAL.get(method.lower(), method.lower())


def score_longbench(dataset: str, predictions, answers, all_classes) -> float:
    metric = DATASET_METRICS[dataset]
    total = 0.0
    for pred, gts in zip(predictions, answers):
        if dataset in FIRST_LINE_TASKS:
            pred = pred.lstrip("\n").split("\n")[0]
        best = 0.0
        for gt in gts:
            best = max(best, metric(pred, gt, all_classes=all_classes))
        total += best
    return round(100 * total / max(len(predictions), 1), 2)


def score_longbench_e(dataset: str, predictions, answers, lengths, all_classes) -> dict:
    """Length-bucketed scoring (eval.py:48-64)."""
    metric = DATASET_METRICS[dataset]
    buckets = {"0-4k": [], "4-8k": [], "8k+": []}
    for pred, gts, length in zip(predictions, answers, lengths):
        if dataset in FIRST_LINE_TASKS:
            pred = pred.lstrip("\n").split("\n")[0]
        s = max((metric(pred, gt, all_classes=all_classes) for gt in gts), default=0.0)
        key = "0-4k" if length < 4000 else ("4-8k" if length < 8000 else "8k+")
        buckets[key].append(s)
    return {
        k: round(100 * sum(v) / len(v), 2) if v else 0.0 for k, v in buckets.items()
    }


def score_prediction_file(path: str, dataset: str, longbench_e: bool = False):
    predictions, answers, lengths, all_classes = [], [], [], None
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            predictions.append(d["pred"])
            answers.append(d["answers"])
            all_classes = d.get("all_classes")
            if "length" in d:
                lengths.append(d["length"])
    if longbench_e:
        return score_longbench_e(dataset, predictions, answers, lengths, all_classes)
    return score_longbench(dataset, predictions, answers, all_classes)


def score_ruler_file(path: str) -> float:
    preds, refs = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            preds.append(d["pred"])
            refs.append(d["answers"])
    return string_match_all(preds, refs)


def write_results_csv(
    results_dir: str,
    datasets,
    methods=REPORT_METHODS,
    out_csv: Optional[str] = None,
    scorer=score_prediction_file,
) -> "list[list]":
    """Aggregate <results_dir>/<dataset>/<method>.json prediction files into
    one CSV row per method (missing -> -1, eval.py:175-179); also writes a
    metrics.json per dataset dir."""
    rows = [["dataset"] + list(datasets)]
    per_ds_scores: dict = {}
    for method in methods:
        row = [method]
        for ds in datasets:
            path = os.path.join(results_dir, ds, f"{method}.json")
            try:
                s = scorer(path, ds) if scorer is score_prediction_file else scorer(path)
                per_ds_scores.setdefault(ds, {})[method] = s
            except Exception:
                s = -1
            row.append(s)
        rows.append(row)
    for ds, scores in per_ds_scores.items():
        with open(os.path.join(results_dir, ds, "metrics.json"), "w") as f:
            json.dump(scores, f, indent=2, ensure_ascii=False)
    out_csv = out_csv or os.path.join(results_dir, "results.csv")
    with open(out_csv, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return rows
