"""Export eval datasets to the runners' on-disk layout.

The reference bundles `data/LongBench/*.jsonl` and `data/RULER/<len>/*.jsonl`
blobs in-repo.  We materialise the same layout from the HuggingFace hub
(requires network; in an air-gapped environment point --data_dir at an
existing copy instead):

  python -m pyramidkv_tpu.runners.prepare_data longbench --out data/LongBench
  python -m pyramidkv_tpu.runners.prepare_data longbench --out data/LongBench -e

LongBench record schema (what run_longbench expects): context, input,
answers, all_classes, length, dataset, language, _id.
"""

from __future__ import annotations

import argparse
import json
import os

from ..evalsuite.tasks import LONGBENCH_EN_TASKS


def export_longbench(out_dir: str, tasks=None, e_split: bool = False) -> None:
    from datasets import load_dataset

    os.makedirs(out_dir, exist_ok=True)
    tasks = tasks or list(LONGBENCH_EN_TASKS)
    for task in tasks:
        name = f"{task}_e" if e_split else task
        ds = load_dataset("THUDM/LongBench", name, split="test")
        path = os.path.join(out_dir, f"{name}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for ex in ds:
                f.write(json.dumps(dict(ex), ensure_ascii=False) + "\n")
        print(f"[prepare_data] wrote {path} ({len(ds)} examples)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("suite", choices=["longbench"])
    p.add_argument("--out", type=str, default="data/LongBench")
    p.add_argument("--tasks", type=str, nargs="*", default=None)
    p.add_argument("-e", "--longbench_e", action="store_true")
    args = p.parse_args()
    if args.suite == "longbench":
        export_longbench(args.out, args.tasks, args.longbench_e)


if __name__ == "__main__":
    main()
