"""RULER eval runner (11 synthetic long-context tasks).

Mirrors /root/reference/run_ruler.py: data at
``<data_dir>/<context_len>/<task>.jsonl``, 64-token greedy generations,
predictions to ``<save_dir>/<model>_<cap>/<dataset>/<method>.json``.
"""

from __future__ import annotations

import argparse
import os

from ..evalsuite.report import canonical_method_name
from ..evalsuite.harness import GenerationHarness, read_jsonl
from ..evalsuite.tasks import RULER_MAX_GEN, RULER_TASKS
from .common import (
    add_engine_args,
    build_engine,
    resolve_model_max_len,
    set_seed,
)


def parse_args():
    p = argparse.ArgumentParser()
    add_engine_args(p)
    p.add_argument("--data_dir", type=str, default="data/RULER")
    p.add_argument("--save_dir", type=str, default="results_ruler")
    p.add_argument("--context_lengths", type=int, nargs="*", default=[4096])
    p.add_argument("--datasets", type=str, nargs="*", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    set_seed(args.seed)
    datasets = args.datasets or list(RULER_TASKS)
    model_max_len = resolve_model_max_len(args)
    eng, tokenizer, model_name, model_max_len = build_engine(
        args, max_new_tokens=RULER_MAX_GEN, model_max_len=model_max_len
    )
    harness = GenerationHarness(eng, tokenizer, model_name, model_max_len)

    for ctx_len in args.context_lengths:
        for dataset in datasets:
            data_file = os.path.join(args.data_dir, str(ctx_len), f"{dataset}.jsonl")
            if not os.path.exists(data_file):
                print(f"[ruler] SKIP {dataset}@{ctx_len}: {data_file} missing")
                continue
            examples = read_jsonl(data_file)
            # RULER examples carry the full prompt in "input" and gold strings
            # in "outputs"; normalise to the harness schema.
            for ex in examples:
                ex.setdefault("context", ex.get("input", ""))
                ex.setdefault("answers", ex.get("outputs", []))
            out_dir = os.path.join(
                args.save_dir, f"{model_name}_{args.max_capacity_prompts}", dataset
            )
            os.makedirs(out_dir, exist_ok=True)
            res = harness.run_examples(
                examples,
                template="{context}",
                max_new_tokens=RULER_MAX_GEN,
                out_path=os.path.join(
                    out_dir,
                    f"{canonical_method_name(args.method)}.json"),
                chat_wrap=True,
                max_examples=args.max_num_examples,
            )
            print(f"[ruler] {dataset}@{ctx_len}: {len(res.predictions)} examples "
                  f"in {res.total_seconds:.1f}s")


if __name__ == "__main__":
    main()
