"""LongBench eval runner.

Usage mirrors /root/reference/run_longbench.py:

  python -m pyramidkv_tpu.runners.run_longbench \
    --model_path /path/to/Meta-Llama-3-8B-Instruct \
    --method pyramidkv --max_capacity_prompts 128 \
    --data_dir data/LongBench --save_dir results_long_bench

Per dataset it writes ``<save_dir>/<model>_<cap>/<dataset>/<method>.json``
(one prediction JSONL per (model, capacity, dataset, method) —
run_longbench.py:178-180) ready for ``runners.eval``.
"""

from __future__ import annotations

import argparse
import os

from ..evalsuite.harness import GenerationHarness, read_jsonl
from ..evalsuite.report import canonical_method_name
from ..evalsuite.tasks import LONGBENCH_EN_TASKS, LONGBENCH_TASKS
from .common import (
    add_engine_args,
    build_engine,
    resolve_model_max_len,
    set_seed,
)


def parse_args():
    p = argparse.ArgumentParser()
    add_engine_args(p)
    p.add_argument("--data_dir", type=str, default="data/LongBench")
    p.add_argument("--save_dir", type=str, default="results_long_bench")
    p.add_argument("--datasets", type=str, nargs="*", default=None,
                   help="subset of LongBench tasks (default: the 16 EN tasks)")
    p.add_argument("--eval_batch_size", type=int, default=1)
    p.add_argument("--longbench_e", action="store_true",
                   help="use the length-bucketed LongBench-E splits (<task>_e.jsonl)")
    return p.parse_args()


def main():
    args = parse_args()
    set_seed(args.seed)
    datasets = args.datasets or list(LONGBENCH_EN_TASKS)
    max_gen = max(LONGBENCH_TASKS[d].max_gen for d in datasets)
    model_max_len = resolve_model_max_len(args)
    eng, tokenizer, model_name, model_max_len = build_engine(
        args, max_new_tokens=max_gen, model_max_len=model_max_len
    )
    harness = GenerationHarness(eng, tokenizer, model_name, model_max_len)

    def engine_factory(cap):
        import copy

        from ..engine import Engine
        from .common import build_compression_spec

        a2 = copy.copy(args)
        a2.max_capacity_prompts = cap
        comp = build_compression_spec(a2, eng.model_spec)
        return Engine(eng.model_spec, comp, eng.engine_spec, eng.params)

    for i, dataset in enumerate(datasets):
        task = LONGBENCH_TASKS[dataset]
        suffix = "_e" if args.longbench_e else ""
        data_file = os.path.join(args.data_dir, f"{dataset}{suffix}.jsonl")
        if not os.path.exists(data_file):
            print(f"[longbench] SKIP {dataset}: {data_file} missing")
            continue
        print(f"[longbench] cap={args.max_capacity_prompts} {dataset} "
              f"({i + 1}/{len(datasets)})")
        examples = read_jsonl(data_file)
        out_dir = os.path.join(
            args.save_dir, f"{model_name}_{args.max_capacity_prompts}", dataset
        )
        os.makedirs(out_dir, exist_ok=True)
        ratio = args.max_capacity_prompts_ratio
        res = harness.run_examples(
            examples,
            template=task.prompt_template,
            max_new_tokens=task.max_gen,
            out_path=os.path.join(
                out_dir, f"{canonical_method_name(args.method)}.json"),
            chat_wrap=True,
            max_examples=args.max_num_examples,
            capacity_ratio=None if ratio == -1 else ratio,
            engine_factory=engine_factory,
        )
        print(
            f"[longbench] {dataset}: {len(res.predictions)} examples, "
            f"{res.total_decode_tokens} decode tokens in {res.total_seconds:.1f}s"
        )


if __name__ == "__main__":
    main()
