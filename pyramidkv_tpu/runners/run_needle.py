"""Needle-in-a-haystack runner.

Mirrors /root/reference/run_needle_in_haystack.py: sweep context lengths
``[s_len, e_len]`` (step, default 100) x 10 linear depths; 30-token greedy
generations; ROUGE-1x10 scoring; per-(length, depth) result JSONs with
skip-if-exists resume.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..evalsuite.harness import GenerationHarness
from ..evalsuite.needle import NeedleTester, depth_percents
from .common import add_engine_args, build_engine, set_seed


def parse_args():
    p = argparse.ArgumentParser()
    add_engine_args(p)
    p.add_argument("--haystack_dir", type=str, default="data/PaulGrahamEssays")
    p.add_argument("--results_dir", type=str, default="results_needle")
    p.add_argument("-s", "--s_len", type=int, default=1000)
    p.add_argument("-e", "--e_len", type=int, default=8000)
    p.add_argument("--step", type=int, default=100)
    p.add_argument("--depth_intervals", type=int, default=10)
    p.add_argument("--depth_interval_type", type=str, default="linear",
                   choices=["linear", "sigmoid"])
    p.add_argument("--save_contexts", action="store_true")
    p.add_argument("--extra_needles", type=str, nargs="*", default=(),
                   help="multi-needle mode: extras spaced toward 100%% depth")
    return p.parse_args()


def main():
    args = parse_args()
    set_seed(args.seed)
    context_lengths = [int(x) for x in np.arange(args.s_len, args.e_len + 1,
                                                 args.step)]
    eng, tokenizer, model_name, _ = build_engine(
        args, max_new_tokens=30, model_max_len=max(context_lengths) + 512
    )
    harness = GenerationHarness(eng, tokenizer, model_name,
                                model_max_len=max(context_lengths) + 512)
    tester = NeedleTester(
        harness=harness,
        haystack_dir=args.haystack_dir,
        results_dir=args.results_dir,
        model_version=f"{model_name}_{args.method}_{args.max_capacity_prompts}",
        context_lengths=context_lengths,
        extra_needles=tuple(args.extra_needles),
        depths=depth_percents(args.depth_intervals, args.depth_interval_type),
        save_contexts=args.save_contexts,
    )
    results = tester.run()
    if results:
        mean = sum(r["score"] for r in results) / len(results)
        print(f"[needle] {len(results)} runs, mean score {mean:.2f}/10")


if __name__ == "__main__":
    main()
