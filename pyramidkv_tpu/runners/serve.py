"""Batch-serving CLI: JSONL of prompts in, JSONL of completions out.

  python -m pyramidkv_tpu.runners.serve --model_path <hf_dir> \
      --method snapkv --max_capacity_prompts 128 --lanes 4 \
      < prompts.jsonl > completions.jsonl

Input lines: {"id": "...", "prompt": "...", "max_new_tokens": 64}
Output lines: {"id": "...", "text": "...", "num_tokens": N}

Uses the continuous batcher (lane recycling) for compressing methods and
falls back to the bucket-and-pack scheduler for fullkv/minference.
"""

from __future__ import annotations

import argparse
import json
import sys

from ..serving import BatchScheduler, ContinuousBatcher, Request
from .common import add_engine_args, build_engine, resolve_model_max_len, set_seed


def parse_args():
    p = argparse.ArgumentParser()
    add_engine_args(p)
    p.add_argument("--lanes", type=int, default=4)
    p.add_argument("--quantum", type=int, default=16)
    p.add_argument("--max_new_tokens", type=int, default=256)
    p.add_argument("--input", type=str, default="-")
    p.add_argument("--output", type=str, default="-")
    return p.parse_args()


def main():
    args = parse_args()
    set_seed(args.seed)
    model_max_len = resolve_model_max_len(args)
    eng, tokenizer, model_name, model_max_len = build_engine(
        args, max_new_tokens=args.max_new_tokens, model_max_len=model_max_len
    )
    eos = [tokenizer.eos_token_id] if tokenizer.eos_token_id is not None else []

    fin = sys.stdin if args.input == "-" else open(args.input)
    requests = []
    for i, line in enumerate(fin):
        line = line.strip()
        if not line:
            continue
        d = json.loads(line)
        ids = tokenizer(d["prompt"], add_special_tokens=True).input_ids
        requests.append(Request(
            request_id=str(d.get("id", i)),
            prompt_ids=ids[: model_max_len],
            max_new_tokens=min(d.get("max_new_tokens", args.max_new_tokens),
                               args.max_new_tokens),
            eos_token_ids=tuple(eos),
        ))

    try:
        batcher = ContinuousBatcher(eng, lanes=args.lanes, quantum=args.quantum)
        results = batcher.run(requests)
    except ValueError:
        sched = BatchScheduler(eng, batch_size=args.lanes)
        for r in requests:
            sched.submit(r)
        results = sched.run()

    fout = sys.stdout if args.output == "-" else open(args.output, "w")
    for r in requests:
        res = results[r.request_id]
        fout.write(json.dumps({
            "id": r.request_id,
            "text": tokenizer.decode(res.tokens, skip_special_tokens=True),
            "num_tokens": len(res.tokens),
        }, ensure_ascii=False) + "\n")
    fout.flush()
    print(f"[serve] completed {len(results)} requests; "
          f"stats={eng.stats.as_dict()}", file=sys.stderr)


if __name__ == "__main__":
    main()
