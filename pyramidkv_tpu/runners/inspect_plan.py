"""Inspect a compression plan: static layout + per-layer/per-head budgets.

  python -m pyramidkv_tpu.runners.inspect_plan --method pyramidkv \
      --cap 128 --ctx 4096 --layers 32

Prints the static slot layout (width/window/decode slots, cache bytes per
token position) and the traced keep-counts each layer would use at the
given prompt length — the numbers the reference prints ad hoc per layer
(pyramidkv_utils.py:217, :312).
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--method", type=str, default="pyramidkv")
    p.add_argument("--cap", type=int, default=128)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--heads", type=int, default=32)
    p.add_argument("--beta", type=int, default=20)
    p.add_argument("--max_new", type=int, default=512)
    p.add_argument("--head_path", type=str, default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from ..config import (
        CompressionSpec,
        headkv_capacity_from_scores,
        load_headkv_scores,
        pyramid_layer_budgets,
    )
    from ..policy import layer_contexts, make_plan

    kw = dict(method=args.method, max_capacity_prompt=args.cap,
              window_size=args.window, beta=args.beta)
    if args.method == "headkv":
        scores = load_headkv_scores(args.head_path)
        kw["head_capacity"] = headkv_capacity_from_scores(
            scores, args.layers, args.heads, args.cap
        )
    spec = CompressionSpec(**kw)
    plan = make_plan(spec, args.layers, args.ctx, args.max_new)
    print(json.dumps({
        "method": args.method,
        "bucket_len": plan.bucket_len,
        "width": plan.width,
        "window": plan.window,
        "decode_slots": plan.decode_slots,
        "total_slots": plan.total_slots,
        "compression_ratio": round(plan.prefill_slots / args.ctx, 4),
        "segments": [
            {"layers": f"{a}..{b - 1}", "width": w}
            for a, b, w in plan.segments
        ],
        "think_narrow": plan.think_narrow,
    }, indent=2))

    tl = jnp.asarray([args.ctx], jnp.int32)
    ctxs = layer_contexts(plan, tl, args.heads)
    counts = [int(c) for c in ctxs.keep_counts[:, 0]]
    print("per-layer past-token keep counts:")
    for l0 in range(0, args.layers, 8):
        row = counts[l0:l0 + 8]
        print(f"  L{l0:>3}..{min(l0+7, args.layers-1):>3}: {row}")
    if args.method == "pyramidkv":
        print("pyramid schedule (static):",
              pyramid_layer_budgets(spec, args.layers, args.ctx)[:8], "...")
    if args.method == "headkv":
        caps = kw["head_capacity"]
        print("head capacities layer 0:", list(caps[0])[:16], "...")


if __name__ == "__main__":
    main()
