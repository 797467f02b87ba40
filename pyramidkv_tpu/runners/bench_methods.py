"""Per-method engine throughput/memory sweep.

The reference never measured throughput, latency, or memory (SURVEY §6).
This runner establishes those numbers for every compression method on the
current backend:

  python -m pyramidkv_tpu.runners.bench_methods --ctx 4096 --cap 128 \
      --methods fullkv snapkv pyramidkv h2o adakv

Prints one JSON line per method:
  {"method": ..., "decode_tokens_per_s": ..., "prefill_ms": ...,
   "kv_cache_mb": ..., "live_kv_tokens": ...}
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--methods", nargs="*", default=[
        "fullkv", "random", "snapkv", "streamingllm", "h2o", "pyramidkv",
        "l2norm", "adakv", "headkv", "think", "cam", "minference",
    ])
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--cap", type=int, default=128)
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--max_new", type=int, default=128)
    p.add_argument("--layers", type=int, default=None,
                   help="depth override (default 8 on TPU, tiny spec on CPU)")
    p.add_argument("--preset", type=str, default="llama3-8b")
    p.add_argument("--quant", type=str, default=None)
    p.add_argument("--nbits", type=int, default=8)
    p.add_argument("--batch", type=int, default=1,
                   help="decode batch size (same prompt replicated)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ..config import CompressionSpec, EngineSpec, ModelSpec
    from ..engine import Engine
    from ..models import llama

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        spec = ModelSpec.preset(args.preset,
                                num_hidden_layers=args.layers or 8)
        ctx, cap = args.ctx, args.cap
        dtype = jnp.bfloat16
    else:
        spec = ModelSpec.tiny(num_hidden_layers=args.layers or 4)
        ctx, cap = min(args.ctx, 256), min(args.cap, 32)
        dtype = jnp.float32
    params = llama.init_params(spec, jax.random.PRNGKey(0), dtype=dtype)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]
    prompts = [prompt] * args.batch

    for method in args.methods:
        kw = {}
        if method == "headkv":
            L, H = spec.num_hidden_layers, spec.num_attention_heads
            kw["head_capacity"] = tuple(
                tuple(max(cap // 2 + ((i * 7 + j * 13) % cap), 8)
                      for j in range(H)) for i in range(L)
            )
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=cap,
                            window_size=args.window, kernel_size=7,
                            pooling="maxpool", quant_method=args.quant,
                            nbits=args.nbits, **kw),
            EngineSpec(max_new_tokens=args.max_new, prefill_buckets=(ctx,)),
            params,
        )
        print(f"[bench_methods] {method}: compiling ...", file=sys.stderr,
              flush=True)
        eng.generate(prompts)  # compile + warmup
        best = None
        for _ in range(2):
            out = eng.generate(prompts)
            tps = out.decode_steps * args.batch / out.decode_seconds
            if best is None or tps > best[0]:
                best = (tps, out)
        tps, out = best
        print(json.dumps({
            "method": method,
            "batch": args.batch,
            "decode_tokens_per_s": round(tps, 2),
            "prefill_ms": round(out.prefill_seconds * 1e3, 1),
            "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
