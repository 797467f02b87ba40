"""Round-2q TPU measurements (one batched process), follow-up to 2p:

A. exp2 ablation at engine level: 64k fullkv prefill with use_exp2=False
   (fast path only).  2p measured fast+exp2 = 4940 ms vs old 6382 ms.
B. h2o engine prefill at 4k and 32k with the rewritten two-pass kernel
   (prior 4k number: 200 ms; 32k is a new row).
C. minference 64k sparse prefill with the cleaned slash kernels
   (prior: 2572 ms).
D. fullkv/snapkv 4k prefill refresh (prior: 138 ms).

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2q_bench.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import pyramidkv_tpu.kernels as kernels
from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama


def log(m):
    print(f"[2q] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


SPEC = ModelSpec(
    name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
    intermediate_size=14336, num_hidden_layers=8,
    num_attention_heads=32, num_key_value_heads=8, head_dim=128,
    rope_theta=500000.0, max_position_embeddings=131072,
)
PARAMS = llama.init_params(SPEC, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
RNG = np.random.default_rng(0)


def run_engine(tag, method, ctx, max_new=16, reps=3, **comp_kw):
    prompt = [int(t) for t in RNG.integers(0, SPEC.vocab_size, size=ctx - 1)]
    eng = Engine(
        SPEC,
        CompressionSpec(method=method, max_capacity_prompt=128,
                        window_size=8, kernel_size=7, pooling="maxpool",
                        **comp_kw),
        EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                   prefill_block=512),
        PARAMS,
    )
    log(f"{tag} compiling")
    eng.generate([prompt])
    best_pf, best_tps = float("inf"), 0.0
    for _ in range(reps):
        out = eng.generate([prompt])
        best_pf = min(best_pf, out.prefill_seconds)
        best_tps = max(best_tps, out.decode_steps / out.decode_seconds)
    emit({"bench": tag, "prefill_ms": round(best_pf * 1e3, 1),
          "decode_tok_s": round(best_tps, 1),
          "kv_mb": round(out.kv_cache_bytes / 1e6, 1)})


def main():
    log(f"platform={jax.devices()[0].platform}")

    # A. exp2 ablation: force use_exp2=False through the engine
    orig = kernels.flash_causal_attention
    kernels.flash_causal_attention = functools.partial(orig, use_exp2=False)
    try:
        run_engine("engine64k/fullkv_fastonly", "fullkv", 65536)
    finally:
        kernels.flash_causal_attention = orig

    # B. h2o with the rewritten two-pass kernel
    run_engine("engine4k/h2o", "h2o", 4096, max_new=128)
    run_engine("engine32k/h2o", "h2o", 32768)

    # C. minference with cleaned slash kernels
    run_engine("engine64k/minference", "minference", 65536,
               minference_dense_below=0)

    # D. 4k refresh
    run_engine("engine4k/fullkv", "fullkv", 4096, max_new=128)
    run_engine("engine4k/snapkv", "snapkv", 4096, max_new=128)

    log("ALL DONE")


if __name__ == "__main__":
    main()
