"""Round-2u TPU measurements: continuous-batching serving at 32k context,
fullkv vs snapkv on the SAME hardware budget.

Naive batched generate() at B=4 x 32k OOMs for fullkv (round 2t) because
the batched prefill transients land on top of the 4.3 GB cache.  The
ContinuousBatcher prefills ONE lane at a time, so fullkv fits — this run
makes the capacity-vs-throughput comparison fair and quantifies what
compression buys a long-context serving deployment on one chip:

- fullkv: 4 lanes x 1.07 GB of cache; decode reads 4.3 GB of KV per step.
- snapkv: 4 lanes x 34 MB; decode reads 134 MB.

8 requests of ~32k tokens each, 128 new tokens, 4 lanes, quantum 16.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2u_bench.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama
from pyramidkv_tpu.serving import ContinuousBatcher, Request


def log(m):
    print(f"[2u] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def main():
    log(f"platform={jax.devices()[0].platform}")
    spec = ModelSpec(
        name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=8,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=131072,
    )
    params = llama.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompts = [
        [int(t) for t in rng.integers(0, spec.vocab_size, size=32768 - 9 - i)]
        for i in range(8)
    ]

    for method in ("snapkv", "fullkv"):
        try:
            eng = Engine(
                spec,
                CompressionSpec(method=method, max_capacity_prompt=128,
                                window_size=8, kernel_size=7,
                                pooling="maxpool"),
                EngineSpec(max_new_tokens=128, prefill_buckets=(32768,),
                           prefill_block=512),
                params,
            )
            cb = ContinuousBatcher(eng, lanes=4, quantum=16)
            reqs = [Request(f"r{i}", p, max_new_tokens=128)
                    for i, p in enumerate(prompts)]
            log(f"cb32k/{method} warmup (compiles)")
            cb.run([Request("w", prompts[0][:32000], max_new_tokens=8)])
            t0 = time.perf_counter()
            out = cb.run(list(reqs))
            wall = time.perf_counter() - t0
            total = sum(len(r.tokens) for r in out.values())
            dec_s = sum(r.decode_seconds for r in out.values())
            pf_s = sum(r.prefill_seconds for r in out.values())
            emit({"bench": f"cb32k/{method}", "wall_s": round(wall, 2),
                  "total_tokens": total,
                  "serving_tok_s": round(total / wall, 1),
                  "sum_prefill_s": round(pf_s, 2),
                  "sum_decode_s": round(dec_s, 2)})
        except Exception as e:  # noqa: BLE001
            emit({"bench": f"cb32k/{method}", "error": repr(e)[:300]})

    log("ALL DONE")


if __name__ == "__main__":
    main()
