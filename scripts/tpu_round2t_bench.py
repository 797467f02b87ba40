"""Round-2t TPU measurements: batched LONG-context serving (the
capacity argument in numbers) + a clean 128k decode rate.

At 64k+ the compression methods' decode-bandwidth edge shrank once the
cache-copy bug died (fullkv 103 tok/s) — their remaining value is HBM
CAPACITY: a fullkv 32k lane costs 1.07 GB of cache, a snapkv lane 33 MB,
so batched long-context serving only scales with compression.

A. d8 bf16, 32k ctx, B=4: fullkv (4.3 GB of cache) vs snapkv (134 MB).
B. 128k snapkv decode re-measured with 128 new tokens (the 2s number,
   116 tok/s, amortised the ~29 ms tunnel dispatch over only 31 steps).

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2t_bench.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama


def log(m):
    print(f"[2t] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def main():
    log(f"platform={jax.devices()[0].platform}")
    spec = ModelSpec(
        name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=8,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=262144,
    )
    params = llama.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def run(tag, method, ctx, batch, max_new):
        prompts = [
            [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]
            for _ in range(batch)
        ]
        try:
            eng = Engine(
                spec,
                CompressionSpec(method=method, max_capacity_prompt=128,
                                window_size=8, kernel_size=7,
                                pooling="maxpool"),
                EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                           prefill_block=512),
                params,
            )
            log(f"{tag} compiling")
            eng.generate(prompts)
            best_pf, best_tps = float("inf"), 0.0
            for _ in range(3):
                out = eng.generate(prompts)
                best_pf = min(best_pf, out.prefill_seconds)
                best_tps = max(best_tps,
                               batch * out.decode_steps / out.decode_seconds)
            emit({"bench": tag, "prefill_ms": round(best_pf * 1e3, 1),
                  "decode_tok_s": round(best_tps, 1),
                  "kv_mb": round(out.kv_cache_bytes / 1e6, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"bench": tag, "error": repr(e)[:300]})

    run("engine32k_B4/snapkv", "snapkv", 32768, 4, 64)
    run("engine32k_B4/fullkv", "fullkv", 32768, 4, 64)
    run("engine128k/snapkv_128new", "snapkv", 131072, 1, 128)
    log("ALL DONE")


if __name__ == "__main__":
    main()
