"""Round-2ab TPU measurements: FLAGSHIP serving — full 32-layer
Llama-3-8B geometry with int4 weights (fused stacked kernel).

1. Continuous-batching at 32k context, snapkv vs fullkv (the d8 version
   of this comparison is logs/tpu_r2u.jsonl): 8 requests x ~32k tokens,
   128 new tokens, 4 lanes, quantum 16.  int4 weights (4.3 GB) leave
   room for fullkv's 4.3 GB cache only because the CB prefills one lane
   at a time.
2. Batched generate() at B=32, 2k ctx, snapkv — the decode-aggregate
   ceiling (B=32 rows is the fused kernel's row-threshold boundary).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2ab_bench.py
"""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.weights import QuantW
from pyramidkv_tpu.serving import ContinuousBatcher, Request


def log(m):
    print(f"[2ab] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def spec_depth(layers, max_pos=131072):
    return ModelSpec(
        name=f"llama3-8b-d{layers}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=max_pos,
    )


def random_int4_params(spec, key):
    ks = iter(jax.random.split(key, 16))
    L, Dm, I = spec.num_hidden_layers, spec.hidden_size, spec.intermediate_size
    H, KV, Dh, V = (spec.num_attention_heads, spec.num_key_value_heads,
                    spec.head_dim, spec.vocab_size)

    def qw(shape):
        fan_in = shape[-2]
        codes = jax.random.randint(
            next(ks), shape[:-1] + (shape[-1] // 2,), -128, 128, jnp.int8)
        sval = 1.0 / (7.0 * np.sqrt(fan_in))
        return QuantW(codes=codes,
                      scale=jnp.full(shape[:-2] + (shape[-1],), sval,
                                     jnp.float32))

    emb_codes = jax.random.randint(next(ks), (V, Dm), -127, 128, jnp.int8)
    lm_codes = jax.random.randint(next(ks), (Dm, V), -127, 128, jnp.int8)
    return {
        "embed": QuantW(codes=emb_codes,
                        scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": jnp.ones((Dm,), jnp.bfloat16),
        "lm_head": QuantW(codes=lm_codes,
                          scale=jnp.full((V,), 1.0 / (127.0 * np.sqrt(Dm)),
                                         jnp.float32)),
        "layers": {
            "wq": qw((L, Dm, H * Dh)),
            "wk": qw((L, Dm, KV * Dh)),
            "wv": qw((L, Dm, KV * Dh)),
            "wo": qw((L, H * Dh, Dm)),
            "w_gate": qw((L, Dm, I)),
            "w_up": qw((L, Dm, I)),
            "w_down": qw((L, I, Dm)),
            "attn_norm": jnp.ones((L, Dm), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, Dm), jnp.bfloat16),
        },
    }


def main():
    assert jax.devices()[0].platform == "tpu"
    spec = spec_depth(32)
    params = random_int4_params(spec, jax.random.PRNGKey(0))
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
            log(f"cb32k_d32_int4w/{method} warmup (compiles)")
            cb.run([Request("w", prompts[0][:32000], max_new_tokens=8)])
            t0 = time.perf_counter()
            out = cb.run(list(reqs))
            wall = time.perf_counter() - t0
            total = sum(len(r.tokens) for r in out.values())
            dec_s = sum(r.decode_seconds for r in out.values())
            pf_s = sum(r.prefill_seconds for r in out.values())
            emit({"bench": f"cb32k_d32_int4w/{method}",
                  "wall_s": round(wall, 2), "total_tokens": total,
                  "serving_tok_s": round(total / wall, 1),
                  "sum_prefill_s": round(pf_s, 2),
                  "sum_decode_s": round(dec_s, 2)})
            del eng, cb
        except Exception:
            emit({"bench": f"cb32k_d32_int4w/{method}",
                  "error": traceback.format_exc()[-800:]})

    # decode-aggregate ceiling: B=32 (kernel row-threshold boundary)
    try:
        eng = Engine(
            spec,
            CompressionSpec(method="snapkv", max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=128, prefill_buckets=(2048,)),
            params,
        )
        bp = [[int(t) for t in rng.integers(0, spec.vocab_size, size=2047)]
              for _ in range(32)]
        log("int4w_d32/snapkv_b32 compiling")
        eng.generate(bp)
        best = 0.0
        for _ in range(2):
            out = eng.generate(bp)
            best = max(best, 32 * out.decode_steps
                       / max(out.decode_seconds, 1e-9))
        emit({"bench": "int4w_d32/snapkv_b32",
              "decode_tokens_per_s": round(best, 2),
              "prefill_ms": round(out.prefill_seconds * 1e3, 1),
              "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
              "batch": 32, "layers": 32})
    except Exception:
        emit({"bench": "int4w_d32/snapkv_b32",
              "error": traceback.format_exc()[-800:]})
    log("ALL DONE")


if __name__ == "__main__":
    main()
