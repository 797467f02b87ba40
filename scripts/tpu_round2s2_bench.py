"""Round-2s2: the 128k legs that OOM with bf16 weights, rerun with int8
weights (halves the 3.5 GB weight footprint; the 4.3 GB full-KV cache is
what dominates).  bf16-weight results (logs/tpu_r2s.jsonl): snapkv runs
(14.4 s prefill, 116 tok/s, 21 MB cache); fullkv/minference OOM — full-KV
at 128k does not fit one 16 GB v5e next to bf16 weights.

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2s2_bench.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.weights import QuantW


def log(m):
    print(f"[2s2] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def int8_params(spec, key):
    ks = iter(jax.random.split(key, 16))
    L, Dm, I = (spec.num_hidden_layers, spec.hidden_size,
                spec.intermediate_size)
    H, KV, Dh, V = (spec.num_attention_heads, spec.num_key_value_heads,
                    spec.head_dim, spec.vocab_size)

    def qw(shape):
        codes = jax.random.randint(next(ks), shape, -127, 128, jnp.int8)
        scale = jnp.full(shape[:-2] + (shape[-1],),
                         1.0 / (127.0 * np.sqrt(shape[-2])), jnp.float32)
        return QuantW(codes=codes, scale=scale)

    return {
        "embed": QuantW(
            codes=jax.random.randint(next(ks), (V, Dm), -127, 128, jnp.int8),
            scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": jnp.ones((Dm,), jnp.bfloat16),
        "lm_head": qw((Dm, V)),
        "layers": {
            "wq": qw((L, Dm, H * Dh)), "wk": qw((L, Dm, KV * Dh)),
            "wv": qw((L, Dm, KV * Dh)), "wo": qw((L, H * Dh, Dm)),
            "w_gate": qw((L, Dm, I)), "w_up": qw((L, Dm, I)),
            "w_down": qw((L, I, Dm)),
            "attn_norm": jnp.ones((L, Dm), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, Dm), jnp.bfloat16),
        },
    }


def main():
    log(f"platform={jax.devices()[0].platform}")
    ctx = 131072
    spec = ModelSpec(
        name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=8,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=262144,
    )
    params = int8_params(spec, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]

    legs = [
        ("engine128k_int8w/fullkv", "fullkv", {}),
        ("engine128k_int8w/minference", "minference",
         dict(minference_dense_below=0)),
        ("engine128k_int8w/snapkv", "snapkv", {}),
    ]
    for tag, method, kw in legs:
        try:
            eng = Engine(
                spec,
                CompressionSpec(method=method, max_capacity_prompt=128,
                                window_size=8, kernel_size=7,
                                pooling="maxpool", **kw),
                EngineSpec(max_new_tokens=32, prefill_buckets=(ctx,),
                           prefill_block=512),
                params,
            )
            log(f"{tag} compiling")
            eng.generate([prompt])
            best_pf, best_tps = float("inf"), 0.0
            for _ in range(3):
                out = eng.generate([prompt])
                best_pf = min(best_pf, out.prefill_seconds)
                best_tps = max(best_tps,
                               out.decode_steps / out.decode_seconds)
            emit({"bench": tag, "prefill_ms": round(best_pf * 1e3, 1),
                  "decode_tok_s": round(best_tps, 1),
                  "kv_mb": round(out.kv_cache_bytes / 1e6, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"bench": tag, "error": repr(e)[:300]})

    log("ALL DONE")


if __name__ == "__main__":
    main()
