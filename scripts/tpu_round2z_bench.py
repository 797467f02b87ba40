"""Round-2z TPU measurements: FULL-DEPTH (32-layer) Llama-3-8B geometry at
LONG context on one v5e — int4 weights (fused stacked kernel) leave
~11 GB of HBM for cache + transients, so the flagship shape now runs the
32k/64k regimes that were previously depth-8 only.

Rows: 32k {fullkv, snapkv, snapkv B=4, minference}, 64k {snapkv}.
fullkv at 32k is the capacity test: 4.3 GB weights + 4.3 GB cache.
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


def log(m):
    print(f"[2z] {m}", file=sys.stderr, flush=True)


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


def run(tag, spec, params, method, ctx, max_new=64, batch=1):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,)),
            params,
        )
        rng = np.random.default_rng(0)
        prompts = [[int(t) for t in rng.integers(0, spec.vocab_size,
                                                 size=ctx - 1)]
                   for _ in range(batch)]
        log(f"{tag}: compiling ...")
        t0 = time.perf_counter()
        eng.generate(prompts)
        log(f"{tag}: compiled+first run in {time.perf_counter()-t0:.1f}s")
        out = eng.generate(prompts)
        tps = batch * out.decode_steps / max(out.decode_seconds, 1e-9)
        emit({"bench": tag, "decode_tokens_per_s": round(tps, 2),
              "prefill_ms": round(out.prefill_seconds * 1e3, 1),
              "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
              "batch": batch, "layers": spec.num_hidden_layers, "ctx": ctx})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-1200:]})


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = random_int4_params(d32, jax.random.PRNGKey(0))

    run("int4w_d32_32k/snapkv", d32, p4, "snapkv", ctx=32768)
    run("int4w_d32_32k/snapkv_b4", d32, p4, "snapkv", ctx=32768, batch=4)
    run("int4w_d32_32k/minference", d32, p4, "minference", ctx=32768)
    run("int4w_d32_32k/fullkv", d32, p4, "fullkv", ctx=32768)
    run("int4w_d32_64k/snapkv", d32, p4, "snapkv", ctx=65536)
    log("ALL DONE")


if __name__ == "__main__":
    main()
