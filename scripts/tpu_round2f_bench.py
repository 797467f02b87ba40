"""Round-2f: the FULL 32-layer Llama-3-8B geometry on one v5e via int8
weights (random codes — perf only), fullkv + snapkv.  Also a depth-8
int8-vs-bf16 sanity pair to isolate the weight-quant speedup."""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama
from pyramidkv_tpu.models.weights import QuantW


def log(m):
    print(f"[2f] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def spec_depth(layers):
    return ModelSpec(
        name=f"llama3-8b-d{layers}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=40960,
    )


def random_int8_params(spec, key):
    """Random int8 codes + sane scales directly on device (no bf16 stage —
    the 32-layer bf16 pytree would not fit HBM)."""
    ks = iter(jax.random.split(key, 16))
    L, Dm, I = spec.num_hidden_layers, spec.hidden_size, spec.intermediate_size
    H, KV, Dh, V = (spec.num_attention_heads, spec.num_key_value_heads,
                    spec.head_dim, spec.vocab_size)

    def qw(shape):
        fan_in = shape[-2]
        codes = jax.random.randint(next(ks), shape, -127, 128, jnp.int8)
        scale = jnp.full(shape[:-2] + (shape[-1],),
                         1.0 / (127.0 * np.sqrt(fan_in)), jnp.float32)
        return QuantW(codes=codes, scale=scale)

    emb_codes = jax.random.randint(next(ks), (V, Dm), -127, 128, jnp.int8)
    params = {
        "embed": QuantW(codes=emb_codes,
                        scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": jnp.ones((Dm,), jnp.bfloat16),
        "lm_head": qw((Dm, V)),
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
    return params


def run(tag, spec, params, method, ctx=4096, max_new=128):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,)),
            params,
        )
        prompt = [int(t) for t in
                  np.random.default_rng(0).integers(0, spec.vocab_size,
                                                    size=ctx - 1)]
        log(f"{tag}: compiling ...")
        eng.generate([prompt])
        best = None
        for _ in range(2):
            out = eng.generate([prompt])
            tps = out.decode_steps / max(out.decode_seconds, 1e-9)
            if best is None or tps > best[0]:
                best = (tps, out)
        tps, out = best
        emit({"bench": tag, "decode_tokens_per_s": round(tps, 2),
              "prefill_ms": round(out.prefill_seconds * 1e3, 1),
              "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
              "layers": spec.num_hidden_layers})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-1000:]})


def main():
    assert jax.devices()[0].platform == "tpu"

    # depth-8 pair: isolate the int8-weight effect vs the bf16 rows
    d8 = spec_depth(8)
    p8q = random_int8_params(d8, jax.random.PRNGKey(0))
    run("int8w/d8/fullkv", d8, p8q, "fullkv")
    run("int8w/d8/snapkv", d8, p8q, "snapkv")
    del p8q

    # the flagship: all 32 layers on one chip
    d32 = spec_depth(32)
    p32 = random_int8_params(d32, jax.random.PRNGKey(1))
    run("int8w/d32/fullkv", d32, p32, "fullkv")
    run("int8w/d32/snapkv", d32, p32, "snapkv")
    log("ALL DONE")


if __name__ == "__main__":
    main()
