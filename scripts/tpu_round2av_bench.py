"""Round-2av TPU measurements: Gemma-2-9B geometry on one v5e.

The Gemma-2 forward adds real per-layer work over Llama (4 RMSNorms,
tanh soft-capping on every attention logit, alternating sliding/full
attention via lax.cond branches) — this measures what those semantics
cost at the family's flagship shape (42 layers, head_dim 256, 8k ctx)
with int4 fused-kernel weights + int8 tied embedding.

Rows: 8k {fullkv, snapkv} decode tok/s + prefill ms.
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
    print(f"[2av] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def random_gemma2_int4_params(spec, key):
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
    zeros = lambda *s: jnp.zeros(s, jnp.bfloat16)  # (1+w) norms # noqa: E731
    return {
        "embed": QuantW(codes=emb_codes,
                        scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": zeros(Dm),
        "layers": {
            "wq": qw((L, Dm, H * Dh)),
            "wk": qw((L, Dm, KV * Dh)),
            "wv": qw((L, Dm, KV * Dh)),
            "wo": qw((L, H * Dh, Dm)),
            "w_gate": qw((L, Dm, I)),
            "w_up": qw((L, Dm, I)),
            "w_down": qw((L, I, Dm)),
            "attn_norm": zeros(L, Dm),
            "mlp_norm": zeros(L, Dm),
            "attn_post_norm": zeros(L, Dm),
            "mlp_post_norm": zeros(L, Dm),
        },
    }


def run(tag, spec, params, method, ctx, max_new=64):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,)),
            params,
        )
        rng = np.random.default_rng(0)
        prompt = [int(t) for t in rng.integers(0, spec.vocab_size,
                                               size=ctx - 1)]
        log(f"{tag}: compiling ...")
        t0 = time.perf_counter()
        eng.generate([prompt])
        log(f"{tag}: compiled+first run in {time.perf_counter()-t0:.1f}s")
        out = eng.generate([prompt])
        tps = out.decode_steps / max(out.decode_seconds, 1e-9)
        emit({"bench": tag, "decode_tokens_per_s": round(tps, 2),
              "prefill_ms": round(out.prefill_seconds * 1e3, 1),
              "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
              "layers": spec.num_hidden_layers, "ctx": ctx})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-1200:]})


def main():
    assert jax.devices()[0].platform == "tpu"
    spec = ModelSpec.preset("gemma2-9b")
    params = random_gemma2_int4_params(spec, jax.random.PRNGKey(0))
    run("gemma2_9b_int4/8k_snapkv", spec, params, "snapkv", 8192)
    run("gemma2_9b_int4/8k_fullkv", spec, params, "fullkv", 8192)
    log("ALL DONE")


if __name__ == "__main__":
    main()
