"""Round-2ac TPU measurements: int4 WEIGHTS with QKV/gate-up OUT-axis
fusion (`weights.fuse_packed_matmuls`) — 4 decode-kernel launches per
layer instead of 7.  r2x measured 91.0 tok/s d32 snapkv with 224
launches/step vs ~140 at int8-effective HBM bandwidth; this isolates
how much of that gap is launch overhead.

History: arithmetic unpack 8.6 tok/s (r2o), native-s4 bitcast 10.2 tok/s
(r2v) — both XLA paths materialise full-width weight transients per
decode step.  The fused kernel reads the PACKED bytes (0.5 byte/param)
and sign-extends in VMEM, so decode HBM traffic halves vs int8
(79.7 tok/s, r2o).  This re-runs the r2v grid on the kernel path
(`weights._int4_kernel_mm` routes decode-shaped x automatically on TPU).

Param generation matches tpu_round2o/2v_bench.py (random packed codes
directly on device; a d32 bf16 staging tree would not fit HBM).
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
    print(f"[2aj] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def spec_depth(layers, max_pos=40960):
    return ModelSpec(
        name=f"llama3-8b-d{layers}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=max_pos,
    )


def random_int4_params(spec, key, group_size=None):
    ks = iter(jax.random.split(key, 16))
    L, Dm, I = spec.num_hidden_layers, spec.hidden_size, spec.intermediate_size
    H, KV, Dh, V = (spec.num_attention_heads, spec.num_key_value_heads,
                    spec.head_dim, spec.vocab_size)

    def qw(shape):
        fan_in = shape[-2]
        codes = jax.random.randint(
            next(ks), shape[:-1] + (shape[-1] // 2,), -128, 128, jnp.int8)
        sval = 1.0 / (7.0 * np.sqrt(fan_in))
        if group_size and fan_in % group_size == 0 and fan_in > group_size:
            scale = jnp.full(shape[:-2] + (fan_in // group_size, shape[-1]),
                             sval, jnp.float32)
        else:
            scale = jnp.full(shape[:-2] + (shape[-1],), sval, jnp.float32)
        return QuantW(codes=codes, scale=scale)

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


def run(tag, spec, params, method, ctx=4096, max_new=128, batch=1):
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
        best = None
        for _ in range(2):
            out = eng.generate(prompts)
            tps = batch * out.decode_steps / max(out.decode_seconds, 1e-9)
            if best is None or tps > best[0]:
                best = (tps, out)
        tps, out = best
        emit({"bench": tag, "decode_tokens_per_s": round(tps, 2),
              "prefill_ms": round(out.prefill_seconds * 1e3, 1),
              "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
              "batch": batch, "layers": spec.num_hidden_layers})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-1200:]})


def run_bf16(tag, spec, params, method, ctx=4096, max_new=128, batch=1):
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
        eng.generate(prompts)
        best = None
        for _ in range(2):
            out = eng.generate(prompts)
            tps = batch * out.decode_steps / max(out.decode_seconds, 1e-9)
            if best is None or tps > best[0]:
                best = (tps, out)
        tps, out = best
        emit({"bench": tag, "decode_tokens_per_s": round(tps, 2),
              "prefill_ms": round(out.prefill_seconds * 1e3, 1),
              "batch": batch, "layers": spec.num_hidden_layers})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-900:]})


def main():
    assert jax.devices()[0].platform == "tpu"
    # d8 bf16: the standard sweep geometry — decode-attn kernel now fires
    d8 = spec_depth(8, max_pos=131072)
    from pyramidkv_tpu.models import llama
    p8 = llama.init_params(d8, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    run_bf16("bf16dj_d8/snapkv_4k", d8, p8, "snapkv")
    run_bf16("bf16dj_d8/snapkv_64k", d8, p8, "snapkv", ctx=65536, max_new=128)
    del p8
    d32 = spec_depth(32)

    from pyramidkv_tpu.models.weights import fuse_packed_matmuls

    # per-channel int4, fused QKV/gate-up: head-to-head with r2ac rows
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))
    run("int4dj_d32/fullkv", d32, p4, "fullkv")
    run("int4dj_d32/snapkv", d32, p4, "snapkv")
    run("int4dj_d32/snapkv_b8", d32, p4, "snapkv", ctx=2048, batch=8)
    run("int4dj_d32/snapkv_b16", d32, p4, "snapkv", ctx=2048, batch=16)
    run("int4dj_d32/fullkv_8k", d32, p4, "fullkv", ctx=8192)
    run("int4dj_d32/snapkv_8k", d32, p4, "snapkv", ctx=8192)
    del p4

    # grouped scales (the quality configuration) through the grouped kernel
    p4g = fuse_packed_matmuls(
        random_int4_params(d32, jax.random.PRNGKey(1), group_size=128))
    run("int4dj_g128_d32/snapkv", d32, p4g, "snapkv")
    log("ALL DONE")


if __name__ == "__main__":
    main()
