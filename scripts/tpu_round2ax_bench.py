"""Round-2ax TPU measurements:

1. Softcap/scale sparse-prefill kernels on REAL Mosaic (the Gemma-2
   threading was verified in interpret mode only): grid + db slash kernels
   and the vertical-partials kernel vs the O(N^2) dense oracle.
2. First Gemma-2 rows: gemma2-9b geometry (42L, 3584 hidden, 256k vocab,
   softcap + alternating 4096-sliding layers, GeGLU, post-block norms) with
   int4 fused-kernel weights at 8k ctx — fullkv vs snapkv.
3. 128k FULL-KV capacity row at the d32 Llama-3-8B geometry: bf16 cache
   would be 17 GB (impossible); kivi-int4 shrinks it to ~5.4 GB next to
   4.3 GB of int4 weights.  Chunked dequant decode (r2aw) makes it usable.
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

sys.path.insert(0, "/root/repo/scripts")
from tpu_round2z_bench import random_int4_params, spec_depth  # noqa: E402


def log(m):
    print(f"[2ax] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def kernel_softcap_parity():
    """Gemma-2 scale/softcap through the sparse-prefill kernels on real
    Mosaic vs the dense oracle (interpret-mode parity already in tests)."""
    from pyramidkv_tpu.ops.sparse_prefill import (
        estimate_vertical_slash,
        sparse_prefill_attention,
        sparse_prefill_attention_dense,
    )

    b, h, n, d = 1, 4, 2048, 128
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
               for _ in range(3))
    tl = jnp.asarray([n - 64], jnp.int32)
    sem = dict(scale=0.0625, softcap=50.0)
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=128,
                                  slash_size=64, last_q=64, **sem)
    want = np.asarray(sparse_prefill_attention_dense(
        q, k, v, pat, true_len=tl, q_block=256, k_tile=256, tile_budget=4,
        **sem))
    pad = 64
    for impl in ("grid", "db"):
        got = np.asarray(sparse_prefill_attention(
            q, k, v, pat, true_len=tl, q_block=256, k_tile=256,
            tile_budget=4, slash_impl=impl, **sem))
        err = float(np.abs(got[:, :, pad:] - want[:, :, pad:]).max())
        emit({"bench": f"softcap_kernel_parity/{impl}", "max_abs_err": err,
              "ok": err < 2e-4})


def random_int4_params_gemma2(spec, key):
    """Gemma-2 layout: tied embeddings (no lm_head leaf), zero-init norms
    (unit-offset RMSNorm), post-block norms."""
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
    z = lambda shape: jnp.zeros(shape, jnp.bfloat16)
    return {
        "embed": QuantW(codes=emb_codes,
                        scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": z((Dm,)),
        "layers": {
            "wq": qw((L, Dm, H * Dh)),
            "wk": qw((L, Dm, KV * Dh)),
            "wv": qw((L, Dm, KV * Dh)),
            "wo": qw((L, H * Dh, Dm)),
            "w_gate": qw((L, Dm, I)),
            "w_up": qw((L, Dm, I)),
            "w_down": qw((L, I, Dm)),
            "attn_norm": z((L, Dm)),
            "mlp_norm": z((L, Dm)),
            "attn_post_norm": z((L, Dm)),
            "mlp_post_norm": z((L, Dm)),
        },
    }


def run(tag, spec, params, method, ctx, max_new=64, **comp_kw):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8, **comp_kw),
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
    log("leg 1: softcap kernel parity on Mosaic")
    try:
        kernel_softcap_parity()
    except Exception:
        emit({"bench": "softcap_kernel_parity", "error":
              traceback.format_exc()[-1200:]})

    log("leg 2: gemma2-9b geometry, int4 weights, 8k ctx")
    g2 = ModelSpec.preset("gemma2-9b")
    pg = random_int4_params_gemma2(g2, jax.random.PRNGKey(1))
    run("gemma2_9b_8k/snapkv", g2, pg, "snapkv", 8192)
    run("gemma2_9b_8k/fullkv", g2, pg, "fullkv", 8192)
    del pg

    log("leg 3: 128k fullkv + kivi4 capacity row (d32 llama geometry)")
    d32 = spec_depth(32)
    p4 = random_int4_params(d32, jax.random.PRNGKey(0))
    run("kv_quant_d32/128k_fullkv_kivi4", d32, p4, "fullkv", 131072,
        quant_method="kivi", nbits=4)
    run("kv_quant_d32/128k_snapkv_kivi4", d32, p4, "snapkv", 131072,
        quant_method="kivi", nbits=4)
    log("ALL DONE")


if __name__ == "__main__":
    main()
