"""Round-2d TPU: reshape-free quant kernel validation + engine rows, and
MInference re-timings after the estimation fix (+ fused engine rows)."""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[2d] {msg}", file=sys.stderr, flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    assert jax.devices()[0].platform == "tpu"

    # ---- 1. quant kernel minimal repro ----
    from pyramidkv_tpu.kernels.quant_decode import quant_decode_attention
    from pyramidkv_tpu.ops.quant import quantize_kv_region

    for nbits in (8, 4):
        try:
            b, h, s, d = 1, 8, 512, 128
            rng = np.random.default_rng(0)
            k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32),
                            jnp.bfloat16)
            v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32),
                            jnp.bfloat16)
            q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
            mask = jnp.ones((b, h, s), bool)
            reg = quantize_kv_region(k, v, nbits=nbits, group_size=64)
            t, out = timed(
                quant_decode_attention, q, reg.k.codes,
                reg.k.scale[..., 0], reg.k.zero[..., 0],
                reg.v.codes, reg.v.scale[..., 0], reg.v.zero[..., 0],
                mask, nbits=nbits, group_size=64,
            )
            emit({"bench": f"quantk_repro/int{nbits}", "ms": round(t * 1e3, 3)})
        except Exception:
            tb = traceback.format_exc()
            log(f"quant repro int{nbits} FAILED:\n{tb}")
            emit({"bench": f"quantk_repro/int{nbits}",
                  "error": tb[-1500:]})

    # ---- 2. minference component timings at 8k ----
    from pyramidkv_tpu.kernels.block_sparse_prefill import slash_tile_attention
    from pyramidkv_tpu.ops.sparse_prefill import (
        _slash_tile_selection,
        estimate_vertical_slash,
        sparse_prefill_attention,
        vertical_attention_partials,
    )

    b, h, hk, n, d = 1, 32, 8, 8192, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32),
                    jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, hk, n, d)).astype(np.float32),
                    jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, hk, n, d)).astype(np.float32),
                    jnp.bfloat16)
    tl = jnp.asarray([n], jnp.int32)

    est = jax.jit(lambda q, k: estimate_vertical_slash(
        q, k, true_len=tl, vertical_size=1000, slash_size=200))
    t, pat = timed(est, q, k)
    emit({"bench": "minf8k/estimate", "ms": round(t * 1e3, 1)})

    vp = jax.jit(lambda q, k, v: vertical_attention_partials(
        q, k, v, pat, true_len=tl))
    try:
        t, _ = timed(vp, q, k, v)
        emit({"bench": "minf8k/vertical_partials", "ms": round(t * 1e3, 1)})
    except Exception:
        emit({"bench": "minf8k/vertical_partials",
              "error": traceback.format_exc()[-800:]})

    for q_block, k_tile, budget in ((128, 128, 16), (256, 256, 8),
                                    (512, 256, 8), (512, 512, 4)):
        try:
            ti, tv = _slash_tile_selection(pat, n, q_block, k_tile, budget)

            st = jax.jit(lambda q, k, v, ti=ti, tv=tv, qb=q_block, kt=k_tile:
                         slash_tile_attention(q, k, v, ti, tv, pat.vert, tl,
                                              q_block=qb, k_tile=kt))
            t, _ = timed(st, q, k, v)
            emit({"bench": f"minf8k/slash_q{q_block}_k{k_tile}_t{budget}",
                  "ms": round(t * 1e3, 1)})
        except Exception:
            emit({"bench": f"minf8k/slash_q{q_block}_k{k_tile}_t{budget}",
                  "error": traceback.format_exc()[-800:]})

    # full fused at the best-looking variant
    for q_block, k_tile, budget in ((512, 256, 8),):
        try:
            fn = jax.jit(lambda q, k, v: sparse_prefill_attention(
                q, k, v, pat, true_len=tl, q_block=q_block, k_tile=k_tile,
                tile_budget=budget))
            t, _ = timed(fn, q, k, v)
            emit({"bench": f"minf8k/fused_q{q_block}_k{k_tile}_t{budget}",
                  "ms": round(t * 1e3, 1)})
        except Exception:
            emit({"bench": f"minf8k/fused_q{q_block}_k{k_tile}_t{budget}",
                  "error": traceback.format_exc()[-800:]})

    # dense flash reference per layer at 8k
    from pyramidkv_tpu.kernels import flash_causal_attention

    fl = jax.jit(lambda q, k, v: flash_causal_attention(q, k, v, tl))
    t, _ = timed(fl, q, k, v)
    emit({"bench": "minf8k/dense_flash", "ms": round(t * 1e3, 1)})

    # per-layer fused at 16k/32k with full traceback on failure
    for n2 in (16384, 32768):
        try:
            q2 = jnp.asarray(
                np.random.default_rng(2).normal(size=(1, 32, n2, 128))
                .astype(np.float32), jnp.bfloat16)
            k2 = jnp.asarray(
                np.random.default_rng(3).normal(size=(1, 8, n2, 128))
                .astype(np.float32), jnp.bfloat16)
            v2 = jnp.asarray(
                np.random.default_rng(4).normal(size=(1, 8, n2, 128))
                .astype(np.float32), jnp.bfloat16)
            tl2 = jnp.asarray([n2], jnp.int32)
            pat2 = jax.jit(lambda q, k: estimate_vertical_slash(
                q, k, true_len=tl2, vertical_size=1000, slash_size=200))(q2, k2)
            t, _ = timed(jax.jit(lambda q, k, v: sparse_prefill_attention(
                q, k, v, pat2, true_len=tl2, tile_budget=16)), q2, k2, v2)
            emit({"bench": f"minf{n2}/fused_layer", "ms": round(t * 1e3, 1)})
            t, _ = timed(jax.jit(
                lambda q, k, v: flash_causal_attention(q, k, v, tl2)),
                q2, k2, v2)
            emit({"bench": f"minf{n2}/dense_layer", "ms": round(t * 1e3, 1)})
            del q2, k2, v2, pat2
        except Exception:
            emit({"bench": f"minf{n2}/fused_layer",
                  "error": traceback.format_exc()[-1200:]})

    # engine-level quant rows with the fused kernel
    from pyramidkv_tpu.config import CompressionSpec, EngineSpec
    from pyramidkv_tpu.engine import Engine
    from pyramidkv_tpu.models import llama as jl
    from pyramidkv_tpu.config import ModelSpec
    import time as _t

    d8 = ModelSpec(
        name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=8,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=40960,
    )
    p8 = jl.init_params(d8, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    prompt = [int(x) for x in np.random.default_rng(0).integers(
        0, 128256, size=4095)]
    for cap in (512, 2048):
        for nbits in (8, 4, 2):
            tag = f"quant/cap{cap}/int{nbits}_kernel"
            try:
                eng = Engine(
                    d8,
                    CompressionSpec(method="snapkv", max_capacity_prompt=cap,
                                    window_size=8, quant_method="kivi",
                                    nbits=nbits),
                    EngineSpec(max_new_tokens=128, prefill_buckets=(4096,)),
                    p8,
                )
                eng.generate([prompt])
                best = 0.0
                for _ in range(2):
                    out = eng.generate([prompt])
                    best = max(best, out.decode_steps / out.decode_seconds)
                emit({"bench": tag, "decode_tokens_per_s": round(best, 2),
                      "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2)})
            except Exception:
                emit({"bench": tag, "error": traceback.format_exc()[-1000:]})

    log("ALL DONE")


if __name__ == "__main__":
    main()
