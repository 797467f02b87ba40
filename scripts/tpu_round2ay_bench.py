"""Round-2ay TPU measurements: planar-packed KIVI paths + attributions.

1. Sparse-prefill parity WITHOUT softcap (control for r2ax's 4.6e-3 error:
   if the plain path shows ~1e-6, the delta is Mosaic-vs-XLA tanh).
2. Planar quant-decode KERNEL on real Mosaic: compile + parity vs the XLA
   dequant path (int8/int4/int2) at cap-2048-sized regions.
3. Chunked planar rows re-measured: 32k/64k x kivi4/kivi8 fullkv decode
   (r2aw pairwise-packed baselines: 19.21 / 43.65 / 10.45 / 25.08 tok/s).
4. Chunk-size ablation on 32k kivi8 (1024 / 4096 / 16384).
5. Engine row with the fused kernel ON (use_quant_kernel) at 4k cap 2048
   kivi4 — the kernel's first engine-level TPU number on planar codes.
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

sys.path.insert(0, "/root/repo/scripts")
from tpu_round2z_bench import random_int4_params, spec_depth  # noqa: E402


def log(m):
    print(f"[2ay] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def sparse_parity_nosoftcap():
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
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=128,
                                  slash_size=64, last_q=64)
    want = np.asarray(sparse_prefill_attention_dense(
        q, k, v, pat, true_len=tl, q_block=256, k_tile=256, tile_budget=4))
    for impl in ("grid", "db"):
        got = np.asarray(sparse_prefill_attention(
            q, k, v, pat, true_len=tl, q_block=256, k_tile=256,
            tile_budget=4, slash_impl=impl))
        err = float(np.abs(got[:, :, 64:] - want[:, :, 64:]).max())
        emit({"bench": f"nosoftcap_kernel_parity/{impl}", "max_abs_err": err,
              "ok": err < 2e-4})


def quant_kernel_parity():
    from pyramidkv_tpu.kernels.quant_decode import quant_decode_attention
    from pyramidkv_tpu.ops.attention import decode_attention_partials
    from pyramidkv_tpu.ops.quant import (
        dequantize_kv_region,
        quantize_kv_region,
    )

    b, hk, h, s, d = 1, 8, 32, 2048, 128
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, hk, s)) > 0.1)
    for nbits in (8, 4, 2):
        try:
            reg = quantize_kv_region(k, v, nbits=nbits, group_size=64)
            k_hat, v_hat = dequantize_kv_region(
                reg, num_slots=s, head_dim=d, nbits=nbits, group_size=64,
                dtype=jnp.float32)
            acc_w, m_w, l_w = decode_attention_partials(q, k_hat, v_hat, mask)
            want = np.asarray(acc_w / np.maximum(np.asarray(l_w)[..., None],
                                                 1e-30))
            acc, m, l = quant_decode_attention(
                q, reg.k.codes, reg.k.scale[..., 0], reg.k.zero[..., 0],
                reg.v.codes, reg.v.scale[..., 0], reg.v.zero[..., 0],
                mask, nbits=nbits, group_size=64)
            got = np.asarray(acc / np.maximum(np.asarray(l)[..., None], 1e-30))
            err = float(np.abs(got - want).max())
            emit({"bench": f"planar_quant_kernel/int{nbits}",
                  "max_abs_err": err, "ok": err < 2e-3})
        except Exception:
            emit({"bench": f"planar_quant_kernel/int{nbits}",
                  "error": traceback.format_exc()[-900:]})


def run(tag, spec, params, method, ctx, max_new=64, use_quant_kernel=False,
        **comp_kw):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=comp_kw.pop(
                "cap", 128), window_size=8, **comp_kw),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                       use_quant_kernel=use_quant_kernel),
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
    from pyramidkv_tpu.models import llama as jl

    log("leg 1: sparse parity without softcap (tanh attribution)")
    try:
        sparse_parity_nosoftcap()
    except Exception:
        emit({"bench": "nosoftcap_kernel_parity",
              "error": traceback.format_exc()[-900:]})

    log("leg 2: planar quant-decode kernel Mosaic parity")
    quant_kernel_parity()

    log("leg 3/4: chunked planar rows + chunk ablation (d32 int4 weights)")
    d32 = spec_depth(32)
    p4 = random_int4_params(d32, jax.random.PRNGKey(0))
    run("planar_d32/32k_fullkv_kivi8", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=8)
    run("planar_d32/32k_fullkv_kivi4", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=4)
    for chunk in (1024, 16384):
        jl._QUANT_CHUNK_SIZE[0] = chunk
        run(f"planar_d32/32k_fullkv_kivi8_chunk{chunk}", d32, p4, "fullkv",
            32768, quant_method="kivi", nbits=8)
    jl._QUANT_CHUNK_SIZE[0] = 4096
    run("planar_d32/64k_fullkv_kivi8", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=8)
    run("planar_d32/64k_fullkv_kivi4", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=4)

    log("leg 5: fused quant kernel engine row (planar codes)")
    run("planar_d32/4k_snapkv2048_kivi4_kernel", d32, p4, "snapkv", 4096,
        cap=2048, use_quant_kernel=True, quant_method="kivi", nbits=4)
    run("planar_d32/4k_snapkv2048_kivi4_xla", d32, p4, "snapkv", 4096,
        cap=2048, quant_method="kivi", nbits=4)
    log("ALL DONE")


if __name__ == "__main__":
    main()
