"""Round-2az TPU measurements: TILED fused dequant-attention kernel.

1. Mosaic parity of quant_decode_attention_tiled vs the XLA dequant path
   (int8/int4/int2, GQA rows, 8192-slot region, 2048-slot tiles).
2. The r2ay planar rows re-run on the tiled-kernel default path
   (engine on TPU now dispatches long KIVI regions to the kernel):
   32k/64k x kivi4/kivi8 fullkv decode.  r2ay chunked-XLA baselines:
   46.17 / 44.67 / 29.27 / 25.05 tok/s.  Bytes roofline (cache+weights at
   ~700 GB/s): 32k kivi4 ~8 ms/step => ~120 tok/s.
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
    print(f"[2az] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def tiled_parity():
    from pyramidkv_tpu.kernels.quant_decode import (
        quant_decode_attention_tiled,
    )
    from pyramidkv_tpu.ops.attention import decode_attention_partials
    from pyramidkv_tpu.ops.quant import (
        dequantize_kv_region,
        quantize_kv_region,
    )

    from pyramidkv_tpu.kernels.quant_decode import tiled_kernel_tile

    b, hk, h, d = 1, 8, 32, 128
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    for nbits in (8, 4, 2):
        try:
            # two tiles at the real-Mosaic tile quantum for this nbits
            s = 2 * tiled_kernel_tile(nbits, 64)
            k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
            v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
            mask = jnp.asarray(rng.random((b, hk, s)) > 0.1)
            reg = quantize_kv_region(k, v, nbits=nbits, group_size=64)
            k_hat, v_hat = dequantize_kv_region(
                reg, num_slots=s, head_dim=d, nbits=nbits, group_size=64,
                dtype=jnp.float32)
            acc_w, _, l_w = decode_attention_partials(q, k_hat, v_hat, mask)
            want = np.asarray(acc_w / np.maximum(np.asarray(l_w)[..., None],
                                                 1e-30))
            acc, m, l = quant_decode_attention_tiled(
                q, reg.k.codes, reg.k.scale[..., 0], reg.k.zero[..., 0],
                reg.v.codes, reg.v.scale[..., 0], reg.v.zero[..., 0],
                mask, nbits=nbits, group_size=64)
            got = np.asarray(acc / np.maximum(np.asarray(l)[..., None],
                                              1e-30))
            err = float(np.abs(got - want).max())
            emit({"bench": f"tiled_quant_kernel/int{nbits}",
                  "max_abs_err": err, "ok": err < 5e-3})
        except Exception:
            emit({"bench": f"tiled_quant_kernel/int{nbits}",
                  "error": traceback.format_exc()[-900:]})


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
    import os

    assert jax.devices()[0].platform == "tpu"
    log("leg 1: tiled kernel Mosaic parity")
    tiled_parity()

    log("leg 2: tiled-kernel engine rows (d32 int4 weights), f32 mm")
    d32 = spec_depth(32)
    p4 = random_int4_params(d32, jax.random.PRNGKey(0))
    run("tiled_d32/32k_fullkv_kivi4", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=4)
    run("tiled_d32/64k_fullkv_kivi8", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=8)

    log("leg 3: same rows, bf16 codes matmul (PKV_QUANT_MM_BF16=1)")
    os.environ["PKV_QUANT_MM_BF16"] = "1"
    run("tiled_bf16_d32/32k_fullkv_kivi4", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=4)
    run("tiled_bf16_d32/32k_fullkv_kivi8", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=8)
    run("tiled_bf16_d32/64k_fullkv_kivi4", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=4)
    run("tiled_bf16_d32/64k_fullkv_kivi8", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=8)
    run("tiled_bf16_d32/64k_fullkv_kivi2", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=2)
    os.environ.pop("PKV_QUANT_MM_BF16")
    log("ALL DONE")


if __name__ == "__main__":
    main()
