"""Round-2aw TPU measurements: CHUNKED dequant decode (quant_region_
attention_partials) on the quantized-KV x int4-weight full-depth rows.
Same legs as r2au2, run on the chunked-path code — r2au2 one-shot
baselines: 32k kivi8/kivi4 10.4, 64k kivi4 4.9 tok/s.

The r2z full-depth table showed bf16 fullkv topping out at 32k (4.3 GB
cache) and OOMing at 64k.  KIVI-quantized caches shrink the region 4x
(int4) / 2x (int8), so the question is (a) does a 64k FULL cache now fit
next to 4 GB of int4 weights, and (b) what does packed-code decode
bandwidth buy vs the bf16 cache read at 32k.

Rows (all d32 int4 fused-kernel weights, cap 128 / window 8 where
compressed):
  32k fullkv kivi-int8 / kivi-int4   (vs bf16 fullkv 49.4 tok/s, r2z)
  64k fullkv kivi-int4               (capacity: bf16 OOMs here)
  64k fullkv kivi-int8               (borderline: ~4.3 GB cache)
  64k snapkv+kivi4 sanity row        (compression + quant together)
"""

import json
import sys
import time
import traceback

import jax
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine

sys.path.insert(0, "/root/repo/scripts")
from tpu_round2z_bench import random_int4_params, spec_depth  # noqa: E402


def log(m):
    print(f"[2aw] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


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
    d32 = spec_depth(32)
    p4 = random_int4_params(d32, jax.random.PRNGKey(0))
    run("kv_quant_d32/32k_fullkv_kivi8", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=8)
    run("kv_quant_d32/32k_fullkv_kivi4", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=4)
    run("kv_quant_d32/64k_fullkv_kivi4", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=4)
    run("kv_quant_d32/64k_fullkv_kivi8", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=8)
    run("kv_quant_d32/64k_snapkv_kivi4", d32, p4, "snapkv", 65536,
        quant_method="kivi", nbits=4)
    log("ALL DONE")


if __name__ == "__main__":
    main()
