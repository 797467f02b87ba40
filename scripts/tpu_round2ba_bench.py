"""Round-2ba TPU measurement: the missing CHUNKED-path int2 long-region
row (64k fullkv kivi2, d32 int4 weights) — the tiled kernel measured
20.93 tok/s here (logs/tpu_r2az); this pins the default path's number.
Plus the 32k kivi2 row for the cache-size story (int2 = 8x smaller than
bf16).
"""

import json
import sys
import time
import traceback

import jax
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec
from pyramidkv_tpu.engine import Engine

sys.path.insert(0, "/root/repo/scripts")
from tpu_round2z_bench import random_int4_params, spec_depth  # noqa: E402


def log(m):
    print(f"[2ba] {m}", file=sys.stderr, flush=True)


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
    run("chunked_d32/64k_fullkv_kivi2", d32, p4, "fullkv", 65536,
        quant_method="kivi", nbits=2)
    run("chunked_d32/32k_fullkv_kivi2", d32, p4, "fullkv", 32768,
        quant_method="kivi", nbits=2)
    log("ALL DONE")


if __name__ == "__main__":
    main()
