"""Round-2bb TPU measurement: 128k-token context at FULL DEPTH (32-layer
Llama-3-8B geometry, int4 fused-kernel weights) on one v5e.

The existing 128k rows (BASELINE round 2s) are depth-8; full-depth 128k
was only probed for fullkv-kivi4 (OOM).  Compressed-cache methods keep
the cache at ~cap slots/layer, so the full 32-layer model should run —
this is the "128k on one chip, real 8B" headline.  fullkv at this shape
is 17 GB of bf16 cache: impossible, by design.
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
    print(f"[2bb] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def run(tag, spec, params, method, ctx, max_new=64, **comp_kw):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8, kernel_size=7, pooling="maxpool",
                            **comp_kw),
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
    run("d32_128k/snapkv", d32, p4, "snapkv", 131072)
    run("d32_128k/pyramidkv", d32, p4, "pyramidkv", 131072)
    log("ALL DONE")


if __name__ == "__main__":
    main()
