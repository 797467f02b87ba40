"""Round-2ak TPU measurements: per-layer-dispatch attacks at d32 int4.

The r2ag depth-split decomposition puts d32 int4 decode at ~1.6 ms fixed
+ 0.25 ms/layer, of which only ~0.1 ms/layer is weight bytes — the
headroom is per-layer dispatch.  Two knobs, measured factorially at the
flagship geometry (32-layer Llama-3-8B, int4 fused-kernel weights, 4k
ctx, cap 128), then the winner is applied to the serving legs:

1. PKV_DECODE_ATTN_KERNEL — one-launch Pallas decode attention
   (`kernels/decode_attn.py`): replaces ~5 XLA dispatches per layer.
   d8 bf16 measured neutral-to-negative (logs/tpu_r2aj); d32 is the
   pending measurement.
2. PKV_DECODE_SCAN_UNROLL — decode layer-scan unroll (4): lets XLA
   schedule across adjacent layers (overlap weight DMA with compute).

Also: CB serving at 32 lanes x 2k (the B=32 aggregate-ceiling row —
batched generate() at B=32 OOMs on prefill transients, per-lane CB
prefill does not), a B=32 generate() retry with blockwise prefill, and
the grouped-scale (g128) config under the winning knobs.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 10800 \
       python scripts/tpu_round2ak_bench.py
"""

import json
import sys
import time
import traceback

import jax
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama
from pyramidkv_tpu.models.weights import fuse_packed_matmuls
from pyramidkv_tpu.ops import attention as attn_mod
from pyramidkv_tpu.serving import ContinuousBatcher, Request

from tpu_round2aj_bench import random_int4_params, spec_depth


def log(m):
    print(f"[2ak] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def set_knobs(dj: bool, unroll: int):
    attn_mod._USE_DECODE_ATTN_KERNEL[0] = dj
    llama._DECODE_SCAN_UNROLL[0] = unroll


def run(tag, spec, params, method, ctx=4096, max_new=128, batch=1,
        prefill_block=None):
    try:
        es = dict(max_new_tokens=max_new, prefill_buckets=(ctx,))
        if prefill_block:
            es["prefill_block"] = prefill_block
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(**es),
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
        return tps
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-900:]})
        return None


def run_cb(tag, spec, params, method, lanes, n_req, ctx, max_new=128):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,)),
            params,
        )
        rng = np.random.default_rng(0)
        prompts = [
            [int(t) for t in rng.integers(0, spec.vocab_size,
                                          size=ctx - 9 - (i % 7))]
            for i in range(n_req)
        ]
        cb = ContinuousBatcher(eng, lanes=lanes, quantum=16)
        log(f"{tag}: warmup (compiles)")
        cb.run([Request("w", prompts[0][: ctx - 48], max_new_tokens=8)])
        t0 = time.perf_counter()
        out = cb.run([Request(f"r{i}", p, max_new_tokens=max_new)
                      for i, p in enumerate(prompts)])
        wall = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in out.values())
        emit({"bench": tag, "wall_s": round(wall, 2),
              "total_tokens": total,
              "serving_tok_s": round(total / wall, 1),
              "lanes": lanes, "requests": n_req,
              "layers": spec.num_hidden_layers})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-900:]})


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))

    # -- factorial knob sweep at B=1 4k (control known: 104.5 tok/s r2ah) --
    results = {}
    for dj, unroll, name in ((False, 1, "ctrl"), (True, 1, "dj"),
                             (False, 4, "u4"), (True, 4, "dj_u4")):
        set_knobs(dj, unroll)
        results[name] = run(f"int4ak_d32/snapkv_{name}", d32, p4, "snapkv")
    set_knobs(False, 1)

    # winner (ties -> control's simpler config)
    best_name = max(results, key=lambda k: results[k] or 0.0)
    best_dj = "dj" in best_name
    best_u = 4 if "u4" in best_name else 1
    log(f"winner: {best_name} ({results[best_name]}) dj={best_dj} u={best_u}")
    emit({"bench": "int4ak_d32/winner", "name": best_name,
          "decode_tokens_per_s": results[best_name]})

    # -- serving legs under the winner --
    set_knobs(best_dj, best_u)
    if best_name != "ctrl":
        run("int4ak_d32/snapkv_b16_win", d32, p4, "snapkv",
            ctx=2048, batch=16)
        run("int4ak_d32/fullkv_win", d32, p4, "fullkv")

    # B=32 generate() retry with blockwise prefill (OOMed without it)
    run("int4ak_d32/snapkv_b32_pb512", d32, p4, "snapkv",
        ctx=2048, batch=32, prefill_block=512)

    # CB 32 lanes x 2k: the serving aggregate ceiling
    run_cb("cb2k_d32_int4/snapkv_lanes32", d32, p4, "snapkv",
           lanes=32, n_req=64, ctx=2048)
    set_knobs(False, 1)

    # grouped scales (quality config) under the winner
    del p4
    p4g = fuse_packed_matmuls(
        random_int4_params(d32, jax.random.PRNGKey(1), group_size=128))
    set_knobs(best_dj, best_u)
    run(f"int4ak_g128_d32/snapkv_{best_name}", d32, p4g, "snapkv")
    set_knobs(False, 1)
    log("ALL DONE")


if __name__ == "__main__":
    main()
