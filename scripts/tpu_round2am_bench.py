"""Round-2am TPU measurements: batched CB refills.

CB prefilled lanes one at a time; at short contexts that made serving
prefill-bound (64 x 2k on 32 lanes: 232.6 tok/s wall vs 2007.7 for one
batched generate — logs/tpu_r2ak).  serving.py now prefills same-bucket
refills in power-of-two batched groups.  Re-run the r2ak CB leg plus the
r2ab 32k flagship CB comparison.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 7200 \
       python scripts/tpu_round2am_bench.py
"""

import json
import sys
import time
import traceback

import jax
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.weights import fuse_packed_matmuls
from pyramidkv_tpu.serving import ContinuousBatcher, Request

from tpu_round2aj_bench import random_int4_params, spec_depth


def log(m):
    print(f"[2am] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def run_cb(tag, spec, params, method, lanes, n_req, ctx, max_new=128,
           prefill_block=None, quantum=16, refill_tokens=8192):
    try:
        es = dict(max_new_tokens=max_new, prefill_buckets=(ctx,))
        if prefill_block:
            es["prefill_block"] = prefill_block
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(**es), params,
        )
        rng = np.random.default_rng(0)
        prompts = [
            [int(t) for t in rng.integers(0, spec.vocab_size,
                                          size=ctx - 9 - (i % 7))]
            for i in range(n_req)
        ]
        cb = ContinuousBatcher(eng, lanes=lanes, quantum=quantum,
                               refill_tokens=refill_tokens)
        log(f"{tag}: warmup (compiles)")
        cb.run([Request(f"w{j}", prompts[j][: ctx - 48], max_new_tokens=8)
                for j in range(min(lanes, n_req))])
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
    # r2ak leg, now with batched refills (was 232.6 tok/s wall);
    # refill_tokens=8192 -> 4-row groups at 2k
    run_cb("cb2k_d32_int4/snapkv_lanes32_refill4", d32, p4, "snapkv",
           lanes=32, n_req=64, ctx=2048)
    # larger refill budget: 8-row groups
    run_cb("cb2k_d32_int4/snapkv_lanes32_refill8", d32, p4, "snapkv",
           lanes=32, n_req=64, ctx=2048, refill_tokens=16384)
    # r2ab flagship leg (was 18.0 tok/s wall, prefill-bound 8 x 6.6 s);
    # default refill budget keeps 32k refills sequential (memory)
    run_cb("cb32k_d32_int4/snapkv_lanes4_seqpf", d32, p4, "snapkv",
           lanes=4, n_req=8, ctx=32768, prefill_block=512)
    log("ALL DONE")


if __name__ == "__main__":
    main()
