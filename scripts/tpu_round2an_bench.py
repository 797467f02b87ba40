"""Round-2an TPU measurements: speculative continuous batching.

Every CB lane drafts (on-device prompt-lookup) and verifies
`spec_draft_len` tokens per forward (`serving._build_quantum_spec`).
At the d32 int4 flagship a 32-lane verify forward costs ~one decode
step, so lane-level acceptance multiplies aggregate serving throughput
the same way it multiplied B=1 (logs/tpu_r2al: 1.9-2.2x).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 7200 \
       python scripts/tpu_round2an_bench.py
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
    print(f"[2an] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def run_cb(tag, spec, params, lanes, n_req, ctx, max_new=128,
           speculative=None, draft_len=8, quantum=16, kind="rand"):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method="snapkv", max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                       speculative=speculative, spec_draft_len=draft_len),
            params,
        )
        rng = np.random.default_rng(0)
        if kind == "rep":
            prompts = []
            for i in range(n_req):
                phrase = rng.integers(0, spec.vocab_size, size=64).tolist()
                prompts.append((phrase * ((ctx - 1) // 64 + 1))[: ctx - 9 - (i % 7)])
        else:
            prompts = [
                [int(t) for t in rng.integers(0, spec.vocab_size,
                                              size=ctx - 9 - (i % 7))]
                for i in range(n_req)
            ]
        cb = ContinuousBatcher(eng, lanes=lanes, quantum=quantum)
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
              "lanes": lanes, "requests": n_req, "spec": bool(speculative),
              "layers": spec.num_hidden_layers})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-900:]})


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))
    # smallest-first: a failed big leg fragments HBM for later ones
    # (32 spec lanes OOM outright: 9.2 GB lane cache + 4.3 GB weights +
    # 288-row verify transients — logs/tpu_r2an2)
    run_cb("cb2k_d32_int4/spec_lanes8", d32, p4, lanes=8, n_req=32,
           ctx=2048, speculative="ngram", quantum=4)
    run_cb("cb2k_d32_int4/plain_lanes8", d32, p4, lanes=8, n_req=32,
           ctx=2048)
    run_cb("cb2k_d32_int4/spec_lanes16", d32, p4, lanes=16, n_req=48,
           ctx=2048, speculative="ngram", quantum=4)
    run_cb("cb2k_d32_int4/plain_lanes16", d32, p4, lanes=16, n_req=48,
           ctx=2048)
    run_cb("cb2k_d32_int4/spec_lanes16_rep", d32, p4, lanes=16, n_req=48,
           ctx=2048, speculative="ngram", quantum=4, kind="rep")
    log("ALL DONE")


if __name__ == "__main__":
    main()
