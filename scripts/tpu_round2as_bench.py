"""Round-2as: staged lane appends (commit once per step/verify instead
of per layer) — plain CB and speculative CB re-measured.  Warmup covers
every refill group size {1,2,4} so mid-run prefill recompiles stop
polluting walls (the r2ap/ar rand-vs-rep anomaly).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 7200 \
       python scripts/tpu_round2as_bench.py
"""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.weights import fuse_packed_matmuls
from pyramidkv_tpu.serving import ContinuousBatcher, Request

from tpu_round2aj_bench import random_int4_params, spec_depth


def log(m):
    print(f"[2as] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def run_cb(tag, spec, params, lanes, n_req, ctx, max_new=128,
           speculative=None, draft_len=8, quantum=16, kind="rand",
           zero_draft=False):
    from pyramidkv_tpu.ops import ngram as ngram_mod

    real_draft = ngram_mod.ngram_draft
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
                ph = rng.integers(0, spec.vocab_size, size=64).tolist()
                prompts.append((ph * ((ctx - 1) // 64 + 1))[: ctx - 9 - (i % 7)])
        else:
            prompts = [
                [int(t) for t in rng.integers(0, spec.vocab_size,
                                              size=ctx - 9 - (i % 7))]
                for i in range(n_req)
            ]
        if zero_draft:
            def none_draft(hist, start, end, *, n, k):
                b = hist.shape[0]
                return (jnp.zeros((b, k), jnp.int32),
                        jnp.zeros((b,), jnp.int32))
            ngram_mod.ngram_draft = none_draft
        cb = ContinuousBatcher(eng, lanes=lanes, quantum=quantum)
        calls = [0]
        if speculative:
            fn = cb._build_quantum_spec()

            def wrapped(*a):
                calls[0] += 1
                return fn(*a)

            cb._quantum_fn = wrapped
        log(f"{tag}: warmup (compiles; 7 reqs => refill sizes 4/2/1)")
        cb.run([Request(f"w{j}", prompts[j % n_req][: ctx - 48],
                        max_new_tokens=8) for j in range(7)])
        calls[0] = 0
        t0 = time.perf_counter()
        out = cb.run([Request(f"r{i}", p, max_new_tokens=max_new)
                      for i, p in enumerate(prompts)])
        wall = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in out.values())
        iters = calls[0] * quantum
        rec = {"bench": tag, "wall_s": round(wall, 2),
               "total_tokens": total,
               "serving_tok_s": round(total / wall, 1),
               "lanes": lanes, "requests": n_req,
               "layers": spec.num_hidden_layers}
        if speculative:
            rec["verify_iters"] = iters
            rec["ms_per_iter"] = round(1e3 * wall / max(iters, 1), 1)
            rec["tokens_per_lane_iter"] = round(
                total / max(iters * lanes, 1), 3)
        emit(rec)
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-900:]})
    finally:
        ngram_mod.ngram_draft = real_draft


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))
    run_cb("cb2k_as/plain8", d32, p4, lanes=8, n_req=32, ctx=2048)
    run_cb("cb2k_as/spec8_zero", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram", zero_draft=True)
    run_cb("cb2k_as/spec8_rand", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram")
    run_cb("cb2k_as/spec8_rep", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram", kind="rep")
    run_cb("cb2k_as/plain16", d32, p4, lanes=16, n_req=48, ctx=2048)
    run_cb("cb2k_as/spec16_rand", d32, p4, lanes=16, n_req=48, ctx=2048,
           speculative="ngram")
    run_cb("cb2k_as/plain32", d32, p4, lanes=32, n_req=64, ctx=2048)
    log("ALL DONE")


if __name__ == "__main__":
    main()
