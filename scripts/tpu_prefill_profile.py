"""Perfetto attribution of one 32k prefill (the serving bottleneck:
8 x 32k CB walls at ~19 tok/s with ~53 s of the 57 s wall being prefill
device time — logs/tpu_r3g; prefill sits at ~60% of its compute
roofline, and THIS trace says where the rest goes)."""

import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os as _os; sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from _bench_common import build_engine, emit, make_logger, random_int4_params, spec_depth

log = make_logger("pprof")
CTX = 32768


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    spec = spec_depth(32)
    params = random_int4_params(spec, jax.random.PRNGKey(0), fused=True,
                                lm_head_nbits=4)
    eng = build_engine(spec, params, method="snapkv", ctx=CTX, cap=128,
                       window=8, max_new=16)
    rng = np.random.default_rng(0)
    prompt = np.zeros((1, CTX), np.int32)
    prompt[0, 1:] = rng.integers(0, spec.vocab_size, size=CTX - 1)
    tl = jnp.asarray([CTX - 1], jnp.int32)
    pf = eng._get_prefill(CTX)
    t0 = time.perf_counter()
    lg, cache = pf(params, jnp.asarray(prompt), tl, jax.random.PRNGKey(0))
    jax.block_until_ready(lg)
    log(f"warm prefill (compile) {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    lg, cache = pf(params, jnp.asarray(prompt), tl, jax.random.PRNGKey(0))
    jax.block_until_ready(lg)
    wall = time.perf_counter() - t0
    emit({"bench": "pprof/prefill_32k_wall_s", "value": round(wall, 3)})

    tdir = "/root/repo/logs/r3j_trace"
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    lg, cache = pf(params, jnp.asarray(prompt), tl, jax.random.PRNGKey(0))
    jax.block_until_ready(lg)
    jax.profiler.stop_trace()
    time.sleep(2)
    agg = {}
    for f in glob.glob(f"{tdir}/**/*.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            name = ev.get("name", "?")
            t, c = agg.get(name, (0.0, 0))
            agg[name] = (t + ev["dur"], c + 1)
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:35]
    emit({"bench": "pprof/prefill_top",
          "ops": [[n, round(t, 1), c] for n, (t, c) in top]})
    log("ALL DONE")


if __name__ == "__main__":
    main()
