"""Round-3c: engine-level measurement of the decode-step fixes from the
r3a/r3b decomposition (logs/tpu_r3b.jsonl, logs/r3a_trace):

  - span-planar pack4 layout: the int4 kernel now assembles natural-order
    output in-VMEM; the caller-side stack interleave (~1.0 ms/step of
    relayout copies: copy.81/84/86-88) is gone.
  - streaming int8 lm_head kernel (multiply_reduce_fusion.9 was 1.149 ms
    at 56% of HBM bandwidth).
  - cheaper nibble sign-extension (2 VPU ops, was 4).

Legs: control (all new defaults) / int8-lm_head-off ablation / profile
capture to confirm the copies disappeared.
"""

import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from _bench_common import emit, make_logger, random_int4_params, spec_depth
from tpu_round3a_bench import CTX, engine_leg

from pyramidkv_tpu.models import weights as W

log = make_logger("r3c")


def profile_leg(spec, params, tdir="/root/repo/logs/r3c_trace", tag="r3c"):
    from _bench_common import build_engine

    try:
        eng = build_engine(spec, params, method="snapkv", ctx=CTX, cap=128,
                           window=8, max_new=128)
        rng = np.random.default_rng(0)
        prompt = np.zeros((1, CTX), np.int32)
        prompt[0, 1:] = rng.integers(0, spec.vocab_size, size=CTX - 1)
        tl = jnp.asarray([CTX - 1], jnp.int32)
        _, cache = eng._get_prefill(CTX)(params, jnp.asarray(prompt), tl,
                                         jax.random.PRNGKey(0))
        decode_fn = eng._get_decode(CTX)
        first = jnp.zeros((1,), jnp.int32)
        eos = jnp.asarray([-1], jnp.int32)
        out = decode_fn(params, cache, first, eos, jax.random.PRNGKey(1),
                        jnp.int32(16))
        jax.block_until_ready(out[0])
        _, cache = eng._get_prefill(CTX)(params, jnp.asarray(prompt), tl,
                                         jax.random.PRNGKey(0))
        jax.block_until_ready(cache.k)
        jax.profiler.start_trace(tdir, create_perfetto_trace=True)
        out = decode_fn(params, cache, first, eos, jax.random.PRNGKey(1),
                        jnp.int32(16))
        jax.block_until_ready(out[0])
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
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]
        emit({"bench": f"{tag}/profile_top",
              "ops": [[n, round(t, 1), c] for n, (t, c) in top]})
    except Exception as e:
        emit({"bench": f"{tag}/profile_top", "error": repr(e)[-400:]})


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    spec = spec_depth(32)
    params = random_int4_params(spec, jax.random.PRNGKey(0), fused=True)

    engine_leg("r3c/planar_int8lm", spec, params)

    W._USE_INT8_KERNEL[0] = False
    try:
        engine_leg("r3c/planar_only", spec, params,
                   extra={"int8_lm_kernel": False})
    finally:
        W._USE_INT8_KERNEL[0] = True

    profile_leg(spec, params)
    log("ALL DONE")


if __name__ == "__main__":
    main()
