"""Continuous-batching + long-generation demo (tiny random model).

Shows the serving surface the reference doesn't have (batch=1 only,
README.md:47): lane-recycled continuous batching, data-parallel lanes over
a mesh, and decode-stage compression (generate_long) past the decode-slot
allocation.

Run: python examples/serving_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # demo-sized; run anywhere

import numpy as np
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.serving import ContinuousBatcher, Request


def main():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=32, window_size=8),
        EngineSpec(max_new_tokens=16, prefill_buckets=(64, 128)),
        params,
    )

    rng = np.random.default_rng(0)
    reqs = [
        Request(request_id=f"req-{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=8)
        for i, n in enumerate((20, 45, 90, 33, 70))
    ]
    cb = ContinuousBatcher(eng, lanes=2, quantum=4)
    done = cb.run(list(reqs))
    for rid, r in sorted(done.items()):
        print(f"{rid}: {len(r.tokens)} tokens "
              f"(prefill {r.prefill_seconds*1e3:.0f} ms, "
              f"decode {r.decode_seconds*1e3:.0f} ms)")

    # decode-stage compression: generate far past the decode slots
    long_out = eng.generate_long(
        [reqs[0].prompt_ids], max_new_tokens=40, eviction="l2norm",
    )
    print(f"generate_long: {len(long_out.tokens[0])} tokens at a fixed "
          f"{long_out.kv_cache_bytes/1e3:.0f} KB cache")


if __name__ == "__main__":
    main()
