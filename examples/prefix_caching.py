"""Prefix-caching demo (tiny random model).

A shared system prompt / few-shot template is precomputed ONCE
(`Engine.precompute_prefix`); every request that starts with it resumes
its chunked prefill past the cached span.  Shows the three surfaces:
explicit handles in `generate()`, the LRU `PrefixRegistry` with
automatic longest-prefix matching in the ContinuousBatcher, and handle
persistence (`save`/`load`).  Measured on a real chip (BASELINE r4j/r4n):
24k prefix at 32k ctx cuts per-request prefill 5.16 s -> 1.81 s and
8x32k serving wall 50.6 s -> 29.9 s.

Run: python examples/prefix_caching.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # demo-sized; run anywhere

import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine, PrefixHandle, PrefixRegistry
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.serving import ContinuousBatcher, Request

import jax.numpy as jnp


def main():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=64,
                        window_size=8),
        EngineSpec(max_new_tokens=16, prefill_buckets=(256,),
                   prefill_chunk=64),
        params,
    )
    rng = np.random.default_rng(0)
    system_prompt = rng.integers(1, 250, size=130).tolist()
    requests = [system_prompt + rng.integers(1, 250, size=n).tolist()
                for n in (60, 90, 126)]

    # 1. explicit handle
    t0 = time.perf_counter()
    handle = eng.precompute_prefix(system_prompt)
    print(f"handle: {handle.full_len} cached tokens, "
          f"{handle.kv_bytes/1e3:.0f} kB, built in "
          f"{time.perf_counter()-t0:.2f}s")
    out = eng.generate(requests, max_new_tokens=8, prefix=handle)
    print("generate(prefix=handle):", [t[:4] for t in out.tokens])
    assert out.tokens == eng.generate(requests, max_new_tokens=8).tokens

    # 2. registry + automatic matching in the batcher
    reg = PrefixRegistry(eng, max_entries=4)
    reg.put(handle)
    cb = ContinuousBatcher(eng, lanes=2, quantum=4, prefix_registry=reg,
                           on_tokens=lambda rid, toks: print(
                               f"  stream {rid}: +{len(toks)} tokens"))
    res = cb.run([Request(request_id=f"r{i}", prompt_ids=p,
                          max_new_tokens=8)
                  for i, p in enumerate(requests)])
    print("batcher (auto-matched prefix):",
          {k: v.tokens[:4] for k, v in sorted(res.items())})

    # 3. persistence
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "system_prompt.npz")
        handle.save(path)
        h2 = PrefixHandle.load(path)
        out2 = eng.generate(requests, max_new_tokens=8, prefix=h2)
        assert out2.tokens == out.tokens
        print(f"save/load roundtrip OK ({os.path.getsize(path)/1e3:.0f} kB)")


if __name__ == "__main__":
    main()
