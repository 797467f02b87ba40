"""Batch scheduler + engine stats."""

import numpy as np
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.serving import BatchScheduler, Request


def _engine(batch_max_new=6):
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=batch_max_new, prefill_buckets=(32, 64)),
        params,
    )


def test_batched_equals_single():
    eng = _engine()
    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(0, 256, size=n)] for n in (20, 25, 28)]
    singles = [eng.generate([p]).tokens[0] for p in prompts]
    batched = eng.generate(prompts).tokens
    assert batched == singles


def test_scheduler_groups_by_bucket_and_preserves_ids():
    eng = _engine()
    sched = BatchScheduler(eng, batch_size=2)
    rng = np.random.default_rng(1)
    reqs = {}
    for i, n in enumerate((10, 20, 28, 40, 50)):  # buckets 32 and 64
        r = Request(request_id=f"r{i}",
                    prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)])
        reqs[r.request_id] = r
        sched.submit(r)
    out = sched.run()
    assert set(out) == set(reqs)
    assert sched.pending() == 0
    # each result matches an individual run of the same prompt
    for rid, res in out.items():
        want = eng.generate([reqs[rid].prompt_ids]).tokens[0]
        assert res.tokens == want, rid


def test_engine_stats_accumulate():
    eng = _engine()
    assert eng.stats.requests == 0
    eng.generate([[1, 2, 3, 4, 5]])
    eng.generate([[5, 4, 3, 2, 1, 6, 7]])
    s = eng.stats
    assert s.requests == 2
    assert s.prompt_tokens == 12
    assert s.generated_tokens == 12  # 6 max_new each, no EOS in tiny model
    assert s.decode_tokens_per_second() > 0
    d = s.as_dict()
    assert d["requests"] == 2 and "decode_tokens_per_s" in d
