"""Per-layer-width cache segments (l2norm skip_layers / PyramidKV pyramid).

The reference's dynamically-sized caches store exactly each layer's budget;
our static layout used to pay the MAX width at every layer — l2norm's
skip_layers inflated every layer to the full bucket (553 MB vs fullkv's 138
in round 1).  Segmented plans fix that; these tests pin (a) token parity
with the forced-uniform layout and (b) the memory win.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.policy import make_plan


@pytest.fixture(scope="module")
def setup():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(3).integers(0, 256, size=100)]
    return spec, params, ids


def test_l2norm_plan_is_segmented():
    cs = CompressionSpec(method="l2norm", max_capacity_prompt=128)
    plan = make_plan(cs, 8, 4096, 64)
    assert plan.segmented
    widths = {w for _, _, w in plan.segments}
    assert 4096 in widths           # skip layers keep the whole bucket
    assert min(widths) <= 128 + 8   # compressed layers near cap
    # skip layers [0,1] are a distinct leading segment
    assert plan.segments[0][:2] == (0, 2)
    used = sum((b - a) * w for a, b, w in plan.segments)
    assert used < 0.5 * 4096 * 8    # >2x slot saving vs uniform


def test_pyramidkv_plan_is_segmented():
    cs = CompressionSpec(method="pyramidkv", max_capacity_prompt=512,
                         window_size=8)
    plan = make_plan(cs, 32, 4096, 64)
    assert plan.segmented
    ws = [w for _, _, w in plan.segments]
    assert ws == sorted(ws, reverse=True)  # pyramid: lower layers keep more
    used = sum((b - a) * w for a, b, w in plan.segments)
    assert used < 0.85 * plan.width * 32


def test_quantized_plans_stay_uniform():
    cs = CompressionSpec(method="pyramidkv", max_capacity_prompt=512,
                         window_size=8, quant_method="kivi", nbits=8)
    plan = make_plan(cs, 32, 4096, 64)
    assert not plan.segmented


@pytest.mark.parametrize("method", ["l2norm", "pyramidkv"])
def test_segmented_tokens_match_uniform(setup, method):
    """Same greedy tokens from the segmented and forced-uniform layouts —
    segmentation is a pure memory-layout change."""
    spec, params, ids = setup
    cs = CompressionSpec(method=method, max_capacity_prompt=24, window_size=4,
                         kernel_size=1)
    outs = {}
    caches = {}
    for tag, allow in (("seg", True), ("uni", False)):
        eng = Engine(spec, cs,
                     EngineSpec(max_new_tokens=8, prefill_buckets=(128,)),
                     params)
        if not allow:
            # monkey-free forced-uniform: rebuild plans without segments
            orig = eng.plan_for

            def plan_for(bucket, _orig=orig):
                import dataclasses
                p = _orig(bucket)
                return dataclasses.replace(
                    p, segments=((0, p.num_layers, p.width),)
                )

            eng.plan_for = plan_for
        out = eng.generate([ids], eos_token_ids=())
        outs[tag] = out.tokens[0]
        caches[tag] = out.kv_cache_bytes
        if tag == "seg":
            assert eng.plan_for(128).segmented, method
    assert outs["seg"] == outs["uni"], method
    assert caches["seg"] < caches["uni"], (method, caches)


def test_l2norm_generate_long_segmented(setup):
    spec, params, ids = setup
    cs = CompressionSpec(method="l2norm", max_capacity_prompt=24)
    eng = Engine(spec, cs, EngineSpec(max_new_tokens=8, prefill_buckets=(128,)),
                 params)
    assert eng.plan_for(128).segmented
    out = eng.generate_long([ids], max_new_tokens=20, eos_token_ids=())
    assert len(out.tokens[0]) == 20
    # rolling eviction across segments must agree with plain decode on the
    # first segment's worth of tokens
    plain = eng.generate([ids], max_new_tokens=8, eos_token_ids=())
    assert out.tokens[0][:8] == plain.tokens[0]
