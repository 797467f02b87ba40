"""True-GQA cache storage: fullkv stores num_kv_heads entries (like the
unpatched reference model) and gqa_aggregate does group-mean scoring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl


@pytest.fixture(scope="module")
def setup():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(7), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(11).integers(0, 256, size=40)]
    return spec, params, ids


def test_fullkv_cache_stores_kv_heads(setup):
    spec, params, ids = setup
    eng = Engine(spec, CompressionSpec(method="fullkv"),
                 EngineSpec(max_new_tokens=4, prefill_buckets=(64,)), params)
    plan = eng.plan_for(64)
    logits, cache = eng._get_prefill(64)(
        params,
        jnp.asarray([([0] * 24) + ids], jnp.int32),
        jnp.asarray([40], jnp.int32),
        jax.random.PRNGKey(0),
    )
    assert cache.k.shape[2] == spec.num_key_value_heads  # not H
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 4


@pytest.mark.parametrize("method", ["snapkv", "pyramidkv", "h2o", "streamingllm",
                                    "l2norm", "adakv", "random"])
def test_gqa_aggregate_runs_and_shrinks_cache(setup, method):
    spec, params, ids = setup
    cs = CompressionSpec(method=method, max_capacity_prompt=16, window_size=4,
                         gqa_aggregate=True)
    eng = Engine(spec, cs, EngineSpec(max_new_tokens=4, prefill_buckets=(64,)), params)
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 4
    # cache head dim is num_kv_heads
    _, cache = eng._get_prefill(64)(
        params,
        jnp.asarray([([0] * 24) + ids], jnp.int32),
        jnp.asarray([40], jnp.int32),
        jax.random.PRNGKey(0),
    )
    assert cache.k.shape[2] == spec.num_key_value_heads


def test_gqa_aggregate_same_tokens_when_capacity_suffices(setup):
    """With capacity >= q_len both layouts keep everything -> identical
    generations."""
    spec, params, ids = setup
    outs = []
    for agg in (False, True):
        cs = CompressionSpec(method="snapkv", max_capacity_prompt=64,
                             window_size=4, gqa_aggregate=agg)
        eng = Engine(spec, cs, EngineSpec(max_new_tokens=6, prefill_buckets=(64,)),
                     params)
        outs.append(eng.generate([ids]).tokens[0])
    assert outs[0] == outs[1]
