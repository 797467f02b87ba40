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
    k0 = cache.k[0] if cache.segmented else cache.k
    assert k0.shape[2] == spec.num_key_value_heads  # not H
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
    k0 = cache.k[0] if cache.segmented else cache.k
    assert k0.shape[2] == spec.num_key_value_heads


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


def test_per_query_head_selection_differs_within_group():
    """The reference compresses AFTER repeat_kv so query heads in one GQA
    group can keep DIFFERENT tokens (llama_model.py:158-159).  The grouped
    compute refactor must preserve that: default path -> per-group
    differences possible; gqa_aggregate -> identical within a group."""
    import jax.numpy as jnp
    from pyramidkv_tpu.config import CompressionSpec
    from pyramidkv_tpu.policy import LayerContext, compress_layer, make_plan
    from pyramidkv_tpu.ops.selection import uniform_keep_counts

    b, h, kv, n, d, w = 1, 4, 2, 64, 16, 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, kv, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, kv, n, d)), jnp.float32)
    tl = jnp.asarray([n], jnp.int32)

    def run(agg):
        spec = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                               window_size=w, kernel_size=1,
                               gqa_aggregate=agg)
        plan = make_plan(spec, 1, n, 4)
        ctx = LayerContext(
            keep_counts=uniform_keep_counts(spec, tl, w),
            head_capacity=jnp.zeros((h,), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        return compress_layer(plan, ctx, q, k, v, true_len=tl)

    ckv = run(False)
    # query heads 0 and 1 share KV head 0 but can keep different positions
    pos = np.asarray(ckv.positions)
    mask = np.asarray(ckv.mask)
    s0 = set(pos[0, 0][mask[0, 0]].tolist())
    s1 = set(pos[0, 1][mask[0, 1]].tolist())
    assert s0 != s1, "random inputs should yield per-head selections"
    # and the kept K values come from the shared KV head
    kept_k = np.asarray(ckv.k)[0, 0]
    src = np.asarray(k)[0, 0]
    for slot, p_ in enumerate(pos[0, 0]):
        if mask[0, 0, slot]:
            np.testing.assert_allclose(kept_k[slot], src[p_], rtol=1e-5)

    agg = run(True)
    assert agg.k.shape[1] == kv  # stored at KV heads
