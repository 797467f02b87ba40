"""ThinK narrow key storage: memory savings with bit-equal decode.

The reference fork stores channel-pruned keys at ``head_dim - k`` width
(cache_utils_think.py:390-424) — that IS the method's benefit.  Round 1
zeroed channels in a full-width buffer (numerically identical, zero memory
saved); these tests pin the narrow layout against that dense oracle.
"""

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
    ids = [int(x) for x in np.random.default_rng(5).integers(0, 256, size=80)]
    return spec, params, ids


def _engine(spec, params, dense, **kw):
    cs = CompressionSpec(method="think", max_capacity_prompt=24,
                         window_size=4, recent_size=8, pruning_ratio=0.5,
                         think_dense=dense, **kw)
    return Engine(spec, cs,
                  EngineSpec(max_new_tokens=10, prefill_buckets=(128,)),
                  params)


def test_narrow_matches_dense_tokens(setup):
    """true_len >= cap: zeroed channels contribute exactly 0 to the dot
    product, so narrow storage decodes the SAME greedy tokens."""
    spec, params, ids = setup
    dense = _engine(spec, params, True).generate([ids], eos_token_ids=())
    narrow = _engine(spec, params, False).generate([ids], eos_token_ids=())
    assert narrow.tokens[0] == dense.tokens[0]
    assert narrow.kv_cache_bytes < dense.kv_cache_bytes


def test_narrow_key_bytes_shrink(setup):
    """K-side bytes of the pruned region drop by ~pruning_ratio."""
    spec, params, ids = setup
    eng = _engine(spec, params, False)
    out = eng.generate([ids], eos_token_ids=())
    plan = eng.plan_for(128)
    assert plan.think_narrow
    _, cache = eng._get_prefill(128)(
        params,
        jnp.asarray([[0] * 48 + ids], jnp.int32),
        jnp.asarray([80], jnp.int32), jax.random.PRNGKey(0),
    )
    assert cache.think is not None
    sp = plan.think_pruned_slots
    D = spec.head_dim
    dk = cache.think.k_pruned.shape[-1]
    assert dk == D - int(D * 0.5)
    # the k buffer no longer holds the pruned slots
    assert cache.k.shape[3] == plan.total_slots - sp
    assert cache.think.k_pruned.shape[3] == sp
    assert out.kv_cache_bytes > 0


def test_narrow_generate_long(setup):
    spec, params, ids = setup
    eng = _engine(spec, params, False)
    out = eng.generate_long([ids], max_new_tokens=24, eos_token_ids=())
    assert len(out.tokens[0]) == 24
    plain = eng.generate([ids], max_new_tokens=10, eos_token_ids=())
    assert out.tokens[0][:10] == plain.tokens[0]


def test_quantized_think_falls_back_to_dense():
    cs = CompressionSpec(method="think", max_capacity_prompt=24,
                         window_size=4, quant_method="kivi", nbits=8)
    from pyramidkv_tpu.policy import make_plan

    plan = make_plan(cs, 2, 64, 8)
    assert not plan.think_narrow
