"""Decode-stage compression: unbounded generation at fixed cache size
(the reference's own open TODO, README.md:49)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl


@pytest.fixture(scope="module")
def eng():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)),
        params,
    )


IDS = [int(x) for x in np.random.default_rng(7).integers(0, 256, size=40)]


def test_generates_beyond_decode_slots(eng):
    out = eng.generate_long([IDS], max_new_tokens=30)
    assert len(out.tokens[0]) == 30
    assert all(0 <= t < 256 for t in out.tokens[0])
    # cache stayed at its fixed size (slots never grew)
    plan = eng.plan_for(64)
    assert out.kv_cache_bytes == (
        2 * eng.model_spec.num_hidden_layers * 1
        * eng.model_spec.num_attention_heads * plan.total_slots
        * eng.model_spec.head_dim * 4  # fp32 test params
    )


def test_first_segment_matches_plain_generate(eng):
    plain = eng.generate([IDS], max_new_tokens=8).tokens[0]
    long = eng.generate_long([IDS], max_new_tokens=30).tokens[0]
    assert long[:8] == plain


def test_short_requests_delegate(eng):
    a = eng.generate([IDS], max_new_tokens=5).tokens[0]
    b = eng.generate_long([IDS], max_new_tokens=5).tokens[0]
    assert a == b


def test_eos_mid_segment_stops(eng):
    base = eng.generate_long([IDS], max_new_tokens=20).tokens[0]
    eos = base[10]
    out = eng.generate_long([IDS], max_new_tokens=20,
                            eos_token_ids=(eos,)).tokens[0]
    assert len(out) <= 20
    assert eos not in out
    # and it is a prefix of the unconstrained run up to the first eos
    cut = base.index(eos)
    assert out == base[:cut]


def test_generate_long_with_sliding_window():
    """Mistral-style sliding window composes with rolling decode eviction
    (positions stay absolute across rolls)."""
    spec = ModelSpec.tiny(sliding_window=16)
    params = jl.init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method="streamingllm", max_capacity_prompt=16,
                        window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)),
        params,
    )
    out = eng.generate_long([IDS], max_new_tokens=25)
    assert len(out.tokens[0]) == 25
    assert all(0 <= t < 256 for t in out.tokens[0])


def test_generate_long_batch():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    eng = Engine(
        spec, CompressionSpec(method="snapkv", max_capacity_prompt=16,
                              window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
    )
    rng = np.random.default_rng(9)
    prompts = [[int(x) for x in rng.integers(0, 256, size=n)] for n in (20, 35)]
    out = eng.generate_long(prompts, max_new_tokens=20)
    assert [len(t) for t in out.tokens] == [20, 20]
    # batch rows match the same rows generated individually
    for i, p in enumerate(prompts):
        solo = eng.generate_long([p], max_new_tokens=20).tokens[0]
        assert out.tokens[i] == solo


def test_generate_long_quantized():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    def mk(qm):
        return Engine(
            spec,
            CompressionSpec(method="snapkv", max_capacity_prompt=16,
                            window_size=4, quant_method=qm, nbits=8),
            EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
        )
    out = mk("kivi").generate_long([IDS], max_new_tokens=25)
    assert len(out.tokens[0]) == 25
    # int8 kivi tracks the fp run closely on the first segment
    fp8 = mk(None).generate([IDS], max_new_tokens=8).tokens[0]
    assert out.tokens[0][:8] == fp8


def test_generate_long_l2norm_eviction():
    """Re-scored decode eviction: keep the lowest-key-norm decode tokens at
    each roll instead of the most recent."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(5), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
    )
    out = eng.generate_long([IDS], max_new_tokens=25, eviction="l2norm")
    assert len(out.tokens[0]) == 25
    # first segment (pre-roll) identical to recency mode
    rec = eng.generate_long([IDS], max_new_tokens=25, eviction="recency")
    assert out.tokens[0][:8] == rec.tokens[0][:8]
    # the roll itself keeps the lowest-norm keys: check the roll fn directly
    import numpy as np

    _, cache = eng._get_prefill(64)(
        params, jnp.asarray([[0] * (64 - len(IDS)) + IDS], jnp.int32),
        jnp.asarray([len(IDS)], jnp.int32), jax.random.PRNGKey(0),
    )
    # fill decode region with distinguishable keys
    decode_fn = eng._get_decode(64)
    out2, steps, cache, last, done = decode_fn(
        params, cache, jnp.asarray([1], jnp.int32),
        jnp.asarray([-1], jnp.int32), jax.random.PRNGKey(0), jnp.int32(7),
    )
    plan = eng.plan_for(64)
    ps, ds = plan.prefill_slots, plan.decode_slots
    keep = 4
    rolled = eng._get_roll(64, keep, "l2norm")(cache)
    dec_k = np.asarray(cache.k)[:, :, :, ps:ps + ds]
    dec_m = np.asarray(cache.mask)[:, :, :, ps:ps + ds]
    norms = np.sqrt((dec_k.astype(np.float64) ** 2).sum(-1))
    norms[~dec_m] = np.inf
    kept_pos = np.asarray(rolled.positions)[:, :, :, ps:ps + keep]
    src_pos = np.asarray(cache.positions)[:, :, :, ps:ps + ds]
    L, B, H = norms.shape[:3]
    for l in range(L):
        for h in range(H):
            want = set(src_pos[l, 0, h][np.argsort(norms[l, 0, h])[:keep]])
            got = set(kept_pos[l, 0, h].tolist())
            assert got == want, (l, h, got, want)


def test_generate_long_l2norm_eviction_think_narrow():
    """l2norm decode eviction with the ThinK NARROW K layout: the K buffer
    holds only (recent + window + decode) full-width rows, so the decode
    region sits at a different K offset than the mask/V offset — the roll
    must score norms at the K offset and apply the picks everywhere."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(6), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method="think", max_capacity_prompt=16,
                        window_size=4, pruning_ratio=0.5),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
    )
    out = eng.generate_long([IDS], max_new_tokens=25, eviction="l2norm")
    assert len(out.tokens[0]) == 25
    import numpy as np

    _, cache = eng._get_prefill(64)(
        params, jnp.asarray([[0] * (64 - len(IDS)) + IDS], jnp.int32),
        jnp.asarray([len(IDS)], jnp.int32), jax.random.PRNGKey(0),
    )
    decode_fn = eng._get_decode(64)
    _, steps, cache, last, done = decode_fn(
        params, cache, jnp.asarray([1], jnp.int32),
        jnp.asarray([-1], jnp.int32), jax.random.PRNGKey(0), jnp.int32(7),
    )
    plan = eng.plan_for(64)
    ps, ds = plan.prefill_slots, plan.decode_slots
    k_off = ps - plan.think_pruned_slots
    keep = 4
    rolled = eng._get_roll(64, keep, "l2norm")(cache)
    dec_k = np.asarray(cache.k)[:, :, :, k_off:k_off + ds]
    dec_m = np.asarray(cache.mask)[:, :, :, ps:ps + ds]
    norms = np.sqrt((dec_k.astype(np.float64) ** 2).sum(-1))
    norms[~dec_m] = np.inf
    kept_pos = np.asarray(rolled.positions)[:, :, :, ps:ps + keep]
    src_pos = np.asarray(cache.positions)[:, :, :, ps:ps + ds]
    L, B, H = norms.shape[:3]
    for l in range(L):
        for h in range(H):
            want = set(src_pos[l, 0, h][np.argsort(norms[l, 0, h])[:keep]])
            got = set(kept_pos[l, 0, h].tolist())
            assert got == want, (l, h, got, want)
