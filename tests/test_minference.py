"""MInference-style vertical+slash sparse prefill."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.ops.attention import causal_prefill_attention
from pyramidkv_tpu.ops.sparse_prefill import (
    VerticalSlashPattern,
    estimate_vertical_slash,
    sparse_prefill_attention,
    sparse_prefill_attention_dense,
)


def _full_pattern(b, h, n, true_len):
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, h, n))
    colv = idx >= (n - true_len)
    return VerticalSlashPattern(
        vert=colv, slash=jnp.ones((b, h, n), bool),
        vert_idx=idx, vert_valid=colv,
    )


def test_dense_pattern_recovers_full_attention():
    """With every column + every diagonal kept, sparse == dense."""
    b, h, n, d = 1, 2, 64, 16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
               for _ in range(3))
    tl = jnp.asarray([50], jnp.int32)
    pattern = _full_pattern(b, h, n, 50)
    got = sparse_prefill_attention(q, k, v, pattern, true_len=tl,
                                   q_block=16, k_tile=16, tile_budget=4,
                                   interpret=True)
    want = causal_prefill_attention(q, k, v, true_len=tl, block=16)
    pad = n - 50
    np.testing.assert_allclose(
        np.asarray(got)[:, :, pad:], np.asarray(want)[:, :, pad:],
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.parametrize("true_len", [128, 100])
def test_gathered_matches_dense_oracle(true_len):
    """The gathered block-sparse path == the O(N^2) oracle applying the
    identical coverage (vertical columns exact + block-granular slash)."""
    b, h, n, d = 1, 2, 128, 16
    rng = np.random.default_rng(7)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
               for _ in range(3))
    tl = jnp.asarray([true_len], jnp.int32)
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=12,
                                  slash_size=8, last_q=8)
    got = np.asarray(sparse_prefill_attention(
        q, k, v, pat, true_len=tl, q_block=16, k_tile=16, tile_budget=3,
        interpret=True))
    kw = dict(true_len=tl, q_block=16, k_tile=16, tile_budget=3)
    want = np.asarray(sparse_prefill_attention_dense(q, k, v, pat, **kw))
    pad = n - true_len
    np.testing.assert_allclose(got[:, :, pad:], want[:, :, pad:],
                               rtol=2e-4, atol=2e-4)


def test_sparse_flops_scale_with_pattern():
    """The gathered path never builds [N, N] logits: its largest live
    attention intermediate is [B, H, q_block, Vs + T*k_tile]."""
    b, h, n, d = 1, 2, 256, 16
    rng = np.random.default_rng(9)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
               for _ in range(3))
    tl = jnp.asarray([n], jnp.int32)
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=8,
                                  slash_size=4, last_q=8)
    fn = jax.jit(lambda q, k, v: sparse_prefill_attention(
        q, k, v, pat, true_len=tl, q_block=32, k_tile=32, tile_budget=2,
        interpret=True))
    txt = fn.lower(q, k, v).compile().as_text()
    # the dense [q_block, N] product would be f32[1,2,32,256] per block;
    # with budget 2 the slash part is f32[1,2,32,64]
    assert "f32[1,2,32,256]" not in txt


def test_estimate_keeps_sinks_and_local_band():
    b, h, n, d = 1, 2, 64, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    tl = jnp.asarray([60], jnp.int32)
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=8,
                                  slash_size=8, last_q=16)
    pad = n - 60
    # sinks: first 4 real columns always vertical
    assert bool(pat.vert[0, :, pad:pad + 4].all())
    # local band: diagonal offsets 0..last_q always present
    assert bool(pat.slash[0, :, :17].all())


def test_minference_engine_e2e():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(3).integers(0, 256, size=48)]
    eng = Engine(
        spec,
        CompressionSpec(method="minference", minference_vertical_size=16,
                        minference_slash_size=16, minference_last_q=8),
        EngineSpec(max_new_tokens=4, prefill_buckets=(64,)),
        params,
    )
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 4
    # cache is full (fullkv semantics: KV heads, all slots live)
    _, cache = eng._get_prefill(64)(
        params, jnp.asarray([([0] * 16) + ids], jnp.int32),
        jnp.asarray([48], jnp.int32), jax.random.PRNGKey(0),
    )
    assert cache.k.shape[2] == spec.num_key_value_heads
    assert int(cache.mask[0, 0, 0].sum()) == 48


def test_minference_close_to_dense_when_pattern_large():
    """With pattern sizes >= N the sparse prefill must reproduce dense
    generation exactly."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(4), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(5).integers(0, 256, size=40)]
    outs = []
    for method, kw in (("fullkv", {}),
                       ("minference", dict(minference_vertical_size=64,
                                           minference_slash_size=64))):
        eng = Engine(spec, CompressionSpec(method=method, **kw),
                     EngineSpec(max_new_tokens=6, prefill_buckets=(64,)), params)
        outs.append(eng.generate([ids]).tokens[0])
    assert outs[0] == outs[1]


@pytest.mark.parametrize("true_len", [128, 100])
def test_db_slash_kernel_matches_grid_kernel(true_len):
    """The double-buffered manual-DMA slash kernel (grid over q-blocks,
    dynamic tile loop inside) == the grid-per-tile kernel, GQA included."""
    from pyramidkv_tpu.kernels.block_sparse_prefill import (
        slash_tile_attention,
        slash_tile_attention_db,
    )
    from pyramidkv_tpu.ops.sparse_prefill import _slash_tile_selection

    b, h, hk, n, d = 1, 4, 2, 128, 16
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, hk, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, hk, n, d)), jnp.float32)
    tl = jnp.asarray([true_len], jnp.int32)
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=12,
                                  slash_size=8, last_q=8)
    ti, tv = _slash_tile_selection(pat, n, 16, 16, 3)
    ref = slash_tile_attention(q, k, v, ti, tv, pat.vert, tl,
                               q_block=16, k_tile=16, interpret=True)
    got = slash_tile_attention_db(q, k, v, ti, tv, pat.vert, tl,
                                  q_block=16, k_tile=16, interpret=True)
    for a, b_ in zip(ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("true_len", [128, 100])
def test_sparse_attention_db_impl_matches_oracle(true_len):
    """sparse_prefill_attention(slash_impl='db') == the dense-applied
    coverage oracle (same contract as the grid impl)."""
    b, h, n, d = 1, 2, 128, 16
    rng = np.random.default_rng(12)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
               for _ in range(3))
    tl = jnp.asarray([true_len], jnp.int32)
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=12,
                                  slash_size=8, last_q=8)
    got = np.asarray(sparse_prefill_attention(
        q, k, v, pat, true_len=tl, q_block=16, k_tile=16, tile_budget=3,
        interpret=True, slash_impl="db"))
    want = np.asarray(sparse_prefill_attention_dense(
        q, k, v, pat, true_len=tl, q_block=16, k_tile=16, tile_budget=3))
    pad = n - true_len
    np.testing.assert_allclose(got[:, :, pad:], want[:, :, pad:],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("slash_impl", ["grid", "db"])
def test_gathered_matches_dense_oracle_gemma2_semantics(slash_impl):
    """scale (query_pre_attn_scalar) + tanh softcap threaded through the
    estimation, BOTH slash kernels, the vertical-partials kernel, and the
    O(N^2) oracle: gathered == oracle under Gemma-2 attention semantics."""
    b, h, n, d = 1, 2, 128, 16
    rng = np.random.default_rng(11)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
               for _ in range(3))
    tl = jnp.asarray([100], jnp.int32)
    sem = dict(scale=0.35, softcap=8.0)
    pat = estimate_vertical_slash(q, k, true_len=tl, vertical_size=12,
                                  slash_size=8, last_q=8, **sem)
    got = np.asarray(sparse_prefill_attention(
        q, k, v, pat, true_len=tl, q_block=16, k_tile=16, tile_budget=3,
        interpret=True, slash_impl=slash_impl, **sem))
    want = np.asarray(sparse_prefill_attention_dense(
        q, k, v, pat, true_len=tl, q_block=16, k_tile=16, tile_budget=3,
        **sem))
    pad = n - 100
    np.testing.assert_allclose(got[:, :, pad:], want[:, :, pad:],
                               rtol=2e-4, atol=2e-4)
    # softcap must actually change the output (guard against silent no-op)
    plain = np.asarray(sparse_prefill_attention(
        q, k, v, pat, true_len=tl, q_block=16, k_tile=16, tile_budget=3,
        interpret=True, slash_impl=slash_impl))
    assert np.abs(got[:, :, pad:] - plain[:, :, pad:]).max() > 1e-3


def test_minference_gemma2_close_to_dense_when_pattern_large():
    """Gemma-2 semantics end-to-end: with pattern sizes >= N the sparse
    prefill (full layers) + banded dense (sliding layers, via the traced
    cond) must reproduce fullkv generation exactly."""
    spec = ModelSpec.tiny(
        query_pre_attn_scalar=32.0,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        rmsnorm_unit_offset=True,
        scale_embeddings=True,
        post_block_norms=True,
        sliding_window=24,
        layer_types=("sliding_attention", "full_attention") * 2,
        hidden_act="gelu_tanh",
    )
    params = jl.init_params(spec, jax.random.PRNGKey(6), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(7).integers(0, 256, size=40)]
    outs = []
    for method, kw in (("fullkv", {}),
                       ("minference", dict(minference_vertical_size=64,
                                           minference_slash_size=64,
                                           minference_dense_below=1))):
        eng = Engine(spec, CompressionSpec(method=method, **kw),
                     EngineSpec(max_new_tokens=6, prefill_buckets=(64,)),
                     params)
        outs.append(eng.generate([ids]).tokens[0])
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# per-layer/per-head pattern configs (minference.py:9-12 MODEL2PATH)
# ---------------------------------------------------------------------------


def test_per_head_budgets_produce_different_coverage():
    """Two heads with different configured budgets keep different-sized
    vertical/slash sets (the static top-k width comes from the config
    maxima; each head's set is rank-capped)."""
    rng = np.random.default_rng(5)
    b, h, n, d = 1, 4, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    tl = jnp.asarray([256], jnp.int32)
    vsz = jnp.asarray([8, 32, 8, 32], jnp.int32)
    ssz = jnp.asarray([16, 16, 64, 64], jnp.int32)
    pat = estimate_vertical_slash(
        q, k, true_len=tl, vertical_size=vsz, slash_size=ssz, last_q=8,
        max_vertical=32, max_slash=64)
    nvert = np.asarray(pat.vert.sum(-1))[0]      # [H]
    # +4 sinks per head; top-k may overlap sinks, so counts are <= budget+4
    assert nvert[0] <= 8 + 4 and nvert[1] <= 32 + 4
    assert nvert[1] > nvert[0] and nvert[3] > nvert[2]
    nslash = np.asarray(pat.slash.sum(-1))[0]
    assert nslash[2] > nslash[0] and nslash[3] > nslash[1]
    # uniform call with the max budgets keeps MORE than the capped heads
    pat_u = estimate_vertical_slash(
        q, k, true_len=tl, vertical_size=32, slash_size=64, last_q=8)
    assert int(pat_u.vert[0, 0].sum()) >= nvert[0]


def test_pattern_config_loader_and_engine_e2e(tmp_path):
    """MODEL2PATH-format JSON round-trips through the loader, steers
    per-head coverage in a real engine prefill, and the gathered sparse
    path still matches the dense oracle under per-head budgets."""
    import json

    from pyramidkv_tpu.config import load_minference_pattern_config

    cfg = [
        {str(hi): ["vertical_and_slash", [8 if hi % 2 else 24, 16]]
         for hi in range(4)},
        {"0": ["vertical_and_slash", [16, 32]]},  # heads 1-3 inherit
    ]
    path = tmp_path / "pattern.json"
    path.write_text(json.dumps(cfg))
    t = load_minference_pattern_config(str(path), num_layers=2, num_heads=4)
    assert t[0][0] == (24, 16) and t[0][1] == (8, 16)
    assert t[1] == ((16, 32),) * 4
    # layers beyond the file inherit the last entry
    t3 = load_minference_pattern_config(str(path), num_layers=3, num_heads=4)
    assert t3[2] == t3[1]

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(3).integers(0, 256, size=48)]
    pcfg = tuple(
        tuple((8 if hi % 2 else 24, 16) for hi in range(4))
        for _ in range(spec.num_hidden_layers)
    )
    eng = Engine(
        spec,
        CompressionSpec(method="minference", minference_last_q=8,
                        minference_dense_below=0,
                        minference_pattern_config=pcfg),
        EngineSpec(max_new_tokens=4, prefill_buckets=(64,)),
        params,
    )
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 4


def test_gathered_matches_dense_oracle_per_head_budgets():
    rng = np.random.default_rng(6)
    b, h, n, d = 1, 4, 256, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    tl = jnp.asarray([200], jnp.int32)
    pat = estimate_vertical_slash(
        q, k, true_len=tl,
        vertical_size=jnp.asarray([8, 32, 16, 24], jnp.int32),
        slash_size=jnp.asarray([16, 8, 64, 32], jnp.int32),
        last_q=8, max_vertical=32, max_slash=64)
    kw = dict(true_len=tl, tile_budget=4, interpret=True)
    got = np.asarray(sparse_prefill_attention(q, k, v, pat, **kw))
    want = np.asarray(sparse_prefill_attention_dense(
        q, k, v, pat, true_len=tl, tile_budget=4))
    pad = 56
    np.testing.assert_allclose(got[:, :, pad:], want[:, :, pad:],
                               rtol=2e-4, atol=2e-4)
