"""Sequence-parallel prefill vs the single-device path on the CPU mesh.

kernel_size=1 avoids maxpool plateaus (exact score ties would make top-k
tie-breaking order-dependent between the sharded and single-device paths).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, ModelSpec
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.parallel import make_mesh
from pyramidkv_tpu.parallel.sp_prefill import sequence_parallel_prefill
from pyramidkv_tpu.policy import make_plan


def _per_layer(cache):
    """(positions, mask) as per-layer numpy lists — handles the segmented
    (tuple-field) cache layout of l2norm/pyramidkv plans."""
    def split(field):
        parts = field if isinstance(field, tuple) else (field,)
        out = []
        for p in parts:
            arr = np.asarray(p)
            out.extend(arr[l] for l in range(arr.shape[0]))
        return out
    return split(cache.positions), split(cache.mask)


@pytest.fixture(scope="module")
def setup():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(1, 128)), jnp.int32
    )
    return spec, params, toks


@pytest.mark.parametrize("method", ["snapkv", "pyramidkv", "streamingllm", "l2norm", "h2o"])
@pytest.mark.parametrize("sp", [4])
def test_sp_prefill_matches_single_device(setup, method, sp):
    spec, params, toks = setup
    tl = jnp.asarray([100], jnp.int32)
    comp = CompressionSpec(method=method, max_capacity_prompt=32,
                           window_size=8, kernel_size=1)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8)

    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, sp), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )

    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
    # identical kept-token SET per layer/head (order may differ only on ties)
    ref_pos, ref_mask = _per_layer(ref_cache)
    got_pos, got_mask = _per_layer(got_cache)
    assert sum(m.sum() for m in ref_mask) == sum(m.sum() for m in got_mask)
    H = ref_pos[0].shape[1]
    for l in range(len(ref_pos)):
        for h in range(H):
            a = set(ref_pos[l][0, h][ref_mask[l][0, h]].tolist())
            bset = set(got_pos[l][0, h][got_mask[l][0, h]].tolist())
            assert a == bset, (method, l, h, sorted(a ^ bset))


@pytest.mark.parametrize("pooling", ["avgpool", "maxpool"])
def test_sp_window_scores_pooling_parity(pooling):
    """kernel_size=7 score parity vs the single-device scorer, esp. the last
    kernel//2 past columns next to the observation window (regression: the
    SP path used to pool BEFORE masking window columns, bleeding the
    near-diagonal window softmax mass into adjacent past columns)."""
    from jax.sharding import PartitionSpec as P
    from pyramidkv_tpu.parallel.sp_prefill import _sp_window_scores
    from pyramidkv_tpu.ops.scoring import window_scores

    b, h, n, d, w, ks = 1, 2, 128, 16, 8, 7
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    tl = jnp.asarray([100], jnp.int32)
    want = np.asarray(window_scores(
        q, k, window_size=w, true_len=tl, kernel_size=ks, pooling=pooling))

    mesh = make_mesh((1, 4), ("data", "model"))
    qw = q[:, :, n - w:, :]

    fn = jax.shard_map(
        lambda a, bb, c: _sp_window_scores(
            a, bb, axis="model", n_global=n, window=w, true_len=c,
            kernel_size=ks, pooling=pooling, aggregation="sum"),
        mesh=mesh,
        in_specs=(P(), P(None, None, "model"), P()),
        out_specs=P(None, None, "model"),
        check_vma=False,
    )
    got_full = np.asarray(fn(qw, k, tl))
    got = got_full[..., : n - w]
    pad = n - int(tl[0])
    assert np.all(got[..., :pad] <= -1e37)  # SP path uses finfo.min not -inf
    np.testing.assert_allclose(got[..., pad:], want[..., pad:],
                               rtol=2e-5, atol=2e-5)


def test_sp_prefill_then_decode(setup):
    """The replicated compressed cache decodes identically to the
    single-device cache."""
    spec, params, toks = setup
    tl = jnp.asarray([100], jnp.int32)
    comp = CompressionSpec(method="streamingllm", max_capacity_prompt=32,
                           window_size=8)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8)
    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, 4), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )
    t0 = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    l_ref, _ = jl.decode_step(params, spec, plan, ref_cache, t0)
    l_got, _ = jl.decode_step(params, spec, plan, got_cache, t0)
    np.testing.assert_allclose(
        np.asarray(l_got), np.asarray(l_ref), rtol=3e-4, atol=3e-4
    )


@pytest.mark.parametrize("method", ["adakv", "headkv"])
def test_sp_prefill_headwise_methods(setup, method):
    spec, params, toks = setup
    tl = jnp.asarray([100], jnp.int32)
    kw = dict(method=method, max_capacity_prompt=32, window_size=8,
              kernel_size=1)
    if method == "headkv":
        L, H = spec.num_hidden_layers, spec.num_attention_heads
        kw["head_capacity"] = tuple(
            tuple(8 + (i + j) % 5 for j in range(H)) for i in range(L)
        )
    comp = CompressionSpec(**kw)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8)
    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, 4), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
    ref_mask = np.asarray(ref_cache.mask)
    got_mask = np.asarray(got_cache.mask)
    # adakv's score-mass-normalised global top-(H*base) can flip a boundary
    # slot under distributed-softmax fp reordering; headkv (static budgets)
    # is exact.
    tol = 2 if method == "adakv" else 0
    assert abs(int(ref_mask.sum()) - int(got_mask.sum())) <= tol
    ref_pos = np.asarray(ref_cache.positions)
    got_pos = np.asarray(got_cache.positions)
    L, B, H, S = ref_mask.shape
    mismatches = 0
    for l in range(L):
        for h in range(H):
            a = set(ref_pos[l, 0, h][ref_mask[l, 0, h]].tolist())
            bb = set(got_pos[l, 0, h][got_mask[l, 0, h]].tolist())
            mismatches += len(a ^ bb)
    # adakv's tail scores sit at ~1e-5 where 1e-7 fp reordering noise flips
    # boundary ranks; require >= 97% kept-set agreement there, exact else.
    limit = int(0.03 * ref_mask.sum()) if method == "adakv" else 0
    assert mismatches <= limit, (method, mismatches, limit)


def test_sp_prefill_think(setup):
    """ThinK under sequence sharding: kept sets + channel masks + decode
    logits match the single-device narrow path."""
    spec, params, toks = setup
    tl = jnp.asarray([100], jnp.int32)
    comp = CompressionSpec(method="think", max_capacity_prompt=32,
                           window_size=8, kernel_size=1, recent_size=16,
                           pruning_ratio=0.5)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8)
    assert plan.think_narrow
    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, 4), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
    assert got_cache.think is not None
    np.testing.assert_array_equal(
        np.asarray(got_cache.think.kept_channels),
        np.asarray(ref_cache.think.kept_channels),
    )
    # decode step parity (exercises the narrow decode against the SP cache)
    t0 = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    l_ref, _ = jl.decode_step(params, spec, plan, ref_cache, t0)
    l_got, _ = jl.decode_step(params, spec, plan, got_cache, t0)
    np.testing.assert_allclose(
        np.asarray(l_got), np.asarray(l_ref), rtol=3e-4, atol=3e-4
    )


def test_sp_prefill_cam(setup):
    """CAM under sequence sharding: identical kept sets, K rows, AND merged
    V values (the Bernoulli draws come from the same full-length uniform
    table; the banded-recurrence carry crosses shards exactly)."""
    spec, params, toks = setup
    tl = jnp.asarray([100], jnp.int32)
    comp = CompressionSpec(method="cam", max_capacity_prompt=32,
                           window_size=8, start_budget_ratio=0.1)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8)
    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, 4), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
    ref_pos, ref_mask = _per_layer(ref_cache)
    got_pos, got_mask = _per_layer(got_cache)
    H = ref_pos[0].shape[1]
    for l in range(len(ref_pos)):
        for h in range(H):
            a = set(ref_pos[l][0, h][ref_mask[l][0, h]].tolist())
            bset = set(got_pos[l][0, h][got_mask[l][0, h]].tolist())
            assert a == bset, ("cam", l, h, sorted(a ^ bset))
    # merged V parity at matched positions
    ref_v = [np.asarray(x) for x in (ref_cache.v if isinstance(ref_cache.v, tuple) else (ref_cache.v,))]
    got_v = [np.asarray(x) for x in (got_cache.v if isinstance(got_cache.v, tuple) else (got_cache.v,))]
    rv = [x[i] for x in ref_v for i in range(x.shape[0])]
    gv = [x[i] for x in got_v for i in range(x.shape[0])]
    for l in range(len(ref_pos)):
        for h in range(H):
            rm, gm = ref_mask[l][0, h], got_mask[l][0, h]
            ro = np.argsort(ref_pos[l][0, h][rm])
            go = np.argsort(got_pos[l][0, h][gm])
            np.testing.assert_allclose(
                gv[l][0, h][gm][go], rv[l][0, h][rm][ro],
                rtol=3e-4, atol=3e-4,
            )


def _kept_sets_equal(ref_cache, got_cache, tag):
    ref_pos, ref_mask = _per_layer(ref_cache)
    got_pos, got_mask = _per_layer(got_cache)
    H = ref_pos[0].shape[1]
    for l in range(len(ref_pos)):
        for h in range(H):
            a = set(ref_pos[l][0, h][ref_mask[l][0, h]].tolist())
            bset = set(got_pos[l][0, h][got_mask[l][0, h]].tolist())
            assert a == bset, (tag, l, h, sorted(a ^ bset))


@pytest.mark.parametrize("method", ["snapkv", "h2o"])
def test_sp_prefill_gemma2_semantics(method):
    """SP prefill with the full Gemma-2 stack: query_pre_attn_scalar scale,
    tanh logit soft-capping (attention AND scorers), alternating
    sliding/full layers (traced per-layer window in the ring), unit-offset
    RMSNorm, post-block norms, scaled embeddings, GeGLU, final-logit cap.
    Parity vs the single-chip prefill on identical weights/tokens."""
    spec = ModelSpec.tiny(
        query_pre_attn_scalar=32.0,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        rmsnorm_unit_offset=True,
        scale_embeddings=True,
        post_block_norms=True,
        sliding_window=48,
        layer_types=("sliding_attention", "full_attention") * 2,
        hidden_act="gelu_tanh",
    )
    params = jl.init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, size=(1, 128)), jnp.int32
    )
    tl = jnp.asarray([100], jnp.int32)
    comp = CompressionSpec(method=method, max_capacity_prompt=32,
                           window_size=8, kernel_size=1)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8,
                     attn_scale=spec.attn_scale,
                     attn_softcap=spec.attn_logit_softcapping)
    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, 4), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
    _kept_sets_equal(ref_cache, got_cache, f"gemma2/{method}")


def test_sp_prefill_uniform_sliding_window():
    """Mistral-style uniform sliding window: the ring must band every
    layer's attention exactly like the single-chip dense path (regression:
    SP used to ignore ``spec.sliding_window`` entirely)."""
    spec = ModelSpec.tiny(sliding_window=32)
    params = jl.init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    toks = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, size=(1, 128)), jnp.int32
    )
    tl = jnp.asarray([128], jnp.int32)
    comp = CompressionSpec(method="snapkv", max_capacity_prompt=32,
                           window_size=8, kernel_size=1)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8)
    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, 4), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
    _kept_sets_equal(ref_cache, got_cache, "sliding/snapkv")


@pytest.mark.parametrize("quant_method,nbits", [("kivi", 4), ("kvquant", 8)])
def test_sp_prefill_quantized_region(setup, quant_method, nbits):
    """SP prefill + quantized prefill region: same cache layout as the
    single-chip quant prefill (per-layer QuantizedKVRegion, bf16 decode
    tail), greedy decode from both caches matches token-for-token."""
    spec, params, toks = setup
    tl = jnp.asarray([100], jnp.int32)
    comp = CompressionSpec(method="snapkv", max_capacity_prompt=32,
                           window_size=8, kernel_size=1,
                           quant_method=quant_method, nbits=nbits)
    plan = make_plan(comp, spec.num_hidden_layers, 128, 8)
    ref_logits, ref_cache = jl.prefill(params, spec, plan, toks, tl)
    mesh = make_mesh((1, 4), ("data", "model"))
    got_logits, got_cache = sequence_parallel_prefill(
        params, spec, plan, toks, tl, mesh, axis="model"
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=3e-4, atol=3e-4
    )
    assert got_cache.quant is not None
    assert got_cache.k.shape == ref_cache.k.shape  # bf16 decode tail only
    t = jnp.argmax(ref_logits, -1).astype(jnp.int32)
    tg = jnp.argmax(got_logits, -1).astype(jnp.int32)
    rc, gc = ref_cache, got_cache
    for _ in range(8):
        assert int(t[0]) == int(tg[0])
        lr, rc = jl.decode_step(params, spec, plan, rc, t)
        lg, gc = jl.decode_step(params, spec, plan, gc, tg)
        t = jnp.argmax(lr, -1).astype(jnp.int32)
        tg = jnp.argmax(lg, -1).astype(jnp.int32)
