"""Selection, budget schedules, compaction, AdaKV allocation, ThinK, quant."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, pyramid_layer_budgets
from pyramidkv_tpu.ops import (
    window_scores,
    topk_select,
    compact_kv,
    uniform_keep_counts,
    pyramid_keep_counts,
    l2norm_keep_counts,
    adakv_allocate,
    headkv_allocate,
    selection_from_allocation,
    think_channel_selection,
    gather_channels,
    quantize,
    dequantize,
)
from reference_oracle import (
    snapkv_kept_positions,
    pyramid_budget_oracle,
    adakv_counts_oracle,
    think_kept_channels_oracle,
)

B, H, D = 1, 4, 16


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, n, D)).astype(np.float32)
    k = rng.normal(size=(B, H, n, D)).astype(np.float32)
    v = rng.normal(size=(B, H, n, D)).astype(np.float32)
    return q, k, v


def test_snapkv_selection_matches_reference_positions():
    n, w, kern, cap = 128, 8, 7, 32
    q, k, v = _rand(n)
    tl = jnp.full((B,), n, jnp.int32)
    s = window_scores(
        jnp.asarray(q), jnp.asarray(k), window_size=w, true_len=tl,
        kernel_size=kern, pooling="maxpool",
    )
    counts = uniform_keep_counts(CompressionSpec(method="snapkv",
                                                 max_capacity_prompt=cap,
                                                 window_size=w), tl, w)
    sel = topk_select(s, cap - w, counts)
    want_all = snapkv_kept_positions(
        torch.from_numpy(q), torch.from_numpy(k), w, kern, "maxpool", cap
    )
    scores = np.asarray(s)
    for h in range(H):
        got = set(int(i) for i in np.asarray(sel.indices[0, h])[np.asarray(sel.valid[0, h])])
        want = set(want_all[0, h, : cap - w].tolist())
        # torch.topk and lax.top_k may break exact ties (maxpool plateaus)
        # differently at the selection boundary: any disagreement must be a
        # near-tie in score.
        for i in got ^ want:
            cutoff = min(scores[0, h, j] for j in want)
            assert abs(scores[0, h, i] - cutoff) < 1e-2 * abs(cutoff) + 1e-5


def test_no_compression_when_short_prompt():
    """q_len < max_capacity_prompt keeps everything (pyramidkv_utils:314)."""
    n, w, cap = 64, 8, 128
    tl = jnp.asarray([40], jnp.int32)
    spec = CompressionSpec(method="snapkv", max_capacity_prompt=cap, window_size=w)
    counts = uniform_keep_counts(spec, tl, w)
    assert int(counts[0]) == 32  # all real past tokens (40 - 8)


@pytest.mark.parametrize("q_len", [300, 512, 1000, 241, 4096])
def test_pyramid_budgets_match_reference(q_len):
    cap, w, beta, L = 128, 8, 20, 8
    spec = CompressionSpec(method="pyramidkv", max_capacity_prompt=cap,
                           window_size=w, beta=beta)
    want = pyramid_budget_oracle(cap, w, beta, L, q_len)
    got_static = pyramid_layer_budgets(spec, L, q_len)
    assert list(got_static) == want
    # traced mirror (regime 3 only applies when q_len >= 2*(cap-w))
    tl = jnp.asarray([q_len], jnp.int32)
    got_dyn = np.asarray(pyramid_keep_counts(spec, L, tl))[:, 0]
    if q_len >= 2 * (cap - w):
        assert list(got_dyn) == want
    elif q_len >= cap:
        assert np.all(got_dyn == cap - w)
    else:
        assert np.all(got_dyn == q_len - w)


def test_l2norm_keep_counts_skip_layers():
    spec = CompressionSpec(method="l2norm", max_capacity_prompt=64, skip_layers=(0, 1))
    tl = jnp.asarray([100], jnp.int32)
    n = np.asarray(l2norm_keep_counts(spec, 4, tl))[:, 0]
    assert list(n) == [100, 100, 64, 64]


def test_compaction_layout_and_masks():
    n, w, cap, new = 64, 8, 32, 4
    q, k, v = _rand(n, seed=2)
    tl = jnp.full((B,), n, jnp.int32)
    s = window_scores(jnp.asarray(q), jnp.asarray(k), window_size=w, true_len=tl,
                      kernel_size=7, pooling="maxpool")
    spec = CompressionSpec(method="snapkv", max_capacity_prompt=cap, window_size=w)
    sel = topk_select(s, cap - w, uniform_keep_counts(spec, tl, w))
    c = compact_kv(jnp.asarray(k), jnp.asarray(v), sel, window_size=w,
                   decode_slots=new, true_len=tl)
    S = (cap - w) + w + new
    assert c.k.shape == (B, H, S, D)
    m = np.asarray(c.mask[0, 0])
    assert m[: cap - w].all() and m[cap - w : cap].all() and not m[cap:].any()
    # gathered rows match the source rows at the recorded positions
    pos = np.asarray(c.positions[0, 0])
    for slot in range(cap):
        np.testing.assert_allclose(np.asarray(c.k)[0, 0, slot], k[0, 0, pos[slot]])


def test_compaction_short_prompt_keeps_everything():
    n, w, cap, new = 64, 8, 128, 2
    true_len = 30
    q, k, v = _rand(n, seed=4)
    tl = jnp.asarray([true_len], jnp.int32)
    s = window_scores(jnp.asarray(q), jnp.asarray(k), window_size=w, true_len=tl,
                      kernel_size=7, pooling="maxpool")
    spec = CompressionSpec(method="snapkv", max_capacity_prompt=cap, window_size=w)
    sel = topk_select(s, cap - w, uniform_keep_counts(spec, tl, w))
    c = compact_kv(jnp.asarray(k), jnp.asarray(v), sel, window_size=w,
                   decode_slots=new, true_len=tl)
    pos = np.asarray(c.positions[0, 0])
    kept = sorted(p for p in pos if p >= 0)
    assert kept == list(range(true_len))  # every real token kept exactly once


def test_adakv_allocation_matches_reference():
    n, w, cap = 256, 8, 64
    base = cap - w
    rng = np.random.default_rng(11)
    scores = np.abs(rng.normal(size=(B, H, n - w))).astype(np.float32)
    want = adakv_counts_oracle(torch.from_numpy(scores), base, 0.2, True).numpy()
    alloc = adakv_allocate(
        jnp.asarray(scores), base_capacity=base, floor_ratio=0.2, normalize=True,
        true_len=jnp.full((B,), n, jnp.int32), window_size=w,
        max_head_capacity=4 * base,
    )
    np.testing.assert_array_equal(np.asarray(alloc.counts), want)
    # total ~= H * base (up to the per-head rounding of the floor blend)
    assert abs(int(alloc.counts.sum()) - H * base) <= H


def test_adakv_clamp_redistributes():
    """A head that would exceed max_head_capacity loses only the overflow;
    those slots flow to runner-up ranks of other heads (total kept ~H*base),
    instead of being silently dropped."""
    n, w, cap = 256, 8, 64
    base = cap - w
    rng = np.random.default_rng(19)
    scores = np.abs(rng.normal(size=(1, H, n - w))).astype(np.float32)
    scores[0, 0] += 100.0  # head 0 dominates the global top-k
    tight = base  # head cap == base -> head 0 must be clamped
    alloc = adakv_allocate(
        jnp.asarray(scores), base_capacity=base, floor_ratio=0.2,
        normalize=False, true_len=jnp.full((1,), n, jnp.int32), window_size=w,
        max_head_capacity=tight,
    )
    counts = np.asarray(alloc.counts)[0]
    assert counts.max() <= tight
    assert counts[0] == tight  # the heavy head fills its bound
    # redistribution: total stays ~H*base (per-head floor rounding slack)
    assert abs(int(counts.sum()) - H * base) <= H


def test_headkv_allocation_and_selection():
    n, w = 128, 8
    caps = jnp.asarray([10, 20, 5, 40], jnp.int32)
    rng = np.random.default_rng(13)
    scores = np.abs(rng.normal(size=(B, H, n - w))).astype(np.float32)
    alloc = headkv_allocate(jnp.asarray(scores), head_capacity=caps,
                            base_capacity=56, true_len=jnp.full((B,), n, jnp.int32),
                            window_size=w, max_head_capacity=64)
    sel = selection_from_allocation(alloc, 64)
    nvalid = np.asarray(sel.valid.sum(axis=-1))[0]
    np.testing.assert_array_equal(nvalid, [10, 20, 5, 40])
    # each head's kept set = its top-count scores
    for h in range(H):
        got = set(np.asarray(sel.indices[0, h])[np.asarray(sel.valid[0, h])])
        want = set(np.argsort(-scores[0, h])[: int(caps[h])].tolist())
        assert got == want


def test_think_channels_match_reference():
    n, ratio = 64, 0.4
    q, k, v = _rand(n, seed=17)
    pr = think_channel_selection(
        jnp.asarray(k), jnp.asarray(q), ratio=ratio,
        true_len=jnp.full((B,), n, jnp.int32),
    )
    want = think_kept_channels_oracle(torch.from_numpy(k), torch.from_numpy(q), ratio).numpy()
    np.testing.assert_array_equal(np.asarray(pr.channel_mask), want)
    gathered = gather_channels(jnp.asarray(k), pr.kept_channels)
    assert gathered.shape == (B, H, n, D - int(D * ratio))


@pytest.mark.parametrize("nbits", [8, 4, 2])
def test_quant_roundtrip(nbits):
    rng = np.random.default_rng(23)
    x = rng.normal(size=(2, 4, 32, 128)).astype(np.float32)
    qt = quantize(jnp.asarray(x), nbits=nbits, group_size=64)
    xh = np.asarray(dequantize(qt, nbits=nbits, group_size=64, dtype=jnp.float32))
    # error bounded by ~scale/2 per group
    span = x.reshape(2, 4, 32, 2, 64)
    scale = (span.max(-1) - span.min(-1)) / (2**nbits - 1)
    tol = (scale / 2 + 1e-6)[..., None].repeat(64, -1).reshape(x.shape)
    assert np.all(np.abs(xh - x) <= tol + 1e-5)


def test_quant_outliers_exact():
    rng = np.random.default_rng(29)
    x = rng.normal(size=(1, 2, 8, 128)).astype(np.float32)
    x[0, 0, 3, 7] = 42.0
    x[0, 1, 5, 100] = -17.0
    qt = quantize(jnp.asarray(x), nbits=2, group_size=64, outlier_threshold=6.0)
    xh = np.asarray(dequantize(qt, nbits=2, group_size=64, dtype=jnp.float32))
    assert xh[0, 0, 3, 7] == pytest.approx(42.0, rel=1e-2)
    assert xh[0, 1, 5, 100] == pytest.approx(-17.0, rel=1e-2)


def test_per_layer_capacity_schedule():
    import jax.numpy as jnp
    from pyramidkv_tpu.config import CompressionSpec
    from pyramidkv_tpu.ops.selection import per_layer_keep_counts

    spec = CompressionSpec(method="snapkv", max_capacity_prompt=32,
                           window_size=4, layer_capacity=(32, 16, 8))
    tl = jnp.asarray([64, 12], jnp.int32)
    n = per_layer_keep_counts(spec, 3, tl, 4)
    # batch 0 (len 64): budgets cap_l - 4
    assert list(n[:, 0]) == [28, 12, 4]
    # batch 1 (len 12): layer budgets below 12 compress, others keep all 8
    assert list(n[:, 1]) == [8, 8, 4]


def test_compaction_chunked_long_buffer_bitexact():
    """n >= 2*_COMPACT_CHUNK engages the chunked one-hot contraction
    (the 128k pyramidkv OOM fix) — outputs must be BIT-exact vs the
    monolithic einsum: every output row's 1.0 coefficient lives in one
    chunk, the others add f32 +0.0."""
    from pyramidkv_tpu.ops import selection as S

    b, hk, h, d = 1, 2, 4, 8
    n = 4 * S._COMPACT_CHUNK
    rng = np.random.default_rng(7)
    k = jnp.asarray(rng.standard_normal((b, hk, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, hk, n, d)), jnp.bfloat16)
    scores = jnp.asarray(rng.standard_normal((b, h, n)), jnp.float32)
    true_len = jnp.asarray([n - 123], jnp.int32)
    sel = topk_select(scores, 64, jnp.asarray([48], jnp.int32))

    got = compact_kv(k, v, sel, window_size=16, decode_slots=4,
                     true_len=true_len)
    old = S._COMPACT_CHUNK
    S._COMPACT_CHUNK = 10 * n  # force the monolithic path
    try:
        want = compact_kv(k, v, sel, window_size=16, decode_slots=4,
                          true_len=true_len)
    finally:
        S._COMPACT_CHUNK = old
    for a, b_ in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
