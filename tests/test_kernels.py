"""Pallas kernel numerics vs the XLA reference paths (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.kernels import flash_causal_attention
from pyramidkv_tpu.ops.attention import causal_prefill_attention

B, H, D = 2, 3, 64


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, n, D)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("true_len", [128, 100, 17])
def test_flash_matches_xla(true_len):
    n = 128
    q, k, v = _rand(n)
    tl = jnp.asarray([true_len, max(true_len - 9, 1)], jnp.int32)
    want = causal_prefill_attention(q, k, v, true_len=tl, block=32)
    got = flash_causal_attention(q, k, v, tl, block_q=32, block_k=32,
                                 interpret=True)
    # compare only real rows
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )


@pytest.mark.parametrize("fast_path", [True, False])
@pytest.mark.parametrize("use_exp2", [True, False])
def test_flash_fast_path_flags(fast_path, use_exp2):
    """The interior-tile fast path and base-2 softmax are exact (not
    approximations): every flag combination matches the XLA reference,
    including a pad landing exactly on a tile boundary (pad == block_k —
    the `pad <= ki*block_k` fast-path predicate's edge)."""
    n = 128
    q, k, v = _rand(n, seed=7)
    tl = jnp.asarray([n - 32, n - 50], jnp.int32)  # pad 32 = block, pad 50
    want = causal_prefill_attention(q, k, v, true_len=tl, block=32)
    got = flash_causal_attention(q, k, v, tl, block_q=32, block_k=32,
                                 interpret=True, fast_path=fast_path,
                                 use_exp2=use_exp2)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )


def test_flash_sliding_window():
    n = 64
    q, k, v = _rand(n, seed=3)
    tl = jnp.asarray([n, n - 5], jnp.int32)
    want = causal_prefill_attention(q, k, v, true_len=tl, block=16,
                                    sliding_window=24)
    got = flash_causal_attention(q, k, v, tl, block_q=16, block_k=16,
                                 sliding_window=24, interpret=True)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )


def test_flash_uneven_blocks():
    n = 96
    q, k, v = _rand(n, seed=5)
    tl = jnp.asarray([96, 50], jnp.int32)
    want = causal_prefill_attention(q, k, v, true_len=tl, block=32)
    got = flash_causal_attention(q, k, v, tl, block_q=32, block_k=48,
                                 interpret=True)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )


def test_prefill_with_pallas_interpret_matches_xla():
    from pyramidkv_tpu.config import CompressionSpec, ModelSpec
    from pyramidkv_tpu.models import llama as jl
    from pyramidkv_tpu.policy import make_plan

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    plan = make_plan(CompressionSpec(method="snapkv", max_capacity_prompt=16,
                                     window_size=4), spec.num_hidden_layers, 64, 4)
    toks = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, size=(1, 64)), jnp.int32
    )
    tl = jnp.asarray([50], jnp.int32)
    lx, cx = jl.prefill(params, spec, plan, toks, tl, attention_impl="xla",
                        prefill_block=32)
    lp, cp = jl.prefill(params, spec, plan, toks, tl,
                        attention_impl="pallas_interpret", prefill_block=32)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp), rtol=2e-4, atol=2e-4)
    assert bool(jnp.all(cx.mask == cp.mask))


@pytest.mark.parametrize("true_len", [128, 90])
def test_h2o_pallas_matches_xla(true_len):
    from pyramidkv_tpu.kernels.h2o_scores import h2o_scores_pallas
    from pyramidkv_tpu.ops.scoring import h2o_scores

    n, w = 128, 8
    q, k, _ = _rand(n, seed=11)
    tl = jnp.asarray([true_len, max(true_len - 13, 1)], jnp.int32)
    want = np.asarray(h2o_scores(q, k, window_size=w, true_len=tl, block=32))
    got = np.asarray(
        h2o_scores_pallas(q, k, window_size=w, true_len=tl,
                          block_q=32, block_k=32, interpret=True)
    )
    assert got.shape == want.shape
    for bi in range(B):
        pad = n - int(tl[bi])
        assert np.all(np.isneginf(got[bi, :, :pad]))
        np.testing.assert_allclose(
            got[bi, :, pad:], want[bi, :, pad:], rtol=3e-4, atol=3e-4
        )


def test_h2o_pallas_grouped_kv():
    """GQA: k at num_kv_heads < num query heads (the policy call-site shape
    — policy.compress_layer passes k_kv grouped).  Regression for the
    round-1 trace-time reshape crash."""
    from pyramidkv_tpu.kernels.h2o_scores import h2o_scores_pallas
    from pyramidkv_tpu.ops.scoring import h2o_scores

    n, w, h, hk = 128, 8, 4, 2
    rng = np.random.default_rng(23)
    q = jnp.asarray(rng.normal(size=(B, h, n, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, hk, n, D)).astype(np.float32))
    tl = jnp.asarray([n, n - 13], jnp.int32)
    want = np.asarray(h2o_scores(q, k, window_size=w, true_len=tl, block=32))
    got = np.asarray(
        h2o_scores_pallas(q, k, window_size=w, true_len=tl,
                          block_q=32, block_k=32, interpret=True)
    )
    assert got.shape == want.shape == (B, h, n - w)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            got[bi, :, pad:], want[bi, :, pad:], rtol=3e-4, atol=3e-4
        )


def test_flash_grouped_kv_matches_repeated():
    """Grouped-query kernel (KV heads < query heads) == repeated-KV kernel."""
    b, h, kv, n, d = 2, 8, 2, 64, 32
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, kv, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, kv, n, d)), jnp.float32)
    tl = jnp.asarray([64, 49], jnp.int32)
    krep = jnp.repeat(k, h // kv, axis=1)
    vrep = jnp.repeat(v, h // kv, axis=1)
    want = flash_causal_attention(q, krep, vrep, tl, block_q=16, block_k=16,
                                  interpret=True)
    got = flash_causal_attention(q, k, v, tl, block_q=16, block_k=16,
                                 interpret=True)
    for bi in range(b):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )


def test_fit_blocks_bounds_smem_tables():
    """Adaptive tile growth: the scalar-prefetch visit tables stay within
    budget at every power-of-two context up to 256k, blocks always divide
    n, and non-power-of-two n falls back gracefully."""
    from pyramidkv_tpu.kernels.flash_prefill import (
        _MAX_TILE_VISITS, _fit_blocks, _triangular_pairs)

    for n in [4096, 32768, 65536, 131072, 262144]:
        bq, bk = _fit_blocks(n, n, 512, 512, None)
        assert n % bq == 0 and n % bk == 0
        t = len(_triangular_pairs(n // bq, n // bk, bq, bk, None)[0])
        assert t <= _MAX_TILE_VISITS, (n, bq, bk, t)
    # odd multiple of 512: growth blocked by divisibility, still valid
    n = 183 * 512
    bq, bk = _fit_blocks(n, n, 512, 512, None)
    assert n % bq == 0 and n % bk == 0
    # sliding window shrinks the visit count, so big-n windowed cases
    # stay at smaller (better-pipelined) tiles
    bq, bk = _fit_blocks(131072, 131072, 512, 512, 4096)
    t = len(_triangular_pairs(131072 // bq, 131072 // bk, bq, bk, 4096)[0])
    assert t <= _MAX_TILE_VISITS
    # rectangular (chunked prefill): a 4k-query chunk against 128k keys
    bq, bk = _fit_blocks(4096, 131072, 512, 512, None, q_start=131072 - 4096)
    assert 4096 % bq == 0 and 131072 % bk == 0
    t = len(_triangular_pairs(4096 // bq, 131072 // bk, bq, bk, None,
                              131072 - 4096)[0])
    assert t <= _MAX_TILE_VISITS


def test_decode_attention_pallas_parity():
    """Fused decode-attention kernel (interpret) == XLA decode_attention:
    per-query-head (Hk==H) and true-GQA (Hk<H) caches, padded masks,
    f32 and bf16."""
    from pyramidkv_tpu.kernels.decode_attn import decode_attention_pallas
    from pyramidkv_tpu.ops.attention import decode_attention

    rng = np.random.default_rng(30)
    for hk, h, dt, rtol in ((4, 4, np.float32, 1e-5),
                            (2, 4, np.float32, 1e-5),
                            (2, 8, "bfloat16", 2e-2)):
        b, s, d = 2, 48, 32
        q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
        if dt == "bfloat16":
            q, k, v = (t.astype(jnp.bfloat16) for t in (q, k, v))
        mask = jnp.asarray(rng.random(size=(b, hk, s)) < 0.7)
        mask = mask.at[:, :, 0].set(True)  # at least one valid slot
        ref = decode_attention(q, k, v, mask)
        got = decode_attention_pallas(q, k, v, mask, interpret=True)
        assert got.shape == ref.shape and got.dtype == ref.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=rtol, atol=rtol)


def test_decode_attention_kernel_engine_tokens():
    """Engine greedy tokens identical with the fused decode-attention
    kernel forced on (interpret) — per-query-head AND gqa_aggregate."""
    from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
    from pyramidkv_tpu.engine import Engine
    from pyramidkv_tpu.models import llama as jl
    from pyramidkv_tpu.ops import attention as A

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(0).integers(0, 256,
                                                             size=28)]
    for kw in (dict(method="snapkv", max_capacity_prompt=16, window_size=4),
               dict(method="snapkv", max_capacity_prompt=16, window_size=4,
                    gqa_aggregate=True),
               dict(method="fullkv")):
        cs = CompressionSpec(**kw)
        es = EngineSpec(max_new_tokens=8, prefill_buckets=(32,))
        want = Engine(spec, cs, es, params).generate([ids]).tokens[0]
        A._FORCE_DECODE_ATTN_KERNEL[0] = True
        try:
            got = Engine(spec, cs, es, params).generate([ids]).tokens[0]
        finally:
            A._FORCE_DECODE_ATTN_KERNEL[0] = False
        assert got == want, (kw, got, want)


@pytest.mark.parametrize("sub_k", [2, 4])
def test_flash_sub_k_pipelined_matches_single_dot(sub_k):
    """sub_k > 1 (software-pipelined sub-tile dots) is EXACT vs the
    single-dot body: the online-softmax updates see the same logits in the
    same slot order, only in finer sub-tiles (fp32 max/exp/sum per sub-tile
    commute with the merge).  Covers padded rows (masked path) and the
    interior fast path.  block_k scales with sub_k so the sub-tile width
    stays a 128-lane multiple — (block_k // sub_k) % 128 != 0 silently
    falls back to the single-dot body and the test would compare the
    control against itself (ADVICE r3)."""
    n = 512 * (sub_k // 2)
    block_k = 128 * sub_k
    assert (block_k // sub_k) % 128 == 0
    q, k, v = _rand(n, seed=3)
    tl = jnp.asarray([n, n - 37], jnp.int32)
    want = flash_causal_attention(q, k, v, tl, block_q=128, block_k=block_k,
                                  interpret=True)
    got = flash_causal_attention(q, k, v, tl, block_q=128, block_k=block_k,
                                 sub_k=sub_k, interpret=True)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-5, atol=2e-5,
        )


def test_flash_sub_k_sliding_window_and_qstart():
    """sub_k composes with the sliding-window band mask and the chunked
    rectangular walk (q_start > 0), and falls back to sub_k=1 when the
    sub-tile would drop under a 128-lane multiple."""
    n = 512
    q, k, v = _rand(n, seed=4)
    tl = jnp.asarray([n, n], jnp.int32)
    want = flash_causal_attention(q, k, v, tl, block_q=128, block_k=256,
                                  sliding_window=200, interpret=True)
    got = flash_causal_attention(q, k, v, tl, block_q=128, block_k=256,
                                 sliding_window=200, sub_k=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    qc = q[:, :, -128:, :]
    want = flash_causal_attention(qc, k, v, tl, block_q=128, block_k=256,
                                  q_start=n - 128, interpret=True)
    got = flash_causal_attention(qc, k, v, tl, block_q=128, block_k=256,
                                 q_start=n - 128, sub_k=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    # block_k=128 / sub_k=2 -> 64-wide sub-tiles: guarded fallback, not an
    # assert/lowering error
    got = flash_causal_attention(q, k, v, tl, block_q=128, block_k=128,
                                 sub_k=2, interpret=True)
    want = flash_causal_attention(q, k, v, tl, block_q=128, block_k=128,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_sub_k_partials():
    """The partials-returning wrapper threads sub_k (chunked-prefill
    quantized-history merges run through it)."""
    from pyramidkv_tpu.kernels import flash_attention_partials

    n = 256
    q, k, v = _rand(n, seed=5)
    tl = jnp.asarray([n, n - 11], jnp.int32)
    a0, m0, l0 = flash_attention_partials(q, k, v, tl, block_q=128,
                                          block_k=128, interpret=True)
    a1, m1, l1 = flash_attention_partials(q, k, v, tl, block_q=128,
                                          block_k=256, sub_k=2,
                                          interpret=True)
    for bi in range(B):
        pad = n - int(tl[bi])
        o0 = np.asarray(a0)[bi, :, pad:] / np.asarray(l0)[bi, :, pad:, None]
        o1 = np.asarray(a1)[bi, :, pad:] / np.asarray(l1)[bi, :, pad:, None]
        np.testing.assert_allclose(o1, o0, rtol=2e-5, atol=2e-5)


def test_flash_l_mxu_matches_default(monkeypatch):
    """PKV_FLASH_LSUM_MXU=1 (l row-sum as an MXU ones-dot) matches the
    VPU-reduce default — same summands, different reduction tree."""
    monkeypatch.setenv("PKV_FLASH_LSUM_MXU", "1")
    n = 512
    q, k, v = _rand(n, seed=9)
    tl = jnp.asarray([n, n - 37], jnp.int32)
    got = flash_causal_attention(q, k, v, tl, block_q=128, block_k=256,
                                 interpret=True)
    monkeypatch.setenv("PKV_FLASH_LSUM_MXU", "0")
    want = flash_causal_attention(q, k, v, tl, block_q=128, block_k=256,
                                  interpret=True)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("true_len", [128, 100, 17])
def test_flash_two_pass_matches_xla(true_len):
    """Two-pass exp-avoidance schedule (pass A row maxes + pass B
    rescale-free accumulation) is EXACT: same p summands as the online
    schedule once the max is known, only the reduction order differs."""
    n = 128
    q, k, v = _rand(n, seed=11)
    tl = jnp.asarray([true_len, max(true_len - 9, 1)], jnp.int32)
    want = causal_prefill_attention(q, k, v, true_len=tl, block=32)
    got = flash_causal_attention(q, k, v, tl, block_q=32, block_k=32,
                                 interpret=True, two_pass=True)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )


def test_flash_two_pass_sliding_window_and_subk():
    n = 128
    q, k, v = _rand(n, seed=12)
    tl = jnp.asarray([n, n - 40], jnp.int32)
    want = causal_prefill_attention(q, k, v, true_len=tl, block=32,
                                    sliding_window=48)
    got = flash_causal_attention(q, k, v, tl, block_q=32, block_k=32,
                                 interpret=True, two_pass=True,
                                 sliding_window=48)
    for bi in range(B):
        pad = n - int(tl[bi])
        np.testing.assert_allclose(
            np.asarray(got)[bi, :, pad:], np.asarray(want)[bi, :, pad:],
            rtol=2e-4, atol=2e-4,
        )
