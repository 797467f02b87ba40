"""Mistral-geometry AdaKV / HeadKV engine e2e (VERDICT r4 missing #2).

The reference ships Mistral AdaKV/HeadKV forwards but they are
flash-only AND import-broken as shipped
(/root/reference/pyramidkv/mistral_model.py:2606 `adaptive_MistralModel_forward`
references symbols its own monkeypatch never binds — monkeypatch.py:10
imports from llama_model only), so token-level A/B against the reference
is impossible.  This closes the gap that CAN be closed: engine e2e at
the Mistral geometry (GQA + sliding window) with per-head budget
assertions and greedy self-consistency, on top of the cluster-level A/B
(test_reference_ab.py::test_ab_adakv / test_ab_headkv, Llama-geometry)
that pins the allocation math EXACTLY.

Budget semantics pinned here (both asserted against the cache validity
mask, the authoritative ragged-budget carrier — cache.py:52):
 - headkv: per-head kept count == head_capacity[l][h] + window_size.
 - adakv: per-layer total == H * max_capacity_prompt (+ tie slack),
   per-head floor == floor_ratio*(cap-window) + window, per-head max ==
   adakv_head_capacity_mult*(cap-window) + window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.llama import init_params

BUCKET = 128
N = 100  # prompt length; > sliding_window so window semantics engage


@pytest.fixture(scope="module")
def mistral():
    """Tiny Mistral geometry: GQA (4q/2kv) + uniform sliding window, the
    mistral-7b shape in miniature (config.py ModelSpec presets)."""
    ms = ModelSpec.tiny(sliding_window=48)
    params = init_params(ms, jax.random.PRNGKey(0), dtype=jnp.float32)
    return ms, params


def _ids(seed=7, n=N):
    return [int(x) for x in np.random.default_rng(seed).integers(
        0, 256, size=n)]


def _engine(ms, params, method, cap=24, window=4, **spec_kw):
    return Engine(
        ms,
        CompressionSpec(method=method, max_capacity_prompt=cap,
                        window_size=window, **spec_kw),
        EngineSpec(max_new_tokens=8, prefill_buckets=(BUCKET,)),
        params,
    )


def _prefill_mask_counts(eng, ids):
    """Per-(layer, head) kept-slot counts from the prefill cache mask."""
    toks = jnp.asarray([list(ids) + [0] * (BUCKET - len(ids))])
    _, cache = eng._get_prefill(BUCKET)(
        eng.params, toks, jnp.asarray([len(ids)], jnp.int32),
        jax.random.PRNGKey(0))
    return np.asarray(cache.mask).sum(-1)[:, 0, :]  # [L, H]


def test_mistral_adakv_per_head_budgets(mistral):
    ms, params = mistral
    cap, window, floor_ratio = 24, 4, 0.2
    eng = _engine(ms, params, "adakv", cap=cap, window=window,
                  floor_ratio=floor_ratio)
    counts = _prefill_mask_counts(eng, _ids())
    H = ms.num_attention_heads
    past = cap - window
    floor = int(floor_ratio * past) + window
    cap_head = int(eng.comp_spec.adakv_head_capacity_mult
                   * past) + window
    assert (counts >= floor).all(), counts
    assert (counts <= cap_head).all(), counts
    # global budget per layer: H*cap, with a per-layer tie slack of
    # H-1 (boundary-score ties at the shared top-k cut)
    totals = counts.sum(-1)
    assert ((totals >= H * cap) & (totals <= H * cap + H - 1)).all(), totals
    # the allocation is actually ADAPTIVE at this geometry (heads differ)
    assert any(len(set(row)) > 1 for row in counts.tolist())


def test_mistral_headkv_per_head_counts_exact(mistral):
    ms, params = mistral
    L, H = ms.num_hidden_layers, ms.num_attention_heads
    window = 4
    caps = tuple(tuple(8 + (i + j) % 5 for j in range(H)) for i in range(L))
    eng = _engine(ms, params, "headkv", cap=24, window=window,
                  head_capacity=caps)
    counts = _prefill_mask_counts(eng, _ids())
    want = np.asarray(caps) + window
    np.testing.assert_array_equal(counts, want)


@pytest.mark.parametrize("method,extra", [
    ("adakv", dict(floor_ratio=0.2)),
    ("headkv", {}),  # head_capacity filled in below
])
def test_mistral_e2e_greedy_self_consistency(mistral, method, extra):
    """Decode runs at the Mistral geometry (per-head masked decode
    attention under GQA grouping + sliding window) and greedy output is
    deterministic across runs and across batch rows."""
    ms, params = mistral
    if method == "headkv":
        L, H = ms.num_hidden_layers, ms.num_attention_heads
        extra = dict(head_capacity=tuple(
            tuple(8 + (i + j) % 5 for j in range(H)) for i in range(L)))
    eng = _engine(ms, params, method, **extra)
    ids = _ids()
    a = eng.generate([ids], max_new_tokens=8).tokens[0]
    b = eng.generate([ids], max_new_tokens=8).tokens[0]
    assert a == b and len(a) == 8
    assert all(0 <= t < ms.vocab_size for t in a)
    # batched rows reproduce the solo result (padding-independence of
    # the per-head masks under the left-pad convention)
    other = _ids(seed=11, n=80)
    out = eng.generate([ids, other], max_new_tokens=8).tokens
    assert out[0] == a


@pytest.mark.parametrize("method", ["adakv", "headkv"])
def test_mistral_budget_above_prompt_matches_fullkv(mistral, method):
    """With every per-head budget >= the prompt, compression keeps all
    tokens and greedy tokens must equal fullkv — the strongest oracle
    available without the reference's (broken) Mistral forwards."""
    ms, params = mistral
    ids = _ids(seed=13, n=40)
    window = 4
    if method == "headkv":
        L, H = ms.num_hidden_layers, ms.num_attention_heads
        extra = dict(head_capacity=tuple(
            tuple(64 for _ in range(H)) for _ in range(L)))
    else:
        extra = dict(floor_ratio=0.2)
    eng = _engine(ms, params, method, cap=64, window=window, **extra)
    full = _engine(ms, params, "fullkv")
    want = full.generate([ids], max_new_tokens=8).tokens[0]
    got = eng.generate([ids], max_new_tokens=8).tokens[0]
    assert got == want
