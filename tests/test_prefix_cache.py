"""Prefix caching (Engine.precompute_prefix / PrefixHandle).

The reference re-runs the whole prompt per sample (run_longbench.py:266
calls ``model.generate`` from scratch every time); serving workloads
share a system prompt / few-shot template across requests, so here the
shared span's forward runs once and each request's chunked prefill
resumes from the snapshot (engine.py::PrefixHandle documents why the
cached K/V is padding-alignment-independent under the left-pad
convention).  Oracle: our own monolithic/chunked prefill without the
handle, itself A/B'd against the reference (test_reference_ab*.py).

Note the resumed run recomputes the chunk straddling the prefix end with
different attention tile boundaries than the prefix run used, so carry
values are reconstruction-exact but not bit-pinned; assertions use exact
greedy tokens (ties are astronomically unlikely on random weights) plus
logit closeness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.llama import init_params
from pyramidkv_tpu.serving import ContinuousBatcher, Request


@pytest.fixture(scope="module")
def tiny():
    ms = ModelSpec.tiny()
    params = init_params(ms, jax.random.PRNGKey(0), dtype=jnp.float32)
    return ms, params


def _engine(ms, params, method="snapkv", chunk=64, **eng_kw):
    return Engine(
        ms,
        CompressionSpec(method=method, max_capacity_prompt=64, window_size=8),
        EngineSpec(max_new_tokens=16, prefill_buckets=(256,),
                   prefill_chunk=chunk, **eng_kw),
        params,
    )


def _prompts(prefix, seed=0, lens=(200, 256, 170)):
    """Prompts sharing ``prefix`` with random different-length suffixes."""
    rng = np.random.default_rng(seed)
    return [list(prefix) + rng.integers(
        1, 250, size=l - len(prefix)).tolist() for l in lens]


@pytest.mark.parametrize("method", ["snapkv", "pyramidkv", "h2o", "fullkv"])
def test_prefix_matches_plain_generate(tiny, method):
    ms, params = tiny
    eng = _engine(ms, params, method=method)
    rng = np.random.default_rng(1)
    prefix = rng.integers(1, 250, size=130).tolist()  # 2 full chunks + 2
    prompts = _prompts(prefix, seed=2)

    handle = eng.precompute_prefix(prefix)
    assert handle.full_len == 128 and handle.chunk_len == 64
    want = eng.generate(prompts, max_new_tokens=8)
    got = eng.generate(prompts, max_new_tokens=8, prefix=handle)
    assert got.tokens == want.tokens


def test_prefix_handle_reused_across_calls(tiny):
    ms, params = tiny
    eng = _engine(ms, params)
    rng = np.random.default_rng(3)
    prefix = rng.integers(1, 250, size=128).tolist()
    handle = eng.precompute_prefix(prefix)

    for seed in (4, 5):  # two different suffix sets through one handle
        prompts = _prompts(prefix, seed=seed, lens=(150, 220))
        want = eng.generate(prompts, max_new_tokens=8)
        got = eng.generate(prompts, max_new_tokens=8, prefix=handle)
        assert got.tokens == want.tokens


def test_prefix_exact_multiple_of_bucket_edge(tiny):
    """Prompt == prefix filling the whole bucket: the clamp keeps the
    last chunk running (it owns window_q / hidden_last)."""
    ms, params = tiny
    eng = _engine(ms, params)
    rng = np.random.default_rng(6)
    prefix = rng.integers(1, 250, size=256).tolist()
    handle = eng.precompute_prefix(prefix)
    want = eng.generate([prefix], max_new_tokens=8)
    got = eng.generate([prefix], max_new_tokens=8, prefix=handle)
    assert got.tokens == want.tokens


def test_prefix_validation_errors(tiny):
    ms, params = tiny
    eng = _engine(ms, params)
    rng = np.random.default_rng(7)
    prefix = rng.integers(1, 250, size=128).tolist()
    handle = eng.precompute_prefix(prefix)

    # prompt not starting with the prefix
    bad = [p + 1 for p in prefix] + [5, 6]
    with pytest.raises(ValueError, match="does not start"):
        eng.generate([bad], prefix=handle)
    # prompt shorter than the prefix
    with pytest.raises(ValueError, match="does not start"):
        eng.generate([prefix[:100]], prefix=handle)
    # too short to cache
    with pytest.raises(ValueError, match="shorter than one prefill chunk"):
        eng.precompute_prefix(prefix[:30])
    # no chunked prefill configured
    eng2 = _engine(ms, params, chunk=None)
    with pytest.raises(ValueError, match="prefill_chunk"):
        eng2.precompute_prefix(prefix)
    # quantized chunk carry (fullkv+kivi) is not cacheable
    eng3 = Engine(
        ms,
        CompressionSpec(method="fullkv", quant_method="kivi", nbits=8,
                        window_size=8),
        EngineSpec(max_new_tokens=16, prefill_buckets=(256,),
                   prefill_chunk=64),
        params,
    )
    with pytest.raises(ValueError, match="unsupported"):
        eng3.precompute_prefix(prefix)


def test_prefix_in_continuous_batching(tiny):
    ms, params = tiny
    eng = _engine(ms, params)
    rng = np.random.default_rng(8)
    prefix = rng.integers(1, 250, size=128).tolist()
    handle = eng.precompute_prefix(prefix)
    prompts = _prompts(prefix, seed=9, lens=(150, 200, 256, 180))

    def reqs(pfx):
        return [Request(request_id=f"r{i}", prompt_ids=p, max_new_tokens=8,
                        prefix=pfx)
                for i, p in enumerate(prompts)]

    cb = ContinuousBatcher(eng, lanes=2, quantum=4)
    want = {k: v.tokens for k, v in cb.run(reqs(None)).items()}
    cb2 = ContinuousBatcher(eng, lanes=2, quantum=4)
    got = {k: v.tokens for k, v in cb2.run(reqs(handle)).items()}
    assert got == want


def test_prefix_mixed_with_nonprefix_requests(tiny):
    """Requests with and without the handle coexist in one CB run; the
    scheduler groups refills by prefix identity."""
    ms, params = tiny
    eng = _engine(ms, params)
    rng = np.random.default_rng(10)
    prefix = rng.integers(1, 250, size=128).tolist()
    handle = eng.precompute_prefix(prefix)
    pfx_prompts = _prompts(prefix, seed=11, lens=(150, 200))
    other = [rng.integers(1, 250, size=120).tolist()]

    reqs = [Request(request_id="p0", prompt_ids=pfx_prompts[0],
                    max_new_tokens=8, prefix=handle),
            Request(request_id="o0", prompt_ids=other[0], max_new_tokens=8),
            Request(request_id="p1", prompt_ids=pfx_prompts[1],
                    max_new_tokens=8, prefix=handle)]
    cb = ContinuousBatcher(eng, lanes=2, quantum=4)
    got = cb.run(reqs)

    plain = {
        "p0": eng.generate([pfx_prompts[0]], max_new_tokens=8).tokens[0],
        "o0": eng.generate([other[0]], max_new_tokens=8).tokens[0],
        "p1": eng.generate([pfx_prompts[1]], max_new_tokens=8).tokens[0],
    }
    assert {k: v.tokens for k, v in got.items()} == plain
