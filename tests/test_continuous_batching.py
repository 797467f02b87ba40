"""Continuous batching: lane recycling produces the same tokens as
independent generation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.serving import ContinuousBatcher, Request


@pytest.fixture(scope="module")
def eng():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=12, prefill_buckets=(32, 64)),
        params,
    )


def test_more_requests_than_lanes_matches_individual(eng):
    rng = np.random.default_rng(0)
    reqs = [
        Request(request_id=f"r{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=6)
        for i, n in enumerate((10, 25, 30, 40, 50, 18, 22))
    ]
    cb = ContinuousBatcher(eng, lanes=2, quantum=4)
    out = cb.run(list(reqs))
    assert set(out) == {r.request_id for r in reqs}
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=6).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_eos_recycles_lane(eng):
    rng = np.random.default_rng(1)
    ids = [int(x) for x in rng.integers(0, 256, size=20)]
    free = eng.generate([ids]).tokens[0]
    eos = free[2]
    reqs = [
        Request("a", ids, max_new_tokens=10, eos_token_ids=(eos,)),
        Request("b", [int(x) for x in rng.integers(0, 256, size=15)],
                max_new_tokens=5),
    ]
    cb = ContinuousBatcher(eng, lanes=1, quantum=3)
    out = cb.run(reqs)
    want_a = eng.generate([ids], max_new_tokens=10,
                          eos_token_ids=(eos,)).tokens[0]
    assert out["a"].tokens == want_a
    assert len(out["a"].tokens) < 10  # EOS actually cut it short
    want_b = eng.generate([reqs[1].prompt_ids], max_new_tokens=5).tokens[0]
    assert out["b"].tokens == want_b


def test_fullkv_rejected(eng):
    spec = eng.model_spec
    full = Engine(spec, CompressionSpec(method="fullkv"),
                  EngineSpec(max_new_tokens=4, prefill_buckets=(32, 64)),
                  eng.params)
    with pytest.raises(ValueError):
        ContinuousBatcher(full, lanes=2)


def test_quantized_lanes(eng):
    spec = eng.model_spec
    qeng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4,
                        quant_method="kivi", nbits=8),
        EngineSpec(max_new_tokens=8, prefill_buckets=(32, 64)),
        eng.params,
    )
    rng = np.random.default_rng(3)
    reqs = [
        Request(f"q{i}", [int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=4)
        for i, n in enumerate((20, 40, 28))
    ]
    cb = ContinuousBatcher(qeng, lanes=2, quantum=2)
    out = cb.run(list(reqs))
    for r in reqs:
        want = qeng.generate([r.prompt_ids], max_new_tokens=4).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_gqa_aggregate_lanes(eng):
    spec = eng.model_spec
    geng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4,
                        gqa_aggregate=True),
        EngineSpec(max_new_tokens=8, prefill_buckets=(32, 64)),
        eng.params,
    )
    rng = np.random.default_rng(5)
    reqs = [Request(f"g{i}", [int(x) for x in rng.integers(0, 256, size=n)],
                    max_new_tokens=4) for i, n in enumerate((20, 40))]
    out = ContinuousBatcher(geng, lanes=2, quantum=2).run(list(reqs))
    for r in reqs:
        want = geng.generate([r.prompt_ids], max_new_tokens=4).tokens[0]
        assert out[r.request_id].tokens == want


@pytest.mark.parametrize("kw", [
    dict(method="think", max_capacity_prompt=16, window_size=4,
         recent_size=8),
    dict(method="pyramidkv", max_capacity_prompt=16, window_size=4),
])
def test_cb_with_region_and_segmented_caches(kw):
    """Lane recycling over the ThinK narrow-K region and segmented
    (pyramidkv) cache layouts: tokens match independent generation."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    eng2 = Engine(
        spec, CompressionSpec(**kw),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
    )
    rng = np.random.default_rng(5)
    reqs = [
        Request(request_id=f"r{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=5)
        for i, n in enumerate((30, 44, 25))
    ]
    cb = ContinuousBatcher(eng2, lanes=2, quantum=3)
    out = cb.run(list(reqs))
    for r in reqs:
        want = eng2.generate([r.prompt_ids], max_new_tokens=5).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_cb_data_parallel_lanes(eng):
    """Lanes sharded over the `data` mesh axis produce identical tokens —
    multi-chip DP serving on the virtual CPU mesh."""
    from pyramidkv_tpu.parallel import make_mesh

    mesh = make_mesh((4, 2), ("data", "model"))
    rng = np.random.default_rng(9)
    reqs = [
        Request(request_id=f"r{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=6)
        for i, n in enumerate((12, 30, 45, 20, 28, 17))
    ]
    cb = ContinuousBatcher(eng, lanes=4, quantum=4, mesh=mesh)
    with mesh:
        out = cb.run(list(reqs))
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=6).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_cb_tensor_parallel_params(eng):
    """TP x DP serving: params sharded over `model` (megatron shardings),
    lanes over `data`, cache heads co-sharded over `model` — tokens
    identical to the unsharded engine (the multi-host topology: TP within
    a host, DP lanes across hosts)."""
    from pyramidkv_tpu.engine import Engine as _Engine
    from pyramidkv_tpu.parallel import make_mesh, shard_params

    mesh = make_mesh((4, 2), ("data", "model"))
    sp = shard_params(eng.params, eng.model_spec, mesh)
    eng_tp = _Engine(eng.model_spec, eng.comp_spec, eng.engine_spec, sp)
    rng = np.random.default_rng(11)
    reqs = [
        Request(request_id=f"r{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=6)
        for i, n in enumerate((14, 33, 41, 22, 27))
    ]
    cb = ContinuousBatcher(eng_tp, lanes=4, quantum=4, mesh=mesh)
    with mesh:
        out = cb.run(list(reqs))
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=6).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_cb_with_quantized_weights():
    """CB + int8 WEIGHTS (QuantW embed has no .dtype — serving must use
    weights.weight_dtype); tokens match independent generation."""
    from pyramidkv_tpu.models.weights import quantize_weights

    spec = ModelSpec.tiny()
    params = quantize_weights(
        jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32))
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(32,)),
        params,
    )
    rng = np.random.default_rng(5)
    reqs = [
        Request(request_id=f"q{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=5)
        for i, n in enumerate((12, 20, 28))
    ]
    cb = ContinuousBatcher(eng, lanes=2, quantum=3)
    out = cb.run(list(reqs))
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=5).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_cb_with_int4_weights_fused_kernel():
    """CB + packed-int4 WEIGHTS with the fused decode kernel forced
    (interpret mode): the LayerView stacked-codes path must survive lane
    insertion/recycling; tokens match independent generation."""
    from pyramidkv_tpu.models import weights as W

    spec = ModelSpec.tiny()
    params = W.quantize_weights(
        jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32),
        nbits=4)
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(32,)),
        params,
    )
    rng = np.random.default_rng(6)
    reqs = [
        Request(request_id=f"q{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=5)
        for i, n in enumerate((10, 22, 30))
    ]
    W._FORCE_INT4_KERNEL[0] = True
    try:
        cb = ContinuousBatcher(eng, lanes=2, quantum=3)
        out = cb.run(list(reqs))
        for r in reqs:
            want = eng.generate([r.prompt_ids], max_new_tokens=5).tokens[0]
            assert out[r.request_id].tokens == want, r.request_id
    finally:
        W._FORCE_INT4_KERNEL[0] = False


def test_batched_refill_groups(eng):
    """Same-bucket requests prefill in one batched call (power-of-two
    groups); tokens still match independent generation.  8 same-bucket
    requests on 4 lanes exercise rows=4 initial fill + refill groups."""
    rng = np.random.default_rng(7)
    reqs = [
        Request(request_id=f"g{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=24 + i)],
                max_new_tokens=6)
        for i in range(8)
    ]
    cb = ContinuousBatcher(eng, lanes=4, quantum=4)
    out = cb.run(list(reqs))
    assert set(out) == {r.request_id for r in reqs}
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=6).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_batched_refill_mixed_buckets_and_eos(eng):
    """Groups split at bucket boundaries; per-request EOS suppression is
    applied per row of the batched prefill."""
    rng = np.random.default_rng(8)
    short = [int(x) for x in rng.integers(0, 256, size=20)]
    base = eng.generate([short], max_new_tokens=10).tokens[0]
    eos = base[3]
    reqs = [
        Request("e0", short, max_new_tokens=10, eos_token_ids=(eos,)),
        Request("e1", [int(x) for x in rng.integers(0, 256, size=26)],
                max_new_tokens=5),
        Request("e2", [int(x) for x in rng.integers(0, 256, size=40)],
                max_new_tokens=5),   # 64-bucket: separate group
        Request("e3", [int(x) for x in rng.integers(0, 256, size=22)],
                max_new_tokens=5),
    ]
    out = ContinuousBatcher(eng, lanes=3, quantum=4).run(list(reqs))
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=r.max_new_tokens,
                            eos_token_ids=r.eos_token_ids).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_cb_speculative_with_int4_kernel():
    """Speculative CB lanes + packed-int4 weights through the fused
    kernel (interpret): verify forwards are lanes*(k+1) rows and must
    stay on the kernel path; tokens match plain generation."""
    from pyramidkv_tpu.models import weights as W

    spec = ModelSpec.tiny()
    params = W.quantize_weights(
        jl.init_params(spec, jax.random.PRNGKey(30), dtype=jnp.float32),
        nbits=4)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    plain = Engine(spec, cs, EngineSpec(max_new_tokens=8,
                                        prefill_buckets=(32,)), params)
    spec_eng = Engine(spec, cs,
                      EngineSpec(max_new_tokens=8, prefill_buckets=(32,),
                                 speculative="ngram", spec_draft_len=3),
                      params)
    rng = np.random.default_rng(31)
    reqs = [
        Request(request_id=f"s{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=5)
        for i, n in enumerate((12, 20, 28))
    ]
    W._FORCE_INT4_KERNEL[0] = True
    try:
        out = ContinuousBatcher(spec_eng, lanes=2, quantum=2).run(list(reqs))
        for r in reqs:
            want = plain.generate([r.prompt_ids], max_new_tokens=5).tokens[0]
            assert out[r.request_id].tokens == want, r.request_id
    finally:
        W._FORCE_INT4_KERNEL[0] = False


def test_cb_speculative_guard_above_crossover(eng):
    """Speculation auto-disables (with a warning) above spec_max_lanes —
    the measured crossover where verify rows leave the weight-bandwidth
    regime (BASELINE r2as/r2at: -4..-34% at >=8 lanes).  No silent slow
    configs; raising spec_max_lanes forces it back on."""
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    es = EngineSpec(max_new_tokens=8, prefill_buckets=(32,),
                    speculative="ngram", spec_draft_len=3)
    spec_eng = Engine(eng.model_spec, cs, es, eng.params)
    with pytest.warns(UserWarning, match="spec_max_lanes"):
        cb = ContinuousBatcher(spec_eng, lanes=8, quantum=2)
    assert not cb._spec_mode

    # at/below the threshold: no warning, speculation stays on
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        cb4 = ContinuousBatcher(spec_eng, lanes=4, quantum=2)
    assert cb4._spec_mode

    # explicit opt-out of the guard via spec_max_lanes
    import dataclasses

    es16 = dataclasses.replace(es, spec_max_lanes=16)
    forced = Engine(eng.model_spec, cs, es16, eng.params)
    with _w.catch_warnings():
        _w.simplefilter("error")
        cb8 = ContinuousBatcher(forced, lanes=8, quantum=2)
    assert cb8._spec_mode

    # the guarded batcher still serves correct tokens (plain quanta)
    rng = np.random.default_rng(40)
    reqs = [
        Request(request_id=f"g{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=4)
        for i, n in enumerate((10, 18))
    ]
    out = cb.run(list(reqs))
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=4).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_open_loop_arrivals_and_latency_fields(eng):
    """Requests with future arrival_time are invisible to the scheduler
    until their arrival passes; tokens still match independent generation
    and every CompletedRequest carries TTFT/e2e latencies measured from
    ARRIVAL (not run start)."""
    from pyramidkv_tpu.serving import latency_summary

    rng = np.random.default_rng(3)
    reqs = [
        Request(request_id=f"r{i}",
                prompt_ids=[int(x) for x in rng.integers(0, 256, size=n)],
                max_new_tokens=4, arrival_time=at)
        for i, (n, at) in enumerate([(20, 0.0), (25, 0.0), (30, 0.4),
                                     (45, 0.8)])
    ]
    cb = ContinuousBatcher(eng, lanes=2, quantum=2)
    import time

    t0 = time.perf_counter()
    out = cb.run(list(reqs))
    wall = time.perf_counter() - t0
    # the scheduler had to wait for the last arrival at t=0.8
    assert wall >= 0.8
    assert set(out) == {r.request_id for r in reqs}
    for r in reqs:
        want = eng.generate([r.prompt_ids], max_new_tokens=4).tokens[0]
        res = out[r.request_id]
        assert res.tokens == want, r.request_id
        assert res.arrival_time == r.arrival_time
        # latencies are from arrival: nonnegative and e2e >= ttft
        assert 0.0 <= res.ttft_seconds <= res.e2e_seconds
        # a request can't finish before it arrives + its decode
        assert res.e2e_seconds < wall + 1e-6
    summ = latency_summary(out)
    assert summ["requests"] == 4 and summ["total_tokens"] == 16
    assert summ["ttft_s"][50] <= summ["ttft_s"][99]
    assert summ["e2e_s"][50] >= summ["ttft_s"][50]


def test_poisson_workload_shape():
    from pyramidkv_tpu.serving import poisson_workload

    reqs = poisson_workload(16, rate=4.0, prompt_lens=(20, 30, 50),
                            seed=7, vocab=256, max_new_tokens=4)
    assert len(reqs) == 16
    arr = [r.arrival_time for r in reqs]
    assert arr == sorted(arr) and arr[-1] > 0
    assert {len(r.prompt_ids) for r in reqs} == {20, 30, 50}
    # deterministic under the same seed
    again = poisson_workload(16, rate=4.0, prompt_lens=(20, 30, 50),
                             seed=7, vocab=256, max_new_tokens=4)
    assert [r.prompt_ids for r in again] == [r.prompt_ids for r in reqs]
    assert [r.arrival_time for r in again] == arr


def test_chunked_refill_budget_below_bucket_does_not_starve():
    """bucket > chunked_refill_tokens with nothing in flight must still
    admit one refill (the pre-r4 guard returned 0 admissions forever —
    a livelock for any chunked engine whose bucket exceeds the HBM
    budget; the budget bounds CONCURRENT states, not the first one)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    e = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=64,
                        window_size=8),
        EngineSpec(max_new_tokens=16, prefill_buckets=(256,),
                   prefill_chunk=64),
        params,
    )
    cb = ContinuousBatcher(e, lanes=2, quantum=4,
                           chunked_refill_tokens=128)  # < bucket 256
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 250, size=n).tolist() for n in (200, 180)]
    res = cb.run([Request(request_id=f"r{i}", prompt_ids=p,
                          max_new_tokens=8)
                  for i, p in enumerate(prompts)])
    want = {f"r{i}": e.generate([p], max_new_tokens=8).tokens[0]
            for i, p in enumerate(prompts)}
    assert {k: v.tokens for k, v in res.items()} == want


def test_cb_quant_pa_chunked_refills_match_generate():
    """r5c regression: fullkv + KIVI 'pa' with CHUNKED refills — the
    lane-cache template must come from the chunked finish (per-chunk K
    scale groups), not the monolithic prefill (one region group); the
    mismatch raised `insert_lane: unmergeable cache leaf` at 64k kivi2
    serving (logs/tpu_r5c.log).  Engine.prefill_cache_shape picks the
    path generate() takes."""
    import jax
    import jax.numpy as jnp

    from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
    from pyramidkv_tpu.engine import Engine
    from pyramidkv_tpu.models.llama import init_params
    from pyramidkv_tpu.serving import ContinuousBatcher, Request

    ms = ModelSpec.tiny()
    params = init_params(ms, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = Engine(
        ms,
        CompressionSpec(method="fullkv", quant_method="kivi", nbits=8,
                        q_layout="pa", window_size=8),
        EngineSpec(max_new_tokens=8, prefill_buckets=(256,),
                   prefill_chunk=64),
        params,
    )
    rng = np.random.default_rng(50)
    prompts = [rng.integers(1, 250, size=n).tolist() for n in (200, 230, 180)]
    cb = ContinuousBatcher(eng, lanes=2, quantum=4, refill_tokens=256)
    res = cb.run([Request(request_id=f"r{i}", prompt_ids=p, max_new_tokens=8)
                  for i, p in enumerate(prompts)])
    for i, p in enumerate(prompts):
        want = eng.generate([p], max_new_tokens=8).tokens[0]
        assert res[f"r{i}"].tokens == want, i
