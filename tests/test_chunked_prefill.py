"""Chunked prefill (models/chunked_prefill.py): parity with the monolithic
prefill and decode-during-refill interleaving in the ContinuousBatcher.

The reference has no serving/chunked path (batching is its open TODO,
/root/reference/README.md:47); the oracle here is our own monolithic
prefill, which is itself A/B'd against the reference's update_kv +
patched forwards (test_reference_ab*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.llama import init_params
from pyramidkv_tpu.ops.attention import causal_prefill_attention
from pyramidkv_tpu.serving import ContinuousBatcher, Request


@pytest.fixture(scope="module")
def tiny():
    ms = ModelSpec.tiny()
    params = init_params(ms, jax.random.PRNGKey(0), dtype=jnp.float32)
    return ms, params


def _engine(ms, params, method="snapkv", chunk=None, **eng_kw):
    return Engine(
        ms,
        CompressionSpec(method=method, max_capacity_prompt=64, window_size=8),
        EngineSpec(max_new_tokens=16, prefill_buckets=(256,),
                   prefill_chunk=chunk, **eng_kw),
        params,
    )


# ---------------------------------------------------------------------------
# rectangular (q_start) attention
# ---------------------------------------------------------------------------


def _rand_qkv(b=2, h=4, hk=2, n=256, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, hk, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hk, n, d)).astype(np.float32))
    return q, k, v


@pytest.mark.parametrize("window", [None, 96])
def test_q_start_attention_matches_causal(window):
    n, c = 256, 64
    q, k, v = _rand_qkv(n=n)
    tl = jnp.asarray([200, 256], jnp.int32)
    ref = causal_prefill_attention(q, k, v, true_len=tl, block=64,
                                   sliding_window=window)
    outs = []
    for i in range(n // c):
        m = (i + 1) * c
        outs.append(causal_prefill_attention(
            q[:, :, i * c:m], k[:, :, :m], v[:, :, :m],
            true_len=tl - (n - m), block=64, q_start=i * c,
            sliding_window=window))
    got = jnp.concatenate(outs, axis=2)
    # padding rows (first 56 of batch 0) are undefined in both
    np.testing.assert_allclose(np.asarray(ref[:, :, 64:]),
                               np.asarray(got[:, :, 64:]), atol=1e-5)


@pytest.mark.parametrize("window", [None, 96])
def test_q_start_flash_kernel_matches_causal(window):
    from pyramidkv_tpu.kernels import flash_causal_attention

    n, c = 256, 64
    q, k, v = _rand_qkv(n=n)
    tl = jnp.asarray([200, 256], jnp.int32)
    ref = causal_prefill_attention(q, k, v, true_len=tl, block=64,
                                   sliding_window=window)
    outs = []
    for i in range(n // c):
        m = (i + 1) * c
        outs.append(flash_causal_attention(
            q[:, :, i * c:m], k[:, :, :m], v[:, :, :m], tl - (n - m),
            block_q=64, block_k=64, interpret=True, q_start=i * c,
            sliding_window=window))
    got = jnp.concatenate(outs, axis=2)
    np.testing.assert_allclose(np.asarray(ref[:, :, 64:]),
                               np.asarray(got[:, :, 64:]), atol=2e-5)


# ---------------------------------------------------------------------------
# engine generate parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method", [
    "snapkv", "pyramidkv", "streamingllm", "l2norm", "adakv",
    "random", "fullkv", "cam", "headkv", "h2o",
])
def test_generate_chunked_matches_monolithic(tiny, method):
    ms, params = tiny
    kw = {}
    if method == "headkv":
        L, H = ms.num_hidden_layers, ms.num_attention_heads
        kw["head_capacity"] = tuple(
            tuple(40 + (i + j) % 9 for j in range(H)) for i in range(L))
    cs = CompressionSpec(method=method, max_capacity_prompt=64,
                         window_size=8, **kw)
    prompts = [list(range(1, 180)), list(range(7, 240))]
    plain = _engine_spec(ms, params, cs).generate(prompts)
    chunked = _engine_spec(ms, params, cs, chunk=64).generate(prompts)
    assert plain.tokens == chunked.tokens


def test_unsupported_method_falls_back(tiny):
    ms, params = tiny
    eng = _engine(ms, params, "minference", chunk=64)
    assert not eng.chunked_prefill_supported(256)
    plain = _engine(ms, params, "minference").generate([list(range(1, 180))])
    fallback = eng.generate([list(range(1, 180))])
    assert plain.tokens == fallback.tokens


def test_h2o_chunked_runs_score_pass(tiny):
    """h2o chunks via the two-pass scheme: 2x chunk fns + token parity
    (covered in the parametrized test above); here pin the pass
    structure so a refactor can't silently drop the reconstruction."""
    ms, params = tiny
    eng = _engine(ms, params, "h2o", chunk=64)
    assert eng.chunked_prefill_supported(256)
    fns = eng._get_prefill_chunked(256)
    assert len(fns["chunks"]) == 2 * (256 // 64)
    assert fns["tok_starts"] == [0, 1, 2, 3, 0, 1, 2, 3]


def _engine_spec(ms, params, cs, chunk=None):
    return Engine(ms, cs,
                  EngineSpec(max_new_tokens=16, prefill_buckets=(256,),
                             prefill_chunk=chunk), params)


@pytest.mark.parametrize("dense", [False, True])
def test_think_chunked_matches_monolithic(tiny, dense):
    """ThinK chunks in BOTH layouts: the channel scorer's last-32-rows
    queries sit inside the captured window when window >= 32 (the
    supports_chunked guard)."""
    ms, params = tiny
    cs = CompressionSpec(method="think", max_capacity_prompt=64,
                         window_size=32, think_dense=dense)
    prompts = [list(range(1, 180)), list(range(7, 240))]
    chunked = _engine_spec(ms, params, cs, chunk=64)
    assert chunked.chunked_prefill_supported(256)
    plain = _engine_spec(ms, params, cs).generate(prompts)
    assert plain.tokens == chunked.generate(prompts).tokens


def test_think_narrow_window_guard(tiny):
    """window < 32 would starve the channel scorer — must fall back."""
    ms, params = tiny
    cs = CompressionSpec(method="think", max_capacity_prompt=64,
                         window_size=8)
    eng = _engine_spec(ms, params, cs, chunk=64)
    assert not eng.chunked_prefill_supported(256)


def test_pivot_merge_chunked_matches_monolithic(tiny):
    ms, params = tiny
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=64,
                         window_size=8, merge="pivot")
    prompts = [list(range(1, 180)), list(range(7, 240))]
    chunked = _engine_spec(ms, params, cs, chunk=64)
    assert chunked.chunked_prefill_supported(256)
    plain = _engine_spec(ms, params, cs).generate(prompts)
    assert plain.tokens == chunked.generate(prompts).tokens


@pytest.mark.parametrize("qm,nbits", [("kivi", 8), ("kvquant", 8)])
def test_compressed_quant_chunked_matches_monolithic(tiny, qm, nbits):
    """Compression + region quantization through the bf16 chunk carry:
    finish quantizes the compacted region per layer exactly like the
    monolithic scan, so at 8 bits greedy tokens match end to end."""
    ms, params = tiny
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=64,
                         window_size=8, quant_method=qm, nbits=nbits,
                         q_group_size=16)
    prompts = [list(range(1, 180)), list(range(7, 240))]
    chunked = _engine_spec(ms, params, cs, chunk=64)
    assert chunked.chunked_prefill_supported(256)
    plain = _engine_spec(ms, params, cs).generate(prompts)
    assert plain.tokens == chunked.generate(prompts).tokens


def test_compressed_quant_chunked_kivi4_bounded(tiny):
    """At 4 bits a single code flip from the chunked forward's float
    association could flip a greedy tie — require bounded prefill-logit
    divergence and a completed generation instead of exact tokens."""
    ms, params = tiny
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=64,
                         window_size=8, quant_method="kivi", nbits=4,
                         q_group_size=16)
    e_post = _engine_spec(ms, params, cs)
    e_chk = _engine_spec(ms, params, cs, chunk=64)
    prompts = [list(range(1, 180)), list(range(7, 240))]
    tokens = np.zeros((2, 256), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, 256 - len(p):] = p
    tl = jnp.asarray([len(p) for p in prompts], jnp.int32)
    lg1, c1 = e_post._get_prefill(256)(
        e_post.params, jnp.asarray(tokens), tl, jax.random.PRNGKey(0))
    lg2, c2 = e_chk._run_chunked_prefill(
        256, jnp.asarray(tokens), tl, jax.random.PRNGKey(0))
    assert c1.quant.k.codes.shape == c2.quant.k.codes.shape
    assert float(jnp.max(jnp.abs(lg1 - lg2))) < 0.05
    out = e_chk.generate(prompts)
    assert all(len(t) == 16 for t in out.tokens)


# ---------------------------------------------------------------------------
# continuous batching
# ---------------------------------------------------------------------------


def _requests():
    return [
        Request(request_id=f"r{i}",
                prompt_ids=list(range(1 + i, 150 + 2 * i)),
                max_new_tokens=4 + 4 * i)
        for i in range(6)
    ]


def test_cb_chunked_tokens_identical(tiny):
    ms, params = tiny

    def run(chunk):
        eng = _engine(ms, params, chunk=chunk)
        cb = ContinuousBatcher(eng, lanes=2, quantum=4)
        return cb.run(_requests())

    plain, chunked = run(None), run(64)
    assert set(plain) == set(chunked)
    for k in plain:
        assert plain[k].tokens == chunked[k].tokens, k


# ---------------------------------------------------------------------------
# quantized chunk carry (fullkv + KIVI — the 128k enabler)
# ---------------------------------------------------------------------------


def _quant_engines(ms, params, nbits, chunk):
    # use_quant_scan pins the dequant+scan decode path: this pair tests
    # CARRY equivalence (chunk-local quantization + repack vs post-hoc),
    # and the fused factored default's different float association flips
    # greedy ties between the two near-identical regions on the tiny
    # model (fused-vs-dense parity has its own tests in test_quant.py)
    mk = lambda ch: Engine(  # noqa: E731
        ms,
        CompressionSpec(method="fullkv", quant_method="kivi",
                        nbits=nbits, q_group_size=16),
        EngineSpec(max_new_tokens=12, prefill_buckets=(256,),
                   prefill_chunk=ch, use_quant_scan=True),
        params,
    )
    return mk(None), mk(chunk)


def _prefill_pair(ms, params, nbits, chunk=64):
    e_post, e_chk = _quant_engines(ms, params, nbits, chunk)
    prompts = [list(range(1, 180)), list(range(7, 240))]
    tokens = np.zeros((2, 256), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, 256 - len(p):] = p
    tl = jnp.asarray([len(p) for p in prompts], jnp.int32)
    lg1, c1 = e_post._get_prefill(256)(
        e_post.params, jnp.asarray(tokens), tl, jax.random.PRNGKey(0))
    lg2, c2 = e_chk._run_chunked_prefill(
        256, jnp.asarray(tokens), tl, jax.random.PRNGKey(0))
    return (lg1, c1), (lg2, c2), (e_post, e_chk, prompts)


@pytest.mark.parametrize("nbits", [8, 4, 2])
def test_quant_chunked_layer0_bit_parity(tiny, nbits):
    """Layer 0's K/V depend only on embeddings, so its chunk-local-then-
    repacked region must be BYTE-IDENTICAL to the post-hoc
    quantize_kv_region output (groups align: chunk % group*per == 0)."""
    ms, params = tiny
    (_, c1), (_, c2), _ = _prefill_pair(ms, params, nbits)
    q1, q2 = c1.quant, c2.quant
    for a, b in [(q1.k.codes, q2.k.codes), (q1.k.scale, q2.k.scale),
                 (q1.k.zero, q2.k.zero), (q1.v.codes, q2.v.codes),
                 (q1.v.scale, q2.v.scale), (q1.v.zero, q2.v.zero)]:
        assert a.shape == b.shape and a.dtype == b.dtype
        assert bool(jnp.all(a[0] == b[0]))
    assert bool(jnp.all(c1.mask == c2.mask))
    assert bool(jnp.all(c1.positions == c2.positions))


def test_quant_chunked_kivi8_tokens_equal(tiny):
    """At 8 bits the prefill-attention approximation is below greedy
    tie-break noise on the tiny model — end-to-end tokens match the
    post-hoc path exactly."""
    ms, params = tiny
    _, _, (e_post, e_chk, prompts) = _prefill_pair(ms, params, 8)
    assert e_post.generate(prompts).tokens == e_chk.generate(prompts).tokens


@pytest.mark.parametrize("nbits", [4, 2])
def test_quant_chunked_divergence_bounded(tiny, nbits):
    """kivi4/2 prefill reads quantized history — logits drift from the
    post-hoc path but stay within the quantization noise scale."""
    ms, params = tiny
    (lg1, _), (lg2, c2), (_, e_chk, prompts) = _prefill_pair(
        ms, params, nbits)
    d = float(jnp.max(jnp.abs(lg1 - lg2)))
    assert d < (0.2 if nbits == 4 else 1.0), d
    # the finished cache still decodes through the standard quant path
    out = e_chk.generate(prompts)
    assert all(len(t) > 0 for t in out.tokens)


def test_cb_decode_progresses_during_chunked_refill(tiny):
    """At least one decode quantum must run BETWEEN two chunks of the same
    refill — the stall-elimination property chunking exists for."""
    ms, params = tiny
    eng = _engine(ms, params, chunk=64)
    cb = ContinuousBatcher(eng, lanes=2, quantum=2)

    events = []
    fns = eng._get_prefill_chunked(256)
    orig_chunks = list(fns["chunks"])
    fns["chunks"] = [
        (lambda *a, _f=f, _i=i: (events.append(("chunk", _i)), _f(*a))[1])
        for i, f in enumerate(orig_chunks)
    ]
    qf = cb._build_quantum()

    def counting_quantum(*a):
        events.append(("quantum", -1))
        return qf(*a)

    cb._quantum_fn = counting_quantum
    results = cb.run(_requests())
    assert len(results) == 6

    interleaved = False
    for i, (kind, ci) in enumerate(events):
        if kind != "chunk":
            continue
        for j in range(i + 1, len(events)):
            kj, cj = events[j]
            if kj == "chunk" and cj == ci + 1:
                break  # consecutive chunks — was anything between?
            if kj == "quantum":
                # a quantum ran between chunk ci and a later event of the
                # SAME refill iff the next chunk follows the quantum
                if any(e == ("chunk", ci + 1) for e in events[j + 1:]):
                    interleaved = True
                break
        if interleaved:
            break
    assert interleaved, events


def test_cb_chunked_refill_token_budget(tiny):
    """The HBM guard serialises chunked refills (each carries a full-KV
    state buffer): with a budget of ONE bucket, tokens still match the
    plain path exactly — requests just queue behind the in-flight
    refill."""
    ms, params = tiny

    plain = ContinuousBatcher(
        _engine(ms, params), lanes=2, quantum=4).run(_requests())
    eng = _engine(ms, params, chunk=64)
    cb = ContinuousBatcher(eng, lanes=2, quantum=4,
                           chunked_refill_tokens=256)
    got = cb.run(_requests())
    assert set(plain) == set(got)
    for k in plain:
        assert plain[k].tokens == got[k].tokens, k


def test_quant_chunked_flash_partials_matches_xla(tiny):
    """The flash-partials history path (TPU default) reproduces the XLA
    tile-partials math: final prefill logits agree to fp tolerance, and a
    partials merge of (history tile + causal self tile) equals one
    rectangular flash call exactly (kernels/flash_prefill.py::
    flash_attention_partials)."""
    from pyramidkv_tpu.models import chunked_prefill as cp

    ms, params = tiny
    eng = Engine(ms, CompressionSpec(method="fullkv", quant_method="kivi",
                                     nbits=8, q_group_size=16),
                 EngineSpec(max_new_tokens=8, prefill_buckets=(256,),
                            prefill_chunk=64), params)
    plan = eng.plan_for(256)
    prompts = [list(range(1, 180)), list(range(7, 240))]
    tokens = np.zeros((2, 256), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, 256 - len(p):] = p
    tl = jnp.asarray([len(p) for p in prompts], jnp.int32)

    def run(impl):
        state = cp.init_quant_state(ms, plan, 2, 64)
        for i in range(4):
            state, wq, hl = cp.prefill_chunk_quant(
                params, ms, plan, state,
                jnp.asarray(tokens[:, i * 64:(i + 1) * 64]), tl,
                jnp.int32(i * 64), attention_impl=impl)
        lg, _ = cp.prefill_finish_quant(params, ms, plan, state, hl, tl, 64)
        return np.asarray(lg)

    np.testing.assert_allclose(run("pallas_interpret"), run("xla"),
                               rtol=2e-4, atol=2e-4)


def test_flash_partials_merge_equals_rectangular_flash():
    from pyramidkv_tpu.kernels import (flash_attention_partials,
                                       flash_causal_attention)

    B, H, HK, D, C, HIST = 1, 4, 2, 32, 64, 128
    N = HIST + C
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, C, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, HK, N, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, HK, N, D)).astype(np.float32))
    tl = jnp.asarray([N - 20], jnp.int32)
    ref = flash_causal_attention(q, k, v, tl, block_q=64, block_k=64,
                                 interpret=True, q_start=HIST)
    a1, m1, l1 = flash_attention_partials(
        q, k[:, :, :HIST], v[:, :, :HIST],
        jnp.asarray([HIST - 20], jnp.int32),
        block_q=64, block_k=64, interpret=True, q_start=HIST)
    a2, m2, l2 = flash_attention_partials(
        q, k[:, :, HIST:], v[:, :, HIST:], jnp.asarray([C], jnp.int32),
        block_q=64, block_k=64, interpret=True, q_start=0)
    m = jnp.maximum(m1, m2)
    neg = float(jnp.finfo(jnp.float32).min)
    w1 = jnp.where(m1 <= neg / 2, 0.0, jnp.exp2(jnp.minimum(m1 - m, 0.0)))
    w2 = jnp.where(m2 <= neg / 2, 0.0, jnp.exp2(jnp.minimum(m2 - m, 0.0)))
    out = ((a1 * w1[..., None] + a2 * w2[..., None])
           / jnp.maximum(l1 * w1 + l2 * w2, 1e-30)[..., None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nbits", [8, 4])
def test_quant_chunked_pa_layout(tiny, nbits):
    """q_layout='pa' through the chunked carry: K gets one scale group per
    CHUNK (the widest span whose values coexist during prefill), V stays
    exactly per-token; the finished cache decodes through the factored
    fused path and layer-0 V bytes match the post-hoc pa quantization."""
    from pyramidkv_tpu.ops.quant import quantize_kv_region

    ms, params = tiny
    mk = lambda ch: Engine(  # noqa: E731
        ms,
        CompressionSpec(method="fullkv", quant_method="kivi",
                        nbits=nbits, q_group_size=16, q_layout="pa"),
        EngineSpec(max_new_tokens=8, prefill_buckets=(256,),
                   prefill_chunk=ch),
        params,
    )
    e_post, e_chk = mk(None), mk(64)
    assert e_chk.chunked_prefill_supported(256)
    prompts = [list(range(1, 180)), list(range(7, 240))]
    tokens = np.zeros((2, 256), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, 256 - len(p):] = p
    tl = jnp.asarray([len(p) for p in prompts], jnp.int32)
    lg1, c1 = e_post._get_prefill(256)(
        e_post.params, jnp.asarray(tokens), tl, jax.random.PRNGKey(0))
    lg2, c2 = e_chk._run_chunked_prefill(
        256, jnp.asarray(tokens), tl, jax.random.PRNGKey(0))
    # post-hoc pa: ONE K group; chunked pa: one group per chunk
    assert c1.quant.k.scale.shape[-2] == 1
    assert c2.quant.k.scale.shape[-2] == 256 // 64
    # V is per-token in both; layer-0 V bytes identical (embedding-only)
    assert c1.quant.v.scale.shape[-2] == 1 == c2.quant.v.scale.shape[-2]
    for a, b in [(c1.quant.v.codes, c2.quant.v.codes),
                 (c1.quant.v.scale, c2.quant.v.scale),
                 (c1.quant.v.zero, c2.quant.v.zero)]:
        assert bool(jnp.all(a[0] == b[0]))
    # prefill logits stay within quantization noise of the post-hoc path
    d = float(jnp.max(jnp.abs(lg1 - lg2)))
    assert d < (0.25 if nbits == 8 else 1.0), d
    # end-to-end decode through the fused path on the chunk-grouped region
    out = e_chk.generate(prompts)
    assert all(len(t) == 8 for t in out.tokens)
