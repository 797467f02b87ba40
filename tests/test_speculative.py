"""n-gram (prompt-lookup) speculative decoding.

The contract is EXACTNESS: the speculative engine emits exactly the greedy
tokens of the 1-token loop (every emitted token is the argmax of a
verified forward) — acceptance only changes how many forwards it takes.
Reference counterpart: none (the reference's generate loop is the plain
HF greedy loop, run_longbench.py:266-275); this is a TPU-serving
extension like batching/ring attention.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.ops.ngram import ngram_draft


def np_ngram_draft(hist, start, end, n, k):
    gram = hist[end - n:end]
    best = -1
    for i in range(start, end - n):
        if (hist[i:i + n] == gram).all():
            best = i
    if best < 0:
        return np.zeros(k, np.int32), 0
    out = np.zeros(k, np.int32)
    nd = 0
    for t in range(k):
        j = best + n + t
        if j >= end:
            break
        out[t] = hist[j]
        nd += 1
    return out, nd


def test_ngram_draft_matches_numpy():
    rng = np.random.default_rng(0)
    for trial in range(20):
        h = 64
        hist = rng.integers(0, 9, size=h).astype(np.int32)  # small vocab
        start = int(rng.integers(0, 20))
        end = int(rng.integers(start + 1, h))
        n, k = int(rng.integers(1, 4)), int(rng.integers(1, 8))
        want, wnd = np_ngram_draft(hist, start, end, n, k)
        got, gnd = ngram_draft(jnp.asarray(hist)[None],
                               jnp.asarray([start], jnp.int32),
                               jnp.asarray([end], jnp.int32), n=n, k=k)
        assert int(gnd[0]) == wnd, (trial, hist, start, end, n, k)
        np.testing.assert_array_equal(np.asarray(got[0])[:wnd], want[:wnd])


def test_verify_step_matches_sequential_decode():
    """T verified logit rows == T sequential decode_step calls."""
    from pyramidkv_tpu.policy import make_plan

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    rng = np.random.default_rng(1)
    ids = jnp.asarray([rng.integers(0, 256, size=40).tolist()], jnp.int32)
    tl = jnp.asarray([40], jnp.int32)
    plan = make_plan(CompressionSpec(method="snapkv", max_capacity_prompt=16,
                                     window_size=4),
                     spec.num_hidden_layers, 40, 12)
    _, cache0 = jl.prefill(params, spec, plan, ids, tl)
    toks = jnp.asarray([[7, 21, 93, 5, 110]], jnp.int32)  # T=5

    # sequential 1-token loop
    seq_logits = []
    cache = cache0
    for t in range(5):
        lg, cache = jl.decode_step(params, spec, plan, cache, toks[:, t])
        seq_logits.append(np.asarray(lg))
    seq_logits = np.stack(seq_logits, axis=1)  # [B, 5, V]

    v_logits, v_cache = jl.verify_step(params, spec, plan, cache0, toks)
    np.testing.assert_allclose(np.asarray(v_logits), seq_logits,
                               rtol=2e-4, atol=2e-4)
    assert int(v_cache.step) == 5
    np.testing.assert_array_equal(np.asarray(v_cache.mask),
                                  np.asarray(cache.mask))


def test_rollback_clears_rejected_tail():
    from pyramidkv_tpu.policy import make_plan

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    ids = jnp.asarray([[3, 1, 4, 1, 5, 9, 2, 6]], jnp.int32)
    tl = jnp.asarray([8], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"),
                     spec.num_hidden_layers, 8, 8)
    _, cache0 = jl.prefill(params, spec, plan, ids, tl)
    toks = jnp.asarray([[7, 21, 93, 5]], jnp.int32)
    _, cache = jl.verify_step(params, spec, plan, cache0, toks)
    rolled = jl.rollback_decode(cache, plan, jnp.int32(2))
    assert int(rolled.step) == 2
    ps = plan.prefill_slots
    m = np.asarray(rolled.mask)
    assert m[..., ps:ps + 2].all()            # kept appends stay valid
    assert not m[..., ps + 2:].any()          # rejected tail cleared
    # a fresh decode on the rolled cache == decoding after only 2 appends
    seq = cache0
    for t in range(2):
        _, seq = jl.decode_step(params, spec, plan, seq, toks[:, t])
    lg_a, _ = jl.decode_step(params, spec, plan, rolled, toks[:, 2])
    lg_b, _ = jl.decode_step(params, spec, plan, seq, toks[:, 2])
    np.testing.assert_allclose(np.asarray(lg_a), np.asarray(lg_b),
                               rtol=1e-5, atol=1e-5)


METHODS = ["fullkv", "snapkv", "pyramidkv", "l2norm", "streamingllm"]


@pytest.mark.parametrize("method", METHODS)
def test_spec_generate_equals_plain(method):
    """Speculative greedy output == plain greedy output, token for token
    (repetitive prompt => drafts fire; random prompt => mostly rejected)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    cs = CompressionSpec(method=method, max_capacity_prompt=24, window_size=4)
    rng = np.random.default_rng(4)
    phrase = rng.integers(0, 256, size=9).tolist()
    prompts = [
        (phrase * 6)[:50],                       # repetitive
        rng.integers(0, 256, size=47).tolist(),  # random
    ]
    for prompt in prompts:
        plain = Engine(spec, cs, EngineSpec(max_new_tokens=16,
                                            prefill_buckets=(64,)), params)
        spec_e = Engine(spec, cs,
                        EngineSpec(max_new_tokens=16, prefill_buckets=(64,),
                                   speculative="ngram", spec_ngram=2,
                                   spec_draft_len=4), params)
        a = plain.generate([prompt], eos_token_ids=())
        b = spec_e.generate([prompt], eos_token_ids=())
        assert a.tokens[0] == b.tokens[0], (method, prompt[:8])
        assert b.spec_iterations is not None and b.spec_iterations >= 1
        assert a.spec_iterations is None


def test_spec_full_acceptance_with_oracle_drafter(monkeypatch):
    """With an oracle drafter (feeds the true continuation) every draft is
    accepted: output unchanged, forwards collapse ~(k+1)-fold — this pins
    the acceptance/rollback math on the full-acceptance boundary."""
    from pyramidkv_tpu.ops import ngram as ngram_mod

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(5), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=24,
                         window_size=4)
    prompt = np.random.default_rng(6).integers(0, 256, size=40).tolist()
    plain = Engine(spec, cs, EngineSpec(max_new_tokens=16,
                                        prefill_buckets=(64,)), params)
    want = plain.generate([prompt], eos_token_ids=()).tokens[0]

    future = jnp.asarray(want[1:] + [0] * 8, jnp.int32)  # after `first`
    bucket = 64
    real = ngram_mod.ngram_draft

    def oracle(hist, start, end, *, n, k):
        # the true next-k tokens, indexed by how many are already emitted
        g = end[0] - (bucket + 1)
        draft = jax.lax.dynamic_slice_in_dim(future, g, k)[None, :]
        return draft, jnp.asarray([k], jnp.int32)

    monkeypatch.setattr(ngram_mod, "ngram_draft", oracle)
    try:
        eng = Engine(spec, cs,
                     EngineSpec(max_new_tokens=16, prefill_buckets=(64,),
                                speculative="ngram", spec_draft_len=4),
                     params)
        out = eng.generate([prompt], eos_token_ids=())
    finally:
        monkeypatch.setattr(ngram_mod, "ngram_draft", real)
    assert out.tokens[0] == want
    # 15 tokens after `first` at 5 per forward => 3 iterations
    assert out.spec_iterations == 3


def test_spec_eos_mid_draft():
    """EOS emitted inside an accepted draft truncates exactly like the
    plain loop."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(7), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=24,
                         window_size=4)
    prompt = np.random.default_rng(8).integers(0, 256, size=44).tolist()
    plain = Engine(spec, cs, EngineSpec(max_new_tokens=12,
                                        prefill_buckets=(64,)), params)
    base = plain.generate([prompt], eos_token_ids=()).tokens[0]
    assert len(base) >= 6
    eos = base[5]  # force an EOS mid-sequence
    a = plain.generate([prompt], eos_token_ids=(eos,))
    b = Engine(spec, cs,
               EngineSpec(max_new_tokens=12, prefill_buckets=(64,),
                          speculative="ngram", spec_draft_len=4),
               params).generate([prompt], eos_token_ids=(eos,))
    assert a.tokens[0] == b.tokens[0]


def test_spec_falls_back_when_unsupported():
    """B>1 keeps the plain loop (quantized caches speculate since r4)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(9), dtype=jnp.float32)
    es = EngineSpec(max_new_tokens=8, prefill_buckets=(64,),
                    speculative="ngram")
    rng = np.random.default_rng(10)
    p1 = rng.integers(0, 256, size=30).tolist()
    p2 = rng.integers(0, 256, size=28).tolist()
    eng = Engine(spec, CompressionSpec(method="snapkv",
                                       max_capacity_prompt=16, window_size=4),
                 es, params)
    out = eng.generate([p1, p2], eos_token_ids=())      # B=2 -> fallback
    assert out.spec_iterations is None and len(out.tokens) == 2


@pytest.mark.parametrize("quant_kw", [
    dict(quant_method="kivi", nbits=8),                     # fused (group)
    dict(quant_method="kivi", nbits=4, q_layout="pa"),      # fused (pa)
    dict(quant_method="kivi", nbits=2, q_layout="pa"),
    dict(quant_method="kvquant", nbits=4),                  # dequant fallback
])
def test_spec_generate_equals_plain_quantized(quant_kw):
    """VERDICT r3 #6: speculation composes with quantized caches —
    greedy spec output == plain greedy output token for token, for the
    fused factored region path (kivi group + pa) AND the one-shot
    dequant fallback (kvquant outlier sidecars)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(11), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=24,
                         window_size=4, **quant_kw)
    rng = np.random.default_rng(12)
    phrase = rng.integers(0, 256, size=9).tolist()
    for prompt in [(phrase * 6)[:50],
                   rng.integers(0, 256, size=47).tolist()]:
        plain = Engine(spec, cs, EngineSpec(max_new_tokens=12,
                                            prefill_buckets=(64,)), params)
        spec_e = Engine(spec, cs,
                        EngineSpec(max_new_tokens=12, prefill_buckets=(64,),
                                   speculative="ngram", spec_ngram=2,
                                   spec_draft_len=4), params)
        a = plain.generate([prompt], eos_token_ids=())
        b = spec_e.generate([prompt], eos_token_ids=())
        assert a.tokens[0] == b.tokens[0], (quant_kw, a.tokens, b.tokens)
        assert b.spec_iterations is not None and b.spec_iterations >= 1


def test_spec_generate_equals_plain_think():
    """Speculation composes with the ThinK narrow-K cache (two-block
    verify logits)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(13), dtype=jnp.float32)
    cs = CompressionSpec(method="think", max_capacity_prompt=24,
                         window_size=4, pruning_ratio=0.4, recent_size=8)
    rng = np.random.default_rng(14)
    phrase = rng.integers(0, 256, size=9).tolist()
    for prompt in [(phrase * 6)[:50],
                   rng.integers(0, 256, size=47).tolist()]:
        plain = Engine(spec, cs, EngineSpec(max_new_tokens=12,
                                            prefill_buckets=(64,)), params)
        spec_e = Engine(spec, cs,
                        EngineSpec(max_new_tokens=12, prefill_buckets=(64,),
                                   speculative="ngram", spec_ngram=2,
                                   spec_draft_len=4), params)
        a = plain.generate([prompt], eos_token_ids=())
        b = spec_e.generate([prompt], eos_token_ids=())
        assert a.tokens[0] == b.tokens[0], (a.tokens, b.tokens)
        assert b.spec_iterations is not None and b.spec_iterations >= 1


def test_generate_long_with_spec_margin():
    """generate_long (plain loop) is unaffected by the speculative
    decode-slot margin: same tokens as a non-speculative engine."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(11), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    prompt = np.random.default_rng(12).integers(0, 256, size=30).tolist()
    a = Engine(spec, cs, EngineSpec(max_new_tokens=8, prefill_buckets=(64,)),
               params).generate_long([prompt], max_new_tokens=20,
                                     eos_token_ids=())
    b = Engine(spec, cs, EngineSpec(max_new_tokens=8, prefill_buckets=(64,),
                                    speculative="ngram", spec_draft_len=4),
               params).generate_long([prompt], max_new_tokens=20,
                                     eos_token_ids=())
    assert a.tokens[0] == b.tokens[0]


def test_cb_speculative_lanes_match_individual():
    """Continuous batching with speculative lanes: per-lane drafting,
    verification, and rollback produce exactly the tokens of independent
    (plain) generation — lanes at different buckets and phases."""
    from pyramidkv_tpu.serving import ContinuousBatcher, Request

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(13), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    plain = Engine(spec, cs, EngineSpec(max_new_tokens=10,
                                        prefill_buckets=(32, 64)), params)
    spec_eng = Engine(spec, cs,
                      EngineSpec(max_new_tokens=10, prefill_buckets=(32, 64),
                                 speculative="ngram", spec_ngram=2,
                                 spec_draft_len=3), params)
    rng = np.random.default_rng(14)
    phrase = rng.integers(0, 256, size=7).tolist()
    reqs = [
        Request("s0", (phrase * 5)[:30], max_new_tokens=8),
        Request("s1", rng.integers(0, 256, size=25).tolist(),
                max_new_tokens=10),
        Request("s2", rng.integers(0, 256, size=50).tolist(),
                max_new_tokens=6),
        Request("s3", (phrase * 8)[:48], max_new_tokens=10),
        Request("s4", rng.integers(0, 256, size=20).tolist(),
                max_new_tokens=10),
    ]
    cb = ContinuousBatcher(spec_eng, lanes=2, quantum=3)
    assert cb._spec_mode
    out = cb.run(list(reqs))
    for r in reqs:
        want = plain.generate([r.prompt_ids],
                              max_new_tokens=r.max_new_tokens).tokens[0]
        assert out[r.request_id].tokens == want, r.request_id


def test_cb_speculative_eos():
    from pyramidkv_tpu.serving import ContinuousBatcher, Request

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(15), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    plain = Engine(spec, cs, EngineSpec(max_new_tokens=12,
                                        prefill_buckets=(64,)), params)
    rng = np.random.default_rng(16)
    ids = rng.integers(0, 256, size=30).tolist()
    base = plain.generate([ids]).tokens[0]
    eos = base[4]
    spec_eng = Engine(spec, cs,
                      EngineSpec(max_new_tokens=12, prefill_buckets=(64,),
                                 speculative="ngram", spec_draft_len=4),
                      params)
    req_b_ids = rng.integers(0, 256, size=22).tolist()
    out = ContinuousBatcher(spec_eng, lanes=2, quantum=3).run([
        Request("a", ids, max_new_tokens=12, eos_token_ids=(eos,)),
        Request("b", req_b_ids, max_new_tokens=7),
    ])
    want_a = plain.generate([ids], max_new_tokens=12,
                            eos_token_ids=(eos,)).tokens[0]
    assert out["a"].tokens == want_a and len(want_a) < 12
    want_b = plain.generate([req_b_ids], max_new_tokens=7).tokens[0]
    assert out["b"].tokens == want_b


def test_spec_sliding_window_matches_plain():
    """Mistral-style sliding window: verify_attention's window term must
    match the plain decode path's position-window mask."""
    spec = ModelSpec.tiny(sliding_window=12)
    params = jl.init_params(spec, jax.random.PRNGKey(17), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    rng = np.random.default_rng(18)
    phrase = rng.integers(0, 256, size=6).tolist()
    for prompt in [(phrase * 9)[:40],
                   rng.integers(0, 256, size=44).tolist()]:
        a = Engine(spec, cs, EngineSpec(max_new_tokens=20,
                                        prefill_buckets=(64,)),
                   params).generate([prompt], eos_token_ids=())
        b = Engine(spec, cs,
                   EngineSpec(max_new_tokens=20, prefill_buckets=(64,),
                              speculative="ngram", spec_draft_len=5),
                   params).generate([prompt], eos_token_ids=())
        assert a.tokens[0] == b.tokens[0]


def test_spec_sampling_matches_plain_sampler():
    """Sampling + speculation: drafts are deterministic and each position
    samples with the plain loop's key (fold_in(rng, out_column)), so the
    speculative trajectory is IDENTICAL to the plain sampled one —
    seed-deterministic, not merely distribution-equal."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(19), dtype=jnp.float32)
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=24,
                         window_size=4)
    rng = np.random.default_rng(20)
    phrase = rng.integers(0, 256, size=8).tolist()
    for prompt in [(phrase * 7)[:50], rng.integers(0, 256, size=42).tolist()]:
        for top_k in (None, 20):
            a = Engine(spec, cs,
                       EngineSpec(max_new_tokens=14, prefill_buckets=(64,),
                                  greedy=False, temperature=0.8,
                                  sample_top_k=top_k),
                       params).generate([prompt], eos_token_ids=(),
                                        rng_seed=7)
            b = Engine(spec, cs,
                       EngineSpec(max_new_tokens=14, prefill_buckets=(64,),
                                  greedy=False, temperature=0.8,
                                  sample_top_k=top_k, speculative="ngram",
                                  spec_draft_len=4),
                       params).generate([prompt], eos_token_ids=(),
                                        rng_seed=7)
            assert a.tokens[0] == b.tokens[0], (top_k, prompt[:6])
            assert b.spec_iterations is not None
