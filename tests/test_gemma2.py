"""Gemma-2 model family: GeGLU MLP, (1+w) RMSNorm, embedding scaling,
post-block norms, query_pre_attn_scalar softmax scale, tanh soft-capping of
attention + final logits, and ALTERNATING sliding/full attention layers.

The reference supports Llama + Mistral only (monkeypatch.py); Gemma-2 is a
beyond-reference family exercising every architecture knob at once.  HF
parity (transformers Gemma2ForCausalLM, eager attention) is the oracle,
like tests/test_model.py for llama/mistral.

Soft-caps are set LOW (5.0 / 3.0) so the tanh actually bends the tiny
random-weight logits — at Gemma's production 50.0 the transform would be
numerically invisible here.
"""

import numpy as np
import jax
import jax.numpy as jnp

import torch
import transformers

from pyramidkv_tpu.config import CompressionSpec, EngineSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.models.loader import load_params_from_hf, spec_from_hf_dir
from pyramidkv_tpu.policy import make_plan


def _tiny_hf_gemma2(tmp_path, seed=0, sliding_window=8):
    torch.manual_seed(seed)
    cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512,
        query_pre_attn_scalar=32.0,      # != head_dim: exercises the scale
        sliding_window=sliding_window,   # layers 0,2 sliding; 1,3 full
        attn_logit_softcapping=5.0,
        final_logit_softcapping=3.0,
        rope_theta=10000.0,
        attn_implementation="eager",     # sdpa silently drops the softcap
    )
    model = transformers.Gemma2ForCausalLM(cfg)
    model.eval()
    d = tmp_path / "gemma2"
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def test_gemma2_spec_from_hf(tmp_path):
    _, d = _tiny_hf_gemma2(tmp_path)
    spec = spec_from_hf_dir(d)
    assert spec.hidden_act == "gelu_tanh"
    assert spec.query_pre_attn_scalar == 32.0
    assert spec.attn_logit_softcapping == 5.0
    assert spec.final_logit_softcapping == 3.0
    assert spec.rmsnorm_unit_offset and spec.scale_embeddings
    assert spec.post_block_norms and spec.tie_word_embeddings
    assert spec.mixed_sliding
    assert [spec.layer_is_sliding(i) for i in range(4)] == [
        True, False, True, False]
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    assert params["layers"]["attn_post_norm"].shape == (4, 64)
    assert params["layers"]["mlp_post_norm"].shape == (4, 64)


def test_gemma2_prefill_logits_match_hf(tmp_path):
    model, d = _tiny_hf_gemma2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n = 24  # > sliding_window=8, so the alternation changes the answer
    ids = rng.integers(0, 128, size=(1, n))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    plan = make_plan(CompressionSpec(method="fullkv"),
                     spec.num_hidden_layers, n, 4)
    logits, _ = jl.prefill(
        params, spec, plan, jnp.asarray(ids, jnp.int32),
        jnp.asarray([n], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0, -1],
                               rtol=2e-4, atol=2e-4)


def test_gemma2_prefill_flash_kernel_matches_xla(tmp_path):
    """The Pallas flash kernel's softcap + the lax.cond sliding/full branch
    selection agree with the XLA fallback (interpret mode on CPU)."""
    _, d = _tiny_hf_gemma2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    n = 32
    ids = jnp.asarray(rng.integers(0, 128, size=(1, n)), jnp.int32)
    tl = jnp.asarray([n], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"),
                     spec.num_hidden_layers, n, 4)
    lx, _ = jl.prefill(params, spec, plan, ids, tl, attention_impl="xla")
    lp, _ = jl.prefill(params, spec, plan, ids, tl,
                       attention_impl="pallas_interpret", prefill_block=16)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lp),
                               rtol=2e-4, atol=2e-4)


def test_gemma2_greedy_decode_matches_hf(tmp_path):
    model, d = _tiny_hf_gemma2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    n, new = 20, 8  # decode positions cross the sliding boundary
    ids = rng.integers(0, 128, size=(1, n))
    with torch.no_grad():
        ref = model.generate(
            torch.tensor(ids), max_new_tokens=new, do_sample=False,
            pad_token_id=0,
        )[0, n:].tolist()
    eng = Engine(
        spec, CompressionSpec(method="fullkv"),
        EngineSpec(max_new_tokens=new, prefill_buckets=(32,)), params,
    )
    got = eng.generate([list(map(int, ids[0]))], eos_token_ids=())
    assert got.tokens[0] == ref


def test_gemma2_compressed_and_speculative(tmp_path):
    """snapkv selection (softcap-aware scorer) + speculative decoding run
    on the Gemma-2 forward; speculative output equals the plain loop's."""
    _, d = _tiny_hf_gemma2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    phrase = rng.integers(0, 128, size=7).tolist()
    prompt = (phrase * 7)[:40]
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    a = Engine(spec, cs, EngineSpec(max_new_tokens=10,
                                    prefill_buckets=(64,)),
               params).generate([prompt], eos_token_ids=())
    b = Engine(spec, cs,
               EngineSpec(max_new_tokens=10, prefill_buckets=(64,),
                          speculative="ngram", spec_draft_len=4),
               params).generate([prompt], eos_token_ids=())
    assert a.tokens[0] == b.tokens[0]


def test_gemma2_sliding_alternation_matters(tmp_path):
    """Treating every layer as full-attention changes the logits — i.e.
    the per-layer window is actually applied, not just carried."""
    import dataclasses

    _, d = _tiny_hf_gemma2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    n = 32
    ids = jnp.asarray(rng.integers(0, 128, size=(1, n)), jnp.int32)
    tl = jnp.asarray([n], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"),
                     spec.num_hidden_layers, n, 4)
    la, _ = jl.prefill(params, spec, plan, ids, tl)
    spec_full = dataclasses.replace(spec, sliding_window=None,
                                    layer_types=None)
    lb, _ = jl.prefill(params, spec_full, plan, ids, tl)
    assert not np.allclose(np.asarray(la), np.asarray(lb), atol=1e-3)


def test_gemma2_softcap_skips_quant_kernel_fallback(tmp_path, monkeypatch):
    """The opt-in fused dequant decode kernel has no softcap/custom-scale
    support (models/llama.py ``use_kernel`` gate), so Gemma-2 engines must
    silently take the XLA dequant fallback even when the kernel is forced —
    and the fallback must actually produce tokens.  A Llama-shaped spec in
    the same configuration DOES hit the kernel (sentinel raises), proving
    the gate discriminates on softcap, not on something else."""
    import dataclasses

    from pyramidkv_tpu.config import ModelSpec
    from pyramidkv_tpu.kernels import quant_decode

    class _KernelHit(RuntimeError):
        pass

    def _boom(*a, **kw):
        raise _KernelHit("one-shot quant kernel invoked")

    monkeypatch.setattr(quant_decode, "quant_decode_attention", _boom)

    base = ModelSpec.tiny()
    g2 = dataclasses.replace(
        base,
        query_pre_attn_scalar=32.0,
        attn_logit_softcapping=5.0,
        final_logit_softcapping=3.0,
    )
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4, quant_method="kivi", nbits=8)
    es = EngineSpec(max_new_tokens=6, prefill_buckets=(32,))
    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(0, base.vocab_size, size=24)]

    jl._FORCE_QUANT_KERNEL[0] = True
    try:
        g2_params = jl.init_params(g2, jax.random.PRNGKey(1),
                                   dtype=jnp.float32)
        out = Engine(g2, cs, es, g2_params).generate([prompt])
        assert len(out.tokens[0]) > 0  # fallback path decoded fine

        # control: same config on a softcap-free spec reaches the kernel
        ll_params = jl.init_params(base, jax.random.PRNGKey(1),
                                   dtype=jnp.float32)
        try:
            Engine(base, cs, es, ll_params).generate([prompt])
            assert False, "expected the forced quant kernel to be invoked"
        except _KernelHit:
            pass
    finally:
        jl._FORCE_QUANT_KERNEL[0] = False
