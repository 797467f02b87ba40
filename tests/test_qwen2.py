"""Qwen2 model family: llama-style decoder with always-on QKV biases.

The reference supports Llama + Mistral only (monkeypatch.py); Qwen2 is a
beyond-reference family that differs from Llama solely by the q/k/v
projection biases (modeling_qwen2 hardcodes bias=True, o_proj
bias=False) — `ModelSpec.attention_bias` + `bq/bk/bv` leaves cover it.
HF parity is the oracle, like tests/test_model.py for llama/mistral.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch
import transformers

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.models.loader import load_params_from_hf, spec_from_hf_dir
from pyramidkv_tpu.policy import make_plan


def _tiny_hf_qwen2(tmp_path, seed=0):
    torch.manual_seed(seed)
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
        rope_theta=10000.0,
    )
    model = transformers.Qwen2ForCausalLM(cfg)
    # HF _init_weights zeroes Linear biases — randomise them so parity
    # tests actually exercise the bias path
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0, 0.05)
    model.eval()
    d = tmp_path / "qwen2"
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def test_qwen2_spec_and_biases_load(tmp_path):
    _, d = _tiny_hf_qwen2(tmp_path)
    spec = spec_from_hf_dir(d)
    assert spec.attention_bias  # implied by model_type, not a config key
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    assert params["layers"]["bq"].shape == (3, 64)
    assert params["layers"]["bk"].shape == (3, 32)
    # biases are real values, not zeros
    assert float(np.abs(np.asarray(params["layers"]["bq"])).max()) > 0


def test_qwen2_prefill_logits_match_hf(tmp_path):
    model, d = _tiny_hf_qwen2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n = 24
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


def test_qwen2_greedy_decode_matches_hf(tmp_path):
    model, d = _tiny_hf_qwen2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    n, new = 12, 8
    ids = rng.integers(0, 128, size=(1, n))
    with torch.no_grad():
        ref = model.generate(
            torch.tensor(ids), max_new_tokens=new, do_sample=False,
            pad_token_id=0,
        )[0, n:].tolist()
    eng = Engine(
        spec, CompressionSpec(method="fullkv"),
        EngineSpec(max_new_tokens=new, prefill_buckets=(16,)), params,
    )
    got = eng.generate([list(map(int, ids[0]))], eos_token_ids=())
    assert got.tokens[0] == ref


def test_qwen2_compressed_and_speculative(tmp_path):
    """snapkv compression + speculative decoding run on the biased
    forward; speculative output equals the plain loop's."""
    _, d = _tiny_hf_qwen2(tmp_path)
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
    assert len(a.tokens[0]) == 10


def test_qwen2_int4_weights_and_sharding(tmp_path):
    """Bias leaves stay bf16 under weight quantization and shard over the
    mesh (column axis); sharded == unsharded greedy tokens."""
    from pyramidkv_tpu.models.weights import QuantW, quantize_weights
    from pyramidkv_tpu.parallel import make_mesh, shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    _, d = _tiny_hf_qwen2(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    q4 = quantize_weights(params, nbits=4)
    assert isinstance(q4["layers"]["wq"], QuantW)
    assert not isinstance(q4["layers"]["bq"], QuantW)  # biases stay float
    prompt = np.random.default_rng(4).integers(0, 128, size=30).tolist()
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    es = EngineSpec(max_new_tokens=6, prefill_buckets=(32,))
    want = Engine(spec, cs, es, q4).generate([prompt],
                                             eos_token_ids=()).tokens[0]
    mesh = make_mesh((1, 4), ("data", "model"))
    sp = shard_params(q4, spec, mesh)
    got = Engine(spec, cs, es, sp).generate([prompt],
                                            eos_token_ids=()).tokens[0]
    assert got == want


def test_qwen2_tied_embeddings(tmp_path):
    """Qwen2-0.5B-style tied embeddings: no lm_head in the checkpoint,
    logits reuse embed rows."""
    torch.manual_seed(5)
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    model = transformers.Qwen2ForCausalLM(cfg)
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0, 0.05)
    model.eval()
    d = tmp_path / "qwen2tied"
    model.save_pretrained(d, safe_serialization=True)
    spec = spec_from_hf_dir(str(d))
    assert spec.tie_word_embeddings and spec.attention_bias
    params = load_params_from_hf(str(d), spec, dtype=jnp.float32)
    assert "lm_head" not in params
    rng = np.random.default_rng(6)
    n = 16
    ids = rng.integers(0, 128, size=(1, n))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    plan = make_plan(CompressionSpec(method="fullkv"),
                     spec.num_hidden_layers, n, 4)
    logits, _ = jl.prefill(params, spec, plan, jnp.asarray(ids, jnp.int32),
                           jnp.asarray([n], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0, -1],
                               rtol=2e-4, atol=2e-4)
