"""Chunked online-softmax dequant decode (long KIVI regions).

The one-shot XLA path materialises a full bf16 copy of the quantized
region every decode step — fine at cap-sized regions, 5x slower than the
bf16 cache at 32k fullkv (logs/tpu_r2au2).  The chunked scan must be
numerically identical (same dequantized values, flash-merge exactness up
to fp reorder)."""

import numpy as np
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.ops.attention import (
    decode_attention,
    decode_attention_partials,
    merge_attention_partials,
)
from pyramidkv_tpu.ops.quant import (
    dequantize_kv_region,
    quant_region_attention_partials,
    quantize_kv_region,
)


def test_chunked_partials_match_oneshot():
    rng = np.random.default_rng(0)
    b, hk, h, s, d = 2, 2, 4, 256, 64
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, hk, s)) > 0.2)
    for nbits in (8, 4, 2):
        reg = quantize_kv_region(k, v, nbits=nbits, group_size=64)
        kd, vd = dequantize_kv_region(
            reg, num_slots=s, head_dim=d, nbits=nbits, group_size=64,
            dtype=jnp.bfloat16)
        want = decode_attention(q, kd, vd, mask)
        acc, m, l = quant_region_attention_partials(
            q, reg, mask, num_slots=s, head_dim=d, nbits=nbits,
            group_size=64, chunk=64)  # 4 chunks
        got = merge_attention_partials([(acc, m, l)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_chunked_partials_respect_scale_softcap():
    rng = np.random.default_rng(1)
    b, hk, h, s, d = 1, 2, 4, 128, 64
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    mask = jnp.ones((b, hk, s), bool)
    reg = quantize_kv_region(k, v, nbits=8, group_size=64)
    kd, vd = dequantize_kv_region(reg, num_slots=s, head_dim=d, nbits=8,
                                  group_size=64, dtype=jnp.bfloat16)
    want = decode_attention(q, kd, vd, mask, scale=0.25, softcap=5.0)
    acc, m, l = quant_region_attention_partials(
        q, reg, mask, num_slots=s, head_dim=d, nbits=8, group_size=64,
        chunk=64, scale=0.25, softcap=5.0)
    got = merge_attention_partials([(acc, m, l)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_engine_tokens_identical_across_paths():
    """Greedy tokens through every long-region dispatch equal the one-shot
    path: the FUSED factored path (the long-region default since r3p) and
    the chunked XLA scan (use_quant_scan counterfactual)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(42), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, 120)]
    cs = CompressionSpec(method="fullkv", quant_method="kivi", nbits=4)
    es = EngineSpec(max_new_tokens=8, prefill_buckets=(128,))
    a = Engine(spec, cs, es, params).generate([prompt], eos_token_ids=())
    old = jl._QUANT_CHUNK_THRESHOLD[0]
    jl._QUANT_CHUNK_THRESHOLD[0] = 16  # everything below is "long" now
    try:
        b = Engine(spec, cs, es, params).generate([prompt],
                                                  eos_token_ids=())
        es_scan = EngineSpec(max_new_tokens=8, prefill_buckets=(128,),
                             use_quant_scan=True)
        c = Engine(spec, cs, es_scan, params).generate([prompt],
                                                       eos_token_ids=())
    finally:
        jl._QUANT_CHUNK_THRESHOLD[0] = old
    assert a.tokens[0] == b.tokens[0]  # fused default
    assert a.tokens[0] == c.tokens[0]  # chunked-scan counterfactual


def test_engine_tokens_identical_tiled_kernel_path():
    """Greedy tokens through the TILED fused-kernel region path (forced in
    interpret mode, with the one-shot small-region kernel disabled so the
    tiled branch actually dispatches) equal the default path's tokens."""
    from pyramidkv_tpu.kernels import quant_decode as qd

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(43), dtype=jnp.float32)
    rng = np.random.default_rng(4)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, 120)]
    cs = CompressionSpec(method="fullkv", quant_method="kivi", nbits=4)
    es = EngineSpec(max_new_tokens=8, prefill_buckets=(128,))
    a = Engine(spec, cs, es, params).generate([prompt], eos_token_ids=())
    old_thresh = jl._QUANT_CHUNK_THRESHOLD[0]
    old_force = jl._FORCE_QUANT_KERNEL[0]
    old_max = qd.MAX_KERNEL_SLOTS
    jl._QUANT_CHUNK_THRESHOLD[0] = 16
    jl._FORCE_QUANT_KERNEL[0] = True
    qd.MAX_KERNEL_SLOTS = 0  # skip the one-shot kernel branch
    try:
        b = Engine(spec, cs, es, params).generate([prompt], eos_token_ids=())
    finally:
        jl._QUANT_CHUNK_THRESHOLD[0] = old_thresh
        jl._FORCE_QUANT_KERNEL[0] = old_force
        qd.MAX_KERNEL_SLOTS = old_max
    assert a.tokens[0] == b.tokens[0]
