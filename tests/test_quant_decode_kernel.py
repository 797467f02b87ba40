"""Fused dequant-attention decode kernel vs the XLA dequant path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.kernels.quant_decode import quant_decode_attention
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.ops.attention import (
    decode_attention,
    decode_attention_partials,
    merge_attention_partials,
)
from pyramidkv_tpu.ops.quant import dequantize_kv_region, quantize_kv_region


@pytest.mark.parametrize("nbits", [8, 4, 2])
@pytest.mark.parametrize("hk", [4, 2])
def test_kernel_matches_xla_dequant(nbits, hk):
    b, h, s, d = 1, 4, 128, 32
    rng = np.random.default_rng(nbits * 10 + hk)
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, hk, s)) > 0.2)

    reg = quantize_kv_region(k, v, nbits=nbits, group_size=32)
    k_hat, v_hat = dequantize_kv_region(
        reg, num_slots=s, head_dim=d, nbits=nbits, group_size=32,
        dtype=jnp.float32,
    )
    want = np.asarray(decode_attention(q, k_hat, v_hat, mask))

    acc, m, l = quant_decode_attention(
        q, reg.k.codes, reg.k.scale[..., 0], reg.k.zero[..., 0],
        reg.v.codes, reg.v.scale[..., 0], reg.v.zero[..., 0],
        mask, nbits=nbits, group_size=32, interpret=True,
    )
    got = np.asarray(acc / np.maximum(np.asarray(l)[..., None], 1e-30))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_partial_merge_matches_joint():
    """Region + tail flash-combine == one joint softmax."""
    b, h, s, d = 1, 3, 96, 16
    rng = np.random.default_rng(3)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, h, s)) > 0.3)
    want = np.asarray(decode_attention(q, k, v, mask))
    cut = 64
    p1 = decode_attention_partials(q, k[:, :, :cut], v[:, :, :cut],
                                   mask[:, :, :cut])
    p2 = decode_attention_partials(q, k[:, :, cut:], v[:, :, cut:],
                                   mask[:, :, cut:])
    got = np.asarray(merge_attention_partials([p1, p2]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nbits", [8, 4, 2])
def test_engine_kernel_path_matches_xla_path(nbits):
    """End-to-end greedy tokens: fused-kernel decode (interpret) == XLA
    dequant decode on a KIVI cache."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(2).integers(0, 256, size=60)]

    def run(force_kernel):
        jl._FORCE_QUANT_KERNEL[0] = force_kernel
        try:
            eng = Engine(
                spec,
                CompressionSpec(method="snapkv", max_capacity_prompt=32,
                                window_size=8, quant_method="kivi",
                                nbits=nbits, q_group_size=16),
                EngineSpec(max_new_tokens=8, prefill_buckets=(64,)),
                params,
            )
            return eng.generate([ids], eos_token_ids=()).tokens[0]
        finally:
            jl._FORCE_QUANT_KERNEL[0] = False

    assert run(True) == run(False)


def test_engine_kernel_path_nonmultiple_slots():
    """prefill_slots NOT a multiple of q_group_size: K codes are
    slot-padded by the quantizer but V codes are not — the kernel wrapper
    must pad V (and the mask) itself (regression: reshape TypeError)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(4).integers(0, 256, size=60)]

    def run(force_kernel):
        jl._FORCE_QUANT_KERNEL[0] = force_kernel
        try:
            eng = Engine(
                spec,
                CompressionSpec(method="snapkv", max_capacity_prompt=26,
                                window_size=6, quant_method="kivi",
                                nbits=4, q_group_size=16),
                EngineSpec(max_new_tokens=6, prefill_buckets=(64,)),
                params,
            )
            return eng.generate([ids], eos_token_ids=()).tokens[0]
        finally:
            jl._FORCE_QUANT_KERNEL[0] = False

    assert run(True) == run(False)


@pytest.mark.parametrize("nbits", [8, 4, 2])
@pytest.mark.parametrize("hk", [4, 2])
def test_tiled_kernel_matches_xla_dequant(nbits, hk):
    """Tiled (grid-over-slot-tiles) fused kernel == XLA dequant attention,
    including GQA rows (dequant once per KV head) and multi-tile carries."""
    from pyramidkv_tpu.kernels.quant_decode import quant_decode_attention_tiled

    b, h, s, d = 1, 4, 1024, 32
    rng = np.random.default_rng(nbits * 7 + hk)
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, hk, s)) > 0.2)

    reg = quantize_kv_region(k, v, nbits=nbits, group_size=32)
    k_hat, v_hat = dequantize_kv_region(
        reg, num_slots=s, head_dim=d, nbits=nbits, group_size=32,
        dtype=jnp.float32,
    )
    want = np.asarray(decode_attention(q, k_hat, v_hat, mask))

    acc, m, l = quant_decode_attention_tiled(
        q, reg.k.codes, reg.k.scale[..., 0], reg.k.zero[..., 0],
        reg.v.codes, reg.v.scale[..., 0], reg.v.zero[..., 0],
        mask, nbits=nbits, group_size=32, tile=256, interpret=True,
    )
    got = np.asarray(acc / np.maximum(np.asarray(l)[..., None], 1e-30))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tiled_kernel_scale_softcap():
    """Gemma-2 semantics through the tiled kernel (scale + tanh softcap)."""
    from pyramidkv_tpu.kernels.quant_decode import quant_decode_attention_tiled
    from pyramidkv_tpu.ops.attention import decode_attention_partials

    b, hk, h, s, d = 1, 2, 4, 512, 32
    rng = np.random.default_rng(5)
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((b, hk, s)) > 0.1)
    reg = quantize_kv_region(k, v, nbits=4, group_size=64)
    k_hat, v_hat = dequantize_kv_region(
        reg, num_slots=s, head_dim=d, nbits=4, group_size=64,
        dtype=jnp.float32)
    acc_w, _, l_w = decode_attention_partials(q, k_hat, v_hat, mask,
                                              scale=0.3, softcap=6.0)
    want = np.asarray(acc_w / np.maximum(np.asarray(l_w)[..., None], 1e-30))
    acc, m, l = quant_decode_attention_tiled(
        q, reg.k.codes, reg.k.scale[..., 0], reg.k.zero[..., 0],
        reg.v.codes, reg.v.scale[..., 0], reg.v.zero[..., 0],
        mask, nbits=4, group_size=64, tile=256, interpret=True,
        scale=0.3, softcap=6.0)
    got = np.asarray(acc / np.maximum(np.asarray(l)[..., None], 1e-30))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
