"""Streaming factored-dequant decode kernel (kernels/quant_fused_decode.py)
vs the XLA factored path (ops/quant.py::quant_region_attention_fused) —
same algebra, so partials must agree to bf16-dot tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramidkv_tpu.ops.quant import (QuantizedKVRegion,
                                     quant_region_attention_fused, quantize,
                                     quantize_kv_region)
from pyramidkv_tpu.kernels.quant_fused_decode import (
    region_attention_fused_kernel, supports_fused_kernel)


def _mk(b=1, hk=2, g=4, s=512, d=64, seed=0):
    rng = np.random.default_rng(seed)
    h = hk * g
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)).astype(np.float32))
    # channel-scaled keys (the regime pa exists for)
    k = k * jnp.exp(jnp.asarray(
        rng.normal(size=(1, 1, 1, d)).astype(np.float32)))
    vis = jnp.asarray(rng.random((b, hk, s)) > 0.25)
    return q, k, v, vis


def _norm(parts):
    acc, m, l = parts
    return np.asarray(acc / np.maximum(np.asarray(l), 1e-30)[..., None])


@pytest.mark.parametrize("nbits", [8, 4, 2])
@pytest.mark.parametrize("tile", [128, 256])
def test_kernel_matches_xla_fused_pa(nbits, tile):
    q, k, v, vis = _mk()
    s, d = k.shape[2], k.shape[3]
    reg = quantize_kv_region(k, v, nbits=nbits, group_size=64, layout="pa")
    assert supports_fused_kernel(reg, nbits=nbits, softcap=None)
    ref = quant_region_attention_fused(q, reg, vis, num_slots=s,
                                       head_dim=d, nbits=nbits)
    got = region_attention_fused_kernel(q, reg, vis, head_dim=d,
                                        nbits=nbits, tile=tile,
                                        interpret=True)
    np.testing.assert_allclose(_norm(got), _norm(ref), rtol=2e-2, atol=2e-2)
    # m is the true max logit (shared domain for the decode-tail merge)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("nbits", [8, 4])
def test_kernel_matches_xla_fused_chunk_grouped(nbits):
    """The chunked-prefill pa carry leaves K scales grouped per CHUNK
    (gk > 1): the kernel folds a per-group query row, selected by the
    block index map."""
    q, k, v, vis = _mk(s=512)
    s, d = k.shape[2], k.shape[3]
    chunk = 256  # 2 K scale groups
    kt = jnp.swapaxes(k.astype(jnp.float32), 2, 3)
    kq = quantize(kt, nbits=nbits, group_size=chunk)
    kq = kq._replace(codes=jnp.swapaxes(kq.codes, -1, -2))  # r4 slot-major
    vq = quantize(v.astype(jnp.float32), nbits=nbits, group_size=d,
                  pack_axis=-2)
    reg = QuantizedKVRegion(k=kq, v=vq, k_out_idx=None, k_out_val=None,
                            v_out_idx=None, v_out_val=None)
    assert reg.k.scale.shape[-2] == 2
    assert supports_fused_kernel(reg, nbits=nbits, softcap=None)
    ref = quant_region_attention_fused(q, reg, vis, num_slots=s,
                                       head_dim=d, nbits=nbits)
    got = region_attention_fused_kernel(q, reg, vis, head_dim=d,
                                        nbits=nbits, tile=128,
                                        interpret=True)
    np.testing.assert_allclose(_norm(got), _norm(ref), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-2, atol=1e-2)


def test_supports_fused_kernel_gates():
    q, k, v, vis = _mk()
    reg_pa = quantize_kv_region(k, v, nbits=4, group_size=64, layout="pa")
    reg_g = quantize_kv_region(k, v, nbits=4, group_size=64, layout="group")
    assert supports_fused_kernel(reg_pa, nbits=4, softcap=None)
    assert not supports_fused_kernel(reg_g, nbits=4, softcap=None)  # gv > 1
    assert not supports_fused_kernel(reg_pa, nbits=4, softcap=30.0)
    reg_out = quantize_kv_region(k, v, nbits=4, group_size=64, layout="pa",
                                 outlier_threshold=6.0)
    assert not supports_fused_kernel(reg_out, nbits=4, softcap=None)


def test_engine_dispatch_and_tokens(monkeypatch):
    """_FORCE hook routes pa-region decode through the streaming kernel
    (interpret mode); greedy tokens match the XLA factored default."""
    from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
    from pyramidkv_tpu.engine import Engine
    from pyramidkv_tpu.kernels import quant_fused_decode as qfd
    from pyramidkv_tpu.models import llama
    from pyramidkv_tpu.models.llama import init_params

    ms = ModelSpec.tiny()
    params = init_params(ms, jax.random.PRNGKey(0), dtype=jnp.float32)
    cs = CompressionSpec(method="fullkv", quant_method="kivi", nbits=8,
                         q_group_size=16, q_layout="pa")
    es = EngineSpec(max_new_tokens=8, prefill_buckets=(256,))
    prompts = [list(range(1, 200))]

    ref = Engine(ms, cs, es, params).generate(prompts)

    calls = []
    orig = qfd.region_attention_fused_kernel

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(llama, "_FORCE_QUANT_FUSED_KERNEL", [True])
    monkeypatch.setattr(qfd, "region_attention_fused_kernel", spy)
    got = Engine(ms, cs, es, params).generate(prompts)
    assert calls, "kernel path was not dispatched"
    assert got.tokens == ref.tokens
