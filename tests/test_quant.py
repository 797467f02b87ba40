"""KV quantization: roundtrip error, outlier exactness, engine e2e."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.ops.quant import (
    dequantize,
    dequantize_kv_region,
    quantize,
    quantize_kv_region,
)


@pytest.mark.parametrize("nbits,tol", [(8, 0.02), (4, 0.3), (2, 1.5)])
def test_roundtrip_error(nbits, tol):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 128)), jnp.float32)
    qt = quantize(x, nbits=nbits, group_size=64)
    xh = dequantize(qt, nbits=nbits, group_size=64, dtype=jnp.float32)
    assert float(jnp.max(jnp.abs(x - xh))) < tol
    # packing actually shrinks the codes
    assert qt.codes.size == x.size // (8 // nbits)


def test_kv_region_roundtrip_odd_slots():
    b, h, s, d = 1, 2, 136, 64  # s not a multiple of 64
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    reg = quantize_kv_region(k, v, nbits=8, group_size=64)
    kh, vh = dequantize_kv_region(reg, num_slots=s, head_dim=d, nbits=8,
                                  group_size=64, dtype=jnp.float32)
    assert kh.shape == (b, h, s, d)
    assert float(jnp.max(jnp.abs(k - kh))) < 0.05
    assert float(jnp.max(jnp.abs(v - vh))) < 0.05


def test_outliers_recovered_exactly():
    b, h, s, d = 1, 1, 64, 64
    rng = np.random.default_rng(2)
    k = rng.normal(size=(b, h, s, d)).astype(np.float32)
    k[0, 0, 3, 17] = 42.0
    k[0, 0, 60, 2] = -9.5
    kj = jnp.asarray(k)
    reg = quantize_kv_region(kj, kj, nbits=2, group_size=64,
                             outlier_threshold=6.0, outlier_budget=4)
    kh, _ = dequantize_kv_region(reg, num_slots=s, head_dim=d, nbits=2,
                                 group_size=64, dtype=jnp.float32)
    # bf16 sidecar: exact to bf16 precision despite 2-bit codes
    assert abs(float(kh[0, 0, 3, 17]) - 42.0) < 0.25
    assert abs(float(kh[0, 0, 60, 2]) + 9.5) < 0.05


@pytest.mark.parametrize("qm,nbits", [("kivi", 8), ("kivi", 4), ("kvquant", 4)])
def test_engine_quantized_decode(qm, nbits):
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(4).integers(0, 256, size=40)]
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4,
                        quant_method=qm, nbits=nbits),
        EngineSpec(max_new_tokens=6, prefill_buckets=(64,)),
        params,
    )
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 6
    assert all(0 <= t < 256 for t in out.tokens[0])


def test_quantized_8bit_matches_fp_tokens():
    """8-bit KIVI should almost never flip greedy tokens on a short run."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(5), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(6).integers(0, 256, size=48)]
    outs = []
    for qm in (None, "kivi"):
        eng = Engine(
            spec,
            CompressionSpec(method="fullkv", quant_method=qm, nbits=8),
            EngineSpec(max_new_tokens=4, prefill_buckets=(64,)),
            params,
        )
        outs.append(eng.generate([ids]).tokens[0])
    assert outs[0] == outs[1]


def test_quantized_cache_is_smaller():
    # region slots are padded to group_size * (8 // nbits) for the planar
    # packing (ops/quant.py::_pack), a fixed <=127-slot overhead — compare
    # at a capacity where the real codes dominate the padding
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(7), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(8).integers(0, 256, size=230)]
    sizes = {}
    for qm, nbits in ((None, 8), ("kivi", 4)):
        eng = Engine(
            spec,
            CompressionSpec(method="snapkv", max_capacity_prompt=160,
                            window_size=8, quant_method=qm, nbits=nbits),
            EngineSpec(max_new_tokens=4, prefill_buckets=(256,)),
            params,
        )
        sizes[qm] = eng.generate([ids]).kv_cache_bytes
    # fp32 test params -> fp32 cache; int4 prefill region + tiny decode tail
    assert sizes["kivi"] < sizes[None]
