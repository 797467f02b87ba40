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


# ---------------------------------------------------------------------------
# Per-axis ("pa") layout + factored dequant attention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("nbits,tol", [(8, 0.06), (4, 0.8)])
def test_pa_layout_roundtrip(nbits, tol):
    """layout='pa' = one K scale per channel across all slots, one V scale
    per token across all channels (the KIVI paper's axes).  Coarser than
    group-64 but must still roundtrip within the width's error budget."""
    b, h, s, d = 1, 2, 200, 64
    rng = np.random.default_rng(2)
    k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.float32)
    reg = quantize_kv_region(k, v, nbits=nbits, group_size=64, layout="pa")
    # one K group along slots, one V group along channels
    assert reg.k.scale.shape[-2] == 1
    assert reg.v.scale.shape[-2] == 1
    kh, vh = dequantize_kv_region(reg, num_slots=s, head_dim=d, nbits=nbits,
                                  group_size=64)
    assert float(jnp.max(jnp.abs(k - kh))) < tol
    assert float(jnp.max(jnp.abs(v - vh))) < tol


@pytest.mark.parametrize("layout", ["group", "pa"])
@pytest.mark.parametrize("nbits", [8, 4, 2])
def test_fused_attention_matches_dequant_dense(layout, nbits):
    """quant_region_attention_fused factors the affine dequant through the
    attention algebra — identical math to dequantize + dense partials up to
    bf16 operand rounding, for both layouts, all widths, and GQA."""
    from pyramidkv_tpu.ops.attention import (decode_attention_partials,
                                             merge_attention_partials)
    from pyramidkv_tpu.ops.quant import quant_region_attention_fused

    b, hk, g, s, d = 1, 2, 2, 256, 64
    h = hk * g
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    visible = jnp.asarray(
        rng.random(size=(b, hk, s)) > 0.1)  # ragged validity
    reg = quantize_kv_region(k, v, nbits=nbits, group_size=64, layout=layout)

    acc, m, l = quant_region_attention_fused(
        q, reg, visible, num_slots=s, head_dim=d, nbits=nbits)
    got = merge_attention_partials([(acc, m, l)])

    kh, vh = dequantize_kv_region(reg, num_slots=s, head_dim=d, nbits=nbits,
                                  group_size=64)
    ref = merge_attention_partials(
        [decode_attention_partials(q, kh.astype(jnp.bfloat16),
                                   vh.astype(jnp.bfloat16), visible)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("softcap", [None, 5.0])
def test_fused_attention_softcap_and_scale(softcap):
    from pyramidkv_tpu.ops.attention import (decode_attention_partials,
                                             merge_attention_partials)
    from pyramidkv_tpu.ops.quant import quant_region_attention_fused

    b, hk, g, s, d = 1, 2, 2, 128, 64
    h = hk * g
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    visible = jnp.ones((b, hk, s), bool)
    reg = quantize_kv_region(k, v, nbits=8, group_size=64, layout="pa")
    acc, m, l = quant_region_attention_fused(
        q, reg, visible, num_slots=s, head_dim=d, nbits=8,
        scale=0.25, softcap=softcap)
    got = merge_attention_partials([(acc, m, l)])
    kh, vh = dequantize_kv_region(reg, num_slots=s, head_dim=d, nbits=8,
                                  group_size=64)
    ref = merge_attention_partials(
        [decode_attention_partials(q, kh.astype(jnp.bfloat16),
                                   vh.astype(jnp.bfloat16), visible,
                                   scale=0.25, softcap=softcap)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_engine_pa_layout_e2e():
    """q_layout='pa' engines decode through the fused path end-to-end; the
    grouped engine with use_quant_fused=True also runs (counterfactual
    route for benching)."""
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    prompt = [int(x) for x in
              np.random.default_rng(5).integers(0, 256, size=24)]
    es = EngineSpec(max_new_tokens=6, prefill_buckets=(32,))
    outs = {}
    for tag, cs_kw, es_kw in [
        ("group", {}, {}),
        ("pa", {"q_layout": "pa"}, {}),
        ("group_fused", {}, {"use_quant_fused": True}),
    ]:
        cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                             window_size=4, quant_method="kivi", nbits=8,
                             **cs_kw)
        eng = Engine(spec, cs, EngineSpec(max_new_tokens=6,
                                          prefill_buckets=(32,), **es_kw),
                     params)
        outs[tag] = eng.generate([prompt], eos_token_ids=()).tokens[0]
        assert len(outs[tag]) == 6, tag
    # the factored path is the same math as the dequant path up to bf16
    # rounding: grouped fused tokens must match grouped dense tokens
    assert outs["group_fused"] == outs["group"]


def test_pa_rejects_kvquant():
    with pytest.raises(ValueError):
        CompressionSpec(method="snapkv", max_capacity_prompt=16,
                        window_size=4, quant_method="kvquant",
                        q_layout="pa")


def test_fused_multiplane_matches_loop(monkeypatch):
    """PKV_QUANT_MULTIPLANE=1 (one concat-plane dot per side, packed
    bytes read once) matches the per-plane loop on pa layouts."""
    from pyramidkv_tpu.ops import quant as Q

    rng = np.random.default_rng(31)
    b, hk, h, d, s = 1, 2, 4, 32, 256
    k = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, hk, s, d)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(b, h, d)), jnp.float32)
    for nbits in (4, 2):
        reg = Q.quantize_kv_region(k, v, nbits=nbits, group_size=64,
                                   layout="pa")
        vis = jnp.ones((b, hk, s), bool).at[:, :, :13].set(False)
        ref = Q.quant_region_attention_fused(q, reg, vis, num_slots=s,
                                             head_dim=d, nbits=nbits)
        monkeypatch.setenv("PKV_QUANT_MULTIPLANE", "1")
        got = Q.quant_region_attention_fused(q, reg, vis, num_slots=s,
                                             head_dim=d, nbits=nbits)
        monkeypatch.setenv("PKV_QUANT_MULTIPLANE", "0")
        for a, g_ in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(g_),
                                       rtol=1e-5, atol=1e-5)
