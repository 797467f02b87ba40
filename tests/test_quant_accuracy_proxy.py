"""Quantized-region ACCURACY proxy (VERDICT r3 weak #8).

Real-weight accuracy grids stay environment-blocked (zero egress), and
random-weight token agreement is a noisy relative probe.  This pins a
more meaningful standing signal: the ATTENTION OUTPUT error of the
factored dequant path on K/V with REALISTIC statistics — per-channel
key scales and per-token value scales (the anisotropy KIVI's axes are
built for, arXiv:2402.02750), plus a heavy-tailed outlier fraction.

Guards (monotonic, margin-backed — not exact numbers):
  1. error shrinks with bit width (int8 < int4 < int2) for both layouts;
  2. int8 is near-lossless (<5% relative output error even on
     these extreme lognormal-scale stats);
  3. the pa layout's coarser scales cost a BOUNDED factor over group-64
     (<2.5x at int4 — the r3q CPU finding was ~1.1-1.5x per-tensor);
  4. kvquant's outlier sidecar strictly helps on outlier-heavy keys.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.ops import quant as Q
from pyramidkv_tpu.ops.attention import (decode_attention,
                                         merge_attention_partials)

B, HK, H, D, S = 1, 2, 4, 64, 512


def _realistic_kv(seed=0, outlier_frac=0.0):
    """K: per-channel lognormal scales (RoPE-like rotation mixes pairs);
    V: per-token lognormal scales; optional heavy outliers."""
    rng = np.random.default_rng(seed)
    ch_scale = rng.lognormal(0.0, 1.0, size=(1, 1, 1, D))
    k = rng.normal(size=(B, HK, S, D)) * ch_scale
    tok_scale = rng.lognormal(0.0, 0.7, size=(1, 1, S, 1))
    v = rng.normal(size=(B, HK, S, D)) * tok_scale
    if outlier_frac:
        n_out = int(outlier_frac * k.size)
        idx = rng.choice(k.size, size=n_out, replace=False)
        k.flat[idx] *= 8.0
    q = rng.normal(size=(B, H, D))
    return (jnp.asarray(q, jnp.float32), jnp.asarray(k, jnp.float32),
            jnp.asarray(v, jnp.float32))


def _fp_attention(q, k, v):
    vis = jnp.ones((B, HK, S), bool)
    return np.asarray(decode_attention(q, k, v, vis))


def _quant_attention(q, k, v, nbits, layout):
    reg = Q.quantize_kv_region(k, v, nbits=nbits, group_size=64,
                               layout=layout)
    vis = jnp.ones((B, HK, S), bool)
    part = Q.quant_region_attention_fused(
        q, reg, vis, num_slots=S, head_dim=D, nbits=nbits)
    return np.asarray(merge_attention_partials([part]))


def _rel_err(got, want):
    return float(np.linalg.norm(got - want) / np.linalg.norm(want))


@pytest.mark.parametrize("layout", ["group", "pa"])
def test_error_monotone_in_bits(layout):
    q, k, v = _realistic_kv(seed=1)
    want = _fp_attention(q, k, v)
    errs = {nb: _rel_err(_quant_attention(q, k, v, nb, layout), want)
            for nb in (8, 4, 2)}
    assert errs[8] < errs[4] < errs[2], (layout, errs)
    assert errs[8] < 0.05, (layout, errs)  # int8 near-lossless


def test_pa_cost_over_group_bounded():
    """The pa layout (one K scale/channel, one V scale/token) trades
    group-64's refinement for fused-path speed; the quality cost on
    realistic statistics must stay bounded."""
    ratios = []
    for seed in range(4):
        q, k, v = _realistic_kv(seed=seed)
        want = _fp_attention(q, k, v)
        e_pa = _rel_err(_quant_attention(q, k, v, 4, "pa"), want)
        e_g = _rel_err(_quant_attention(q, k, v, 4, "group"), want)
        ratios.append(e_pa / max(e_g, 1e-12))
    assert np.mean(ratios) < 2.5, ratios


def test_outlier_sidecar_strictly_helps():
    """kvquant's |x|>threshold sidecar (quantcache.py:51-58 restated)
    must reduce K roundtrip error on outlier-heavy keys."""
    _, k, v = _realistic_kv(seed=3, outlier_frac=0.01)
    base = Q.quantize_kv_region(k, v, nbits=4, group_size=64)
    side = Q.quantize_kv_region(k, v, nbits=4, group_size=64,
                                outlier_threshold=6.0)
    kd_b, _ = Q.dequantize_kv_region(base, num_slots=S, head_dim=D,
                                     nbits=4, group_size=64,
                                     dtype=jnp.float32)
    kd_s, _ = Q.dequantize_kv_region(side, num_slots=S, head_dim=D,
                                     nbits=4, group_size=64,
                                     dtype=jnp.float32)
    e_b = float(jnp.linalg.norm(kd_b - k))
    e_s = float(jnp.linalg.norm(kd_s - k))
    assert e_s < e_b, (e_s, e_b)
