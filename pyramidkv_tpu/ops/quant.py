"""Grouped KV quantization (KIVI / KVQuant behaviors) in pure JAX.

The reference delegates to HQQ (asymmetric min/max affine quantization with
``q_group_size=64`` along ``axis_key=1``; run_longbench.py:287) and, for
KVQuant, zeroes |x| > 6.0 outliers before quantization and re-injects them
after dequantization from a sparse sidecar (quantcache.py:51-58).

TPU-native differences:
- Static shapes: the sparse outlier sidecar becomes a dense mask + values
  buffer restricted to a per-group budget (outliers are rare at threshold 6).
  Here we store an fp16-value *sidecar of the same shape* gated by a mask —
  simple, exact, and XLA-fusable; a bit-packed Pallas variant can replace it.
- int4/int2 values are bit-packed into int8 lanes for HBM residency; the
  decode kernel dequantizes in registers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    #: packed codes, int8. For nbits=8: same shape as input. For 4/2 bits the
    #: last axis is divided by (8 // nbits).
    codes: jax.Array
    scale: jax.Array  # [..., groups, 1] float32
    zero: jax.Array   # [..., groups, 1] float32
    #: dense outlier sidecar (zeros when outlier handling is off)
    outliers: jax.Array | None


def _pack(vals: jax.Array, nbits: int) -> jax.Array:
    """Pack unsigned ints < 2^nbits along the last axis into int8."""
    if nbits == 8:
        return vals.astype(jnp.int8)
    per = 8 // nbits
    *lead, n = vals.shape
    v = vals.reshape(*lead, n // per, per).astype(jnp.uint8)
    shifts = (jnp.arange(per, dtype=jnp.uint8) * nbits)[(None,) * (len(lead) + 1)]
    packed = jnp.sum(v << shifts, axis=-1, dtype=jnp.uint8)
    return packed.astype(jnp.int8)


def _unpack(codes: jax.Array, nbits: int) -> jax.Array:
    if nbits == 8:
        return codes.astype(jnp.uint8).astype(jnp.int32)
    per = 8 // nbits
    u = codes.astype(jnp.uint8)
    shifts = jnp.arange(per, dtype=jnp.uint8) * nbits
    vals = (u[..., None] >> shifts[(None,) * u.ndim]) & ((1 << nbits) - 1)
    *lead, n, _ = vals.shape
    return vals.reshape(*lead, n * per).astype(jnp.int32)


def quantize(
    x: jax.Array,
    *,
    nbits: int,
    group_size: int = 64,
    outlier_threshold: float | None = None,
) -> QuantizedTensor:
    """Asymmetric per-group min/max quantization along the last axis.

    Matches HQQ's affine scheme: code = round((x - min) / scale),
    x_hat = code * scale + min; groups of ``group_size`` along the last axis
    (run_longbench.py:287 uses group 64, key axis 1 == per-token grouping of
    the transposed key — we group along the feature axis of whatever layout
    the cache stores, which is equivalent for grouped affine quantization).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    outliers = None
    if outlier_threshold is not None:
        is_out = jnp.abs(xf) > outlier_threshold
        outliers = jnp.where(is_out, xf, 0.0).astype(jnp.bfloat16)
        xf = jnp.where(is_out, 0.0, xf)
    *lead, n = xf.shape
    assert n % group_size == 0, f"last axis {n} not divisible by group {group_size}"
    g = xf.reshape(*lead, n // group_size, group_size)
    mn = g.min(axis=-1, keepdims=True)
    mx = g.max(axis=-1, keepdims=True)
    qmax = float(2**nbits - 1)
    scale = jnp.maximum((mx - mn) / qmax, 1e-8)
    codes = jnp.clip(jnp.round((g - mn) / scale), 0, qmax)
    codes = codes.reshape(*lead, n).astype(jnp.int32)
    return QuantizedTensor(
        codes=_pack(codes, nbits),
        scale=scale.astype(jnp.float32),
        zero=mn.astype(jnp.float32),
        outliers=outliers,
    )


def dequantize(qt: QuantizedTensor, *, nbits: int, group_size: int = 64,
               dtype=jnp.bfloat16) -> jax.Array:
    codes = _unpack(qt.codes, nbits)
    *lead, n = codes.shape
    g = codes.reshape(*lead, n // group_size, group_size).astype(jnp.float32)
    x = g * qt.scale + qt.zero
    x = x.reshape(*lead, n)
    if qt.outliers is not None:
        x = jnp.where(qt.outliers != 0, qt.outliers.astype(jnp.float32), x)
    return x.astype(dtype)
