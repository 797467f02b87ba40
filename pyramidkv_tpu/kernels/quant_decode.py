"""Fused dequant + decode-attention kernel (Pallas TPU) for KIVI caches.

The reference dequantizes the ENTIRE past on every decoded token
(quantcache.py:43-49, :77-80 — HQQ host-side dequant, then dense
attention).  Round 1's XLA path was already one-shot (immutable prefill
region) but still materialised a bf16 copy of the region each step, so the
HBM traffic per step was ~2x bf16 instead of the packed-code bytes.  This
kernel reads ONLY the packed int2/4/8 codes + per-group scales and
dequantizes the region in VMEM — decode traffic for the quantized region
drops to ~nbits/16 of the bf16 cache, which is the whole point of cache
quantization on a bandwidth-bound decode.

Layout (from ``ops.quant.quantize_kv_region``):
  K grouped along slots (KIVI axis_key=1):  codes [BH, D, S/per] int8,
    scale/zero [BH, D, S/64];
  V grouped along channels: codes [BH, S, Dp/per], scale/zero [BH, S, Dp/64].

Each grid step processes one (batch, query-head) row's ENTIRE region in
VMEM (Mosaic requires block minor dims to be 128-aligned or whole-array;
region buffers are small: cap 2048 int4 keys = 128x1056 bytes).  The
kernel emits online-softmax partials (acc, m, l); the caller flash-merges
them with the bf16 decode-tail partials.  Outlier sidecars (KVQuant) are
NOT supported here — the engine keeps those on the XLA dequant path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)

#: Above this many padded region slots the engine falls back to the XLA
#: dequant path (the one-shot VMEM working set would exceed ~12 MB).
MAX_KERNEL_SLOTS = 8192


def _unpack_tile(codes, nbits):
    """int8-packed [..., W] -> int32 [..., W*per] (per = 8 // nbits)."""
    if nbits == 8:
        return codes.astype(jnp.uint8).astype(jnp.int32)
    per = 8 // nbits
    u = codes.astype(jnp.uint8)
    shifts = (jnp.arange(per, dtype=jnp.uint8) * nbits)[(None,) * u.ndim]
    vals = (u[..., None] >> shifts) & ((1 << nbits) - 1)
    return vals.reshape(*codes.shape[:-1], codes.shape[-1] * per).astype(
        jnp.int32
    )


def _kernel(
    q_ref,        # [1, 8, D] f32 (query row broadcast over sublanes)
    kc_ref,       # [1, D, S/per] int8
    ks_ref,       # [1, D, G] f32
    kz_ref,       # [1, D, G] f32
    vc_ref,       # [1, S, Dp/per] int8
    vs_ref,       # [1, S, Gv] f32
    vz_ref,       # [1, S, Gv] f32
    mask_ref,     # [1, 8, S] i32 (broadcast over sublanes)
    acc_out,      # [1, 8, D] f32
    m_out,        # [1, 8, 128] f32
    l_out,        # [1, 8, 128] f32
    *,
    nbits: int,
    group: int,
    s_pad: int,
    head_dim: int,
):
    d = head_dim
    g = s_pad // group

    # ---- dequantize K in VMEM: [D, S] f32 ----
    kcodes = _unpack_tile(kc_ref[0], nbits)           # [D, S] int32
    kg = kcodes.reshape(d, g, group).astype(jnp.float32)
    khat = (kg * ks_ref[0][:, :, None] + kz_ref[0][:, :, None]).reshape(
        d, s_pad
    )

    q = q_ref[0][:1]  # [1, D] f32 (already scaled by 1/sqrt(D))
    s = jax.lax.dot_general(
        q, khat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, S]
    valid = mask_ref[0][:1] > 0  # [1, S]
    s = jnp.where(valid, s, _NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - jnp.maximum(m, _NEG_INF / 2))
    p = jnp.where(valid, p, 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)

    # ---- dequantize V: [S, D] f32 ----
    vcodes = _unpack_tile(vc_ref[0], nbits)           # [S, Dp] int32
    dp = vcodes.shape[-1]
    gv = dp // group
    vg = vcodes.reshape(s_pad, gv, group).astype(jnp.float32)
    vhat = (vg * vs_ref[0][:, :, None] + vz_ref[0][:, :, None]).reshape(
        s_pad, dp
    )[:, :d]

    pv = jax.lax.dot_general(
        p, vhat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, D]
    acc_out[0] = jnp.broadcast_to(pv, (8, d))
    m_out[0] = jnp.broadcast_to(m, (8, 128))
    l_out[0] = jnp.broadcast_to(l, (8, 128))


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "group_size", "interpret"),
)
def quant_decode_attention(
    q: jax.Array,
    kc: jax.Array, ks: jax.Array, kz: jax.Array,
    vc: jax.Array, vs: jax.Array, vz: jax.Array,
    mask: jax.Array,
    *,
    nbits: int,
    group_size: int = 64,
    interpret: bool = False,
):
    """Online-softmax partials of one decode step over the quantized region.

    Args:
      q: [B, H, D] query (unscaled).
      kc/ks/kz: key codes [B, Hk, D, S/per] int8 + scale/zero [B, Hk, D, S/64].
      vc/vs/vz: value codes [B, Hk, S, Dp/per] + scale/zero [B, Hk, S, Dp/64].
      mask: [B, Hk, S] bool — slot validity over the PADDED region.

    Returns (acc [B, H, D] f32, m [B, H] f32, l [B, H] f32) such that the
    region's attention output is acc / l after merging with other partials.
    """
    b, h, d = q.shape
    hk = kc.shape[1]
    g = h // hk
    per = 8 // nbits
    s_pad = kc.shape[-1] * per
    dp = vc.shape[-1] * per

    scale = 1.0 / math.sqrt(d)
    qr = (q.astype(jnp.float32) * scale).reshape(b * h, 1, d)
    qr = jnp.broadcast_to(qr, (b * h, 8, d))
    kcr = kc.reshape(b * hk, d, s_pad // per)
    ksr = ks.reshape(b * hk, d, s_pad // group_size)
    kzr = kz.reshape(b * hk, d, s_pad // group_size)
    vcr = vc.reshape(b * hk, s_pad, dp // per)
    vsr = vs.reshape(b * hk, s_pad, dp // group_size)
    vzr = vz.reshape(b * hk, s_pad, dp // group_size)
    mr = jnp.broadcast_to(
        mask.reshape(b * hk, 1, s_pad).astype(jnp.int32), (b * hk, 8, s_pad)
    )

    def _kv(bh):
        return (bh // h) * hk + (bh % h) // g

    def full(shape):
        # whole-array blocks along the non-batch dims: Mosaic accepts minor
        # dims that equal the overall array dims regardless of alignment
        return pl.BlockSpec((1,) + shape[1:], lambda bh: (_kv(bh), 0, 0))

    acc, m, l = pl.pallas_call(
        functools.partial(
            _kernel, nbits=nbits, group=group_size, s_pad=s_pad, head_dim=d,
        ),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, 8, d), lambda bh: (bh, 0, 0)),
            full(kcr.shape), full(ksr.shape), full(kzr.shape),
            full(vcr.shape), full(vsr.shape), full(vzr.shape),
            full(mr.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, d), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda bh: (bh, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda bh: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kcr, ksr, kzr, vcr, vsr, vzr, mr)
    return (
        acc[:, 0, :].reshape(b, h, d),
        m[:, 0, 0].reshape(b, h),
        l[:, 0, 0].reshape(b, h),
    )
