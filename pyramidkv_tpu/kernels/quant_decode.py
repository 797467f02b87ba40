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


def _unpack_f32(codes, nbits):
    """int8-packed [R, W] -> f32 [R, W*per] WITHOUT reshapes.

    Mosaic rejects both minor-dim inserts on i8 vectors and 2D->3D shape
    casts, so the interleave (position j = i*per + (j mod per)) is done as
    ``per`` static 0/1 scatter MATMULS: out = sum_p vals_p @ P_p where
    P_p[i, j] = (j == i*per + p) is built from 2D iotas in VREGs."""
    r, wdt = codes.shape
    if nbits == 8:
        # uint8 semantics on an int8 carrier, 32-bit ops only
        u = codes.astype(jnp.int32)
        return jnp.where(u < 0, u + 256, u).astype(jnp.float32)
    per = 8 // nbits
    u = codes.astype(jnp.int32)
    u = jnp.where(u < 0, u + 256, u)
    n_out = wdt * per
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (wdt, n_out), 0)
    cols_j = jax.lax.broadcasted_iota(jnp.int32, (wdt, n_out), 1)
    out = jnp.zeros((r, n_out), jnp.float32)
    for p in range(per):
        vals = ((u >> (p * nbits)) & ((1 << nbits) - 1)).astype(jnp.float32)
        scatter = (cols_j == rows_i * per + p).astype(jnp.float32)
        out = out + jax.lax.dot_general(
            vals, scatter, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return out


def _expand_groups(scales, group, n_out):
    """[R, G] per-group values -> [R, n_out] broadcast over each group of
    ``group`` positions, via a static 0/1 expansion matmul (no reshape)."""
    r, g = scales.shape
    rows_g = jax.lax.broadcasted_iota(jnp.int32, (g, n_out), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, n_out), 1)
    e = (cols // group == rows_g).astype(jnp.float32)
    return jax.lax.dot_general(
        scales, e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
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

    # ---- dequantize K in VMEM: [D, S] f32 (all 2D ops) ----
    kcodes = _unpack_f32(kc_ref[0], nbits)            # [D, S] f32
    khat = (kcodes * _expand_groups(ks_ref[0], group, s_pad)
            + _expand_groups(kz_ref[0], group, s_pad))

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
    vcodes = _unpack_f32(vc_ref[0], nbits)            # [S, Dp] f32
    dp = vcodes.shape[-1]
    vhat = (vcodes * _expand_groups(vs_ref[0], group, dp)
            + _expand_groups(vz_ref[0], group, dp))[:, :d]

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

    # K codes are slot-padded to a group multiple by quantize_kv_region;
    # V codes (quantized along channels) keep the raw slot count — pad
    # them (and a raw-slot mask) up to s_pad here.  Zero codes/scales
    # dequantize to exactly 0 and the mask keeps those slots dead.
    if vc.shape[2] != s_pad:
        padn = ((0, 0), (0, 0), (0, s_pad - vc.shape[2]), (0, 0))
        vc = jnp.pad(vc, padn)
        vs = jnp.pad(vs, padn)
        vz = jnp.pad(vz, padn)
    if mask.shape[-1] != s_pad:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - mask.shape[-1])))

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
