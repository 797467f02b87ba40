"""Fused dequant + decode-attention kernel (Pallas TPU) for KIVI caches.

The reference dequantizes the ENTIRE past on every decoded token
(quantcache.py:43-49, :77-80 — HQQ host-side dequant, then dense
attention).  Round 1's XLA path was already one-shot (immutable prefill
region) but still materialised a bf16 copy of the region each step, so the
HBM traffic per step was ~2x bf16 instead of the packed-code bytes.  This
kernel reads ONLY the packed int2/4/8 codes + per-group scales and
dequantizes tiles in VMEM — decode traffic for the quantized region drops
to ~nbits/16 of the bf16 cache, which is the whole point of cache
quantization on a bandwidth-bound decode.

Layout (from ``ops.quant.quantize_kv_region``):
  K grouped along slots (KIVI axis_key=1):  codes [BH, D, S/per] int8,
    scale/zero [BH, D, S/64];
  V grouped along channels: codes [BH, S, Dp/per], scale/zero [BH, S, Dp/64].

The kernel emits the online-softmax partials (acc, m, l) over the quantized
region; the caller merges them with the bf16 decode-tail partials (flash
combine).  Outlier sidecars (KVQuant) are NOT supported here — the engine
keeps those on the XLA dequant path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


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
    kc_ref,       # [1, D, Sblk/per] int8
    ks_ref,       # [1, D, Gblk] f32
    kz_ref,       # [1, D, Gblk] f32
    vc_ref,       # [1, Sblk, Dp/per] int8
    vs_ref,       # [1, Sblk, Gv] f32
    vz_ref,       # [1, Sblk, Gv] f32
    mask_ref,     # [1, 8, Sblk] i32 (broadcast over sublanes)
    acc_out,      # [1, 8, D] f32
    m_out,        # [1, 8, 128] f32
    l_out,        # [1, 8, 128] f32
    acc_ref,      # [8, D] f32 scratch
    m_ref,        # [8, 128] f32
    l_ref,        # [8, 128] f32
    *,
    nbits: int,
    group: int,
    s_block: int,
    head_dim: int,
    num_s_blocks: int,
):
    si = pl.program_id(1)

    @pl.when(si == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    d = head_dim
    gblk = s_block // group

    # ---- dequantize K tile in VMEM: [D, Sblk] f32 ----
    kcodes = _unpack_tile(kc_ref[0], nbits)           # [D, Sblk] int32
    kg = kcodes.reshape(d, gblk, group).astype(jnp.float32)
    khat = kg * ks_ref[0][:, :, None] + kz_ref[0][:, :, None]
    khat = khat.reshape(d, s_block)

    q = q_ref[0][:1]  # [1, D] f32 (already scaled by 1/sqrt(D))
    s = jax.lax.dot_general(
        q, khat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, Sblk]
    valid = mask_ref[0][:1] > 0  # [1, Sblk]
    s = jnp.where(valid, s, _NEG_INF)

    m_prev = m_ref[:1, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - jnp.maximum(m_new, _NEG_INF / 2))
    p = jnp.where(valid, p, 0.0)
    alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
    alpha = jnp.where(m_prev <= _NEG_INF / 2, 0.0, alpha)

    # ---- dequantize V tile: [Sblk, D] f32 ----
    vcodes = _unpack_tile(vc_ref[0], nbits)           # [Sblk, Dp] int32
    dp = vcodes.shape[-1]
    gv = dp // group
    vg = vcodes.reshape(s_block, gv, group).astype(jnp.float32)
    vhat = vg * vs_ref[0][:, :, None] + vz_ref[0][:, :, None]
    vhat = vhat.reshape(s_block, dp)[:, :d]

    l_new = alpha * l_ref[:1, :1] + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p, vhat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [1, D]
    acc_ref[:] = acc_ref[:] * alpha + jnp.broadcast_to(pv, acc_ref.shape)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(si == num_s_blocks - 1)
    def _fin():
        acc_out[0] = acc_ref[:]
        m_out[0] = m_ref[:]
        l_out[0] = l_ref[:]


def _pick_s_block(s_pad: int, group: int, target: int = 512) -> int:
    best = group
    for cand in range(group, min(s_pad, target) + 1, group):
        if s_pad % cand == 0:
            best = cand
    return best


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
    s_block = _pick_s_block(s_pad, group_size)
    nsb = s_pad // s_block
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

    gblk = s_block // group_size
    acc, m, l = pl.pallas_call(
        functools.partial(
            _kernel, nbits=nbits, group=group_size, s_block=s_block,
            head_dim=d, num_s_blocks=nsb,
        ),
        grid=(b * h, nsb),
        in_specs=[
            pl.BlockSpec((1, 8, d), lambda bh, si: (bh, 0, 0)),
            pl.BlockSpec((1, d, s_block // per), lambda bh, si: (_kv(bh), 0, si)),
            pl.BlockSpec((1, d, gblk), lambda bh, si: (_kv(bh), 0, si)),
            pl.BlockSpec((1, d, gblk), lambda bh, si: (_kv(bh), 0, si)),
            pl.BlockSpec((1, s_block, dp // per), lambda bh, si: (_kv(bh), si, 0)),
            pl.BlockSpec((1, s_block, dp // group_size), lambda bh, si: (_kv(bh), si, 0)),
            pl.BlockSpec((1, s_block, dp // group_size), lambda bh, si: (_kv(bh), si, 0)),
            pl.BlockSpec((1, 8, s_block), lambda bh, si: (_kv(bh), 0, si)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, d), lambda bh, si: (bh, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda bh, si: (bh, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda bh, si: (bh, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, 8, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, d), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kcr, ksr, kzr, vcr, vsr, vzr, mr)
    return (
        acc[:, 0, :].reshape(b, h, d),
        m[:, 0, 0].reshape(b, h),
        l[:, 0, 0].reshape(b, h),
    )
