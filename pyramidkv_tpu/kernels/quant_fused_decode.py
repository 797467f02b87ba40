"""Streaming factored-dequant decode-attention kernel (Pallas TPU) for
long per-axis ("pa") KIVI regions.

The XLA factored path (`ops.quant.quant_region_attention_fused`) already
folds the affine dequant through the attention algebra so its dots read
only packed codes — but XLA still materialises each unpacked bf16 bit
plane through HBM before the dot (an elementwise shift/and producer does
not fuse into a dot operand), plus fp32 logits/probabilities round-trips.
At 64k kivi4 that is ~2x the packed-code bytes, matching the measured
~52%-of-byte-roofline decode (BASELINE r3p).  This kernel streams slot
tiles through VMEM instead: unpack, logits, online softmax, and the PV
dot all happen on-chip, so per-step HBM traffic for the region is the
packed codes + per-token V scales — the quantization bandwidth win fully
realised (reference analogue: the per-token dequant+attend hot loop,
quantcache.py:59-96, which re-materialises the whole past in fp16).

Differences from the failed r2az tiled kernel (BASELINE r2az — lost to
the XLA scan on every row):
- scales are folded OUTSIDE the kernel ("pa" layout: one K scale per
  channel folds into the query; per-token V scales ride a [per, W] f32
  sidecar), so there is no in-kernel scale-block staging, no group-select
  iota matmuls, and the code dots run in bf16 on the MXU;
- the K zero term is a per-(row, slot-group) logit BIAS (z = q . kz),
  added before the online max — for the post-hoc pa layout it is one
  global constant (softmax-invariant but kept so merged partials carry
  the true max); the V zero term accumulates as a separate
  online-rescaled scalar per row, added to every output channel at the
  end (v_te = c_te * vs_t + vz_t — the zero is channel-independent);
- the grid is (BH, slot-tile, plane) with the plane index INNERMOST and
  the byte tiles' index maps ignoring it: consecutive plane steps reuse
  the same VMEM block (Pallas only re-fetches when the block index
  changes), so each packed byte is read from HBM exactly once.

Layout contract (from ``ops.quant.quantize_kv_region(layout="pa")`` or
the chunked-prefill pa carry): K codes [B,Hk,D,W] planar over slots,
K scale/zero [B,Hk,D,Gk] with Gk == 1 (post-hoc) or Gk == n_chunks
(carry; plane widths W are Gk-aligned because supports_chunked_quant
requires n_chunks % per == 0); V codes [B,Hk,W,Dp]; V scale/zero
per token [B,Hk,S].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)
_NEG_HALF = _NEG_INF / 2

#: Slot-tile width (per plane) streamed through VMEM per grid step.
#: [D, tile] int8 K bytes + [tile, Dp] V bytes + their i32/bf16 unpack
#: temporaries stay well under the 16 MB scoped-VMEM limit at 2048.
DEFAULT_TILE = 2048


def _u32(codes):
    """uint8 semantics on an int8 carrier (Mosaic has no u8 vector ops)."""
    u = codes.astype(jnp.int32)
    return jnp.where(u < 0, u + 256, u)


def _kernel(
    qs_ref,    # [1, 1, G8, D]  bf16  (scale-folded queries, group g(t,p))
    zb_ref,    # [1, 1, G8, 128] f32  (K zero-term logit bias, same group)
    kc_ref,    # [1, D, T]      int8  (slot-planar K codes, byte tile)
    vc_ref,    # [1, T, Dp]     int8  (slot-planar V codes, byte tile)
    vs_ref,    # [1, 1, 1, T]   f32   (per-token V scale, plane p's slots)
    vz_ref,    # [1, 1, 1, T]   f32   (per-token V zero)
    mask_ref,  # [1, 1, 1, T]   int8  (slot validity, plane p's slots)
    acc_out,   # [1, G8, Dp]    f32
    m_out,     # [1, G8, 128]   f32
    l_out,     # [1, G8, 128]   f32
    acc_scr,   # [G8, Dp]  f32
    m_scr,     # [G8, 128] f32
    l_scr,     # [G8, 128] f32
    zv_scr,    # [G8, 128] f32
    *,
    nbits: int,
    per: int,
    n_tiles: int,
):
    t = pl.program_id(1)
    p = pl.program_id(2)
    mb = (1 << nbits) - 1

    @pl.when((t == 0) & (p == 0))
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        zv_scr[...] = jnp.zeros_like(zv_scr)

    shift = p * nbits
    # widen before comparing: Mosaic has no i8 vector cmpi on this target
    valid = mask_ref[0, 0].astype(jnp.int32) > 0            # [1, T]

    # ---- logits over this plane-tile's slots (codes straight to MXU) ----
    ku = _u32(kc_ref[0])                                    # [D, T] i32
    cp = ((ku >> shift) & mb).astype(jnp.bfloat16)
    s = jax.lax.dot_general(
        qs_ref[0, 0], cp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [G8, T]
    s = s + zb_ref[0, 0][:, :1]                             # K zero bias
    s = jnp.where(valid, s, _NEG_INF)

    # ---- online-softmax merge ----
    m_old = m_scr[:, :1]                                    # [G8, 1]
    m_new = jnp.maximum(m_old, s.max(axis=1, keepdims=True))
    m_safe = jnp.maximum(m_new, _NEG_HALF)
    alpha = jnp.where(m_old <= _NEG_HALF, 0.0, jnp.exp(m_old - m_safe))
    pe = jnp.where(valid, jnp.exp(s - m_safe), 0.0)         # [G8, T]
    l_scr[...] = l_scr[...] * alpha + jnp.broadcast_to(
        pe.sum(axis=1, keepdims=True), l_scr.shape)
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    # ---- PV (V scale folds into the probabilities) ----
    vu = _u32(vc_ref[0])                                    # [T, Dp] i32
    vp = ((vu >> shift) & mb).astype(jnp.bfloat16)
    ps = (pe * vs_ref[0, 0]).astype(jnp.bfloat16)           # [G8, T]
    pv = jax.lax.dot_general(
        ps, vp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [G8, Dp]
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv
    zv_scr[...] = zv_scr[...] * alpha + jnp.broadcast_to(
        (pe * vz_ref[0, 0]).sum(axis=1, keepdims=True), zv_scr.shape)

    @pl.when((t == n_tiles - 1) & (p == per - 1))
    def _emit():
        acc_out[0] = acc_scr[...] + zv_scr[:, :1]
        m_out[0] = m_scr[...]
        l_out[0] = l_scr[...]


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "head_dim", "tile", "interpret"),
)
def quant_fused_attention_pa(
    qs: jax.Array,    # [BH, Gk, G8, D] bf16 — queries pre-scaled by
                      #   1/sqrt(d) * K per-channel scale (per slot-group)
    zb: jax.Array,    # [BH, Gk, G8, 128] f32 — K zero logit bias per group
    kc: jax.Array,    # [BH, D, W] int8
    vc: jax.Array,    # [BH, W, Dp] int8
    vs: jax.Array,    # [BH, per, W] f32
    vz: jax.Array,    # [BH, per, W] f32
    mask: jax.Array,  # [BH, per, W] int8
    *,
    nbits: int,
    head_dim: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
):
    """Returns (acc [BH, G8, Dp], m [BH, G8, 128], l [BH, G8, 128]) —
    e-domain online-softmax partials over the packed region (``acc`` is
    unnormalised; rows of ``m``/``l`` are lane-broadcast scalars)."""
    bh, gk, g8, d = qs.shape
    per = 8 // nbits
    w = kc.shape[-1]
    dp = vc.shape[-1]
    assert w % tile == 0, (w, tile)
    n_tiles = w // tile
    kg_w = w * per // gk          # global slots per K scale group
    assert (w * per) % gk == 0 and kg_w % tile == 0, (w, per, gk, tile)
    assert gk == 1 or w % kg_w == 0, (w, kg_w)

    def qidx(b, t, p):
        # global slot of this plane-tile's first element -> K scale group
        return (b, (p * w + t * tile) // kg_w, 0, 0)

    grid = (bh, n_tiles, per)
    kernel = functools.partial(_kernel, nbits=nbits, per=per,
                               n_tiles=n_tiles)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, g8, d), qidx),
            pl.BlockSpec((1, 1, g8, 128), qidx),
            pl.BlockSpec((1, d, tile), lambda b, t, p: (b, 0, t)),
            pl.BlockSpec((1, tile, dp), lambda b, t, p: (b, t, 0)),
            # per-token sidecars carry a singleton axis before the slot
            # axis so the block's last-two dims are (1, tile) — Mosaic
            # requires them divisible by (8, 128) OR equal to the array
            # dims, and a (1, tile) block over [.., per, W] is neither.
            pl.BlockSpec((1, 1, 1, tile), lambda b, t, p: (b, p, 0, t)),
            pl.BlockSpec((1, 1, 1, tile), lambda b, t, p: (b, p, 0, t)),
            pl.BlockSpec((1, 1, 1, tile), lambda b, t, p: (b, p, 0, t)),
        ],
        out_specs=[
            pl.BlockSpec((1, g8, dp), lambda b, t, p: (b, 0, 0)),
            pl.BlockSpec((1, g8, 128), lambda b, t, p: (b, 0, 0)),
            pl.BlockSpec((1, g8, 128), lambda b, t, p: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, g8, dp), jnp.float32),
            jax.ShapeDtypeStruct((bh, g8, 128), jnp.float32),
            jax.ShapeDtypeStruct((bh, g8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g8, dp), jnp.float32),
            pltpu.VMEM((g8, 128), jnp.float32),
            pltpu.VMEM((g8, 128), jnp.float32),
            pltpu.VMEM((g8, 128), jnp.float32),
        ],
        interpret=interpret,
    )
    return call(qs, zb, kc, vc, vs[:, :, None], vz[:, :, None],
                mask[:, :, None])


def supports_fused_kernel(reg, *, nbits: int, softcap) -> bool:
    """pa-layout KIVI regions only: per-channel K scales (Gk == 1 post-hoc
    or chunk-carry groups with tile-aligned plane spans) and per-token V
    scales; no outlier sidecars; no softcap."""
    if softcap is not None or reg.k_out_idx is not None:
        return False
    per = 8 // nbits
    gk = reg.k.scale.shape[-2]
    gv = reg.v.scale.shape[-2]
    if gv != 1:
        return False
    w = reg.k.codes.shape[-2]          # slot-major region (r4)
    s_pad = w * per
    if s_pad % gk != 0:
        return False
    kg_w = s_pad // gk
    if gk > 1 and w % kg_w != 0:
        # plane starts must be K-group-aligned for the per-plane group
        # index map (chunk carries guarantee this: n_chunks % per == 0)
        return False
    return _pick_tile(w, kg_w, None) % 128 == 0


def _pick_tile(w: int, kg_w: int, tile: int | None) -> int:
    """Largest slot-tile that divides both the plane width and the K
    scale-group width (so every tile folds ONE query row)."""
    t = math.gcd(w, min(DEFAULT_TILE if tile is None else tile, w))
    return math.gcd(t, kg_w)


def region_attention_fused_kernel(
    q: jax.Array,
    reg,
    visible: jax.Array,
    *,
    head_dim: int,
    nbits: int,
    scale: float | None = None,
    tile: int | None = None,
    interpret: bool = False,
):
    """Adapter matching ``ops.quant.quant_region_attention_fused``'s
    contract: (acc [B,H,D], m [B,H], l [B,H]) e-domain partials."""
    b, h, d = q.shape
    hk = reg.k.codes.shape[1]
    g = h // hk
    per = 8 // nbits
    w = reg.k.codes.shape[-2]          # slot-major region (r4)
    s_pad = w * per
    dp = reg.v.codes.shape[-1]
    gk = reg.k.scale.shape[-2]
    g8 = max(8, ((g + 7) // 8) * 8)
    tile = _pick_tile(w, (w * per) // gk, tile)
    sc = scale if scale is not None else 1.0 / math.sqrt(d)

    qg = q.astype(jnp.float32).reshape(b, hk, g, d) * sc
    ksc = reg.k.scale[..., 0]                    # [B,Hk,D,Gk]
    kzc = reg.k.zero[..., 0]
    # scale-folded queries + zero-term bias, one row per K slot-group
    qs = qg[:, :, None] * jnp.moveaxis(ksc, -1, 2)[:, :, :, None]
    zb = jnp.einsum("bkgd,bkdG->bkGg", qg, kzc,
                    preferred_element_type=jnp.float32)
    qs = jnp.pad(qs, ((0, 0), (0, 0), (0, 0), (0, g8 - g), (0, 0)))
    zb = jnp.pad(zb, ((0, 0), (0, 0), (0, 0), (0, g8 - g)))
    zb = jnp.broadcast_to(zb[..., None], zb.shape + (128,))

    mask = visible
    if mask.shape[-1] != s_pad:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - mask.shape[-1])))
    bhn = b * hk
    vs = reg.v.scale[..., 0, 0].reshape(bhn, per, w)
    vz = reg.v.zero[..., 0, 0].reshape(bhn, per, w)
    acc, m, l = quant_fused_attention_pa(
        qs.astype(jnp.bfloat16).reshape(bhn, gk, g8, d),
        zb.reshape(bhn, gk, g8, 128),
        jnp.swapaxes(reg.k.codes, -1, -2).reshape(bhn, d, w),
        reg.v.codes.reshape(bhn, w, dp),
        vs, vz,
        mask.astype(jnp.int8).reshape(bhn, per, w),
        nbits=nbits, head_dim=head_dim, tile=tile, interpret=interpret,
    )
    acc = acc.reshape(b, hk, g8, dp)[:, :, :g, :head_dim]
    m = m.reshape(b, hk, g8, 128)[:, :, :g, 0]
    l = l.reshape(b, hk, g8, 128)[:, :, :g, 0]
    return (acc.reshape(b, h, head_dim), m.reshape(b, h), l.reshape(b, h))
