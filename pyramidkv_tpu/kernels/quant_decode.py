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

Layout (from ``ops.quant.quantize_kv_region``): codes are PLANAR-packed
along the SLOT axis — byte j holds slots {j + p*(S/per)} in bit-plane p:
  K grouped along slots (KIVI axis_key=1):  codes [BH, D, S/per] int8,
    scale/zero [BH, D, S/64];
  V grouped along channels: codes [BH, S/per, Dp], scale/zero [BH, S, Dp/64].

Planar packing makes the in-kernel unpack ``per`` shifted copies whose
planes simply SPLIT the softmax/PV reduction (per-plane logit tiles merged
under one max; per-plane PV partial dots summed) — no element interleave
and no lane concat.  The previous pairwise layout needed the interleave
expressed as ``per`` 0/1 scatter MATMULS (O(D * S^2 / per) f32 FLOPs),
which capped the kernel at small regions.

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


def _plane_f32(codes_u32, nbits, p):
    """Bit-plane ``p`` of uint8-semantics int32 codes as f32 (planar
    packing: the plane IS a contiguous span of positions — no interleave)."""
    if nbits == 8:
        return codes_u32.astype(jnp.float32)
    return ((codes_u32 >> (p * nbits)) & ((1 << nbits) - 1)).astype(
        jnp.float32)


def _u32(codes):
    """uint8 semantics on an int8 carrier, 32-bit ops only (Mosaic has no
    u8 vector arithmetic)."""
    u = codes.astype(jnp.int32)
    return jnp.where(u < 0, u + 256, u)


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
    kc_ref,       # [1, D, S/per] int8 (slot-planar)
    ks_ref,       # [1, D, G] f32
    kz_ref,       # [1, D, G] f32
    vc_ref,       # [1, S/per, Dp] int8 (slot-planar)
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
    per = 8 // nbits
    w = s_pad // per          # slots per plane
    gpl = w // group          # K scale groups per plane
    q = q_ref[0][:1]  # [1, D] f32 (already scaled by 1/sqrt(D))

    # ---- per-plane logits (a plane is a CONTIGUOUS slot span) ----
    ku = _u32(kc_ref[0])               # [D, S/per]
    s_planes, valid_planes = [], []
    for p in range(per):
        khat_p = _plane_f32(ku, nbits, p)          # [D, w]
        ks_p = jax.lax.slice_in_dim(ks_ref[0], p * gpl, (p + 1) * gpl,
                                    axis=1)
        kz_p = jax.lax.slice_in_dim(kz_ref[0], p * gpl, (p + 1) * gpl,
                                    axis=1)
        khat_p = (khat_p * _expand_groups(ks_p, group, w)
                  + _expand_groups(kz_p, group, w))
        s_p = jax.lax.dot_general(
            q, khat_p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, w]
        valid_p = jax.lax.slice_in_dim(
            mask_ref[0][:1], p * w, (p + 1) * w, axis=1) > 0
        s_planes.append(jnp.where(valid_p, s_p, _NEG_INF))
        valid_planes.append(valid_p)

    m = s_planes[0].max(axis=1, keepdims=True)
    for s_p in s_planes[1:]:
        m = jnp.maximum(m, s_p.max(axis=1, keepdims=True))
    m_safe = jnp.maximum(m, _NEG_INF / 2)

    # ---- per-plane PV partials share the reduction: no concat needed ----
    vu = _u32(vc_ref[0])               # [S/per, Dp]
    l = jnp.zeros_like(m)
    pv = None
    for p in range(per):
        pe = jnp.where(valid_planes[p],
                       jnp.exp(s_planes[p] - m_safe), 0.0)   # [1, w]
        l = l + jnp.sum(pe, axis=1, keepdims=True)
        vhat_p = _plane_f32(vu, nbits, p)                    # [w, Dp]
        vs_p = jax.lax.slice_in_dim(vs_ref[0], p * w, (p + 1) * w, axis=0)
        vz_p = jax.lax.slice_in_dim(vz_ref[0], p * w, (p + 1) * w, axis=0)
        dp = vhat_p.shape[-1]
        vhat_p = (vhat_p * _expand_groups(vs_p, group, dp)
                  + _expand_groups(vz_p, group, dp))[:, :d]
        pv_p = jax.lax.dot_general(
            pe, vhat_p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [1, D]
        pv = pv_p if pv is None else pv + pv_p

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
      kc/ks/kz: key codes [B, Hk, D, S/per] int8 + scale/zero [B, Hk, D, S/64]
        (slot-planar packing: see ``ops.quant._pack``).
      vc/vs/vz: value codes [B, Hk, S/per, Dp] (slot-planar) + scale/zero
        [B, Hk, S, Dp/64].
      mask: [B, Hk, S] bool — slot validity over the PADDED region.

    Returns (acc [B, H, D] f32, m [B, H] f32, l [B, H] f32) such that the
    region's attention output is acc / l after merging with other partials.

    Since r4 the REGION stores K codes slot-major ([B, Hk, S/per, D] —
    the layout the default XLA factored path wants natively); this
    opt-in kernel keeps its channel-major BlockSpecs and transposes at
    entry (an explicit small copy on an already-counterfactual path).
    """
    kc = jnp.swapaxes(kc, -1, -2)      # slot-major region -> [B,Hk,D,S/per]
    b, h, d = q.shape
    hk = kc.shape[1]
    g = h // hk
    per = 8 // nbits
    s_pad = kc.shape[-1] * per
    dp = vc.shape[-1]
    # quantize_kv_region slot-pads BOTH K and V codes to group*per
    assert vc.shape[2] * per == s_pad, (vc.shape, s_pad)
    if mask.shape[-1] != s_pad:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - mask.shape[-1])))

    scale = 1.0 / math.sqrt(d)
    qr = (q.astype(jnp.float32) * scale).reshape(b * h, 1, d)
    qr = jnp.broadcast_to(qr, (b * h, 8, d))
    kcr = kc.reshape(b * hk, d, s_pad // per)
    ksr = ks.reshape(b * hk, d, s_pad // group_size)
    kzr = kz.reshape(b * hk, d, s_pad // group_size)
    vcr = vc.reshape(b * hk, s_pad // per, dp)
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


# ---------------------------------------------------------------------------
# Tiled variant: long regions (32k-64k fullkv), grid over slot tiles
# ---------------------------------------------------------------------------

#: Mosaic requires DYNAMIC (grid-dependent) lane offsets to be provably
#: 128-aligned, so every per-plane operand (scales, zeros, V rows, mask)
#: is delivered through BlockSpec index maps instead of in-kernel dynamic
#: slices; a K-scale block is exactly 128 lanes when the tile holds
#: 128 groups PER PLANE: tile = 128 * group * per slots (8192 bytes).
_TILE_BYTES = 8192


def tiled_kernel_tile(nbits: int, group_size: int) -> int:
    """Slot-tile size of the tiled kernel for this (nbits, group) combo."""
    return 128 * group_size * (8 // nbits)


def _tiled_kernel(
    *refs,
    nbits: int,
    group: int,
    head_dim: int,
    softcap: float | None,
    sub: int,
    mm_bf16: bool,
):
    """One grid step = one (kv-head row, slot tile).

    refs layout (inputs, outputs, scratch):
      q [1,Gp,D] f32 (pre-scaled), kc [1,D,TB] int8, vc [1,TB,Dp] int8,
      then per bit-plane p: ks/kz [1,D,TBG] f32, vs/vz [1,Gv,TB] f32
      (LANE-major: slots on lanes — a [TB,Gv] block would pad Gv=2 lanes
      to 128, i.e. 4 MiB of VMEM per 8192-slot block; measured as a
      body-independent 16.25 MiB/plane scoped floor), mask [1,1,TB] i32 —
      each plane's block is selected by its OWN BlockSpec index map
      (plane p of tile t = block p*nt + t).
      outputs acc [1,Gp,D], m/l [1,Gp,128]; scratch acc/m/l.

    The body is a ``fori_loop`` over ``sub``-byte chunks: Mosaic's scoped
    allocator does NOT reuse stack slots across straight-line temporaries
    (an unrolled loop's iterations SUM — measured identical 16.25 MB/plane
    scoped usage for one flat 8192-byte body and eight unrolled 1024-byte
    sub-bodies), but a fori_loop body is allocated once.  All dynamic
    slice offsets are multiples of ``sub`` (>=256), provably 128-aligned
    on the lane dim.  Scale-group selection out of the tile's [.,TBG]
    block can't be lane-sliced (a chunk is only sub/group = 4..16 lanes),
    so it rides the broadcast matmul: e[g, c] = ((off+c)//group == g)
    built from iota + the loop index, then ``scales @ e`` selects AND
    expands in one MXU contraction.  Codes are read once per chunk and
    shared by all bit-planes.

    vs the chunked XLA scan (ops/quant.py::quant_region_attention_
    partials): the dequantized f32 chunk never leaves VMEM, so HBM
    traffic is the packed codes + scales instead of ~5x that in
    materialised chunk copies (BASELINE r2ay: 2.5x off the bytes
    roofline).
    """
    per = 8 // nbits
    q_ref, kc_ref, vc_ref = refs[0], refs[1], refs[2]
    plane_refs = refs[3:3 + 5 * per]
    acc_out, m_out, l_out = refs[3 + 5 * per:6 + 5 * per]
    acc_ref, m_ref, l_ref, qhat_ref = refs[6 + 5 * per:]
    d = head_dim
    t = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]                       # [Gp, D]
    tb = kc_ref.shape[-1]
    dp = vc_ref.shape[-1]
    gp = q.shape[0]
    assert tb % sub == 0 and sub % group == 0, (tb, sub, group)
    tbg = tb // group
    gsub = sub // group

    # V-side channel-group expansion is chunk-independent: hoisted.
    gv = plane_refs[2].shape[1]
    ev_rows = jax.lax.broadcasted_iota(jnp.int32, (gv, dp), 0)
    ev_cols = jax.lax.broadcasted_iota(jnp.int32, (gv, dp), 1)
    e_v = (ev_cols // group == ev_rows).astype(jnp.float32)

    def _dot(a_, b_):
        return jax.lax.dot_general(
            a_, b_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _dot_t(a_, b_):  # contract dim 0 of both: [G,S]x[G,D] -> [S,D]
        return jax.lax.dot_general(
            a_, b_, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # K-scale folding (once per tile, per plane): a broadcast-by-matmul
    # ks@e_k costs 128 MACs per logit — 16-32x the attention dot itself and
    # measured ~33 ms/step at 64k (f32 MXU).  Instead fold the per-group
    # scale into the QUERY: qhat[g*Gp+r, :] = q[r, :] * ks[:, g], matmul the
    # RAW code plane once per chunk ([gsub*Gp, D] @ [D, sub]), and pick each
    # column's own group row with an iota select — MXU work drops to
    # gsub x the attention dot.  The zero term is rank-1 in d: z_log =
    # (q @ kz)[r, g(j)], one [Gp,TBG] matmul per plane + a tiny broadcast.
    zlog_p = []
    for p in range(per):
        ks_b, kz_b = plane_refs[5 * p], plane_refs[5 * p + 1]
        kst = ks_b[0].T                                  # [TBG, D]
        qhat_ref[p] = (kst[:, None, :] * q[None, :, :]).reshape(tbg * gp, d)
        zlog_p.append(_dot(q, kz_b[0]))                  # [Gp, TBG]

    def body(i, carry):
        m_run, l_run, pv_run = carry
        off = i * sub
        ku = _u32(kc_ref[0, :, pl.ds(off, sub)])         # [D, sub]
        vu = _u32(vc_ref[0, pl.ds(off, sub), :])         # [sub, Dp]
        # chunk-local group index of every column, and its one-hot selects
        rows_s = jax.lax.broadcasted_iota(jnp.int32, (gsub, 1, sub), 0)
        cols_s = jax.lax.broadcasted_iota(jnp.int32, (gsub, 1, sub), 2)
        sel = (cols_s // group == rows_s).astype(jnp.float32)
        rows_z = jax.lax.broadcasted_iota(jnp.int32, (tbg, sub), 0)
        cols_z = jax.lax.broadcasted_iota(jnp.int32, (tbg, sub), 1)
        e_z = ((cols_z + off) // group == rows_z).astype(jnp.float32)
        for p in range(per):
            mask_b = plane_refs[5 * p + 4]
            khat = _plane_f32(ku, nbits, p)              # [D, sub] raw codes
            qh_i = qhat_ref[p, pl.ds(i * gsub * gp, gsub * gp), :]
            if mm_bf16:
                # codes <=255 are exact in bf16; qhat rounds (~0.4% rel) —
                # f32 accumulate.  6x MXU rate vs f32 multi-pass.
                qh_i = qh_i.astype(jnp.bfloat16)
                khat = khat.astype(jnp.bfloat16)
            s_all = _dot(qh_i, khat)                     # [gsub*Gp, sub]
            s = jnp.sum(s_all.reshape(gsub, gp, sub) * sel, axis=0)
            s = s + _dot(zlog_p[p], e_z)                 # [Gp, sub]
            if softcap is not None:
                s = jnp.tanh(s * (1.0 / softcap)) * softcap
            valid = mask_b[0, :, pl.ds(off, sub)] > 0    # [1, sub]
            s = jnp.where(valid, s, _NEG_INF)
            m_c = s.max(axis=1, keepdims=True)
            m_n = jnp.maximum(m_run, m_c)
            m_sf = jnp.maximum(m_n, _NEG_INF / 2)
            a = jnp.exp(jnp.minimum(m_run - m_n, 0.0))
            a = jnp.where(m_run <= _NEG_INF / 2, 0.0, a)
            pe = jnp.where(valid, jnp.exp(s - m_sf), 0.0)  # [Gp, sub]
            vs_b, vz_b = plane_refs[5 * p + 2], plane_refs[5 * p + 3]
            vhat = _plane_f32(vu, nbits, p)
            vs_pi = vs_b[0, :, pl.ds(off, sub)]          # [Gv, sub]
            vz_pi = vz_b[0, :, pl.ds(off, sub)]
            vhat = (vhat * _dot_t(vs_pi, e_v) + _dot_t(vz_pi, e_v))[:, :d]
            pv_run = pv_run * a + _dot(pe, vhat)
            l_run = l_run * a + jnp.sum(pe, axis=1, keepdims=True)
            m_run = m_n
        return m_run, l_run, pv_run

    m_run, l_run, pv_run = jax.lax.fori_loop(
        0, tb // sub, body,
        (jnp.full((gp, 1), _NEG_INF, jnp.float32),
         jnp.zeros((gp, 1), jnp.float32),
         jnp.zeros((gp, d), jnp.float32)),
    )

    # merge the tile's running partials into the cross-tile scratch carry
    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, m_run)
    a_prev = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
    a_prev = jnp.where(m_prev <= _NEG_INF / 2, 0.0, a_prev)
    a_run = jnp.exp(jnp.minimum(m_run - m_new, 0.0))
    a_run = jnp.where(m_run <= _NEG_INF / 2, 0.0, a_run)
    acc_ref[:] = acc_ref[:] * a_prev + pv_run * a_run
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_ref[:, :1] * a_prev + l_run * a_run,
                                l_ref.shape)

    @pl.when(t == nt - 1)
    def _fin():
        acc_out[0] = acc_ref[:]
        m_out[0] = jnp.broadcast_to(m_ref[:, :1], m_out.shape[1:])
        l_out[0] = jnp.broadcast_to(l_ref[:, :1], l_out.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=("nbits", "group_size", "tile", "interpret", "scale",
                     "softcap", "mm_bf16"),
)
def quant_decode_attention_tiled(
    q: jax.Array,
    kc: jax.Array, ks: jax.Array, kz: jax.Array,
    vc: jax.Array, vs: jax.Array, vz: jax.Array,
    mask: jax.Array,
    *,
    nbits: int,
    group_size: int = 64,
    tile: int | None = None,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float | None = None,
    mm_bf16: bool = False,
):
    """Tiled fused dequant decode attention over a LONG quantized region.

    Same contract/layout as :func:`quant_decode_attention` (planar codes),
    but the grid runs (kv-head rows) x (slot tiles) with an online-softmax
    carry, each KV head computing all of its GQA query rows at once —
    dequantization happens exactly once per tile regardless of the group
    size.  K codes arrive slot-major (r4 region layout) and are
    transposed at entry like :func:`quant_decode_attention`.
    Requires ``s_pad % tile == 0`` with the default
    ``tile = tiled_kernel_tile(nbits, group_size)`` (128 scale groups per
    plane per tile, the Mosaic lane-block quantum); the engine falls back
    to the chunked XLA path for unaligned regions.
    """
    import math as _math

    kc = jnp.swapaxes(kc, -1, -2)      # slot-major region -> [B,Hk,D,S/per]
    b, h, d = q.shape
    hk = kc.shape[1]
    g = h // hk
    gp = max(8, ((g + 7) // 8) * 8)
    per = 8 // nbits
    s_pad = kc.shape[-1] * per
    dp = vc.shape[-1]
    gv = vs.shape[-1]
    assert vc.shape[2] * per == s_pad, (vc.shape, s_pad)
    if mask.shape[-1] != s_pad:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - mask.shape[-1])))

    if tile is None:
        tile = tiled_kernel_tile(nbits, group_size)
    assert s_pad % tile == 0 and tile % (group_size * per) == 0, (
        s_pad, tile, group_size, per)
    nt = s_pad // tile
    tb = tile // per                    # tile bytes == plane slots
    tbg = tb // group_size              # scale groups per plane block

    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    qg = (q.astype(jnp.float32) * sc).reshape(b * hk, g, d)
    qg = jnp.pad(qg, ((0, 0), (0, gp - g), (0, 0)))
    kcr = kc.reshape(b * hk, d, s_pad // per)
    ksr = ks.reshape(b * hk, d, s_pad // group_size)
    kzr = kz.reshape(b * hk, d, s_pad // group_size)
    vcr = vc.reshape(b * hk, s_pad // per, dp)
    # LANE-major scale/zero layout ([.., Gv, S]): slots on the lane dim so
    # a block is [Gv->8 sublanes, TB lanes] (256 KB) instead of Gv=2 lanes
    # padded to 128 (4 MiB) — the dominant scoped-VMEM term otherwise.
    vsr = vs.reshape(b * hk, s_pad, gv).swapaxes(1, 2)
    vzr = vz.reshape(b * hk, s_pad, gv).swapaxes(1, 2)
    mr = mask.reshape(b * hk, 1, s_pad).astype(jnp.int32)

    # fori_loop chunk: one body allocation regardless of tile length; sized
    # so per-chunk f32 temporaries ([D, sub] x ~4 per plane) stay ~2 MB
    # total across the in-body plane unroll.
    sub = max(group_size, min(tb, 512 // per))
    while tb % sub:
        sub //= 2
    assert sub % group_size == 0, (sub, group_size)

    # plane p of tile t = lane/sublane block p*nt + t of the shared array
    def kplane(p):
        return pl.BlockSpec((1, d, tbg), lambda bh, t, p=p: (bh, 0, p * nt + t))

    def vplane(p):
        return pl.BlockSpec((1, gv, tb), lambda bh, t, p=p: (bh, 0, p * nt + t))

    def mplane(p):
        return pl.BlockSpec((1, 1, tb), lambda bh, t, p=p: (bh, 0, p * nt + t))

    in_specs = [
        pl.BlockSpec((1, gp, d), lambda bh, t: (bh, 0, 0)),
        pl.BlockSpec((1, d, tb), lambda bh, t: (bh, 0, t)),
        pl.BlockSpec((1, tb, dp), lambda bh, t: (bh, t, 0)),
    ]
    args = [qg, kcr, vcr]
    for p in range(per):
        in_specs += [kplane(p), kplane(p), vplane(p), vplane(p), mplane(p)]
        args += [ksr, kzr, vsr, vzr, mr]

    acc, m, l = pl.pallas_call(
        functools.partial(
            _tiled_kernel, nbits=nbits, group=group_size, head_dim=d,
            softcap=softcap, sub=sub, mm_bf16=mm_bf16,
        ),
        grid=(b * hk, nt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, gp, d), lambda bh, t: (bh, 0, 0)),
            pl.BlockSpec((1, gp, 128), lambda bh, t: (bh, 0, 0)),
            pl.BlockSpec((1, gp, 128), lambda bh, t: (bh, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((gp, d), jnp.float32),
            pltpu.VMEM((gp, 128), jnp.float32),
            pltpu.VMEM((gp, 128), jnp.float32),
            # per-plane scale-folded queries (recomputed each tile)
            pltpu.VMEM((per, tbg * gp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * hk, gp, d), jnp.float32),
            jax.ShapeDtypeStruct((b * hk, gp, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * hk, gp, 128), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return (
        acc[:, :g, :].reshape(b, h, d),
        m[:, :g, 0].reshape(b, h),
        l[:, :g, 0].reshape(b, h),
    )
