"""Grouped KV quantization (KIVI / KVQuant behaviors) in pure JAX.

The reference delegates to HQQ (asymmetric min/max affine quantization with
``q_group_size=64`` along ``axis_key=1``; run_longbench.py:287) and, for
KVQuant, zeroes |x| > 6.0 outliers before quantization and re-injects them
after dequantization from a sparse sidecar (quantcache.py:51-58).

TPU-native differences:
- Static shapes: the reference's unbounded sparse outlier sidecar becomes a
  fixed per-row budget of (index, value) pairs — exact whenever a row has
  <= budget outliers (threshold 6 makes them rare), strictly bounded memory.
- int4/int2 codes are bit-packed into int8 lanes for HBM residency; dequant
  runs on the fly inside the decode step (XLA-fused; a Pallas fused
  dequant-attention kernel is the follow-on).
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


def _pack(vals: jax.Array, nbits: int, axis: int = -1) -> jax.Array:
    """Pack unsigned ints < 2^nbits along ``axis`` into int8, PLANAR layout.

    Byte j holds positions {j + p*(n/per)} in bit-plane p (NOT adjacent
    positions): unpacking is then ``per`` shifted copies + one contiguous
    concat instead of an element interleave, which costs lane-granular
    relayout passes on TPU in both XLA and Mosaic (measured: interleaved
    int4 KIVI decode ran at HALF the int8 rate despite half the bytes —
    BASELINE r2aw).  ``axis`` need not be the minor axis (the V region
    packs along SLOTS while its quant groups run along channels)."""
    if nbits == 8:
        return vals.astype(jnp.int8)
    per = 8 // nbits
    axis = axis % vals.ndim
    n = vals.shape[axis]
    assert n % per == 0, (n, per)
    w = n // per
    u = vals.astype(jnp.uint8)
    planes = [
        jax.lax.slice_in_dim(u, p * w, (p + 1) * w, axis=axis)
        for p in range(per)
    ]
    packed = planes[0]
    for p in range(1, per):
        packed = packed | (planes[p] << jnp.uint8(p * nbits))
    return packed.astype(jnp.int8)


def _unpack(codes: jax.Array, nbits: int, axis: int = -1) -> jax.Array:
    if nbits == 8:
        return codes.astype(jnp.uint8).astype(jnp.int32)
    per = 8 // nbits
    u = codes.astype(jnp.uint8)
    mask = jnp.uint8((1 << nbits) - 1)
    planes = [((u >> jnp.uint8(p * nbits)) & mask).astype(jnp.int32)
              for p in range(per)]
    return jnp.concatenate(planes, axis=axis)


def quantize(
    x: jax.Array,
    *,
    nbits: int,
    group_size: int = 64,
    outlier_threshold: float | None = None,
    pack_axis: int = -1,
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
        codes=_pack(codes, nbits, axis=pack_axis),
        scale=scale.astype(jnp.float32),
        zero=mn.astype(jnp.float32),
        outliers=outliers,
    )


def dequantize(qt: QuantizedTensor, *, nbits: int, group_size: int = 64,
               dtype=jnp.bfloat16, pack_axis: int = -1) -> jax.Array:
    codes = _unpack(qt.codes, nbits, axis=pack_axis)
    *lead, n = codes.shape
    g = codes.reshape(*lead, n // group_size, group_size).astype(jnp.float32)
    x = g * qt.scale + qt.zero
    x = x.reshape(*lead, n)
    if qt.outliers is not None:
        x = jnp.where(qt.outliers != 0, qt.outliers.astype(jnp.float32), x)
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# KV-cache quantization (KIVI / KVQuant layouts)
# ---------------------------------------------------------------------------


class QuantizedKVRegion(NamedTuple):
    """One cache region (the post-compaction prefill slots) in quantized form.

    KIVI layout (run_longbench.py:287 ``axis_key: 1``): KEYS are grouped
    along the token/slot axis (per-channel scales — key channels have stable
    per-channel magnitude), VALUES along the channel axis (per-token scales).

    KVQuant (quantcache.py:51-58) additionally extracts |x| > threshold
    outliers before quantization.  The reference keeps them as an unbounded
    sparse COO sidecar; under static shapes we keep a fixed per-row budget
    of (index, value) pairs — exact whenever a row has <= budget outliers
    (threshold 6.0 makes them rare), strictly bounded memory.
    """

    k: QuantizedTensor         # grouped along slots (transposed layout)
    v: QuantizedTensor         # grouped along channels
    k_out_idx: jax.Array | None  # [B,H,S,budget] int32 channel ids (-1 = none)
    k_out_val: jax.Array | None  # [B,H,S,budget] bf16
    v_out_idx: jax.Array | None
    v_out_val: jax.Array | None


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _extract_outliers(x: jax.Array, threshold: float, budget: int):
    """Extract the top-``budget`` |x| > threshold per row into an (idx,
    val) sidecar and zero ONLY those entries.

    A row with more than ``budget`` outliers keeps the excess IN the
    dense tensor — it stretches that group's quant grid instead of being
    deleted (zeroing unsaved values, the pre-r4 behavior, lost them
    outright: the accuracy-proxy test measured the sidecar HURTING on
    outlier-heavy keys).  Rows within budget behave exactly as before
    (and exactly as the reference's unbounded sidecar, quantcache.py:
    51-58 — the A/B exactness tests pin that case)."""
    mag = jnp.abs(x)
    is_out = mag > threshold
    vals, idx = jax.lax.top_k(jnp.where(is_out, mag, -1.0), budget)
    take = jnp.take_along_axis(x, idx, axis=-1)
    valid = vals > 0
    out_idx = jnp.where(valid, idx, -1).astype(jnp.int32)
    out_val = jnp.where(valid, take, 0.0).astype(jnp.bfloat16)
    *lead, d = x.shape
    xf = x.reshape(-1, d)
    idxf = out_idx.reshape(-1, budget)
    rows = jnp.arange(xf.shape[0])[:, None]
    safe = jnp.maximum(idxf, 0)
    cur = jnp.take_along_axis(xf, safe, axis=-1)
    xf = xf.at[rows, safe].set(jnp.where(idxf >= 0, 0.0, cur))
    return xf.reshape(*lead, d), out_idx, out_val


def _inject_outliers(x: jax.Array, idx: jax.Array, val: jax.Array) -> jax.Array:
    """Scatter the (index, value) sidecar back into the last axis."""
    *lead, d = x.shape
    budget = idx.shape[-1]
    xf = x.reshape(-1, d)
    idxf = idx.reshape(-1, budget)
    valf = val.reshape(-1, budget)
    rows = jnp.arange(xf.shape[0])[:, None]
    safe = jnp.maximum(idxf, 0)
    cur = jnp.take_along_axis(xf, safe, axis=-1)
    new = jnp.where(idxf >= 0, valf.astype(x.dtype), cur)
    xf = xf.at[rows, safe].set(new)
    return xf.reshape(*lead, d)


def quantize_kv_region(
    k: jax.Array,
    v: jax.Array,
    *,
    nbits: int,
    group_size: int = 64,
    outlier_threshold: float | None = None,
    outlier_budget: int = 8,
    layout: str = "group",
) -> QuantizedKVRegion:
    """Quantize a compacted [B, H, S, D] prefill region (slots never change
    after compaction, so this is a one-shot — no rolling re-quantization like
    quantcache.py:83-92 needs).

    Both K and V codes are PLANAR-packed along the SLOT axis (K codes
    [B,H,D,S_pad/per], V codes [B,H,S_pad/per,D_pad]): byte j holds slots
    {j + p*(S_pad/per)}, so a decode-time unpack is ``per`` shifted copies
    whose planes just split the softmax/PV reduction — no element
    interleave, no concat in the Pallas kernel.  Quant GROUPS keep the
    KIVI axes regardless (K per-channel along slots, V per-token along
    channels).  S_pad is rounded to ``group_size * per`` so every plane is
    group-aligned.

    ``layout="pa"`` (per-axis) widens each group to its WHOLE axis — K
    scales become one (channel) value across all slots, V scales one
    (token) value across all channels: exactly the KIVI paper's
    per-channel-K / per-token-V axes without the reference's HQQ group-64
    refinement.  The payoff is at decode: per-axis scales fold into the
    query / probability vectors, so attention over the region never
    materialises a dequantized copy (see
    :func:`quant_region_attention_fused`)."""
    if layout not in ("group", "pa"):
        raise ValueError(f"layout must be group|pa, got {layout!r}")
    b, h, s, d = k.shape
    per = 8 // nbits
    k_oi = k_ov = v_oi = v_ov = None
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if outlier_threshold is not None:
        kf, k_oi, k_ov = _extract_outliers(kf, outlier_threshold, outlier_budget)
        vf, v_oi, v_ov = _extract_outliers(vf, outlier_threshold, outlier_budget)
    # keys: group + pack along slots (grid computed in the [B,H,D,S_pad]
    # orientation), then store the codes SLOT-MAJOR ([B,H,S_pad/per,D],
    # matching V's orientation): the decode dots contract D, and XLA
    # wants the contracted axis minor — the old channel-major buffer was
    # relayout-copied wholesale (4 GB per program at 128k kivi8, the
    # r4b/r4d OOMs).  Scales/zeros keep their [B,H,D,G,1] shapes.
    s_pad = _round_up(s, group_size * per)
    kt = jnp.swapaxes(kf, 2, 3)
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, 0), (0, s_pad - s)))
    kq = quantize(kt, nbits=nbits,
                  group_size=s_pad if layout == "pa" else group_size)
    kq = kq._replace(codes=jnp.swapaxes(kq.codes, -1, -2))
    # values: group along channels (d is a multiple of 64 for all our
    # models), pack along SLOTS (padded to the same plane width as K)
    d_pad = _round_up(d, group_size)
    vp = jnp.pad(vf, ((0, 0), (0, 0), (0, s_pad - s), (0, d_pad - d)))
    vq = quantize(vp, nbits=nbits,
                  group_size=d_pad if layout == "pa" else group_size,
                  pack_axis=-2)
    return QuantizedKVRegion(
        k=kq, v=vq, k_out_idx=k_oi, k_out_val=k_ov,
        v_out_idx=v_oi, v_out_val=v_ov,
    )


def dequantize_kv_region(
    reg: QuantizedKVRegion, *, num_slots: int, head_dim: int, nbits: int,
    group_size: int = 64, dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """-> (k [B,H,num_slots,head_dim], v likewise); the static sizes undo
    the group padding applied at quantization time.  Group sizes are
    INFERRED from the scale shapes (so both the ``group`` and per-axis
    ``pa`` layouts of :func:`quantize_kv_region` roundtrip); the
    ``group_size`` argument is kept for call-site compatibility."""
    del group_size  # inferred below
    per = 8 // nbits
    s_pad = reg.k.codes.shape[-2] * per        # codes are slot-major
    kg = s_pad // reg.k.scale.shape[-2]
    vg = reg.v.codes.shape[-1] // reg.v.scale.shape[-2]
    kcm = reg.k._replace(codes=jnp.swapaxes(reg.k.codes, -1, -2))
    kt = dequantize(kcm, nbits=nbits, group_size=kg, dtype=jnp.float32)
    k = jnp.swapaxes(kt, 2, 3)[:, :, :num_slots, :]
    v = dequantize(reg.v, nbits=nbits, group_size=vg,
                   dtype=jnp.float32, pack_axis=-2)
    v = v[:, :, :num_slots, :head_dim]
    if reg.k_out_idx is not None:
        k = _inject_outliers(k, reg.k_out_idx, reg.k_out_val)
    if reg.v_out_idx is not None:
        v = _inject_outliers(v, reg.v_out_idx, reg.v_out_val)
    return k.astype(dtype), v.astype(dtype)


def quant_region_attention_partials(
    q: jax.Array,
    reg: QuantizedKVRegion,
    visible: jax.Array,
    *,
    num_slots: int,
    head_dim: int,
    nbits: int,
    group_size: int = 64,
    chunk: int = 4096,
    scale: float | None = None,
    softcap: float | None = None,
):
    """Online-softmax partials over a KIVI region, dequantizing one slot
    CHUNK at a time inside a ``lax.scan``.

    The one-shot path (``dequantize_kv_region`` + concat + dense attention)
    materialises a full bf16 copy of the region in HBM every decode step —
    at 32k fullkv d32 that is ~3x the bf16 cache traffic and decode
    measured 10.4 tok/s vs 49.4 for the bf16 cache (logs/tpu_r2au2).
    Scanning ``chunk``-slot windows keeps the dequantized bf16 tile small
    enough for XLA to fuse into the chunk's QK/PV dots, so HBM traffic
    approaches the packed-code bytes — the point of cache quantization on
    a bandwidth-bound decode.  KIVI only (outlier sidecars stay one-shot).

    Args:
      q: [B, H, D] query (unscaled).
      visible: [B, Hk, num_slots] slot validity.
    Returns (acc [B,H,D] f32, m [B,H] f32, l [B,H] f32) — merge with
    :func:`ops.attention.merge_attention_partials`.
    """
    import math

    from .attention import decode_attention_partials

    assert reg.k_out_idx is None and reg.v_out_idx is None, "KIVI only"
    b, h, d = q.shape
    per = 8 // nbits
    s_pad = reg.k.codes.shape[-2] * per        # codes are slot-major
    w = s_pad // per  # plane width in slots (planar packing, see _pack)
    # chunks must hold whole group-aligned planes (quantize_kv_region pads
    # S to group*per, so the gcd below stays a multiple of the alignment)
    align = group_size * per
    chunk = max(align, min(chunk, s_pad) // align * align)
    if s_pad % chunk != 0:
        chunk = math.gcd(s_pad, chunk)
    assert chunk % align == 0, (chunk, group_size, per)
    nchunks = s_pad // chunk
    hk = reg.k.codes.shape[1]

    mask = visible
    if mask.shape[-1] != s_pad:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - mask.shape[-1])))

    kcodes, ksc, kz = reg.k.codes, reg.k.scale, reg.k.zero
    vc, vsc, vz = reg.v.codes, reg.v.scale, reg.v.zero

    def _planes(x, axis, unit, c):
        """Slice chunk ``c``'s ``per`` plane ranges along ``axis``.

        A byte slice of the planar-packed codes covers ``per`` slot ranges
        (plane p: [p*w + c*chunk/per, +chunk/per)); the UNPACKED arrays
        (scales, zeros, mask) are sliced at those ranges and concatenated
        in the same plane order.  ``unit`` = slots per element along
        ``axis`` (1 for slot axes, group_size for group axes)."""
        step = chunk // (per * unit)
        wpl = w // unit
        parts = [jax.lax.dynamic_slice_in_dim(x, p * wpl + c * step, step,
                                              axis=axis)
                 for p in range(per)]
        return parts[0] if per == 1 else jnp.concatenate(parts, axis=axis)

    def body(carry, c):
        acc, m, l = carry
        kc_c = jnp.swapaxes(jax.lax.dynamic_slice_in_dim(
            kcodes, c * (chunk // per), chunk // per, axis=2), 2, 3)
        ks_c = _planes(ksc, 3, group_size, c)
        kz_c = _planes(kz, 3, group_size, c)
        kt = dequantize(QuantizedTensor(kc_c, ks_c, kz_c, None),
                        nbits=nbits, group_size=group_size,
                        dtype=jnp.bfloat16)            # [B,Hk,D,chunk]
        k_c = jnp.swapaxes(kt, 2, 3)                   # [B,Hk,chunk,D]
        vc_c = jax.lax.dynamic_slice_in_dim(
            vc, c * (chunk // per), chunk // per, axis=2)
        vs_c = _planes(vsc, 2, 1, c)
        vz_c = _planes(vz, 2, 1, c)
        v_c = dequantize(QuantizedTensor(vc_c, vs_c, vz_c, None),
                         nbits=nbits, group_size=group_size,
                         dtype=jnp.bfloat16,
                         pack_axis=-2)[..., :head_dim]
        m_c = _planes(mask, 2, 1, c)
        acc2, m2, l2 = decode_attention_partials(
            q, k_c, v_c, m_c, scale=scale, softcap=softcap)
        m_new = jnp.maximum(m, m2)
        w1 = jnp.where(m <= _NEG_HALF, 0.0,
                       jnp.exp(jnp.minimum(m - m_new, 0.0)))
        w2 = jnp.where(m2 <= _NEG_HALF, 0.0,
                       jnp.exp(jnp.minimum(m2 - m_new, 0.0)))
        return (acc * w1[..., None] + acc2 * w2[..., None],
                m_new, l * w1 + l2 * w2), None

    neg = float(jnp.finfo(jnp.float32).min)
    carry0 = (
        jnp.zeros((b, h, head_dim), jnp.float32),
        jnp.full((b, h), neg, jnp.float32),
        jnp.zeros((b, h), jnp.float32),
    )
    (acc, m, l), _ = jax.lax.scan(
        body, carry0, jnp.arange(nchunks, dtype=jnp.int32))
    return acc, m, l


_NEG_HALF = float(jnp.finfo(jnp.float32).min) / 2


def quant_region_attention_fused(
    q: jax.Array,
    reg: QuantizedKVRegion,
    visible: jax.Array,
    *,
    num_slots: int,
    head_dim: int,
    nbits: int,
    scale: float | None = None,
    softcap: float | None = None,
):
    """Online-softmax partials over a KIVI region WITHOUT materialising a
    dequantized K/V copy.

    The chunked scan (:func:`quant_region_attention_partials`) dequantizes
    one bf16 chunk at a time, and XLA materialises each chunk through HBM
    between the dequant fusion and the dots — measured ~5x the packed-code
    bytes at int4, leaving long-region decode at ~40% of its byte roofline
    (BASELINE r2ay / round 3).  Here the affine dequant is FACTORED through
    the attention algebra instead:

      K side:  s_t = sum_d q_d (c_dt * ks_{d,g(t)} + kz_{d,g(t)})
                   = sum_g [ (q (.) ks_:,g) @ c_{:,t in g} ] + (q @ kz)_{g(t)}
        — the scale folds into the QUERY per slot-group (a [G_q, D]-row
        rescale) and the zero term is a rank-1 per-group bias, so the only
        large operand the dot reads is the RAW code plane.
      V side:  pv_e = sum_t p_t (c_te * vs_{t,g(e)} + vz_{t,g(e)})
                    = sum_g [ (p (.) vs_:,g) @ c_{t,e in g} ] + sum_t p_t vz_t
        — scales fold into the PROBABILITIES.

    With the per-axis layout (``quantize_kv_region(layout="pa")``: one K
    group per channel, one V group per token — the KIVI paper's axes) the
    group dimension vanishes and each side is ONE clean
    [G_q, D] x [D, S] / [G_q, S] x [S, D] matmul per kv-head over packed
    codes: HBM traffic = codes + scales, the quantization bandwidth win
    realised at decode.  Grouped layouts batch the same einsum over their
    group axis.  Bit-planes (planar packing, see ``_pack``) are processed
    as ``per`` independent slot spans whose logits concatenate in planar
    slot order.  KIVI only (outlier sidecars keep the dequant paths).

    Args/returns match :func:`quant_region_attention_partials`.
    """
    import math

    assert reg.k_out_idx is None and reg.v_out_idx is None, "KIVI only"
    b, h, d = q.shape
    hk = reg.k.codes.shape[1]
    g = h // hk
    per = 8 // nbits
    w = reg.k.codes.shape[-2]          # plane width in slots (slot-major)
    s_pad = w * per
    dp = reg.v.codes.shape[-1]
    gk = reg.k.scale.shape[-2]         # K slot-groups ("pa": 1)
    gv = reg.v.scale.shape[-2]         # V channel-groups ("pa": 1)
    assert gk == 1 or gk % per == 0, (gk, per)

    mask = visible
    if mask.shape[-1] != s_pad:
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, s_pad - mask.shape[-1])))
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    qg = q.astype(jnp.float32).reshape(b, hk, g, d) * sc

    ku = reg.k.codes.astype(jnp.uint8)
    vu = reg.v.codes.astype(jnp.uint8)
    mb = jnp.uint8((1 << nbits) - 1)
    ksc, kzc = reg.k.scale[..., 0], reg.k.zero[..., 0]   # [B,Hk,D,Gk]
    vsc, vzc = reg.v.scale[..., 0], reg.v.zero[..., 0]   # [B,Hk,S,Gv]

    # ---- logits (scale folded into the query) ----
    import os as _os

    multiplane = (per > 1 and gk == 1 and gv == 1
                  and _os.environ.get("PKV_QUANT_MULTIPLANE", "0") == "1")
    if multiplane:
        # r4 probe (VERDICT #1): batch the per-plane einsums into ONE dot
        # per side — the plane shifts concatenate into a single unpacked
        # operand, so the packed bytes are read once (not ``per`` times)
        # and the MXU sees one [G,D]x[D,per*W] dot instead of ``per``
        # skinny ones.  pa layout only (plane-independent scales); the
        # planar concat order matches the loop's exactly.
        cp_all = jnp.concatenate(
            [((ku >> jnp.uint8(p * nbits)) & mb).astype(jnp.bfloat16)
             for p in range(per)], axis=-2)          # [B,Hk,per*W,D]
        qs = (qg * ksc[:, :, None, :, 0]).astype(jnp.bfloat16)
        s = jnp.einsum("bkqd,bkwd->bkqw", qs, cp_all,
                       preferred_element_type=jnp.float32)
        z = jnp.einsum("bkqd,bkd->bkq", qg, kzc[..., 0],
                       preferred_element_type=jnp.float32)
        s = s + z[..., None]
    s_planes = []
    for p in range(per if not multiplane else 0):
        cp = ((ku >> jnp.uint8(p * nbits)) & mb).astype(jnp.bfloat16)
        if gk == 1:
            qs = (qg * ksc[:, :, None, :, 0]).astype(jnp.bfloat16)
            s_p = jnp.einsum("bkqd,bkwd->bkqw", qs, cp,
                             preferred_element_type=jnp.float32)
            z = jnp.einsum("bkqd,bkd->bkq", qg, kzc[..., 0],
                           preferred_element_type=jnp.float32)
            s_p = s_p + z[..., None]
        else:
            kg_sz = s_pad // gk
            gpl = w // kg_sz           # groups per plane (planar-aligned)
            ks_p = jax.lax.slice_in_dim(ksc, p * gpl, (p + 1) * gpl, axis=-1)
            kz_p = jax.lax.slice_in_dim(kzc, p * gpl, (p + 1) * gpl, axis=-1)
            qs = (qg[..., None] * ks_p[:, :, None, :, :]).astype(
                jnp.bfloat16)                       # [B,Hk,Gq,D,gpl]
            cp5 = cp.reshape(b, hk, gpl, kg_sz, d)
            s5 = jnp.einsum("bkqdg,bkgtd->bkqgt", qs, cp5,
                            preferred_element_type=jnp.float32)
            z5 = jnp.einsum("bkqd,bkdg->bkqg", qg, kz_p,
                            preferred_element_type=jnp.float32)
            s_p = (s5 + z5[..., None]).reshape(b, hk, g, w)
        s_planes.append(s_p)
    if not multiplane:
        s = jnp.concatenate(s_planes, axis=-1)      # planar slot order
    if softcap is not None:
        s = jnp.tanh(s * (1.0 / softcap)) * softcap
    valid = mask[:, :, None, :]
    s = jnp.where(valid, s, float(jnp.finfo(jnp.float32).min))
    m = jnp.max(s, axis=-1)                         # [B,Hk,Gq]
    pe = jnp.where(valid,
                   jnp.exp(s - jnp.maximum(m, _NEG_HALF)[..., None]), 0.0)
    l = pe.sum(-1)

    # ---- PV (scale folded into the probabilities) ----
    if multiplane:
        vp_all = jnp.concatenate(
            [((vu >> jnp.uint8(p * nbits)) & mb).astype(jnp.bfloat16)
             for p in range(per)], axis=2)           # [B,Hk,per*W,E]
        ps = (pe * vsc[:, :, None, :, 0]).astype(jnp.bfloat16)
        acc = jnp.einsum("bkqw,bkwe->bkqe", ps, vp_all,
                         preferred_element_type=jnp.float32)
        zv = jnp.einsum("bkqw,bkw->bkq", pe, vzc[..., 0],
                        preferred_element_type=jnp.float32)
        acc = acc + zv[..., None]
        return (acc[..., :head_dim].reshape(b, h, head_dim),
                m.reshape(b, h), l.reshape(b, h))
    acc = jnp.zeros((b, hk, g, dp), jnp.float32)
    for p in range(per):
        vp_c = ((vu >> jnp.uint8(p * nbits)) & mb).astype(jnp.bfloat16)
        pe_p = jax.lax.slice_in_dim(pe, p * w, (p + 1) * w, axis=-1)
        vs_p = jax.lax.slice_in_dim(vsc, p * w, (p + 1) * w, axis=2)
        vz_p = jax.lax.slice_in_dim(vzc, p * w, (p + 1) * w, axis=2)
        if gv == 1:
            ps = (pe_p * vs_p[:, :, None, :, 0]).astype(jnp.bfloat16)
            acc_p = jnp.einsum("bkqw,bkwe->bkqe", ps, vp_c,
                               preferred_element_type=jnp.float32)
            zv = jnp.einsum("bkqw,bkw->bkq", pe_p, vz_p[..., 0],
                            preferred_element_type=jnp.float32)
            acc_p = acc_p + zv[..., None]
        else:
            vg_sz = dp // gv
            ps5 = (pe_p[..., None] * vs_p[:, :, None, :, :]).astype(
                jnp.bfloat16)                       # [B,Hk,Gq,W,Gv]
            vp5 = vp_c.reshape(b, hk, w, gv, vg_sz)
            acc5 = jnp.einsum("bkqwg,bkwge->bkqge", ps5, vp5,
                              preferred_element_type=jnp.float32)
            zv5 = jnp.einsum("bkqw,bkwg->bkqg", pe_p, vz_p,
                             preferred_element_type=jnp.float32)
            acc_p = (acc5 + zv5[..., None]).reshape(b, hk, g, dp)
        acc = acc + acc_p
    return (acc[..., :head_dim].reshape(b, h, head_dim),
            m.reshape(b, h), l.reshape(b, h))


def quant_region_attention_fused_multi(
    q: jax.Array,
    reg,
    visible: jax.Array,
    *,
    num_slots: int,
    head_dim: int,
    nbits: int,
    scale: float | None = None,
    softcap: float | None = None,
):
    """T-query wrapper of :func:`quant_region_attention_fused` for
    speculative verification: the quantized region is strictly PAST every
    draft query, so all T rows share the region visibility mask and T
    folds straight into the per-kv-head query-group axis of the fused
    einsums — one verify costs ~one decode-step region pass (the codes
    are read once for all T rows).

    Args: q [B, H, T, D]; rest as the single-query form.
    Returns (acc [B,H,T,head_dim], m [B,H,T], l [B,H,T]) f32.
    """
    b, h, t, d = q.shape
    # [B,H,T,D] -> [B, H*T, D]: the (H, T) flatten keeps queries of the
    # same kv head contiguous, so the internal (b, hk, g*T, d) reshape is
    # exactly the grouped layout the einsums expect.
    acc, m, l = quant_region_attention_fused(
        q.reshape(b, h * t, d), reg, visible, num_slots=num_slots,
        head_dim=head_dim, nbits=nbits, scale=scale, softcap=softcap,
    )
    return (acc.reshape(b, h, t, head_dim), m.reshape(b, h, t),
            l.reshape(b, h, t))
