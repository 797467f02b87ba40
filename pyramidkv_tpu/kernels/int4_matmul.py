"""Fused dequant x@W kernel (Pallas TPU) for packed-int4 WEIGHTS.

Decode is weight-HBM-bound, and XLA cannot stream sub-byte operands into
the MXU: both the arithmetic mask/shift unpack and a zero-copy bitcast
to native ``jnp.int4`` make XLA materialise full-width weight transients
every step (measured d32 Llama-3-8B fullkv decode: 8.6 and 10.2 tok/s vs
int8's 79.7 — logs/tpu_r2o.jsonl, tpu_r2v.jsonl).  This kernel reads the
PACKED bytes (0.5 byte/param of HBM traffic), sign-extends the two
nibbles in VMEM, and feeds the MXU directly — the int4 analogue of what
XLA's operand-fusion already does for int8.

Layout contract (``models/weights.py::pack_span``): codes int8
``[in, out//2]``, SPAN-PLANAR — byte ``s*128 + p`` holds columns
``s*256 + p`` (low nibble) and ``s*256 + 128 + p`` (high), two's
complement.  The kernel computes two dots per tile against the packed
bytes (``x @ sign_extend_lo`` / ``x @ (b >> 4)``) and assembles the
natural-order output in VMEM from full-lane 128-column blocks
(`_assemble_planar`) — the historical adjacent layout (span 1, byte j =
columns 2j/2j+1) needed a caller-side ELEMENT interleave that cost
~1.0 ms/step of relayout copies at d32 (logs/r3a_trace) and survives
only for odd tiny-test widths.

Scales: per-output-channel (symmetric) applied by the caller after the
interleave; AWQ-style GROUP scales (``[G, out]``) are applied in-kernel
per group-subtile before cross-group accumulation (the dequant factors
out of each group's partial product — weights.py module docstring).

Used for decode-shaped ``x`` (few rows) only; prefill matmuls are
compute-bound and stay on the XLA path where the one-off dequant
transient amortises over the whole prompt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: default tiles — (2048, 2048) with in-kernel sub-chunking measured
#: fastest at the 8B decode shapes (d32 snapkv lm4 137.0 vs 135.0 at
#: (1024, 2048), logs/tpu_r3e; bigger in-blocks lose to Pallas's
#: double-buffered 8 MB code blocks, r3f).  The eligibility guard in
#: models/weights.py checks group divisibility against DEFAULT_BLOCK_IN
#: (the internal halving loop only shrinks it to power-of-two divisors
#: of in_dim, so ``min(DEFAULT_BLOCK_IN, in_dim) % group_size == 0``
#: guarantees every realised in-block spans whole groups).
DEFAULT_BLOCK_IN = 2048
DEFAULT_BLOCK_OUT2 = 2048

#: scoped-VMEM budget for the in-kernel f32 nibble temporaries: above it
#: the planar kernel auto-sub-chunks (a [2048, 2048] tile's lo/hi pair
#: alone is 32 MB > the 16 MB scoped limit).
_SCOPED_NIBBLE_BUDGET = 8 << 20


def _nibbles_f32(c: jax.Array, dtype=jnp.float32):
    """int8 packed tile -> (lo, hi) tiles in ``dtype``, sign-extended.

    byte (two's complement) = 16*hi_s + lo_u, so hi_s is an arithmetic
    shift and lo_s sign-extends via shift-up/shift-down (2 VPU ops — the
    mask/compare/select chain it replaces was 4; the kernel is dequant-
    VPU-bound ahead of its own DMA, so unpack ops are the hot cost).
    Nibble values [-8, 7] are exact in bf16 as well as f32.
    """
    ci = c.astype(jnp.int32)
    lo = ((ci << 28) >> 28).astype(dtype)
    hi = (ci >> 4).astype(dtype)
    return lo, hi


def _assemble_planar(ye: jax.Array, yo: jax.Array, span: int) -> jax.Array:
    """[rp, bo] nibble-plane dots -> [rp, 2*bo] natural-order output under
    the span-planar pack layout (models/weights.py::pack_span): per span,
    the lo block lands at columns [s*2S, s*2S+S) and the hi block at
    [s*2S+S, (s+1)*2S) — full-lane-width (S=128) block writes, no element
    interleave."""
    rp, bo = ye.shape
    ns = bo // span
    out = jnp.concatenate(
        [ye.reshape(rp, ns, 1, span), yo.reshape(rp, ns, 1, span)], axis=2)
    return out.reshape(rp, 2 * bo)


def _kernel_planar(x_ref, c_ref, y_ref, *, span: int, op_dtype=jnp.float32,
                   sub_in: int = 0):
    """``sub_in`` > 0 chunks the in-tile's dequant+dot into [sub_in, bo]
    slices so a LARGE in-block (fewer grid steps, bigger DMA windows)
    stays within the ~16 MB scoped-VMEM budget — the naive [bi, bo] f32
    nibble temporaries at (2048, 2048) measured a scoped OOM
    (logs/tpu_r3a.jsonl tiles_* legs)."""
    i = pl.program_id(1)
    rp = x_ref.shape[0]
    bi = c_ref.shape[-2]
    bo = c_ref.shape[-1]
    step = sub_in if sub_in and sub_in < bi else bi
    if step == bi:
        lo, hi = _nibbles_f32(c_ref[...] if c_ref.ndim == 2 else c_ref[0],
                              op_dtype)
        x = x_ref[...].astype(op_dtype)
        ye = jax.lax.dot_general(
            x, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        yo = jax.lax.dot_general(
            x, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        # ONE compiled fori body (a python-unrolled loop would make
        # Mosaic's scoped allocator SUM the per-slice temporaries — the
        # tiled quant-decode kernel lesson, commit 4e28f2c); slices read
        # via pl.ds on the REFS (Mosaic has no dynamic_slice on values)
        def body(s, acc):
            ye, yo = acc
            sl = pl.ds(s * step, step)
            cs_ = c_ref[sl, :] if c_ref.ndim == 2 else c_ref[0, sl, :]
            xs = x_ref[:, sl].astype(op_dtype)
            lo, hi = _nibbles_f32(cs_, op_dtype)
            ye = ye + jax.lax.dot_general(
                xs, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            yo = yo + jax.lax.dot_general(
                xs, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return ye, yo

        ye, yo = jax.lax.fori_loop(
            0, bi // step, body,
            (jnp.zeros((rp, bo), jnp.float32),
             jnp.zeros((rp, bo), jnp.float32)))
    y = _assemble_planar(ye, yo, span)

    @pl.when(i == 0)
    def _init():
        y_ref[...] = y

    @pl.when(i > 0)
    def _acc():
        y_ref[...] += y


def _kernel_planar_grouped(x_ref, c_ref, s_ref, y_ref, *,
                           groups_per_block: int, group_size: int,
                           span: int, op_dtype=jnp.float32):
    """Group-scaled planar variant: scales arrive in NATURAL column order
    (one strip, no even/odd split) and are applied after assembly.  The
    group loop is ONE compiled fori body dequantizing a [group, bo] slice
    at a time — Mosaic's scoped allocator would otherwise sum the nibble
    temporaries across an unrolled loop (32 x 1 MB at the (2048, 2048)
    default tiles)."""
    i = pl.program_id(1)

    def body(g, y):
        sl = pl.ds(g * group_size, group_size)
        cs_ = c_ref[sl, :] if c_ref.ndim == 2 else c_ref[0, sl, :]
        xg = x_ref[:, sl].astype(op_dtype)
        lo, hi = _nibbles_f32(cs_, op_dtype)
        pe = jax.lax.dot_general(
            xg, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        po = jax.lax.dot_general(
            xg, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row = pl.ds(i * groups_per_block + g, 1)
        return y + _assemble_planar(pe, po, span) * s_ref[row, :]

    y = jax.lax.fori_loop(0, groups_per_block, body,
                          jnp.zeros(y_ref.shape, jnp.float32))

    @pl.when(i == 0)
    def _init():
        y_ref[...] = y

    @pl.when(i > 0)
    def _acc():
        y_ref[...] += y


def _kernel_planar_pref(l_ref, x_ref, c_ref, y_ref, *, span: int,
                        op_dtype=jnp.float32, sub_in: int = 0):
    del l_ref
    _kernel_planar(x_ref, c_ref, y_ref, span=span, op_dtype=op_dtype,
                   sub_in=sub_in)


def _kernel_planar_grouped_pref(l_ref, x_ref, c_ref, s_ref, y_ref, *,
                                groups_per_block: int, group_size: int,
                                span: int, op_dtype=jnp.float32):
    del l_ref
    _kernel_planar_grouped(x_ref, c_ref, s_ref, y_ref,
                           groups_per_block=groups_per_block,
                           group_size=group_size, span=span,
                           op_dtype=op_dtype)


def _kernel(x_ref, c_ref, ye_ref, yo_ref, *, op_dtype=jnp.float32):
    i = pl.program_id(1)
    lo, hi = _nibbles_f32(c_ref[...] if c_ref.ndim == 2 else c_ref[0],
                          op_dtype)
    x = x_ref[...].astype(op_dtype)
    ye = jax.lax.dot_general(
        x, lo, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    yo = jax.lax.dot_general(
        x, hi, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _init():
        ye_ref[...] = ye
        yo_ref[...] = yo

    @pl.when(i > 0)
    def _acc():
        ye_ref[...] += ye
        yo_ref[...] += yo


def _kernel_grouped(x_ref, c_ref, se_ref, so_ref, ye_ref, yo_ref, *,
                    groups_per_block: int, group_size: int,
                    op_dtype=jnp.float32):
    """Group-scaled variant: the in-tile spans whole scale groups; each
    group's partial dot is scaled before accumulation (one static loop —
    MXU work is unchanged, just split).

    The scale refs hold the FULL ``[G, out2-block]`` column strip (a
    ``(groups_per_block, bo)`` block would need >= 8 sublanes — Mosaic
    rejects gpb < 8); rows are indexed dynamically at ``i*gpb + g``.
    Scales are tiny, so the full-strip DMA costs nothing.
    """
    i = pl.program_id(1)
    lo, hi = _nibbles_f32(c_ref[...] if c_ref.ndim == 2 else c_ref[0],
                          op_dtype)
    x = x_ref[...].astype(op_dtype)
    ye = jnp.zeros(ye_ref.shape, jnp.float32)
    yo = jnp.zeros(yo_ref.shape, jnp.float32)
    for g in range(groups_per_block):
        sl = slice(g * group_size, (g + 1) * group_size)
        xg = x[:, sl]
        pe = jax.lax.dot_general(
            xg, lo[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        po = jax.lax.dot_general(
            xg, hi[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        row = pl.ds(i * groups_per_block + g, 1)
        ye = ye + pe * se_ref[row, :]
        yo = yo + po * so_ref[row, :]

    @pl.when(i == 0)
    def _init():
        ye_ref[...] = ye
        yo_ref[...] = yo

    @pl.when(i > 0)
    def _acc():
        ye_ref[...] += ye
        yo_ref[...] += yo


def _kernel_pref(l_ref, x_ref, c_ref, ye_ref, yo_ref, *,
                 op_dtype=jnp.float32):
    del l_ref  # consumed by the index maps only
    _kernel(x_ref, c_ref, ye_ref, yo_ref, op_dtype=op_dtype)


def _kernel_grouped_pref(l_ref, x_ref, c_ref, se_ref, so_ref, ye_ref,
                         yo_ref, *, groups_per_block: int, group_size: int,
                         op_dtype=jnp.float32):
    del l_ref
    _kernel_grouped(x_ref, c_ref, se_ref, so_ref, ye_ref, yo_ref,
                    groups_per_block=groups_per_block,
                    group_size=group_size, op_dtype=op_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_in", "block_out2", "group_size", "interpret",
                     "sub_in", "op"),
)
def int4_matmul(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    *,
    layer=None,
    block_in: int = DEFAULT_BLOCK_IN,
    block_out2: int = DEFAULT_BLOCK_OUT2,
    group_size: int = 0,
    interpret: bool = False,
    sub_in: int = 0,
    op: "str | None" = None,
) -> jax.Array:
    """``x @ dequant(codes, scale)`` reading only the packed bytes.

    Args:
      x: ``[rows, in]`` (any float dtype; rows is decode-sized).
      codes: int8 ``[in, out//2]`` packed nibbles (weights.pack4 layout),
        or a STACKED ``[L, in, out//2]`` with ``layer`` set — the layer
        index rides scalar prefetch and only that layer's tiles are
        DMA'd, so a decode layer-scan never materialises a per-layer
        slice of the packed bytes (the dynamic-slice copy XLA would
        insert in front of an opaque pallas_call costs as much HBM
        traffic as the kernel's own reads — measured d32: 64 tok/s
        sliced vs int8's 83; see logs/tpu_r2w vs r2x).
      scale: ``[out]`` per-channel, or ``[G, out]`` with ``group_size`` set
        (``G = in // group_size``); for stacked codes the caller passes
        the CURRENT layer's scale (it is small — slicing it is free).
      layer: int32 scalar array indexing the stack axis (traced; may come
        from a ``lax.scan`` induction variable).
      group_size: 0 for per-channel scales.

    Returns ``[rows, out]`` in ``x.dtype``.
    """
    stacked = codes.ndim == 3
    assert stacked == (layer is not None), (codes.shape, layer)
    rows, in_dim = x.shape
    out2 = codes.shape[-1]
    bi = min(block_in, in_dim)
    bo = min(block_out2, out2)
    # shrink to divisors.  The out axis uses a 128-step divisor scan — a
    # packed-int4 lm_head has out2 = 64128 = 128*3*167, where halving
    # collapses to 128-byte slivers but the scan lands on 384 — falling
    # back to halving for sub-128 (tiny-test) widths.
    while in_dim % bi:
        bi //= 2
    if out2 % bo:
        bo = _largest_tile(out2, bo) or bo
    while out2 % bo:
        bo //= 2
    if group_size:
        # every in-block must span whole groups
        assert bi % group_size == 0, (bi, group_size)
    n_i, n_o = in_dim // bi, out2 // bo

    # pad rows to the sublane tile of x's dtype (8 f32, 16 bf16).  The
    # kernel computes f32 dots anyway (bf16 MXU operands measured SLOWER
    # — the int32->bf16 nibble converts outweigh the dot savings, r2ad),
    # so sub-tile bf16 x is upcast OUTSIDE: an 8-row f32 tile is half the
    # MXU work of a 16-row bf16 pad at B<=8 decode.
    out_dtype = x.dtype
    if x.dtype.itemsize < 4 and rows <= 8:
        x = x.astype(jnp.float32)
    sub = 16 if x.dtype.itemsize < 4 else 8
    rp = max(sub, ((rows + sub - 1) // sub) * sub)
    xp = jnp.pad(x, ((0, rp - rows), (0, 0))) if rp != rows else x
    # operand dtype: f32 for decode-sized rows (bf16 nibble converts cost
    # more than the f32 dots save at <= 32 rows — r2ad, REVERTED then);
    # bf16 for verify-sized rows, where the f32 multi-pass MXU tax scales
    # with rows while the per-tile convert does not (spec-CB verify at 8
    # lanes measured iteration ~2x a plain step on the f32 path, r2aq).
    # Numerics: nibbles are exact in bf16 and x is already bf16, so the
    # products are exact; accumulation stays f32 either way.
    op_dtype = (jnp.bfloat16
                if x.dtype == jnp.bfloat16 and rows > 32 else jnp.float32)
    if op is not None:  # explicit override (static arg -> keyed jit cache)
        op_dtype = jnp.bfloat16 if op == "bf16" else jnp.float32

    # pack layout span (mirrors models/weights.py::pack_span — kept local
    # to avoid a circular import); span >= 8 sublane-tiles cleanly, so the
    # kernel assembles its single natural-order output in-VMEM and the
    # caller-side stack interleave (measured ~1.0 ms/step of relayout
    # copies at d32 int4 — logs/r3a_trace copy.81/84/86-88) disappears
    span = 128 if out2 % 128 == 0 else 1
    planar = span >= 8 and bo % span == 0
    if planar and not sub_in and bi * bo * 8 > _SCOPED_NIBBLE_BUDGET:
        # auto-sub-chunk: keep the f32 lo/hi nibble tiles within scoped
        # VMEM at the (2048, 2048) default (engine-measured best, r3e)
        sub_in = max(_SCOPED_NIBBLE_BUDGET // (bo * 8) // 128 * 128, 128)

    n_groups = scale.shape[0] if group_size else 0
    so_cols = 2 * bo if planar else bo
    if stacked:
        x_spec = pl.BlockSpec((rp, bi), lambda o, i, l: (0, i))
        c_spec = pl.BlockSpec((1, bi, bo), lambda o, i, l: (l[0], i, o))
        s_spec = pl.BlockSpec((n_groups, so_cols), lambda o, i, l: (0, o))
        y_spec = pl.BlockSpec((rp, so_cols), lambda o, i, l: (0, o))
    else:
        x_spec = pl.BlockSpec((rp, bi), lambda o, i: (0, i))
        c_spec = pl.BlockSpec((bi, bo), lambda o, i: (i, o))
        s_spec = pl.BlockSpec((n_groups, so_cols), lambda o, i: (0, o))
        y_spec = pl.BlockSpec((rp, so_cols), lambda o, i: (0, o))
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
    )

    def call(kern, kern_pref, in_specs, out_specs, out_shape, *operands):
        if stacked:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_o, n_i),
                in_specs=in_specs, out_specs=out_specs,
            )
            lyr = jnp.asarray(layer, jnp.int32).reshape(1)
            return pl.pallas_call(
                kern_pref, grid_spec=grid_spec, out_shape=out_shape,
                compiler_params=cparams, interpret=interpret,
            )(lyr, *operands)
        return pl.pallas_call(
            kern, grid=(n_o, n_i), in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=cparams, interpret=interpret,
        )(*operands)

    if planar:
        out_shape = jax.ShapeDtypeStruct((rp, out2 * 2), jnp.float32)
        if group_size:
            gpb = bi // group_size
            y = call(
                functools.partial(_kernel_planar_grouped,
                                  groups_per_block=gpb,
                                  group_size=group_size, span=span,
                                  op_dtype=op_dtype),
                functools.partial(_kernel_planar_grouped_pref,
                                  groups_per_block=gpb,
                                  group_size=group_size, span=span,
                                  op_dtype=op_dtype),
                [x_spec, c_spec, s_spec], y_spec, out_shape,
                xp, codes, scale.astype(jnp.float32),
            )
            return y[:rows].astype(out_dtype)
        y = call(
            functools.partial(_kernel_planar, span=span, op_dtype=op_dtype,
                              sub_in=sub_in),
            functools.partial(_kernel_planar_pref, span=span,
                              op_dtype=op_dtype, sub_in=sub_in),
            [x_spec, c_spec], y_spec, out_shape, xp, codes,
        )
        y = y * scale.astype(jnp.float32)[None, :]
        return y[:rows].astype(out_dtype)

    # span == 1 (odd widths, tiny test models): historical two-output +
    # caller interleave path
    out_shape = [
        jax.ShapeDtypeStruct((rp, out2), jnp.float32),
        jax.ShapeDtypeStruct((rp, out2), jnp.float32),
    ]
    if group_size:
        gpb = bi // group_size
        se = scale[:, 0::2].astype(jnp.float32)  # [G, out2] even cols
        so = scale[:, 1::2].astype(jnp.float32)
        ye, yo = call(
            functools.partial(_kernel_grouped, groups_per_block=gpb,
                              group_size=group_size, op_dtype=op_dtype),
            functools.partial(_kernel_grouped_pref, groups_per_block=gpb,
                              group_size=group_size, op_dtype=op_dtype),
            [x_spec, c_spec, s_spec, s_spec], [y_spec, y_spec], out_shape,
            xp, codes, se, so,
        )
        y = jnp.stack([ye, yo], axis=-1).reshape(rp, out2 * 2)
        return y[:rows].astype(out_dtype)

    ye, yo = call(functools.partial(_kernel, op_dtype=op_dtype),
                  functools.partial(_kernel_pref, op_dtype=op_dtype),
                  [x_spec, c_spec], [y_spec, y_spec], out_shape, xp, codes)
    y = jnp.stack([ye, yo], axis=-1).reshape(rp, out2 * 2)
    y = y * scale.astype(jnp.float32)[None, :]
    return y[:rows].astype(out_dtype)


# ---------------------------------------------------------------------------
# int8 variant (lm_head): same streaming structure, no nibble unpack
# ---------------------------------------------------------------------------


def _kernel8(x_ref, c_ref, y_ref, *, op_dtype=jnp.bfloat16,
             accumulate: bool):
    w = (c_ref[...] if c_ref.ndim == 2 else c_ref[0]).astype(op_dtype)
    y = jax.lax.dot_general(
        x_ref[...].astype(op_dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if not accumulate:
        y_ref[...] = y
        return
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        y_ref[...] = y

    @pl.when(i > 0)
    def _acc():
        y_ref[...] += y


def _kernel8_pref(l_ref, x_ref, c_ref, y_ref, *, op_dtype=jnp.bfloat16,
                  accumulate: bool):
    del l_ref  # consumed by the index maps only
    _kernel8(x_ref, c_ref, y_ref, op_dtype=op_dtype, accumulate=accumulate)


def _largest_tile(n: int, cap: int, unit: int = 128) -> int:
    """Largest divisor of ``n`` that is <= cap and a multiple of ``unit``
    (the lm_head out dim 128256 = 128 x 1002 has no power-of-two tiling;
    the divisor scan lands on 768)."""
    for t in range(min(cap, n) - min(cap, n) % unit, 0, -unit):
        if n % t == 0:
            return t
    return 0


def int8_tiles(in_dim: int, out: int, block_in: int = 4096,
               block_out: int = 2048):
    """Eligibility/tiling for :func:`int8_matmul`: (bi, bo), zeros when the
    dims don't tile (callers fall back to the XLA path)."""
    bi = _largest_tile(in_dim, block_in)
    bo = _largest_tile(out, block_out)
    # keep the converted bf16 tile + byte tile within scoped VMEM
    while bi and bo and bi * bo * 3 > (12 << 20) and bi > 512:
        bi //= 2
    if not bi or not bo or in_dim % bi or out % bo:
        return 0, 0
    return bi, bo


@functools.partial(
    jax.jit, static_argnames=("block_in", "block_out", "interpret"))
def int8_matmul(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    *,
    layer=None,
    block_in: int = 4096,
    block_out: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """``x @ (codes * scale)`` streaming the int8 bytes straight to VMEM.

    Decode's lm_head (s8 ``[4096, 128256]`` read per step) lowers on the
    XLA path to a VPU multiply-reduce at ~56% of HBM bandwidth (1.149 ms
    measured, logs/r3a_trace multiply_reduce_fusion.9 — 525 MB at
    457 GB/s).  A Pallas grid of [in, bo] byte tiles converts once per
    byte and feeds the MXU, pipelining the DMA like the int4 kernel.
    Operands run bf16 (int8 values are exact in bf16; x is bf16-rounded
    upstream), accumulation f32.

    x: [rows, in] (rows decode-sized); codes s8 [in, out] or STACKED
    [L, in, out] with ``layer`` (scalar prefetch — a decode layer scan
    never materialises a per-layer byte slice, same as the int4 kernel);
    scale [out].
    """
    stacked = codes.ndim == 3
    assert stacked == (layer is not None), (codes.shape, layer)
    rows, in_dim = x.shape
    out = codes.shape[-1]
    bi, bo = int8_tiles(in_dim, out, block_in, block_out)
    assert bi and bo, (in_dim, out)  # callers gate via int8_tiles
    n_i, n_o = in_dim // bi, out // bo
    out_dtype = x.dtype
    sub = 8
    rp = max(sub, ((rows + sub - 1) // sub) * sub)
    xp = x.astype(jnp.float32)
    if rp != rows:
        xp = jnp.pad(xp, ((0, rp - rows), (0, 0)))
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"))
    out_shape = jax.ShapeDtypeStruct((rp, out), jnp.float32)
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(n_o, n_i),
            in_specs=[
                pl.BlockSpec((rp, bi), lambda o, i, l: (0, i)),
                pl.BlockSpec((1, bi, bo), lambda o, i, l: (l[0], i, o)),
            ],
            out_specs=pl.BlockSpec((rp, bo), lambda o, i, l: (0, o)),
        )
        y = pl.pallas_call(
            functools.partial(_kernel8_pref, accumulate=n_i > 1),
            grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=cparams, interpret=interpret,
        )(jnp.asarray(layer, jnp.int32).reshape(1), xp, codes)
    else:
        y = pl.pallas_call(
            functools.partial(_kernel8, accumulate=n_i > 1),
            grid=(n_o, n_i),
            in_specs=[
                pl.BlockSpec((rp, bi), lambda o, i: (0, i)),
                pl.BlockSpec((bi, bo), lambda o, i: (i, o)),
            ],
            out_specs=pl.BlockSpec((rp, bo), lambda o, i: (0, o)),
            out_shape=out_shape,
            compiler_params=cparams, interpret=interpret,
        )(xp, codes)
    y = y * scale.astype(jnp.float32)[None, :]
    return y[:rows].astype(out_dtype)


# ---------------------------------------------------------------------------
# Manual-DMA planar variant (per-channel scales): one grid step per OUT
# tile; the in-dim loop lives inside the kernel with double-buffered
# window copies.  The automatic pipeline double-buffers whole
# [block_in, block_out2] code blocks (2 x 4 MB at the (2048, 2048)
# defaults) and holds the int4 matmuls at ~73% of their weight-byte
# roofline (BASELINE Round 3 — DMA bubbles at grid-step boundaries);
# finer explicit windows overlap copy w+1 with compute w at sub-block
# granularity, the block-sparse kernel's pattern (`_db_kernel`).
# ---------------------------------------------------------------------------


def _dma_window_body(x_ref, y_ref, buf, sem, src, *, span: int, win: int,
                     op_dtype):
    """Shared double-buffered window loop; ``src(w)`` yields window w's
    HBM ref slice ([win, bo] packed bytes)."""
    rp = x_ref.shape[0]
    bo = buf.shape[-1]
    nw = x_ref.shape[1] // win

    def start(slot, w):
        pltpu.make_async_copy(src(w), buf.at[slot], sem.at[slot]).start()

    start(0, 0)

    def body(w, acc):
        ye, yo = acc
        slot = jax.lax.rem(w, 2)

        @pl.when(w + 1 < nw)
        def _prefetch():
            start(1 - slot, w + 1)

        pltpu.make_async_copy(src(w), buf.at[slot], sem.at[slot]).wait()
        lo, hi = _nibbles_f32(buf[slot], op_dtype)
        xs = x_ref[:, pl.ds(w * win, win)].astype(op_dtype)
        ye = ye + jax.lax.dot_general(
            xs, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        yo = yo + jax.lax.dot_general(
            xs, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return ye, yo

    ye, yo = jax.lax.fori_loop(
        0, nw, body,
        (jnp.zeros((rp, bo), jnp.float32),
         jnp.zeros((rp, bo), jnp.float32)))
    y_ref[...] = _assemble_planar(ye, yo, span)


def _kernel_planar_dma(x_ref, c_hbm, y_ref, buf, sem, *, span: int,
                       win: int, op_dtype, bo: int):
    o = pl.program_id(0)

    def src(w):
        return c_hbm.at[pl.ds(w * win, win), pl.ds(o * bo, bo)]

    _dma_window_body(x_ref, y_ref, buf, sem, src, span=span, win=win,
                     op_dtype=op_dtype)


def _kernel_planar_dma_pref(l_ref, x_ref, c_hbm, y_ref, buf, sem, *,
                            span: int, win: int, op_dtype, bo: int):
    o = pl.program_id(0)
    lyr = l_ref[0]

    def src(w):
        return c_hbm.at[lyr, pl.ds(w * win, win), pl.ds(o * bo, bo)]

    _dma_window_body(x_ref, y_ref, buf, sem, src, span=span, win=win,
                     op_dtype=op_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_out2", "win", "interpret", "op"),
)
def int4_matmul_dma(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    *,
    layer=None,
    block_out2: int = DEFAULT_BLOCK_OUT2,
    win: int = 512,
    interpret: bool = False,
    op: "str | None" = None,
) -> jax.Array:
    """Manual-DMA counterpart of :func:`int4_matmul` (per-channel scales,
    span-planar layout only).  Same contract; ``win`` is the in-dim window
    each double-buffered copy streams (2 x win x bo bytes of VMEM)."""
    stacked = codes.ndim == 3
    assert stacked == (layer is not None), (codes.shape, layer)
    rows, in_dim = x.shape
    out2 = codes.shape[-1]
    assert out2 % 128 == 0 and scale.ndim == 1, (out2, scale.shape)
    span = 128
    bo = min(block_out2, out2)
    if out2 % bo:
        bo = _largest_tile(out2, bo) or bo
    while out2 % bo:
        bo //= 2
    assert bo % span == 0, (bo, span)
    w_ = min(win, in_dim)
    while in_dim % w_:
        w_ //= 2
    n_o = out2 // bo

    out_dtype = x.dtype
    if x.dtype.itemsize < 4 and rows <= 8:
        x = x.astype(jnp.float32)
    sub = 16 if x.dtype.itemsize < 4 else 8
    rp = max(sub, ((rows + sub - 1) // sub) * sub)
    xp = jnp.pad(x, ((0, rp - rows), (0, 0))) if rp != rows else x
    op_dtype = (jnp.bfloat16
                if x.dtype == jnp.bfloat16 and rows > 32 else jnp.float32)
    if op is not None:
        op_dtype = jnp.bfloat16 if op == "bf16" else jnp.float32

    kern_kw = dict(span=span, win=w_, op_dtype=op_dtype, bo=bo)
    scratch = [
        pltpu.VMEM((2, w_, bo), jnp.int8),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out_shape = jax.ShapeDtypeStruct((rp, out2 * 2), jnp.float32)
    cparams = pltpu.CompilerParams(dimension_semantics=("parallel",))
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_o,),
            in_specs=[
                pl.BlockSpec((rp, in_dim), lambda o, l: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((rp, 2 * bo), lambda o, l: (0, o)),
            scratch_shapes=scratch,
        )
        y = pl.pallas_call(
            functools.partial(_kernel_planar_dma_pref, **kern_kw),
            grid_spec=grid_spec, out_shape=out_shape,
            compiler_params=cparams, interpret=interpret,
        )(jnp.asarray(layer, jnp.int32).reshape(1), xp, codes)
    else:
        y = pl.pallas_call(
            functools.partial(_kernel_planar_dma, **kern_kw),
            grid=(n_o,),
            in_specs=[
                pl.BlockSpec((rp, in_dim), lambda o: (0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((rp, 2 * bo), lambda o: (0, o)),
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=cparams, interpret=interpret,
        )(xp, codes)
    y = y * scale.astype(jnp.float32)[None, :]
    return y[:rows].astype(out_dtype)


# ---------------------------------------------------------------------------
# Tensor-parallel path: custom_partitioning over the fused kernel
# ---------------------------------------------------------------------------
#
# pallas_call is opaque to GSPMD, so a jit over model-axis-sharded packed
# codes would all-gather the whole weight stack in front of the kernel.
# ``int4_matmul_sharded`` teaches the partitioner the matmul's SPMD
# structure instead: each shard runs the kernel on its local strip —
# column-parallel weights (wq/wk/wv/w_gate/w_up: codes sharded on the OUT
# axis, pack4 keeps both nibbles of a column pair in one shard) need no
# communication; row-parallel weights (wo/w_down: codes sharded on the IN
# axis, x sharded to match) psum the partial products, exactly the
# all-reduce GSPMD emits for the bf16/int8 megatron pattern.  The
# per-output-channel scale multiply is linear, so scaling each shard's
# partial before the psum is exact; grouped scales are forced to co-shard
# their group axis with the codes' in-axis.
#
# Validated on the 8-device CPU mesh with the interpret-mode kernel
# (tests/test_weight_quant.py); on real multi-chip TPU hardware the same
# lowering runs the Mosaic kernel per shard (compile validated only —
# this environment has one chip).

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _spec_axes(sharding, rank):
    """PartitionSpec entries padded to ``rank`` (None = replicated)."""
    spec = getattr(sharding, "spec", None)
    axes = list(spec) if spec is not None else []
    return axes + [None] * (rank - len(axes))


def _sharded_call(x, codes, scale, layer, group_size, block_in, block_out2,
                  interpret):
    kw = {}
    if block_in:
        kw["block_in"] = block_in
    if block_out2:
        kw["block_out2"] = block_out2
    return int4_matmul(x, codes, scale, layer=layer,
                       group_size=group_size, interpret=interpret, **kw)


def _make_partition(grouped: bool):
    def partition(group_size, block_in, block_out2, interpret,
                  mesh, arg_shapes, result_shape):
        del result_shape
        xs = _spec_axes(arg_shapes[0].sharding, 2)
        cs = _spec_axes(arg_shapes[1].sharding, 3)
        in_ax, out_ax = cs[1], cs[2]
        if out_ax is not None:
            # span-planar layout constraint: an out-axis shard must hold
            # whole 128-byte spans, or each shard's local width derives a
            # DIFFERENT span than the global pack (models/weights.py::
            # pack_span) — silently wrong results.  Real megatron layouts
            # satisfy this (minimum shard = 2 KV heads = 256 columns).
            out2 = arg_shapes[1].shape[-1]
            shards = mesh.shape[out_ax]
            g_span = 128 if out2 % 128 == 0 else 1
            l_span = 128 if (out2 // shards) % 128 == 0 else 1
            if g_span != l_span:
                raise ValueError(
                    f"int4_matmul_sharded: out2={out2} over {shards} "
                    f"'{out_ax}' shards splits a 128-byte pack span; "
                    "shard width must be a multiple of 256 columns"
                )

        def lower_fn(x, codes, scale, layer):
            y = _sharded_call(x, codes, scale, layer, group_size,
                              block_in, block_out2, interpret)
            if in_ax is not None:
                y = jax.lax.psum(y, in_ax)
            return y

        if grouped:
            scale_spec = PartitionSpec(in_ax, out_ax)   # g co-shards with i
        else:
            scale_spec = PartitionSpec(out_ax)
        arg_shardings = (
            NamedSharding(mesh, PartitionSpec(xs[0], in_ax)),
            NamedSharding(mesh, PartitionSpec(None, in_ax, out_ax)),
            NamedSharding(mesh, scale_spec),
            NamedSharding(mesh, PartitionSpec(None)),
        )
        out_sharding = NamedSharding(mesh, PartitionSpec(xs[0], out_ax))
        return mesh, lower_fn, out_sharding, arg_shardings

    def infer(group_size, block_in, block_out2, interpret,
              mesh, arg_shapes, result_shape):
        del group_size, block_in, block_out2, interpret, result_shape
        xs = _spec_axes(arg_shapes[0].sharding, 2)
        cs = _spec_axes(arg_shapes[1].sharding, 3)
        return NamedSharding(mesh, PartitionSpec(xs[0], cs[2]))

    return partition, infer


def _cp_instance(grouped: bool):
    @functools.partial(custom_partitioning, static_argnums=(4, 5, 6, 7))
    def fn(x, codes, scale, layer, group_size, block_in, block_out2,
           interpret):
        return _sharded_call(x, codes, scale, layer, group_size,
                             block_in, block_out2, interpret)

    partition, infer = _make_partition(grouped)
    # The output/scale "out" axis is the codes' packed axis j times the
    # two nibbles per byte: the compound factor (j t), t=2, links them so
    # shardy propagates an out-axis sharding straight through the byte
    # packing (a contiguous split of out is a contiguous split of j as
    # long as the shard size is even — guaranteed: out/shards is a
    # multiple of head_dim or of the MLP tile).
    rule = ("m i, l i j, g (j t), u -> m (j t)" if grouped
            else "m i, l i j, (j t), u -> m (j t)")
    fn.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
        reduction_factors=("i",),
        t=2,
    )
    return fn


_CP_PLAIN = _cp_instance(grouped=False)
_CP_GROUPED = _cp_instance(grouped=True)


def int4_matmul_sharded(
    x: jax.Array,
    codes: jax.Array,
    scale: jax.Array,
    *,
    layer,
    block_in: int = 0,
    block_out2: int = 0,
    group_size: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """:func:`int4_matmul` for multi-device traces (STACKED codes only).

    Same contract as ``int4_matmul`` with ``codes [L, in, out//2]`` and a
    traced ``layer`` index; ``block_in/block_out2 = 0`` means kernel
    defaults.  The custom_partitioning wrapper keeps the packed bytes
    sharded (megatron column/row layouts, ``parallel/mesh.py``) instead of
    letting GSPMD all-gather them in front of the opaque pallas_call.
    """
    lyr = jnp.asarray(layer, jnp.int32).reshape(1)
    fn = _CP_GROUPED if group_size else _CP_PLAIN
    return fn(x, codes, scale, lyr, group_size, block_in, block_out2,
              interpret)
