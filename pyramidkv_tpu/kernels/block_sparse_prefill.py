"""Block-sparse prefill attention kernel (Pallas TPU) for MInference.

The slash part of the vertical+slash pattern is block-granular: each query
block attends a small data-dependent set of k-tiles.  XLA can only express
that as gathers (measured 4x SLOWER than dense at 8k on v5e); this kernel
instead reads the selected tile index from a scalar-prefetched array inside
the BlockSpec index map, so the DMA engine fetches exactly the chosen
[k_tile, D] tiles — the same mechanism TPU paged-attention kernels use for
page tables.  No gather ops, no repeat_kv (query-head grid rows map to
their KV head row), FLOPs = N * T * k_tile * D.

Emits online-softmax PARTIALS (unnormalised acc, m, l) over the slash
coverage; the caller flash-merges them with the vertical-column partials
(``vertical_attention_partials_kernel`` below) and normalises.
Columns covered by a vertical are masked out here (dedup), exactly like
the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(
    # scalar prefetch
    pad_ref,        # [B] int32
    tidx_ref,       # [BH * nq * T] int32 flattened tile ids
    tval_ref,       # [BH * nq * T] int32 tile validity
    # inputs
    q_ref,          # [1, q_block, D]
    k_ref,          # [1, k_tile, D]   (tile selected by index map)
    v_ref,          # [1, k_tile, D]
    vert_ref,       # [1, 8, k_tile] int32 — 1 where column is a vertical
    # outputs
    acc_out,        # [1, q_block, D] f32 (unnormalised)
    m_out,          # [1, 8, q_block] f32
    l_out,          # [1, 8, q_block] f32
    # scratch
    acc_ref, m_ref, l_ref,
    *,
    q_block: int,
    k_tile: int,
    num_tiles: int,
    batch: int,
    nq: int,
    c0: int,
    h: int,
    softcap: float | None,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    t = pl.program_id(2)
    b = (c0 + bh) // h  # global (batch*head) row -> batch index
    pad = pad_ref[b]
    flat = (bh * nq + qi) * num_tiles + t
    ti = tidx_ref[flat]
    tv = tval_ref[flat]

    @pl.when(t == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # q arrives pre-scaled by the softmax scale from the wrapper
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [q_block, k_tile]
    if softcap is not None:
        # Gemma-2: tanh-cap the SCALED logits BEFORE masking (capping a
        # masked _NEG_INF would un-mask it to -softcap)
        s = jnp.tanh(s * (1.0 / softcap)) * softcap
    rows = qi * q_block + jax.lax.broadcasted_iota(
        jnp.int32, (q_block, k_tile), 0
    )
    cols = ti * k_tile + jax.lax.broadcasted_iota(
        jnp.int32, (q_block, k_tile), 1
    )
    not_vert = vert_ref[0][:1] == 0  # [1, k_tile]
    mask = (cols <= rows) & (cols >= pad) & not_vert & (tv > 0)
    s = jnp.where(mask, s, _NEG_INF)

    # stats live per-ROW in the sublane dim (col 0), like flash_prefill;
    # masked entries (s == _NEG_INF) underflow to exactly 0 through the
    # clamped subtraction — no post-exp re-mask needed (and a stale
    # m_prev == _NEG_INF makes alpha underflow to 0 the same way)
    m_prev = m_ref[:, :1]  # [q_block, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - jnp.maximum(m_new, _NEG_INF / 2))
    alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(t == num_tiles - 1)
    def _fin():
        acc_out[0] = acc_ref[:]
        m_out[0] = jnp.broadcast_to(m_ref[:, 0][None, :], (8, q_block))
        l_out[0] = jnp.broadcast_to(l_ref[:, 0][None, :], (8, q_block))


@functools.partial(
    jax.jit,
    static_argnames=("q_block", "k_tile", "interpret", "scale", "softcap"),
)
def slash_tile_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    tile_idx: jax.Array,
    tile_valid: jax.Array,
    vert: jax.Array,
    true_len: jax.Array,
    *,
    q_block: int = 128,
    k_tile: int = 128,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float | None = None,
):
    """Online-softmax partials of causal attention over the selected tiles.

    Args:
      q: [B, H, N, D]; k, v: [B, Hk, N, D] (grouped KV ok).
      tile_idx / tile_valid: [B, H, nq, T] from ``_slash_tile_selection``.
      vert: [B, H, N] bool — vertical columns to EXCLUDE (handled by the
        vertical partials).
    Returns (acc [B,H,N,D] f32 unnormalised, m [B,H,N] f32, l [B,H,N] f32).
    """
    b, h, n, d = q.shape
    hk = k.shape[1]
    g = h // hk
    nq = n // q_block
    t = tile_idx.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    pad = (n - true_len).astype(jnp.int32)

    # fold the softmax scale into q once (fp32 multiply, storage-dtype
    # rounding identical to the previous in-kernel scaling); softcap is
    # nonlinear and stays inside the kernel on the scaled logits
    qr = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, d)
    kr = k.reshape(b * hk, n, d)
    vr = v.reshape(b * hk, n, d)
    vert8 = jnp.broadcast_to(
        vert.reshape(b * h, 1, n).astype(jnp.int32), (b * h, 8, n)
    )
    tidx_all = tile_idx.reshape(b * h, nq * t).astype(jnp.int32)
    tval_all = tile_valid.reshape(b * h, nq * t).astype(jnp.int32)

    # Prefetched scalar arrays live in SMEM (~1 MB): chunk the grid over
    # (batch*heads) so bh_chunk * nq * T stays within budget (a 32k
    # full-grid variant measured a scoped-SMEM exhaustion).  K/V stay
    # whole; the kv-row index map offsets by the chunk start.
    max_entries = 32768
    bh_chunk = b * h
    while bh_chunk > 1 and bh_chunk * nq * t > max_entries:
        bh_chunk //= 2
    accs, ms, ls = [], [], []
    for c0 in range(0, b * h, bh_chunk):
        nbh = min(bh_chunk, b * h - c0)
        tidx = tidx_all[c0:c0 + nbh].reshape(-1)
        tval = tval_all[c0:c0 + nbh].reshape(-1)

        def _kv(bh, c0=c0):
            gbh = c0 + bh
            return (gbh // h) * hk + (gbh % h) // g

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nbh, nq, t),
            in_specs=[
                pl.BlockSpec((1, q_block, d),
                             lambda bh, qi, ti, pad, tx, tv: (bh, qi, 0)),
                pl.BlockSpec(
                    (1, k_tile, d),
                    lambda bh, qi, ti, pad, tx, tv:
                    (_kv(bh), tx[(bh * nq + qi) * t + ti], 0),
                ),
                pl.BlockSpec(
                    (1, k_tile, d),
                    lambda bh, qi, ti, pad, tx, tv:
                    (_kv(bh), tx[(bh * nq + qi) * t + ti], 0),
                ),
                pl.BlockSpec(
                    (1, 8, k_tile),
                    lambda bh, qi, ti, pad, tx, tv:
                    (bh, 0, tx[(bh * nq + qi) * t + ti]),
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, q_block, d),
                             lambda bh, qi, ti, pad, tx, tv: (bh, qi, 0)),
                pl.BlockSpec((1, 8, q_block),
                             lambda bh, qi, ti, pad, tx, tv: (bh, 0, qi)),
                pl.BlockSpec((1, 8, q_block),
                             lambda bh, qi, ti, pad, tx, tv: (bh, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((q_block, d), jnp.float32),
                pltpu.VMEM((q_block, 128), jnp.float32),
                pltpu.VMEM((q_block, 128), jnp.float32),
            ],
        )
        acc_c, m_c, l_c = pl.pallas_call(
            functools.partial(
                _kernel, q_block=q_block, k_tile=k_tile, num_tiles=t,
                batch=b, nq=nq, c0=c0, h=h, softcap=softcap,
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            out_shape=[
                jax.ShapeDtypeStruct((nbh, n, d), jnp.float32),
                jax.ShapeDtypeStruct((nbh, 8, n), jnp.float32),
                jax.ShapeDtypeStruct((nbh, 8, n), jnp.float32),
            ],
            interpret=interpret,
        )(pad, tidx, tval, qr[c0:c0 + nbh], kr, vr, vert8[c0:c0 + nbh])
        accs.append(acc_c)
        ms.append(m_c)
        ls.append(l_c)
    acc = jnp.concatenate(accs, 0) if len(accs) > 1 else accs[0]
    m = jnp.concatenate(ms, 0) if len(ms) > 1 else ms[0]
    l = jnp.concatenate(ls, 0) if len(ls) > 1 else ls[0]
    return (
        acc.reshape(b, h, n, d),
        m[:, 0, :].reshape(b, h, n),
        l[:, 0, :].reshape(b, h, n),
    )


def _db_kernel(
    # scalar prefetch
    pad_ref,        # [B] int32
    tidx_ref,       # [nbh * nq * T] int32 flattened tile ids
    nval_ref,       # [nbh * nq] int32 number of VALID tiles (top_k sorts
                    # valid-first, so tiles [0, nval) are exactly the live set)
    # inputs
    q_ref,          # [1, q_block, D] VMEM block
    k_hbm,          # [B*Hk, N, D]  (ANY/HBM — sliced by manual DMA)
    v_hbm,          # [B*Hk, N, D]
    vert_hbm,       # [nbh, 8, N] int32
    # outputs
    acc_out, m_out, l_out,
    # scratch
    kbuf, vbuf, vertbuf,        # [2, k_tile, D] x2, [2, 8, k_tile]
    acc_ref, m_ref, l_ref,
    sems,                       # DMA sems [2, 3]
    *,
    q_block: int,
    k_tile: int,
    nq: int,
    num_tiles: int,
    h: int,
    hk: int,
    c0: int,
    softcap: float | None,
):
    """One grid step = one (bh, q-block); the tile loop lives INSIDE the
    kernel with double-buffered manual DMA.  vs the grid-per-tile variant:
    no per-tile grid-step overhead (output spec bookkeeping, revisiting),
    invalid tiles are never visited (the loop bound is the valid count),
    and tile t+1's K/V/vert DMA overlaps tile t's compute explicitly."""
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    gbh = c0 + bh
    b = gbh // h
    g = h // hk
    kvrow = b * hk + (gbh % h) // g
    pad = pad_ref[b]
    base = (bh * nq + qi) * num_tiles
    nval = nval_ref[bh * nq + qi]

    def start(slot, t):
        ti = tidx_ref[base + t]
        pltpu.make_async_copy(
            k_hbm.at[kvrow, pl.ds(ti * k_tile, k_tile), :],
            kbuf.at[slot], sems.at[slot, 0],
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[kvrow, pl.ds(ti * k_tile, k_tile), :],
            vbuf.at[slot], sems.at[slot, 1],
        ).start()
        pltpu.make_async_copy(
            vert_hbm.at[bh, :, pl.ds(ti * k_tile, k_tile)],
            vertbuf.at[slot], sems.at[slot, 2],
        ).start()

    def wait(slot, t):
        ti = tidx_ref[base + t]
        pltpu.make_async_copy(
            k_hbm.at[kvrow, pl.ds(ti * k_tile, k_tile), :],
            kbuf.at[slot], sems.at[slot, 0],
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[kvrow, pl.ds(ti * k_tile, k_tile), :],
            vbuf.at[slot], sems.at[slot, 1],
        ).wait()
        pltpu.make_async_copy(
            vert_hbm.at[bh, :, pl.ds(ti * k_tile, k_tile)],
            vertbuf.at[slot], sems.at[slot, 2],
        ).wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    start(0, 0)  # forced diagonal tiles guarantee nval >= 1

    q = q_ref[0]  # pre-scaled by 1/sqrt(d) in the wrapper
    rows = qi * q_block + jax.lax.broadcasted_iota(
        jnp.int32, (q_block, k_tile), 0
    )
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (q_block, k_tile), 1)

    def body(t, _):
        slot = jax.lax.rem(t, 2)

        @pl.when(t + 1 < nval)
        def _prefetch():
            start(1 - slot, t + 1)

        wait(slot, t)
        ti = tidx_ref[base + t]
        s = jax.lax.dot_general(
            q, kbuf[slot], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if softcap is not None:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        cols = ti * k_tile + col_iota
        not_vert = vertbuf[slot][:1] == 0  # [1, k_tile]
        mask = (cols <= rows) & (cols >= pad) & not_vert
        s = jnp.where(mask, s, _NEG_INF)
        # masked entries underflow to exactly 0 through the clamped
        # subtraction — no post-exp re-mask (see slash grid kernel)
        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - jnp.maximum(m_new, _NEG_INF / 2))
        alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
        l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(vbuf.dtype), vbuf[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(0, nval, body, 0)
    acc_out[0] = acc_ref[:]
    m_out[0] = jnp.broadcast_to(m_ref[:, 0][None, :], (8, q_block))
    l_out[0] = jnp.broadcast_to(l_ref[:, 0][None, :], (8, q_block))


@functools.partial(
    jax.jit,
    static_argnames=("q_block", "k_tile", "interpret", "scale", "softcap"),
)
def slash_tile_attention_db(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    tile_idx: jax.Array,
    tile_valid: jax.Array,
    vert: jax.Array,
    true_len: jax.Array,
    *,
    q_block: int = 512,
    k_tile: int = 256,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float | None = None,
):
    """Double-buffered manual-DMA variant of :func:`slash_tile_attention`
    (same contract).  Requires ``tile_idx`` ordered valid-first per
    q-block, which ``_slash_tile_selection``'s top_k guarantees."""
    b, h, n, d = q.shape
    hk = k.shape[1]
    nq = n // q_block
    t = tile_idx.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    pad = (n - true_len).astype(jnp.int32)

    # fold the softmax scale into q once (fp32 multiply, storage-dtype
    # rounding identical to the previous in-kernel scaling)
    qr = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, d)
    kr = k.reshape(b * hk, n, d)
    vr = v.reshape(b * hk, n, d)
    vert8 = jnp.broadcast_to(
        vert.reshape(b * h, 1, n).astype(jnp.int32), (b * h, 8, n)
    )
    tidx_all = tile_idx.reshape(b * h, nq * t).astype(jnp.int32)
    nval_all = jnp.sum(tile_valid, axis=-1).reshape(b * h, nq).astype(
        jnp.int32
    )

    max_entries = 32768
    bh_chunk = b * h
    while bh_chunk > 1 and bh_chunk * nq * t > max_entries:
        bh_chunk //= 2
    accs, ms, ls = [], [], []
    for c0 in range(0, b * h, bh_chunk):
        nbh = min(bh_chunk, b * h - c0)
        tidx = tidx_all[c0:c0 + nbh].reshape(-1)
        nval = nval_all[c0:c0 + nbh].reshape(-1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nbh, nq),
            in_specs=[
                pl.BlockSpec((1, q_block, d),
                             lambda bh, qi, pad, tx, nv, c0=c0:
                             (c0 + bh, qi, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, q_block, d),
                             lambda bh, qi, pad, tx, nv: (bh, qi, 0)),
                pl.BlockSpec((1, 8, q_block),
                             lambda bh, qi, pad, tx, nv: (bh, 0, qi)),
                pl.BlockSpec((1, 8, q_block),
                             lambda bh, qi, pad, tx, nv: (bh, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, k_tile, d), q.dtype),
                pltpu.VMEM((2, k_tile, d), q.dtype),
                pltpu.VMEM((2, 8, k_tile), jnp.int32),
                pltpu.VMEM((q_block, d), jnp.float32),
                pltpu.VMEM((q_block, 128), jnp.float32),
                pltpu.VMEM((q_block, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 3)),
            ],
        )
        acc_c, m_c, l_c = pl.pallas_call(
            functools.partial(
                _db_kernel, q_block=q_block, k_tile=k_tile,
                nq=nq, num_tiles=t, h=h, hk=hk, c0=c0, softcap=softcap,
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            out_shape=[
                jax.ShapeDtypeStruct((nbh, n, d), jnp.float32),
                jax.ShapeDtypeStruct((nbh, 8, n), jnp.float32),
                jax.ShapeDtypeStruct((nbh, 8, n), jnp.float32),
            ],
            interpret=interpret,
        )(pad, tidx, nval, qr, kr, vr, vert8[c0:c0 + nbh])
        accs.append(acc_c)
        ms.append(m_c)
        ls.append(l_c)
    acc = jnp.concatenate(accs, 0) if len(accs) > 1 else accs[0]
    m = jnp.concatenate(ms, 0) if len(ms) > 1 else ms[0]
    l = jnp.concatenate(ls, 0) if len(ls) > 1 else ls[0]
    return (
        acc.reshape(b, h, n, d),
        m[:, 0, :].reshape(b, h, n),
        l[:, 0, :].reshape(b, h, n),
    )


def _vert_kernel(
    pad_ref,       # [B] int32
    q_ref,         # [1, q_block, D]
    kv_ref,        # [1, Vs, D]
    vv_ref,        # [1, Vs, D]
    vcol_ref,      # [1, 8, Vs] int32 column ids
    vvalid_ref,    # [1, 8, Vs] int32
    acc_out, m_out, l_out,
    *,
    q_block: int,
    h: int,
    softcap: float | None,
):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    pad = pad_ref[bh // h]

    # q arrives pre-scaled by the softmax scale from the wrapper
    s = jax.lax.dot_general(
        q_ref[0], kv_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [q_block, Vs]
    if softcap is not None:
        s = jnp.tanh(s * (1.0 / softcap)) * softcap
    rows = qi * q_block + jax.lax.broadcasted_iota(
        jnp.int32, (q_block, s.shape[1]), 0
    )
    vcol = vcol_ref[0][:1]     # [1, Vs]
    valid = vvalid_ref[0][:1] > 0
    mask = (vcol <= rows) & valid
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    # masked entries underflow to exactly 0 through the clamped subtraction
    p = jnp.exp(s - jnp.maximum(m, _NEG_INF / 2))
    l = jnp.sum(p, axis=1, keepdims=True)
    acc_out[0] = jax.lax.dot_general(
        p.astype(vv_ref.dtype), vv_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_out[0] = jnp.broadcast_to(m[:, 0][None, :], (8, q_block))
    l_out[0] = jnp.broadcast_to(l[:, 0][None, :], (8, q_block))


@functools.partial(
    jax.jit, static_argnames=("q_block", "interpret", "scale", "softcap")
)
def vertical_attention_partials_kernel(
    q: jax.Array,
    k_vert: jax.Array,
    v_vert: jax.Array,
    vcol: jax.Array,
    vvalid: jax.Array,
    true_len: jax.Array,
    *,
    q_block: int = 512,
    interpret: bool = False,
    scale: float | None = None,
    softcap: float | None = None,
):
    """Pallas one-shot partials of all queries vs the gathered vertical
    columns (the XLA scan variant measured 31 ms/layer at 8k for ~1 ms of
    FLOPs — unfused elementwise passes).

    q [B,H,N,D]; k_vert/v_vert [B,H,Vs,D]; vcol/vvalid [B,H,Vs].
    Returns (acc [B,H,N,D] f32 unnormalised, m, l [B,H,N] f32).
    """
    b, h, n, d = q.shape
    vs = k_vert.shape[2]
    nq = n // q_block
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    pad = (n - true_len).astype(jnp.int32)
    qr = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, d)
    kr = k_vert.reshape(b * h, vs, d)
    vr = v_vert.reshape(b * h, vs, d)
    vc = jnp.broadcast_to(
        vcol.reshape(b * h, 1, vs).astype(jnp.int32), (b * h, 8, vs)
    )
    vv = jnp.broadcast_to(
        vvalid.reshape(b * h, 1, vs).astype(jnp.int32), (b * h, 8, vs)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, nq),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda bh, qi, pad: (bh, qi, 0)),
            pl.BlockSpec((1, vs, d), lambda bh, qi, pad: (bh, 0, 0)),
            pl.BlockSpec((1, vs, d), lambda bh, qi, pad: (bh, 0, 0)),
            pl.BlockSpec((1, 8, vs), lambda bh, qi, pad: (bh, 0, 0)),
            pl.BlockSpec((1, 8, vs), lambda bh, qi, pad: (bh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, q_block, d), lambda bh, qi, pad: (bh, qi, 0)),
            pl.BlockSpec((1, 8, q_block), lambda bh, qi, pad: (bh, 0, qi)),
            pl.BlockSpec((1, 8, q_block), lambda bh, qi, pad: (bh, 0, qi)),
        ],
    )
    acc, m, l = pl.pallas_call(
        functools.partial(_vert_kernel, q_block=q_block, h=h,
                          softcap=softcap),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 8, n), jnp.float32),
        ],
        interpret=interpret,
    )(pad, qr, kr, vr, vc, vv)
    return (
        acc.reshape(b, h, n, d),
        m[:, 0, :].reshape(b, h, n),
        l[:, 0, :].reshape(b, h, n),
    )
