"""Fused causal flash-attention prefill kernel (Pallas TPU).

Replaces the reference's flash-attn-2 CUDA dependency
(/root/reference/pyramidkv/llama_model.py:18-19, :443-445) on the prefill
path.  Online-softmax tiling keeps the [block_q, block_k] logit tile in
VMEM — the XLA fallback (`ops.attention.causal_prefill_attention`) spills
O(block_q x N) fp32 logits to HBM per step.

Grid layout: the (q-block, k-block) pairs are enumerated TRIANGULARLY at
trace time (causally-dead tiles — and, with a sliding window, tiles fully
below the window — are never visited or DMA'd), flattened into one grid
dimension driven by scalar-prefetched index arrays.  The output block plus
the running max/denominator live in VMEM scratch, accumulated across the
consecutive k-tiles of each q-block.

Matmul operands stay in the storage dtype (bf16 -> full-rate MXU) with fp32
accumulation; softmax statistics are fp32.

Note on score fusion: SURVEY.md §7 suggested emitting the SnapKV
observation-window scores from this kernel.  The window rows are only
W<=32 of N rows — their standalone scoring matmul (`ops.scoring.
window_scores`) is <1% of prefill attention FLOPs and re-reads K once
(~N*D*2 bytes/head), so fusion buys nothing measurable; we keep scoring
separate and simple.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(
    # scalar prefetch
    pad_ref,            # [B] int32 — left-pad length per batch row
    qidx_ref,           # [T] int32 — q-block index per grid step
    kidx_ref,           # [T] int32 — k-block index per grid step
    first_ref,          # [T] int32 — 1 iff first k-tile of this q-block
    last_ref,           # [T] int32 — 1 iff last k-tile of this q-block
    interior_ref,       # [T] int32 — 1 iff tile is fully causal/in-band
    # inputs
    q_ref,              # [1, block_q, D]
    k_ref,              # [1, block_k, D]
    v_ref,              # [1, block_k, D]
    # outputs
    o_ref,              # [1, block_q, D]
    # scratch
    acc_ref,            # [block_q, D] f32
    m_ref,              # [block_q, 128] f32
    l_ref,              # [block_q, 128] f32
    *,
    block_q: int,
    block_k: int,
    batch: int,
    sliding_window: int | None,
    fast_path: bool,
    use_exp2: bool,
    softcap: float | None,
    q_start: int,
    normalize: bool = True,
    sub_k: int = 1,
    l_mxu: bool = False,
):
    bh = pl.program_id(0)
    t = pl.program_id(1)
    qi = qidx_ref[t]
    ki = kidx_ref[t]
    b = bh // (pl.num_programs(0) // batch)
    pad = pad_ref[b]
    exp = jnp.exp2 if use_exp2 else jnp.exp

    @pl.when(first_ref[t] == 1)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # operands stay in their storage dtype (bf16) so the MXU runs at full
    # rate; accumulate in fp32 via preferred_element_type.  q arrives
    # pre-scaled by 1/sqrt(d) (and log2(e) in exp2 mode) from the caller —
    # scaling here would redo the multiply for every k-tile of the q-block.
    # With sub_k > 1 the fetched k/v block is split into sub_k sub-tiles
    # whose logit dots are ALL issued before any softmax update: the MXU
    # computes sub-tile j+1's logits while the VPU runs sub-tile j's
    # online-softmax update (no data dependency between them) — a software
    # pipeline probing the r3j finding that MXU and VPU serialize per tile.
    sk = block_k // sub_k
    ss = []
    for j in range(sub_k):
        sj = jax.lax.dot_general(
            q_ref[0], k_ref[0, j * sk:(j + 1) * sk, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [bq, sk] f32
        if softcap is not None:
            # Gemma-2 attention-logit soft-capping: q arrives pre-scaled by
            # the NATURAL softmax scale only (log2(e) cannot be folded
            # through the tanh), so the exp2 conversion happens post-cap.
            sj = jnp.tanh(sj * (1.0 / softcap)) * (
                softcap * (math.log2(math.e) if use_exp2 else 1.0)
            )
        ss.append(sj)

    def _update(s, v):
        """Online-softmax rank-1 update of (m, l, acc) with sub-tile logits
        s [bq, sk] and values v [sk, D].

        Masked entries carry _NEG_INF: after the clamped subtraction they
        sit at <= _NEG_INF/2, so exp underflows to exactly 0 — no post-exp
        re-mask is needed.  A fully-masked row keeps m == _NEG_INF and
        l == 0 (alpha == exp(0) == 1 leaves the zero acc unchanged)."""
        m_prev = m_ref[:, :1]                      # [bq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = exp(s - jnp.maximum(m_new, _NEG_INF / 2))
        alpha = exp(jnp.minimum(m_prev - m_new, 0.0))
        if l_mxu:
            # r4 probe: the row-sum of p is one of the ~3 large VPU passes
            # serializing against the MXU per tile (r3j attribution);
            # as a [bq, sk] x [sk, 8] ones-dot it rides the MXU instead
            # (f32 operands keep the exact summands; only the reduction
            # tree order changes).
            l_cur = jax.lax.dot_general(
                p, jnp.ones((s.shape[1], 8), jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, :1]
        else:
            l_cur = jnp.sum(p, axis=1, keepdims=True)
        l_new = alpha * l_ref[:, :1] + l_cur
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    def _masked_update(s, col0, v):
        rows = q_start + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, sk), 0
        )
        cols = col0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, sk), 1
        )
        mask = (cols <= rows) & (cols >= pad)
        if sliding_window is not None:
            mask &= (rows - cols) < sliding_window
        _update(jnp.where(mask, s, _NEG_INF), v)

    def _all(update):
        for j in range(sub_k):
            update(j, ss[j], v_ref[0, j * sk:(j + 1) * sk, :])

    if fast_path:
        # Tiles fully inside the causal/banded region AND past this batch
        # row's left padding need no iota/compare/select work at all — at
        # long context that is almost every tile (the causal edge is O(nq)
        # of the O(nq^2/2) visited tiles).
        fast = (interior_ref[t] == 1) & (pad <= ki * block_k)

        @pl.when(fast)
        def _fast():
            _all(lambda j, s, v: _update(s, v))

        @pl.when(~fast)
        def _slow():
            _all(lambda j, s, v: _masked_update(s, ki * block_k + j * sk, v))
    else:
        _all(lambda j, s, v: _masked_update(s, ki * block_k + j * sk, v))

    @pl.when(last_ref[t] == 1)
    def _finalize():
        if normalize:
            l = l_ref[:, :1]
            o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)
                        ).astype(o_ref.dtype)
        else:
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)  # unnormalised


def _kernel_partials(pad_ref, qidx_ref, kidx_ref, first_ref, last_ref,
                     interior_ref, q_ref, k_ref, v_ref,
                     o_ref, m_ref_out, l_ref_out,
                     acc_ref, m_ref, l_ref, **kw):
    """Partials-returning wrapper of :func:`_kernel`: the finalize writes
    the UNNORMALISED accumulator plus the running max/denominator (lane-
    broadcast, so the stores reuse the [block_q, 128] scratch layout with
    no relayout) — callers merge tiles online (chunked-prefill history
    attention over dequantized KIVI tiles).  NOTE: with ``use_exp2`` the
    (m, l) pair lives in the BASE-2 domain; merge with exp2."""
    _kernel(pad_ref, qidx_ref, kidx_ref, first_ref, last_ref, interior_ref,
            q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
            normalize=False, **kw)

    @pl.when(last_ref[pl.program_id(1)] == 1)
    def _finalize_partials():
        m_ref_out[0] = m_ref[:]
        l_ref_out[0] = l_ref[:]


def _max_kernel(
    pad_ref, qidx_ref, kidx_ref, first_ref, last_ref, interior_ref,
    q_ref, k_ref, m_out_ref, m_ref,
    *, block_q, block_k, batch, sliding_window, fast_path, use_exp2,
    softcap, q_start, sub_k,
):
    """Pass A of the two-pass schedule (VERDICT r4 weak #6 experiment):
    per-row logit max over every k-tile of the q-block — MXU dot + one
    VPU max per tile, nothing else.  The row maxes come out as a
    [1, block_q, 8] sidecar (sublane-major like the m scratch, so no
    relayout on either store or pass-B load)."""
    bh = pl.program_id(0)
    t = pl.program_id(1)
    qi = qidx_ref[t]
    ki = kidx_ref[t]
    b = bh // (pl.num_programs(0) // batch)
    pad = pad_ref[b]

    @pl.when(first_ref[t] == 1)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [bq, bk]
    if softcap is not None:
        s = jnp.tanh(s * (1.0 / softcap)) * (
            softcap * (math.log2(math.e) if use_exp2 else 1.0))
    interior = (interior_ref[t] == 1) & (pad <= ki * block_k)
    if not fast_path:
        interior = interior & False
    rows = q_start + qi * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    cols = ki * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    mask = (cols <= rows) & (cols >= pad)
    if sliding_window is not None:
        mask &= (rows - cols) < sliding_window
    s = jnp.where(interior | mask, s, _NEG_INF)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(
        jnp.maximum(m_ref[:, :1], m_cur), m_ref.shape)

    @pl.when(last_ref[t] == 1)
    def _finalize():
        m_out_ref[0] = m_ref[:, :8]


def _kernel_pass_b(
    pad_ref, qidx_ref, kidx_ref, first_ref, last_ref, interior_ref,
    q_ref, k_ref, v_ref, m_in_ref, o_ref, acc_ref, l_ref,
    *, block_q, block_k, batch, sliding_window, fast_path, use_exp2,
    softcap, q_start, sub_k,
):
    """Pass B: rescale-free accumulation against the KNOWN row maxes.

    Per tile the VPU does exp + the l row-sum only — no running max, no
    alpha exponential, no [bq, D] accumulator rescale, no m/l broadcast
    stores (the three per-tile VPU passes the single-pass schedule pays
    beyond exp; r3j attribution: MXU and VPU serialize per tile)."""
    bh = pl.program_id(0)
    t = pl.program_id(1)
    qi = qidx_ref[t]
    ki = kidx_ref[t]
    b = bh // (pl.num_programs(0) // batch)
    pad = pad_ref[b]
    exp = jnp.exp2 if use_exp2 else jnp.exp

    @pl.when(first_ref[t] == 1)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        l_ref[:] = jnp.zeros_like(l_ref)

    # fully-masked (padding) rows carry m == _NEG_INF: clamp so
    # (-inf) - m stays -inf -> exp == 0 (their l stays 0; finalize
    # guards the divide)
    m_row = jnp.maximum(m_in_ref[0][:, :1], _NEG_INF / 2)  # [bq, 1]

    sk = block_k // sub_k
    ss = []
    for j in range(sub_k):
        sj = jax.lax.dot_general(
            q_ref[0], k_ref[0, j * sk:(j + 1) * sk, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if softcap is not None:
            sj = jnp.tanh(sj * (1.0 / softcap)) * (
                softcap * (math.log2(math.e) if use_exp2 else 1.0))
        ss.append(sj)

    def _update(s, v):
        p = exp(s - m_row)
        l_ref[:] = jnp.broadcast_to(
            l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _masked_update(s, col0, v):
        rows = q_start + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, sk), 0)
        cols = col0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, sk), 1)
        mask = (cols <= rows) & (cols >= pad)
        if sliding_window is not None:
            mask &= (rows - cols) < sliding_window
        _update(jnp.where(mask, s, _NEG_INF), v)

    def _all(update):
        for j in range(sub_k):
            update(j, ss[j], v_ref[0, j * sk:(j + 1) * sk, :])

    if fast_path:
        fast = (interior_ref[t] == 1) & (pad <= ki * block_k)

        @pl.when(fast)
        def _fast():
            _all(lambda j, s, v: _update(s, v))

        @pl.when(~fast)
        def _slow():
            _all(lambda j, s, v: _masked_update(s, ki * block_k + j * sk, v))
    else:
        _all(lambda j, s, v: _masked_update(s, ki * block_k + j * sk, v))

    @pl.when(last_ref[t] == 1)
    def _finalize():
        l = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)
                    ).astype(o_ref.dtype)


@functools.lru_cache(maxsize=64)
def _triangular_pairs(nq: int, nk: int, block_q: int, block_k: int,
                      sliding_window: int | None, q_start: int = 0):
    """Static (q-tile, k-tile) visit order: causal upper-triangle only, and
    (with a sliding window) only tiles intersecting the band.  ``q_start``
    offsets the query rows globally (chunked prefill: the chunk's nq tiles
    sit at rows [q_start, q_start + nq*block_q) against nk key tiles)."""
    qidx, kidx, first, last, interior = [], [], [], [], []
    for qi in range(nq):
        row_max = q_start + qi * block_q + block_q - 1
        row_min = q_start + qi * block_q
        ks = []
        for ki in range(nk):
            col_min = ki * block_k
            col_max = ki * block_k + block_k - 1
            if col_min > row_max:
                continue  # fully above the causal diagonal
            # fully below the band iff even the smallest in-tile distance
            # (row_min - col_max) exceeds the window
            if sliding_window is not None and row_min - col_max >= sliding_window:
                continue
            # interior = every (row, col) pair in the tile is causally
            # visible (col_max <= row_min) and, with a window, in-band
            inn = col_max <= row_min and (
                sliding_window is None or row_max - col_min < sliding_window
            )
            ks.append((ki, inn))
        assert ks, (qi, nq, nk)
        for j, (ki, inn) in enumerate(ks):
            qidx.append(qi)
            kidx.append(ki)
            first.append(1 if j == 0 else 0)
            last.append(1 if j == len(ks) - 1 else 0)
            interior.append(1 if inn else 0)
    return (
        np.asarray(qidx, np.int32),
        np.asarray(kidx, np.int32),
        np.asarray(first, np.int32),
        np.asarray(last, np.int32),
        np.asarray(interior, np.int32),
    )


#: per-grid SMEM budget for the 6 int32 scalar-prefetch tables; a
#: 32k-entry table measured a scoped-SMEM exhaustion in the slash kernel
_MAX_TILE_VISITS = 16384


def _fit_blocks(nq_len: int, nk_len: int, block_q: int, block_k: int,
                sliding_window: int | None, q_start: int = 0):
    """Grow the tile sizes until the ACTUAL triangular visit count fits the
    SMEM table budget — 128k ctx lands on 1024x1024 tiles (T=8256).  Only
    doublings that still divide the respective length are taken (engine
    buckets are powers of two; odd direct-call lengths keep their size)."""
    def visits(bq, bk):
        return len(_triangular_pairs(nq_len // bq, nk_len // bk, bq, bk,
                                     sliding_window, q_start)[0])

    while visits(block_q, block_k) > _MAX_TILE_VISITS:
        if block_q <= block_k and nq_len % (2 * block_q) == 0:
            block_q *= 2
        elif nk_len % (2 * block_k) == 0:
            block_k *= 2
        elif nq_len % (2 * block_q) == 0:
            block_q *= 2
        else:
            break
    return block_q, block_k


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "sliding_window", "interpret",
                     "fast_path", "use_exp2", "scale", "softcap", "q_start",
                     "sub_k", "two_pass"),
)
def flash_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    true_len: jax.Array,
    *,
    block_q: int = 512,
    block_k: int = 512,
    sliding_window: int | None = None,
    interpret: bool = False,
    fast_path: bool = True,
    use_exp2: bool = True,
    scale: float | None = None,
    softcap: float | None = None,
    q_start: int = 0,
    sub_k: int = 1,
    two_pass: bool = False,
) -> jax.Array:
    """Causal self-attention over a left-padded buffer.

    Args / returns match ``ops.attention.causal_prefill_attention``:
    q [B, H, Nq, D], k, v [B, Hk, N, D] -> [B, H, Nq, D] (padding rows
    undefined).  ``q_start`` (static) places the queries at global columns
    [q_start, q_start + Nq) of the key buffer — the rectangular chunked-
    prefill case; the tile walk stays triangular around the shifted
    causal edge, so chunk FLOPs match the causal ideal.

    ``fast_path`` skips all mask work on tiles that are statically interior
    to the causal/banded region (and dynamically past the batch row's left
    pad); ``use_exp2`` runs the online softmax in the base-2 domain with
    log2(e) folded into the q scaling (one fewer VPU multiply per logit —
    softmax ratios are unchanged).
    """
    import os as _os

    b, h, nq_len, d = q.shape
    hk = k.shape[1]
    n = k.shape[2]
    assert q_start + nq_len == n or (q_start == 0 and nq_len == n)
    g = h // hk
    block_q, block_k = _fit_blocks(nq_len, n, min(block_q, nq_len),
                                   min(block_k, n), sliding_window, q_start)
    if block_k % sub_k or (block_k // sub_k) % 128:
        sub_k = 1  # clamped/odd blocks: fall back to the single-dot body
    # r4 probe (trace-time opt-in): ride the l row-sum on the MXU
    l_mxu = _os.environ.get("PKV_FLASH_LSUM_MXU", "0") == "1"
    assert nq_len % block_q == 0 and n % block_k == 0, (
        nq_len, n, block_q, block_k)
    nq, nk = nq_len // block_q, n // block_k
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if use_exp2 and softcap is None:
        # with soft-capping the log2(e) factor is applied in-kernel AFTER
        # the tanh (folding it into q would distort the cap)
        scale *= math.log2(math.e)
    pad = (n - true_len).astype(jnp.int32)

    qidx, kidx, first, last, interior = _triangular_pairs(
        nq, nk, block_q, block_k, sliding_window, q_start
    )
    T = len(qidx)

    # fold the softmax scale into q ONCE (fp32 multiply, bf16 storage —
    # same rounding as the previous in-kernel per-tile scaling)
    qr = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(
        b * h, nq_len, d)
    kr = k.reshape(b * hk, n, d)
    vr = v.reshape(b * hk, n, d)

    def _kv_row(bh):
        # grid row bh indexes (batch, query head); map to its KV head row
        # (grouped-query: no repeat_kv buffer is materialised)
        return (bh // h) * hk + (bh % h) // g

    q_spec = pl.BlockSpec(
        (1, block_q, d),
        lambda bh, t, pad, qx, kx, fs, ls, inn: (bh, qx[t], 0))
    k_spec = pl.BlockSpec(
        (1, block_k, d),
        lambda bh, t, pad, qx, kx, fs, ls, inn: (_kv_row(bh), kx[t], 0))
    v_spec = pl.BlockSpec(
        (1, block_k, d),
        lambda bh, t, pad, qx, kx, fs, ls, inn: (_kv_row(bh), kx[t], 0))
    o_spec = pl.BlockSpec(
        (1, block_q, d),
        lambda bh, t, pad, qx, kx, fs, ls, inn: (bh, qx[t], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b * h, T),
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=o_spec,
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    if two_pass:
        # exp-avoidance experiment (VERDICT r4 weak #6): pass A computes
        # the row maxes (MXU dot + one VPU max per tile), pass B
        # accumulates rescale-free against the known maxes (exp + l-sum
        # only on the VPU).  Trades a second QK sweep (MXU + K re-reads)
        # for dropping the per-tile online-softmax bookkeeping.
        kw = dict(block_q=block_q, block_k=block_k, batch=b,
                  sliding_window=sliding_window, fast_path=fast_path,
                  use_exp2=use_exp2, softcap=softcap, q_start=q_start,
                  sub_k=sub_k)
        max_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(b * h, T),
            in_specs=[q_spec, k_spec],
            out_specs=pl.BlockSpec(
                (1, block_q, 8),
                lambda bh, t, pad, qx, kx, fs, ls, inn: (bh, qx[t], 0)),
            scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32)],
        )
        m_rows = pl.pallas_call(
            functools.partial(_max_kernel, **kw),
            grid_spec=max_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            out_shape=jax.ShapeDtypeStruct((b * h, nq_len, 8), jnp.float32),
            interpret=interpret,
        )(pad, jnp.asarray(qidx), jnp.asarray(kidx), jnp.asarray(first),
          jnp.asarray(last), jnp.asarray(interior), qr, kr)
        b_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(b * h, T),
            in_specs=[q_spec, k_spec, v_spec,
                      pl.BlockSpec((1, block_q, 8),
                                   lambda bh, t, pad, qx, kx, fs, ls, inn:
                                   (bh, qx[t], 0))],
            out_specs=o_spec,
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_kernel_pass_b, **kw),
            grid_spec=b_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
            out_shape=jax.ShapeDtypeStruct((b * h, nq_len, d), q.dtype),
            interpret=interpret,
        )(pad, jnp.asarray(qidx), jnp.asarray(kidx), jnp.asarray(first),
          jnp.asarray(last), jnp.asarray(interior), qr, kr, vr, m_rows)
        return out.reshape(b, h, nq_len, d)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            block_q=block_q,
            block_k=block_k,
            batch=b,
            sliding_window=sliding_window,
            fast_path=fast_path,
            use_exp2=use_exp2,
            softcap=softcap,
            q_start=q_start,
            sub_k=sub_k,
            l_mxu=l_mxu,
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # (batch*heads) rows are independent; the flattened tile walk
            # carries the online-softmax accumulator -> sequential
            dimension_semantics=("parallel", "arbitrary"),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_len, d), q.dtype),
        interpret=interpret,
    )(pad, jnp.asarray(qidx), jnp.asarray(kidx), jnp.asarray(first),
      jnp.asarray(last), jnp.asarray(interior), qr, kr, vr)
    return out.reshape(b, h, nq_len, d)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "sliding_window", "interpret",
                     "fast_path", "use_exp2", "scale", "softcap", "q_start",
                     "sub_k"),
)
def flash_attention_partials(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    true_len: jax.Array,
    *,
    block_q: int = 512,
    block_k: int = 512,
    sliding_window: int | None = None,
    interpret: bool = False,
    fast_path: bool = True,
    use_exp2: bool = True,
    scale: float | None = None,
    softcap: float | None = None,
    q_start: int = 0,
    sub_k: int = 1,
):
    """:func:`flash_causal_attention` that returns ONLINE-SOFTMAX PARTIALS
    instead of the normalized output: ``(acc [B,H,Nq,D] f32 unnormalised,
    m [B,H,Nq] f32, l [B,H,Nq] f32)``.

    Callers merge tiles flash-style (chunked-prefill quantized-history
    attention: one call per dequantized KIVI tile, merged with the bf16
    self tile).  With ``use_exp2`` (default) the (m, l) statistics live in
    the BASE-2 domain — merge weights are ``exp2(m_i - m_new)`` and every
    merged source must use the same domain/scale convention (they do, by
    calling this function).

    ``q_start >= N`` marks an ALL-VISIBLE rectangular tile (history tiles:
    every key precedes every query) — the tile walk then visits all key
    tiles with no causal-edge mask work.
    """
    b, h, nq_len, d = q.shape
    hk = k.shape[1]
    n = k.shape[2]
    assert q_start + nq_len >= n, (q_start, nq_len, n)
    g = h // hk
    block_q, block_k = _fit_blocks(nq_len, n, min(block_q, nq_len),
                                   min(block_k, n), sliding_window, q_start)
    if block_k % sub_k or (block_k // sub_k) % 128:
        sub_k = 1  # clamped/odd blocks: fall back to the single-dot body
    assert nq_len % block_q == 0 and n % block_k == 0, (
        nq_len, n, block_q, block_k)
    nq, nk = nq_len // block_q, n // block_k
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if use_exp2 and softcap is None:
        scale *= math.log2(math.e)
    pad = (n - true_len).astype(jnp.int32)

    qidx, kidx, first, last, interior = _triangular_pairs(
        nq, nk, block_q, block_k, sliding_window, q_start
    )

    qr = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(
        b * h, nq_len, d)
    kr = k.reshape(b * hk, n, d)
    vr = v.reshape(b * hk, n, d)

    def _kv_row(bh):
        return (bh // h) * hk + (bh % h) // g

    o_spec = pl.BlockSpec((1, block_q, d),
                          lambda bh, t, pad, qx, kx, fs, ls, inn:
                          (bh, qx[t], 0))
    ml_spec = pl.BlockSpec((1, block_q, 128),
                           lambda bh, t, pad, qx, kx, fs, ls, inn:
                           (bh, qx[t], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(b * h, len(qidx)),
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bh, t, pad, qx, kx, fs, ls, inn:
                         (bh, qx[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, t, pad, qx, kx, fs, ls, inn:
                         (_kv_row(bh), kx[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, t, pad, qx, kx, fs, ls, inn:
                         (_kv_row(bh), kx[t], 0)),
        ],
        out_specs=[o_spec, ml_spec, ml_spec],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        functools.partial(
            _kernel_partials,
            block_q=block_q,
            block_k=block_k,
            batch=b,
            sliding_window=sliding_window,
            fast_path=fast_path,
            use_exp2=use_exp2,
            softcap=softcap,
            q_start=q_start,
            sub_k=sub_k,
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq_len, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nq_len, 128), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nq_len, 128), jnp.float32),
        ],
        interpret=interpret,
    )(pad, jnp.asarray(qidx), jnp.asarray(kidx), jnp.asarray(first),
      jnp.asarray(last), jnp.asarray(interior), qr, kr, vr)
    return (acc.reshape(b, h, nq_len, d),
            m[..., 0].reshape(b, h, nq_len),
            l[..., 0].reshape(b, h, nq_len))
