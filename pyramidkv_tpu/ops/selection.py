"""Budget schedules, top-k selection, and cache compaction.

The reference sizes each layer/head cache dynamically (torch ``cat`` /
ragged flatten).  Under XLA everything here is static-shape: selection is a
fixed-width ``lax.top_k`` whose *validity* (how many of the selected slots
are real) is a traced per-element count that reproduces the reference's
dynamic branching (``q_len < cap`` -> keep all, PyramidKV's three regimes,
AdaKV's global-top-k head allocation) exactly.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import CompressionSpec

_NEG_INF = float("-inf")


# ---------------------------------------------------------------------------
# Dynamic keep-counts (traced mirrors of the reference's Python branching)
# ---------------------------------------------------------------------------


def uniform_keep_counts(
    spec: CompressionSpec, true_len: jax.Array, window_size: int
) -> jax.Array:
    """[B] number of *past* (non-window) tokens kept by the single-budget
    methods (SnapKV/H2O/CAM/StreamingLLM/random).

    Mirrors the ``q_len < max_capacity_prompt -> no compression`` early exit
    (pyramidkv_utils.py:314-315) and the budget ``cap - w`` otherwise."""
    cap = spec.max_capacity_prompt
    avail = jnp.maximum(true_len - window_size, 0)
    return jnp.where(true_len < cap, avail, jnp.minimum(cap - window_size, avail))


def per_layer_keep_counts(
    spec: CompressionSpec, num_layers: int, true_len: jax.Array, window_size: int
) -> jax.Array:
    """[L, B] keep counts from an explicit per-layer capacity schedule
    (reference per-layer config lists, run_longbench.py:242-252)."""
    caps = jnp.asarray(spec.layer_capacity, dtype=jnp.int32)[:, None]  # [L,1]
    assert caps.shape[0] == num_layers, (caps.shape, num_layers)
    avail = jnp.maximum(true_len - window_size, 0)[None, :]
    return jnp.where(
        true_len[None, :] < caps, avail, jnp.minimum(caps - window_size, avail)
    )


def pyramid_keep_counts(
    spec: CompressionSpec, num_layers: int, true_len: jax.Array
) -> jax.Array:
    """[L, B] past-token keep counts for PyramidKV.

    Traced mirror of pyramidkv_utils.py:205-215 + the three regimes at
    :218-252: ``q_len < cap`` -> keep all; ``q_len < 2*(cap - w)`` -> uniform
    ``cap - w``; else the arithmetic pyramid (with the short-prompt clamp of
    :209-211 evaluated on the *true* length, not the padded buffer)."""
    cap, w = spec.max_capacity_prompt, spec.window_size
    capw = cap - w
    qlw = (true_len - w).astype(jnp.int32)  # [B]
    min0 = capw // spec.beta
    max0 = capw * 2 - min0
    clamped = max0 >= qlw
    max_num = jnp.where(clamped, qlw, max0)
    min_num = jnp.where(clamped, capw * 2 - qlw, min0)
    steps = (max_num - min_num) // max(num_layers - 1, 1)
    layer = jnp.arange(num_layers, dtype=jnp.int32)[:, None]
    b_l = max_num[None, :] - layer * steps[None, :]  # [L, B]
    avail = jnp.maximum(qlw, 0)[None, :]
    n = jnp.where(
        (true_len < cap)[None, :],
        avail,
        jnp.where((true_len < 2 * capw)[None, :], jnp.minimum(capw, avail), jnp.minimum(b_l, avail)),
    )
    return n


def l2norm_keep_counts(
    spec: CompressionSpec, num_layers: int, true_len: jax.Array
) -> jax.Array:
    """[L, B] TOTAL keep counts for L2Norm (no window concept; budget is the
    full ``max_capacity_prompt``; ``skip_layers`` stay uncompressed —
    pyramidkv_utils.py:405-429)."""
    cap = spec.max_capacity_prompt
    base = jnp.minimum(true_len, cap)[None, :].astype(jnp.int32)
    full = true_len[None, :].astype(jnp.int32)
    skip = jnp.zeros((num_layers, 1), dtype=bool)
    for l in spec.skip_layers:
        if 0 <= l < num_layers:
            skip = skip.at[l].set(True)
    n = jnp.where(skip, full, jnp.where((true_len < cap)[None, :], full, base))
    return n


def static_selection_width(
    spec: CompressionSpec, num_layers: int, bucket_len: int
) -> int:
    """The static top-k width: an upper bound on any layer/element keep count.

    One uniform width is used across layers (the per-layer/per-element
    validity count handles the rest), so the stacked-layer cache keeps a
    single slot dimension."""
    cap, w = spec.max_capacity_prompt, spec.window_size
    m = spec.method
    if m == "fullkv":
        return bucket_len
    if m == "l2norm":
        # skip_layers keep everything -> must be able to select the whole buffer
        return bucket_len if spec.skip_layers else min(cap, bucket_len)
    if m == "streamingllm":
        return min(4, bucket_len)  # cap - (cap - 4) sinks
    if m == "pyramidkv":
        capw = cap - w
        max0 = capw * 2 - capw // spec.beta
        return min(max0, max(bucket_len - w, 1))
    if m in ("adakv",):
        base = cap - w
        return min(int(math.ceil(base * spec.adakv_head_capacity_mult)), max(bucket_len - w, 1))
    if m == "headkv":
        assert spec.head_capacity is not None, "headkv requires head_capacity"
        mx = max(max(row) for row in spec.head_capacity)
        # The no-compression early exit can keep up to cap - w - 1 past tokens
        # per head, so the static width must cover it even if priors are small.
        return min(max(mx, cap - w), max(bucket_len - w, 1))
    # snapkv / h2o / cam / think / random
    if spec.layer_capacity is not None:
        cap = max(spec.layer_capacity)
    return min(cap - w, max(bucket_len - w, 1))


def selection_window(spec: CompressionSpec) -> int:
    """The recency window appended verbatim after the selected past tokens."""
    if spec.method == "fullkv":
        return 0
    if spec.method == "l2norm":
        return 0  # L2Norm keeps no explicit window (pyramidkv_utils.py:405-429)
    if spec.method == "streamingllm":
        return spec.streaming_window()
    return spec.window_size


# ---------------------------------------------------------------------------
# AdaKV / HeadKV per-head allocation
# ---------------------------------------------------------------------------


class HeadAllocation(NamedTuple):
    #: [B, H] int32 — number of past tokens each head keeps.
    counts: jax.Array
    #: [B, H, C] int32 — per-head column indices sorted by descending score.
    order: jax.Array


def adakv_allocate(
    scores: jax.Array,
    *,
    base_capacity: int,
    floor_ratio: float,
    normalize: bool,
    true_len: jax.Array,
    window_size: int,
    max_head_capacity: int,
) -> HeadAllocation:
    """AdaKV head-adaptive budget allocation (pyramidkv_utils.py:700-751).

    Global top-(H * base_capacity) over the per-head descending-sorted
    (optionally mass-normalised) scores decides how many slots each head
    receives; a floor guarantees ``floor_ratio * base`` per head.  The
    reference's ragged output becomes per-head counts + a per-head index
    order.  The static cache bounds any head at ``max_head_capacity`` (the
    reference is unbounded); the bound is enforced as a per-head rank mask
    BEFORE the shared top-k, so slots a heavy head cannot hold are
    redistributed to the runner-up ranks of the other heads instead of
    silently dropped (total kept stays ~H*base).
    """
    b, h, c = scores.shape
    order = jnp.argsort(-scores, axis=-1)  # descending; -inf padding sinks
    sorted_scores = jnp.take_along_axis(scores, order, axis=-1)
    finite = jnp.isfinite(sorted_scores)
    vals = jnp.where(finite, sorted_scores, 0.0)
    adjusted = sorted_scores
    if normalize:
        top_mass = jnp.where(
            jnp.arange(c)[None, None, :] < base_capacity, vals, 0.0
        ).sum(-1, keepdims=True)
        total_mass = vals.sum(-1, keepdims=True)
        ratio = top_mass / jnp.maximum(total_mass, 1e-20)
        adjusted = sorted_scores * ratio
    floor_cap = int(base_capacity * floor_ratio)
    # Pre-floor image of the slot bound: a head with pre-floor count n ends
    # at round(n*(1-fr) + floor_cap) slots; cap n so the post-floor count
    # fits max_head_capacity.
    max_pre = int((max_head_capacity - floor_cap) / max(1.0 - floor_ratio, 1e-9))
    if max_pre < c:
        adjusted = jnp.where(
            jnp.arange(c)[None, None, :] < max_pre, adjusted, -jnp.inf
        )
    flat = adjusted.reshape(b, h * c)
    k = min(h * base_capacity, h * c)
    _, flat_idx = jax.lax.top_k(flat, k)
    head_of = (flat_idx // c).astype(jnp.int32)  # [B, k]
    counts = jnp.zeros((b, h), dtype=jnp.int32)
    counts = counts.at[jnp.arange(b)[:, None], head_of].add(1)
    counts = jnp.round(counts * (1.0 - floor_ratio) + floor_cap).astype(jnp.int32)
    counts = jnp.minimum(counts, max_head_capacity)  # rounding safety
    avail = jnp.maximum(true_len - window_size, 0).astype(jnp.int32)[:, None]
    counts = jnp.minimum(counts, avail)
    # no-compression early exit: base_capacity > q_len - w -> keep everything
    # (pyramidkv_utils.py:700-703)
    counts = jnp.where(base_capacity > avail, avail, counts)
    return HeadAllocation(counts=counts, order=order.astype(jnp.int32))


def headkv_allocate(
    scores: jax.Array,
    *,
    head_capacity: jax.Array,
    base_capacity: int,
    true_len: jax.Array,
    window_size: int,
    max_head_capacity: int,
) -> HeadAllocation:
    """HeadKV: static per-head budgets from retrieval-head priors
    (pyramidkv_utils.py:808-878; capacities computed in the runner,
    run_longbench.py:225-234)."""
    b, h, c = scores.shape
    order = jnp.argsort(-scores, axis=-1)
    counts = jnp.broadcast_to(head_capacity[None, :].astype(jnp.int32), (b, h))
    counts = jnp.minimum(counts, max_head_capacity)
    avail = jnp.maximum(true_len - window_size, 0).astype(jnp.int32)[:, None]
    counts = jnp.minimum(counts, avail)
    counts = jnp.where(base_capacity > avail, avail, counts)
    return HeadAllocation(counts=counts, order=order.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Top-k selection + compaction into the static cache layout
# ---------------------------------------------------------------------------


class Selection(NamedTuple):
    #: [B, H, width] int32 buffer-column indices of the kept past tokens.
    indices: jax.Array
    #: [B, H, width] bool — which of the static slots are real.
    valid: jax.Array


def topk_select(
    scores: jax.Array, width: int, keep_counts: jax.Array
) -> Selection:
    """Fixed-width top-k with per-element dynamic validity.

    ``keep_counts`` may be [B] (broadcast over heads) or [B, H]."""
    b, h, c = scores.shape
    width = min(width, c)
    vals, idx = jax.lax.top_k(scores, width)
    if keep_counts.ndim == 1:
        keep_counts = keep_counts[:, None]
    rank = jnp.arange(width, dtype=jnp.int32)[None, None, :]
    valid = (rank < keep_counts[:, :, None]) & jnp.isfinite(vals)
    return Selection(indices=idx.astype(jnp.int32), valid=valid)


def selection_from_allocation(
    alloc: HeadAllocation, width: int
) -> Selection:
    """Turn an AdaKV/HeadKV allocation into a fixed-width Selection."""
    idx = alloc.order[..., :width]
    rank = jnp.arange(idx.shape[-1], dtype=jnp.int32)[None, None, :]
    valid = rank < alloc.counts[:, :, None]
    return Selection(indices=idx, valid=valid)


class CompactedKV(NamedTuple):
    """Static compacted cache content for ONE layer.

    Layout along the slot axis: ``[selected past (width) | recency window (W)
    | decode slots (max_new)]`` — appends during decode are O(1)
    ``dynamic_update_slice`` writes, replacing the reference's O(N)
    re-materialising CUDA append (csrc/csrc/cuda_api.cu:11-53)."""

    k: jax.Array          # [B, H, S, D]
    v: jax.Array          # [B, H, S, D]
    mask: jax.Array       # [B, H, S] bool — slot holds a real token
    positions: jax.Array  # [B, H, S] int32 — original token position, -1 if invalid


#: Chunk the one-hot compaction contraction over the buffer axis once the
#: buffer is at least this long: the [B, H, width, N] one-hot operand at
#: N=131072 x pyramidkv's ~2x segment width is a ~2-4 GB bf16 transient
#: that OOMed the 128k pyramidkv prefill compile next to the flash
#: transients + 4.3 GB of int4 weights (BASELINE r2bb) while snapkv's
#: 1x width squeaked by.  Chunking bounds it at [B, H, width, CHUNK]
#: (~126 MB) — exact: each output row's single 1.0 coefficient lives in
#: exactly one chunk, every other chunk contributes +0.0 in f32.
_COMPACT_CHUNK = 8192


def _gather_rows(indices: jax.Array, src: jax.Array, col0, chunk_cols: int,
                 hk: int) -> jax.Array:
    """One chunk of the one-hot row gather: [B,H,width] indices against
    src[:, :, col0:col0+chunk_cols, :], f32 accumulation."""
    b, h, width = indices.shape
    d = src.shape[-1]
    cols = col0 + jnp.arange(chunk_cols, dtype=jnp.int32)
    onehot = (indices[..., None] == cols[None, None, None, :]).astype(src.dtype)
    if hk == h:
        return jnp.einsum(
            "bhwn,bhnd->bhwd", onehot, src, preferred_element_type=jnp.float32
        )
    g = h // hk
    oh = onehot.reshape(b, hk, g, width, chunk_cols)
    return jnp.einsum(
        "bkgwn,bknd->bkgwd", oh, src, preferred_element_type=jnp.float32
    ).reshape(b, h, width, d)


def compact_kv(
    k: jax.Array,
    v: jax.Array,
    sel: Selection,
    *,
    window_size: int,
    decode_slots: int,
    true_len: jax.Array,
) -> CompactedKV:
    """Gather the selected past tokens + the verbatim recency window into the
    static slot layout (reference: gather + cat, pyramidkv_utils.py:341-346).
    """
    b, hk, n, d = k.shape
    h = sel.indices.shape[1]
    w = window_size
    width = sel.indices.shape[-1]
    pad = (n - true_len).astype(jnp.int32)[:, None, None]  # [B,1,1]

    # Row gather as a one-hot matmul: XLA lowers take_along_axis on
    # [B,H,width,D] rows to a scalar gather that measured ~22 ms/layer on
    # TPU at N=4096; the MXU one-hot contraction does it in <1 ms and is
    # bit-exact (single 1.0 coefficient per output row).  With grouped keys
    # (hk == num_kv_heads < H selection heads) the contraction reads each
    # KV head once for its whole query group — no repeat_kv buffer.
    if n >= 2 * _COMPACT_CHUNK and n % _COMPACT_CHUNK == 0:
        chunk = _COMPACT_CHUNK

        def body(i, acc):
            ak, av = acc
            col0 = i * chunk
            ks = jax.lax.dynamic_slice_in_dim(k, col0, chunk, axis=2)
            vs = jax.lax.dynamic_slice_in_dim(v, col0, chunk, axis=2)
            ak = ak + _gather_rows(sel.indices, ks, col0, chunk, hk)
            av = av + _gather_rows(sel.indices, vs, col0, chunk, hk)
            return ak, av

        zeros = jnp.zeros((b, h, width, d), dtype=jnp.float32)
        acc_k, acc_v = jax.lax.fori_loop(0, n // chunk, body, (zeros, zeros))
        kept_k = acc_k.astype(k.dtype)
        kept_v = acc_v.astype(v.dtype)
    else:
        kept_k = _gather_rows(sel.indices, k, 0, n, hk).astype(k.dtype)
        kept_v = _gather_rows(sel.indices, v, 0, n, hk).astype(v.dtype)
    kept_pos = sel.indices - pad  # true positions
    kept_mask = sel.valid

    if w > 0:
        win_k = k[:, :, n - w :, :]
        win_v = v[:, :, n - w :, :]
        if hk != h:
            g = h // hk
            win_k = jnp.repeat(win_k, g, axis=1)  # only W rows — tiny
            win_v = jnp.repeat(win_v, g, axis=1)
        win_col = jnp.arange(n - w, n, dtype=jnp.int32)[None, None, :]
        win_mask = jnp.broadcast_to(win_col >= pad, (b, h, w))
        win_pos = jnp.broadcast_to(win_col - pad, (b, h, w))
    else:
        win_k = win_v = win_mask = win_pos = None
    return assemble_slots(
        kept_k, kept_v, kept_mask, kept_pos,
        win_k, win_v, win_mask, win_pos, decode_slots,
    )


def assemble_slots(
    kept_k, kept_v, kept_mask, kept_pos,
    win_k, win_v, win_mask, win_pos,
    decode_slots: int,
) -> CompactedKV:
    """Assemble the static slot layout ``[selected | window | decode]`` from
    already-gathered parts; shared by :func:`compact_kv` and the
    sequence-parallel prefill (which fetches the winning rows via psum'd
    one-hot contractions instead of a local gather)."""
    b, h, _, d = kept_k.shape
    if win_k is not None:
        ck = jnp.concatenate([kept_k, win_k], axis=2)
        cv = jnp.concatenate([kept_v, win_v], axis=2)
        cmask = jnp.concatenate([kept_mask, win_mask], axis=2)
        cpos = jnp.concatenate([kept_pos, win_pos], axis=2)
    else:
        ck, cv, cmask, cpos = kept_k, kept_v, kept_mask, kept_pos

    if decode_slots > 0:
        zk = jnp.zeros((b, h, decode_slots, d), dtype=ck.dtype)
        ck = jnp.concatenate([ck, zk], axis=2)
        cv = jnp.concatenate([cv, zk], axis=2)
        cmask = jnp.concatenate(
            [cmask, jnp.zeros((b, h, decode_slots), dtype=bool)], axis=2
        )
        cpos = jnp.concatenate(
            [cpos, jnp.zeros((b, h, decode_slots), dtype=jnp.int32)], axis=2
        )

    ck = jnp.where(cmask[..., None], ck, 0)
    cv = jnp.where(cmask[..., None], cv, 0)
    cpos = jnp.where(cmask, cpos, -1)
    return CompactedKV(k=ck, v=cv, mask=cmask, positions=cpos)
