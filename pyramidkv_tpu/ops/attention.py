"""Attention primitives: blockwise causal prefill + masked decode.

The reference runs prefill attention through flash-attn 2 / SDPA / eager
matmul (/root/reference/pyramidkv/llama_model.py:174-183, :306-313,
:443-445).  On TPU the XLA path below is a chunked online-softmax scan
(O(N * block) memory, MXU-shaped matmuls); the Pallas fused kernel in
``pyramidkv_tpu.kernels`` replaces it on the hot path and additionally emits
the observation-window score vector in the same pass.

Decode attention replaces ``flash_attn_varlen_func`` over the ragged
per-head cache (llama_model.py:2386-2388): our cache is a static
``[B, H, S, D]`` slot buffer with a validity mask, so per-head variable
lengths are just masked columns — one batched matmul, no raggedness.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _scale_softcap(logits: jax.Array, scale: float,
                   softcap: float | None) -> jax.Array:
    """Scale raw QK^T logits, then (optionally) tanh-softcap them.

    Matches Gemma-2's eager_attention_forward order: softcap applies to the
    SCALED logits and the additive mask comes after (softcapping a masked
    -inf would resurrect it at -cap)."""
    logits = logits * scale
    if softcap is not None:
        logits = jnp.tanh(logits * (1.0 / softcap)) * softcap
    return logits


def causal_prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    true_len: jax.Array,
    block: int = 512,
    sliding_window: int | None = None,
    scale: float | None = None,
    softcap: float | None = None,
    q_start: int = 0,
) -> jax.Array:
    """Blockwise causal self-attention over a left-padded buffer.

    Args:
      q: [B, H, Nq, D]; k, v: [B, Hk, N, D] where Hk == H (pre-repeated) or
        Hk == num_kv_heads (grouped-query: each group of H/Hk query heads
        shares a KV head — no repeat_kv materialisation).
      true_len: [B] int32 — real tokens occupy columns [N - true_len, N)
        of the KEY buffer (padding is on the left of the full bucket; a
        chunked caller passes the extent-so-far as N, see ``q_start``).
      block: query-block size of the online-softmax scan.
      sliding_window: Mistral-style window — key j visible to query i only
        when i - j < sliding_window (mistral_model.py sliding-window slicing).
      q_start: static global column of q's first row (chunked prefill:
        the chunk's queries sit at columns [q_start, q_start + Nq) of the
        key buffer; causality is row >= col in GLOBAL coordinates).  The
        default 0 with Nq == N is plain causal self-attention.

    Returns:
      [B, H, Nq, D] attention outputs (garbage at padding rows; callers mask).
    """
    b, h, nq_len, d = q.shape
    hk = k.shape[1]
    n = k.shape[2]
    assert q_start + nq_len == n or (q_start == 0 and nq_len == n)
    if hk != h:
        g = h // hk
        q = q.reshape(b, hk, g, nq_len, d)
    # cap the transient [B, H, block, N] fp32 logits at ~256 MB
    budget = (1 << 26) // max(b * h * n, 1)
    block = max(min(block, budget), 8)
    if nq_len % block != 0:
        block = math.gcd(nq_len, block) or nq_len
    nblocks = nq_len // block
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    pad = (n - true_len).astype(jnp.int32)  # [B]
    col = jnp.arange(n, dtype=jnp.int32)
    colv = col[None, :] >= pad[:, None]  # [B, N]

    q_blocks = (
        q.reshape(b, h, nblocks, block, d).transpose(2, 0, 1, 3, 4)
        if hk == h else None
    )

    def body(_, inputs):
        bi, qb = inputs
        # operands stay in storage dtype (bf16 on TPU -> full-rate MXU);
        # accumulation is fp32 via preferred_element_type, softmax in fp32 —
        # the reference's fp16-matmul + fp32-softmax recipe.
        rows = q_start + bi * block + jnp.arange(block, dtype=jnp.int32)
        causal = col[None, :] <= rows[:, None]  # [block, N]
        if sliding_window is not None:
            causal &= (rows[:, None] - col[None, :]) < sliding_window
        mask = causal[None] & colv[:, None, :]  # [B, block, N]
        if hk == h:
            logits = _scale_softcap(jnp.einsum(
                "bhqd,bhnd->bhqn", qb, k, preferred_element_type=jnp.float32
            ), scale, softcap)
            logits = jnp.where(mask[:, None], logits, _NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum(
                "bhqn,bhnd->bhqd", probs, v,
                preferred_element_type=jnp.float32,
            )
        else:
            logits = _scale_softcap(jnp.einsum(
                "bkgqd,bknd->bkgqn", qb, k, preferred_element_type=jnp.float32
            ), scale, softcap)
            logits = jnp.where(mask[:, None, None], logits, _NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum(
                "bkgqn,bknd->bkgqd", probs, v,
                preferred_element_type=jnp.float32,
            )
        return None, out

    if hk == h:
        q_blocks_ = q_blocks
        _, outs = jax.lax.scan(body, None, (jnp.arange(nblocks), q_blocks_))
        out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, nq_len, d)
    else:
        g = h // hk
        q_blocks_ = q.reshape(b, hk, g, nblocks, block, d).transpose(3, 0, 1, 2, 4, 5)
        _, outs = jax.lax.scan(body, None, (jnp.arange(nblocks), q_blocks_))
        # outs: [nblocks, B, Hk, G, block, D]
        out = outs.transpose(1, 2, 3, 0, 4, 5).reshape(b, h, nq_len, d)
    return out.astype(q.dtype)


#: Test hook: force the fused decode-attention kernel (interpret) off-TPU.
_FORCE_DECODE_ATTN_KERNEL = [False]

#: Opt-in switch for the fused decode-attention kernel on TPU
#: (PKV_DECODE_ATTN_KERNEL=1).  Measured NEGATIVE at both geometries —
#: d8 bf16 145.0 vs 148.3 tok/s (logs/tpu_r2aj) and d32 int4 99.4 vs
#: 105.3 (logs/tpu_r2ak; scan unroll=4 was neutral, 104.0): XLA's
#: batched QK/PV matmuls pipeline the compressed-cache attention better
#: than a per-layer pallas launch, so the kernel stays off by default
#: and exists as the counterfactual record.
import os as _os

_USE_DECODE_ATTN_KERNEL = [_os.environ.get("PKV_DECODE_ATTN_KERNEL") == "1"]


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    mask: jax.Array,
    *,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """Single-token attention against the compacted static cache.

    Args:
      q: [B, H, D] — the new token's query.
      k_cache, v_cache: [B, Hk, S, D] slot buffers.  Hk == H when the cache
        stores per-query-head selections (reference parity,
        llama_model.py:158-159); Hk == num_kv_heads for true-GQA storage
        (fullkv / ``gqa_aggregate``), in which case each group of H/Hk
        queries shares its KV head.
      mask: [B, Hk, S] bool — slot holds a real token.

    On a single TPU device with a VMEM-sized cache this routes to the
    one-launch Pallas kernel (`kernels/decode_attn.py`) — per-layer
    dispatch is the decode bottleneck once weights are int4/int8 (r2ag
    decomposition); fullkv's multi-thousand-slot caches and multi-device
    traces keep the XLA path below.

    Returns: [B, H, D]
    """
    b, h, d = q.shape
    hk = k_cache.shape[1]
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    interp = _FORCE_DECODE_ATTN_KERNEL[0]
    if (scale is None and softcap is None
            and (interp or (_USE_DECODE_ATTN_KERNEL[0]
                            and jax.default_backend() == "tpu"
                            and len(jax.devices()) == 1 and d % 128 == 0))):
        from ..kernels.decode_attn import MAX_KERNEL_SLOTS, decode_attention_pallas

        if k_cache.shape[2] <= MAX_KERNEL_SLOTS and h % hk == 0:
            return decode_attention_pallas(q, k_cache, v_cache, mask,
                                           interpret=interp)
    if hk == h:
        logits = _scale_softcap(jnp.einsum(
            "bhd,bhsd->bhs", q, k_cache, preferred_element_type=jnp.float32
        ), sc, softcap)
        logits = jnp.where(mask, logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
        out = jnp.einsum(
            "bhs,bhsd->bhd", probs, v_cache, preferred_element_type=jnp.float32
        )
        return out.astype(q.dtype)
    g = h // hk
    qg = q.reshape(b, hk, g, d)
    logits = _scale_softcap(jnp.einsum(
        "bkgd,bksd->bkgs", qg, k_cache, preferred_element_type=jnp.float32
    ), sc, softcap)
    logits = jnp.where(mask[:, :, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum(
        "bkgs,bksd->bkgd", probs, v_cache, preferred_element_type=jnp.float32
    )
    return out.reshape(b, h, d).astype(q.dtype)


def decode_attention_append(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    visible: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    *,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """:func:`decode_attention` with the CURRENT token's K/V passed
    directly instead of pre-written into the cache.

    The continuous-batching decode path appends at per-lane slot offsets;
    writing before reading costs one scatter per buffer per LAYER (XLA
    scatters have high fixed cost on TPU — lane-path decode measured
    15.4 ms/step vs 11.2 for the shared-offset batch path at d32 int4,
    logs/tpu_r2ap).  Staging the new row through the layer-scan ys and
    committing ONCE per step outside the scan removes 4*(L-1) scatters;
    this helper supplies the self-attention term the cache no longer
    holds (the new token is always visible to itself).

    Args:
      q: [B, H, D]; k_cache/v_cache: [B, Hk, S, D]; visible: [B, Hk, S].
      k_new, v_new: [B, Hk, D] — the row that will be committed at this
        step's slot.
    """
    b, h, d = q.shape
    hk = k_cache.shape[1]
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    if hk == h:
        logits = _scale_softcap(jnp.einsum(
            "bhd,bhsd->bhs", q, k_cache, preferred_element_type=jnp.float32
        ), sc, softcap)
        lnew = _scale_softcap(jnp.einsum(
            "bhd,bhd->bh", q, k_new, preferred_element_type=jnp.float32
        )[..., None], sc, softcap)
        logits = jnp.concatenate(
            [jnp.where(visible, logits, _NEG_INF), lnew], axis=-1
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
        out = jnp.einsum(
            "bhs,bhsd->bhd", probs[..., :-1], v_cache,
            preferred_element_type=jnp.float32,
        ) + probs[..., -1:].astype(jnp.float32) * v_new.astype(jnp.float32)
        return out.astype(q.dtype)
    g = h // hk
    qg = q.reshape(b, hk, g, d)
    logits = _scale_softcap(jnp.einsum(
        "bkgd,bksd->bkgs", qg, k_cache, preferred_element_type=jnp.float32
    ), sc, softcap)
    lnew = _scale_softcap(jnp.einsum(
        "bkgd,bkd->bkg", qg, k_new, preferred_element_type=jnp.float32
    )[..., None], sc, softcap)
    logits = jnp.concatenate(
        [jnp.where(visible[:, :, None, :], logits, _NEG_INF), lnew], axis=-1
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum(
        "bkgs,bksd->bkgd", probs[..., :-1], v_cache,
        preferred_element_type=jnp.float32,
    ) + (probs[..., -1:].astype(jnp.float32)
         * v_new[:, :, None, :].astype(jnp.float32))
    return out.reshape(b, h, d).astype(q.dtype)


def verify_attention_append(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    mask: jax.Array,
    positions: jax.Array,
    q_pos: jax.Array,
    k_seg: jax.Array,
    v_seg: jax.Array,
    sliding_window=None,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """:func:`verify_attention` with the draft segment's K/V passed
    directly (same staging rationale as :func:`decode_attention_append`:
    the speculative-CB verify wrote 4 scatters per layer — ~4.8 ms of a
    ~25 ms iteration at 8 lanes d32 int4, logs/tpu_r2aq).

    Args:
      q: [B, H, T, D]; k_cache/v_cache: [B, Hk, S, D].
      mask/positions: [B, Hk, S] slot validity / absolute positions.
      q_pos: [B, T] the segment's absolute positions.
      k_seg, v_seg: [B, Hk, T, D] — the candidate rows (committed by the
        caller after acceptance).
    """
    b, h, t, d = q.shape
    hk = k_cache.shape[1]
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    vis = mask[:, :, None, :] & (
        positions[:, :, None, :] <= q_pos[:, None, :, None]
    )
    # in-segment causality (incl. self) + optional window
    seg_ok = jnp.tril(jnp.ones((t, t), bool))
    if sliding_window is not None:
        vis = vis & (
            positions[:, :, None, :]
            > (q_pos[:, None, :, None] - sliding_window)
        )
        delta = jnp.arange(t)[:, None] - jnp.arange(t)[None, :]
        seg_ok = seg_ok & (delta < sliding_window)
    if hk == h:
        lc = _scale_softcap(jnp.einsum(
            "bhtd,bhsd->bhts", q, k_cache, preferred_element_type=jnp.float32
        ), sc, softcap)
        ls = _scale_softcap(jnp.einsum(
            "bhtd,bhud->bhtu", q, k_seg, preferred_element_type=jnp.float32
        ), sc, softcap)
        logits = jnp.concatenate(
            [jnp.where(vis, lc, _NEG_INF),
             jnp.where(seg_ok[None, None], ls, _NEG_INF)], axis=-1
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
        out = (
            jnp.einsum("bhts,bhsd->bhtd", probs[..., : -t], v_cache,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bhtu,bhud->bhtd", probs[..., -t:], v_seg,
                         preferred_element_type=jnp.float32)
        )
        return out.astype(q.dtype)
    g = h // hk
    qg = q.reshape(b, hk, g, t, d)
    lc = _scale_softcap(jnp.einsum(
        "bkgtd,bksd->bkgts", qg, k_cache, preferred_element_type=jnp.float32
    ), sc, softcap)
    ls = _scale_softcap(jnp.einsum(
        "bkgtd,bkud->bkgtu", qg, k_seg, preferred_element_type=jnp.float32
    ), sc, softcap)
    logits = jnp.concatenate(
        [jnp.where(vis[:, :, None], lc, _NEG_INF),
         jnp.where(seg_ok[None, None, None], ls, _NEG_INF)], axis=-1
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
    out = (
        jnp.einsum("bkgts,bksd->bkgtd", probs[..., : -t], v_cache,
                   preferred_element_type=jnp.float32)
        + jnp.einsum("bkgtu,bkud->bkgtd", probs[..., -t:], v_seg,
                     preferred_element_type=jnp.float32)
    )
    return out.reshape(b, h, t, d).astype(q.dtype)


def verify_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    mask: jax.Array,
    positions: jax.Array,
    q_pos: jax.Array,
    sliding_window=None,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """Multi-token decode attention for speculative verification.

    Like :func:`decode_attention` but for ``T`` draft tokens at once: the
    caller has already appended all ``T`` candidate K/V rows, so query
    ``t`` must see only slots whose ORIGINAL position is <= its own —
    the per-query position bound supplies the in-segment causal mask
    (cached prefill slots all have smaller positions and pass trivially).

    Args:
      q: [B, H, T, D] — the draft segment's queries.
      k_cache, v_cache: [B, Hk, S, D] slot buffers (Hk == H or H % Hk == 0).
      mask: [B, Hk, S] bool slot validity.
      positions: [B, Hk, S] int32 absolute token positions (-1 invalid).
      q_pos: [B, T] int32 absolute positions of the draft tokens.
      sliding_window: optional int — Mistral-style window on top.

    Returns [B, H, T, D] in q's dtype.
    """
    b, h, t, d = q.shape
    hk = k_cache.shape[1]
    vis = mask[:, :, None, :] & (
        positions[:, :, None, :] <= q_pos[:, None, :, None]
    )
    if sliding_window is not None:
        vis = vis & (
            positions[:, :, None, :]
            > (q_pos[:, None, :, None] - sliding_window)
        )
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    if hk == h:
        logits = _scale_softcap(jnp.einsum(
            "bhtd,bhsd->bhts", q, k_cache,
            preferred_element_type=jnp.float32,
        ), sc, softcap)
        logits = jnp.where(vis, logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
        out = jnp.einsum(
            "bhts,bhsd->bhtd", probs, v_cache,
            preferred_element_type=jnp.float32,
        )
        return out.astype(q.dtype)
    g = h // hk
    qg = q.reshape(b, hk, g, t, d)
    logits = _scale_softcap(jnp.einsum(
        "bkgtd,bksd->bkgts", qg, k_cache,
        preferred_element_type=jnp.float32,
    ), sc, softcap)
    logits = jnp.where(vis[:, :, None, :, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum(
        "bkgts,bksd->bkgtd", probs, v_cache,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, t, d).astype(q.dtype)


def verify_attention_partials(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    mask: jax.Array,
    positions: jax.Array,
    q_pos: jax.Array,
    *,
    sliding_window=None,
    scale: float | None = None,
    softcap: float | None = None,
):
    """Online-softmax partials of :func:`verify_attention` — the
    multi-token (speculative-verify) analogue of
    :func:`decode_attention_partials`, for merging the bf16 decode tail
    of a QUANTIZED cache with its region partials.

    Args match :func:`verify_attention` (q [B,H,T,D], per-slot position
    bound supplies the in-segment causal mask).  Returns
    (acc [B,H,T,D] f32, m [B,H,T] f32, l [B,H,T] f32) — merge with
    :func:`merge_attention_partials`.
    """
    b, h, t, d = q.shape
    hk = k_cache.shape[1]
    vis = mask[:, :, None, :] & (
        positions[:, :, None, :] <= q_pos[:, None, :, None]
    )
    if sliding_window is not None:
        vis = vis & (
            positions[:, :, None, :]
            > (q_pos[:, None, :, None] - sliding_window)
        )
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    if hk == h:
        logits = _scale_softcap(jnp.einsum(
            "bhtd,bhsd->bhts", q, k_cache,
            preferred_element_type=jnp.float32), sc, softcap)
        logits = jnp.where(vis, logits, _NEG_INF)
        m = jnp.max(logits, axis=-1)
        p = jnp.exp(logits - jnp.maximum(m, _NEG_INF / 2)[..., None])
        p = jnp.where(vis, p, 0.0)
        l = p.sum(-1)
        acc = jnp.einsum("bhts,bhsd->bhtd", p, v_cache.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return acc, m, l
    g = h // hk
    qg = q.reshape(b, hk, g, t, d)
    logits = _scale_softcap(jnp.einsum(
        "bkgtd,bksd->bkgts", qg, k_cache,
        preferred_element_type=jnp.float32), sc, softcap)
    vis5 = vis[:, :, None, :, :]
    logits = jnp.where(vis5, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - jnp.maximum(m, _NEG_INF / 2)[..., None])
    p = jnp.where(vis5, p, 0.0)
    l = p.sum(-1).reshape(b, h, t)
    acc = jnp.einsum("bkgts,bksd->bkgtd", p, v_cache.astype(jnp.float32),
                     preferred_element_type=jnp.float32).reshape(b, h, t, d)
    return acc, m.reshape(b, h, t), l


def verify_attention_think(
    q: jax.Array,
    k_pruned: jax.Array,
    kept_channels: jax.Array,
    k_rest: jax.Array,
    v_cache: jax.Array,
    mask: jax.Array,
    positions: jax.Array,
    q_pos: jax.Array,
    *,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """Multi-token :func:`decode_attention_think` for speculative
    verification: the two ThinK logit blocks (channel-gathered query x
    narrow pruned keys, full query x recent/window/decode keys —
    llama_model_think.py:175-181) with the per-query position bound
    masking the in-segment causal structure.

    Args:
      q: [B, H, T, D]; q_pos: [B, T] absolute draft positions.
      positions/mask: [B, H, Sp+Sr] over the FULL slot layout.
    Returns [B, H, T, D] in q's dtype.
    """
    b, h, t, d = q.shape
    q_kept = jnp.take_along_axis(
        q, jnp.broadcast_to(kept_channels[:, :, None, :],
                            (b, h, t, kept_channels.shape[-1])), axis=-1)
    lp = jnp.einsum("bhtd,bhsd->bhts", q_kept, k_pruned,
                    preferred_element_type=jnp.float32)
    lr = jnp.einsum("bhtd,bhsd->bhts", q, k_rest,
                    preferred_element_type=jnp.float32)
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = _scale_softcap(jnp.concatenate([lp, lr], axis=-1), sc, softcap)
    vis = mask[:, :, None, :] & (
        positions[:, :, None, :] <= q_pos[:, None, :, None]
    )
    logits = jnp.where(vis, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum("bhts,bhsd->bhtd", probs, v_cache,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def decode_attention_think(
    q: jax.Array,
    k_pruned: jax.Array,
    kept_channels: jax.Array,
    k_rest: jax.Array,
    v_cache: jax.Array,
    mask: jax.Array,
    *,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """ThinK decode: two partial logit blocks concatenated before softmax
    (llama_model_think.py:175-181) — channel-gathered query x narrow pruned
    keys, full query x full-width recent/window/decode keys.

    Args:
      q: [B, H, D].
      k_pruned: [B, H, Sp, D_kept] narrow keys (slots [0, Sp)).
      kept_channels: [B, H, D_kept] int32 (ascending).
      k_rest: [B, H, Sr, D] full-width keys (slots [Sp, Sp+Sr)).
      v_cache: [B, H, Sp+Sr, D] full-width values.
      mask: [B, H, Sp+Sr] bool.

    The softmax scale stays 1/sqrt(D) for BOTH blocks (the reference scales
    by the full head_dim, llama_model_think.py:177).  The channel gather is
    a last-axis gather on a [B,H,D] per-step tensor — not the slot-axis row
    gather the TPU pathology notes forbid.
    """
    b, h, d = q.shape
    q_kept = jnp.take_along_axis(q, kept_channels, axis=-1)  # [B,H,Dk]
    lp = jnp.einsum(
        "bhd,bhsd->bhs", q_kept, k_pruned, preferred_element_type=jnp.float32
    )
    lr = jnp.einsum(
        "bhd,bhsd->bhs", q, k_rest, preferred_element_type=jnp.float32
    )
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = _scale_softcap(jnp.concatenate([lp, lr], axis=-1), sc, softcap)
    logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
    out = jnp.einsum(
        "bhs,bhsd->bhd", probs, v_cache, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def decode_attention_partials(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    mask: jax.Array,
    *,
    scale: float | None = None,
    softcap: float | None = None,
):
    """Online-softmax partials of single-token attention: returns
    (acc [B,H,D] f32, m [B,H] f32, l [B,H] f32) for flash-style combination
    with other regions (out = acc / l after merging)."""
    b, h, d = q.shape
    hk = k_cache.shape[1]
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    qx = q if hk == h else q.reshape(b, hk, h // hk, d)
    if hk == h:
        logits = _scale_softcap(jnp.einsum(
            "bhd,bhsd->bhs", qx, k_cache, preferred_element_type=jnp.float32
        ), sc, softcap)
        logits = jnp.where(mask, logits, _NEG_INF)
    else:
        logits = _scale_softcap(jnp.einsum(
            "bkgd,bksd->bkgs", qx, k_cache, preferred_element_type=jnp.float32
        ), sc, softcap)
        logits = jnp.where(mask[:, :, None, :], logits, _NEG_INF)
    m = jnp.max(logits, axis=-1)
    p = jnp.exp(logits - jnp.maximum(m, _NEG_INF / 2)[..., None])
    if hk == h:
        p = jnp.where(mask, p, 0.0)
        l = p.sum(-1)
        acc = jnp.einsum("bhs,bhsd->bhd", p, v_cache.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    else:
        p = jnp.where(mask[:, :, None, :], p, 0.0)
        l = p.sum(-1).reshape(b, h)
        acc = jnp.einsum("bkgs,bksd->bkgd", p, v_cache.astype(jnp.float32),
                         preferred_element_type=jnp.float32).reshape(b, h, d)
        m = m.reshape(b, h)
    return acc, m, l


def tile_attention_partials(
    q: jax.Array,
    k_tile: jax.Array,
    v_tile: jax.Array,
    mask: jax.Array,
    *,
    scale: float | None = None,
    softcap: float | None = None,
    q_block: int = 1024,
):
    """Online-softmax partials of a MULTI-ROW query block against one K/V
    tile (the chunked-prefill analogue of :func:`decode_attention_partials`).

    Args:
      q: [B, H, T, D] queries; k_tile/v_tile: [B, Hk, S, D].
      mask: [B, T, S] (or [B, 1, S], broadcast over rows) visibility —
        causality/padding are the CALLER's job (global column arithmetic
        lives in models/chunked_prefill.py).
      q_block: row-block size bounding the [B, H, q_block, S] fp32 logits.

    Returns (acc [B,H,T,D] f32, m [B,H,T] f32, l [B,H,T] f32); merge
    tiles with :func:`merge_partials_pair`.
    """
    b, h, t, d = q.shape
    hk = k_tile.shape[1]
    g = h // hk
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    if mask.shape[1] == 1 and t > 1:
        mask = jnp.broadcast_to(mask, (b, t, mask.shape[-1]))

    def block(qb, mb):
        tb = qb.shape[2]
        qx = qb.reshape(b, hk, g, tb, d)
        logits = _scale_softcap(jnp.einsum(
            "bkgtd,bksd->bkgts", qx, k_tile,
            preferred_element_type=jnp.float32), sc, softcap)
        logits = jnp.where(mb[:, None, None], logits, _NEG_INF)
        m = jnp.max(logits, axis=-1)                       # [B,Hk,G,Tb]
        p = jnp.exp(logits - jnp.maximum(m, _NEG_INF / 2)[..., None])
        p = jnp.where(mb[:, None, None], p, 0.0)
        l = p.sum(-1)
        acc = jnp.einsum("bkgts,bksd->bkgtd", p.astype(v_tile.dtype), v_tile,
                         preferred_element_type=jnp.float32)
        return (acc.reshape(b, h, tb, d), m.reshape(b, h, tb),
                l.reshape(b, h, tb))

    if t <= q_block or t % q_block != 0:
        return block(q, mask)
    nb = t // q_block
    qb = q.reshape(b, h, nb, q_block, d).transpose(2, 0, 1, 3, 4)
    mb = mask.reshape(b, nb, q_block, -1).transpose(1, 0, 2, 3)
    _, (accs, ms, ls) = jax.lax.scan(
        lambda _, xm: (None, block(xm[0], xm[1])), None, (qb, mb))
    return (accs.transpose(1, 2, 0, 3, 4).reshape(b, h, t, d),
            ms.transpose(1, 2, 0, 3).reshape(b, h, t),
            ls.transpose(1, 2, 0, 3).reshape(b, h, t))


def merge_partials_pair(a, b):
    """Online-merge two flash partial triples (acc, m, l) of matching
    shape (acc [..., D], m/l [...])."""
    acc1, m1, l1 = a
    acc2, m2, l2 = b
    m = jnp.maximum(m1, m2)
    w1 = jnp.where(m1 <= _NEG_INF / 2, 0.0, jnp.exp(jnp.minimum(m1 - m, 0.0)))
    w2 = jnp.where(m2 <= _NEG_INF / 2, 0.0, jnp.exp(jnp.minimum(m2 - m, 0.0)))
    return (acc1 * w1[..., None] + acc2 * w2[..., None], m, l1 * w1 + l2 * w2)


def merge_attention_partials(parts):
    """Combine flash partials [(acc, m, l), ...] -> [B, H, D] output."""
    m_all = parts[0][1]
    for _, m, _ in parts[1:]:
        m_all = jnp.maximum(m_all, m)
    num = 0.0
    den = 0.0
    for acc, m, l in parts:
        w = jnp.exp(jnp.minimum(m - m_all, 0.0))
        w = jnp.where(m <= _NEG_INF / 2, 0.0, w)
        num = num + acc * w[..., None]
        den = den + l * w
    return num / jnp.maximum(den, 1e-30)[..., None]
