"""Chunked prefill: the prompt forward split into fixed-size token chunks.

Why: continuous batching runs decode in quanta between refills; a 32k
refill's monolithic prefill occupies the chip for seconds and stalls every
live lane's decode (BASELINE "cb32k_d32" — 6.6 s stalls).  Chunked prefill
dispatches one chunk at a time so decode quanta interleave at chunk
granularity (vLLM-style chunked prefill, reframed for static XLA shapes).
The reference has no serving path at all (its batching TODO:
/root/reference/README.md:47); this is our own north star.

Design (everything static under jit):
- The full-KV working set rides a ``ChunkState`` carry: per-layer
  ``[L, B, KV, N, D]`` K/V buffers at the bucket length.  Chunk ``i``
  writes its RoPE'd K/V at static offset ``i*C`` (one
  ``dynamic_update_slice`` per layer) and attends its ``C`` queries over
  the static extent ``(i+1)*C`` — per-chunk-index jit specialisation keeps
  the attention exactly causal-FLOP (the flash kernel's triangular tile
  walk takes a ``q_start`` offset), at bucket/C compiles per bucket.
- Compression happens once, in ``prefill_finish``: the observation-window
  queries captured from the LAST chunk feed ``policy.compress_layer``
  per layer — identical math to the monolithic ``llama.prefill``, so
  kept-sets and greedy tokens match the unchunked path exactly (tested).

Method coverage: every method whose scoring reads only the window (or
trailing-32) queries — snapkv / pyramidkv / adakv / headkv / streamingllm
/ l2norm / random / fullkv / cam / think (both layouts) / pivot merge —
including KIVI/kvquant region quantization of the compressed cache at
finish (identical math to the monolithic per-layer quantization: the bf16
carry holds the same values).

- h2o chunks via a TWO-PASS scheme (VERDICT r3 #5).  Its score is
  EXACTLY the reference's quirky statistic (pyramidkv_utils.py:544-561)
  — a softmax over ALL columns with the causal mask applied only inside
  the trailing WxW block, summed over ALL query rows.  Rows in chunk u
  attend keys of chunks t > u in both the numerator and the
  denominator, so no SINGLE-pass per-chunk accumulation with bounded
  state exists: S_j = sum_i exp(s_ij - m_i)/l_i mixes rows whose
  (m_i, l_i) only finalise after the LAST chunk, and recovering them
  later would need every layer's full query tensor ([L, B, H, N, D] —
  4x the K carry under GQA).  Instead, once pass 1 completes the K
  carry, a SECOND chunked pass re-runs the forward (bit-identical
  hidden states — the carry holds the same K/V) and accumulates each
  chunk's rows' EXACT column-sum contributions against the full K
  buffer (``ops.scoring.h2o_partial_scores``): every row's softmax
  stats are final because all columns exist.  Cost: 2x prefill compute
  for h2o refills — the price of serving the reference's non-causal
  statistic under chunked refills; the engine folds the score
  accumulator into the chunk-state tuple so the CB driver is uniform.
- minference cannot chunk: it replaces prefill attention itself
  (per-head sparse patterns over the full context).

`supports_chunked` encodes this table.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache import KVCache
from ..config import ModelSpec
from ..ops.attention import (causal_prefill_attention, merge_partials_pair,
                             tile_attention_partials)
from ..policy import PolicyPlan, compress_layer, layer_contexts
from . import llama
from .weights import embed_lookup, mm


class ChunkState(NamedTuple):
    """Resumable prefill state: the growing full-KV buffers.

    ``k``/``v``: [L, B, KV, N, D] in the activation dtype; columns
    [0, chunk_start) hold previous chunks' RoPE'd projections (padding
    columns included — validity is derived from ``true_len`` exactly as in
    the monolithic prefill)."""

    k: jax.Array
    v: jax.Array


def supports_chunked(plan: PolicyPlan) -> bool:
    """True when the plan's compression reads only trailing queries (see
    the module docstring's method table — h2o/minference cannot)."""
    spec = plan.spec
    if spec.method == "think":
        # channel scores read the last 32 REAL query rows
        # (ops/think.py::think_channel_selection, reference
        # pyramidkv_utils.py:17 q[..., -32:, :]); those rows live inside
        # the captured window iff window >= 32.  Applies to both the
        # dense-zeroing and narrow-split layouts.
        return plan.window >= 32
    if spec.method == "fullkv":
        # fullkv+quant belongs to the QUANTIZED chunk carry
        # (supports_chunked_quant) — a bf16 carry would defeat the
        # memory purpose that path exists for
        return spec.quant_method is None
    return spec.method in ("snapkv", "pyramidkv", "adakv", "headkv",
                           "streamingllm", "l2norm", "random", "cam",
                           "h2o")


def needs_score_pass(plan: PolicyPlan) -> bool:
    """h2o's chunked prefill appends a second (score-reconstruction) pass
    over the same chunks — see the module docstring."""
    return plan.spec.method == "h2o"


def init_h2o_scores(spec: ModelSpec, plan: PolicyPlan,
                    batch: int) -> jax.Array:
    """[L, B, H, N - W] f32 column-sum accumulator for the h2o
    reconstruction pass."""
    return jnp.zeros(
        (spec.num_hidden_layers, batch, spec.num_attention_heads,
         plan.bucket_len - plan.window), jnp.float32)


def init_state(spec: ModelSpec, plan: PolicyPlan, batch: int,
               dtype) -> ChunkState:
    shape = (spec.num_hidden_layers, batch, spec.num_key_value_heads,
             plan.bucket_len, spec.head_dim)
    return ChunkState(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def prefill_chunk(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    state: ChunkState,
    tokens: jax.Array,
    true_len: jax.Array,
    *,
    chunk_start: int,
    attention_impl: str = "xla",
    prefill_block: int = 512,
    prefill_sub_k: int = 1,
    score_acc: Optional[jax.Array] = None,
):
    """Forward one token chunk through all layers against the state so far.

    Args:
      tokens: [B, C] the chunk's token ids (columns [chunk_start,
        chunk_start + C) of the left-padded bucket buffer).
      chunk_start: STATIC global column of the chunk's first token.
      score_acc: h2o reconstruction pass (pass 2) only — the
        [L, B, H, N - W] column-sum accumulator.  When given, the K
        carry is COMPLETE (every chunk already written), the chunk's
        forward is recomputed bit-identically, and each layer adds its
        rows' exact h2o contributions against the full K buffer.

    Returns:
      (state', window_q [L, B, H, W, D] — the plan-window queries of this
      chunk (consumed by ``prefill_finish`` when this was the last chunk),
      hidden_last [B, Dm] — the chunk's final hidden row), plus the
      updated ``score_acc`` as a 4th element when one was passed.
    """
    b, c = tokens.shape
    n = plan.bucket_len
    kv_extent = chunk_start + c
    assert kv_extent <= n, (chunk_start, c, n)
    w = plan.window
    assert w <= c, (w, c)
    kvh = spec.num_key_value_heads
    dh = spec.head_dim
    inv_freq = llama.rope_inv_freq(spec)
    pad = (n - true_len).astype(jnp.int32)
    cols = chunk_start + jnp.arange(c, dtype=jnp.int32)
    positions = cols[None, :] - pad[:, None]  # [B, C]
    # attention fns derive the key pad from their OWN key length
    # (kv_extent), so the effective length shifts by the unseen tail
    eff_len = true_len.astype(jnp.int32) - (n - kv_extent)

    act_dtype = params["final_norm"].dtype
    hidden0 = embed_lookup(params["embed"], tokens, act_dtype)
    if spec.scale_embeddings:
        hidden0 = hidden0 * jnp.asarray(
            math.sqrt(spec.hidden_size), dtype=act_dtype)
    unit = spec.rmsnorm_unit_offset
    ascale = (spec.attn_scale
              if spec.query_pre_attn_scalar is not None else None)
    asoftcap = spec.attn_logit_softcapping
    sliding_flags = (
        jnp.asarray([spec.layer_is_sliding(i)
                     for i in range(spec.num_hidden_layers)])
        if spec.mixed_sliding else None
    )

    def chunk_attn(q, kh, vh, win):
        if attention_impl in ("pallas", "pallas_interpret"):
            from ..kernels import flash_causal_attention

            # 1024-tile floor, like the monolithic prefill (logs/tpu_r3k)
            fb = max(prefill_block, 1024)
            bq = fb if prefill_sub_k == 1 else max(fb // prefill_sub_k, 512)
            return flash_causal_attention(
                q, kh, vh, eff_len,
                block_q=min(bq, c),
                block_k=min(fb, kv_extent),
                sub_k=prefill_sub_k,
                sliding_window=win,
                interpret=attention_impl == "pallas_interpret",
                scale=ascale, softcap=asoftcap, q_start=chunk_start,
            )
        return causal_prefill_attention(
            q, kh, vh, true_len=eff_len, block=prefill_block,
            sliding_window=win, scale=ascale, softcap=asoftcap,
            q_start=chunk_start,
        )

    def layer_fn(carry, xs):
        hidden, kf, vf, sa = carry
        wts, li = xs
        x = llama.rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps, unit)
        q, k, v = llama._qkv(x, wts, spec)
        q = llama.apply_rope(q, positions, inv_freq)
        k = llama.apply_rope(k, positions, inv_freq)
        kf = jax.lax.dynamic_update_slice(
            kf, k[None].astype(kf.dtype), (li, 0, 0, chunk_start, 0))
        vf = jax.lax.dynamic_update_slice(
            vf, v[None].astype(vf.dtype), (li, 0, 0, chunk_start, 0))
        if sa is not None:
            # pass 2: the full K buffer exists — these rows' h2o column
            # contributions are final (h2o_partial_scores docstring)
            from ..ops.scoring import h2o_partial_scores

            k_full = jax.lax.dynamic_slice(
                kf, (li, 0, 0, 0, 0), (1, b, kvh, n, dh))[0]
            part = h2o_partial_scores(
                q, k_full, row_start=chunk_start, window_size=w,
                true_len=true_len, scale=ascale, softcap=asoftcap,
            )
            sa_li = jax.lax.dynamic_slice(
                sa, (li, 0, 0, 0), (1,) + part.shape)
            sa = jax.lax.dynamic_update_slice(
                sa, sa_li + part[None], (li, 0, 0, 0))
        kh = jax.lax.dynamic_slice(
            kf, (li, 0, 0, 0, 0), (1, b, kvh, kv_extent, dh))[0]
        vh = jax.lax.dynamic_slice(
            vf, (li, 0, 0, 0, 0), (1, b, kvh, kv_extent, dh))[0]
        if sliding_flags is None:
            attn = chunk_attn(q, kh, vh, spec.sliding_window)
        else:
            attn = jax.lax.cond(
                sliding_flags[li],
                lambda: chunk_attn(q, kh, vh, spec.sliding_window),
                lambda: chunk_attn(q, kh, vh, None),
            )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, c, -1)
        ao = mm(attn, wts["wo"])
        if spec.post_block_norms:
            ao = llama.rms_norm(ao, wts["attn_post_norm"],
                                spec.rms_norm_eps, unit)
        hidden = hidden + ao
        x2 = llama.rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps, unit)
        mo = llama._mlp(
            x2, wts, spec.num_experts_per_tok,
            capacity_factor=spec.moe_capacity_factor,
            valid=positions >= 0, hidden_act=spec.hidden_act,
        )
        if spec.post_block_norms:
            mo = llama.rms_norm(mo, wts["mlp_post_norm"],
                                spec.rms_norm_eps, unit)
        hidden = hidden + mo
        return (hidden, kf, vf, sa), q[:, :, c - w:, :]

    (hidden, kf, vf, sa), window_q = jax.lax.scan(
        layer_fn, (hidden0, state.k, state.v, score_acc),
        (params["layers"],
         jnp.arange(spec.num_hidden_layers, dtype=jnp.int32)),
    )
    if score_acc is not None:
        return ChunkState(k=kf, v=vf), window_q, hidden[:, -1, :], sa
    return ChunkState(k=kf, v=vf), window_q, hidden[:, -1, :]


def prefill_finish(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    state: ChunkState,
    window_q: jax.Array,
    hidden_last: jax.Array,
    true_len: jax.Array,
    rng: Optional[jax.Array] = None,
    h2o_raw_scores: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Compress the accumulated full-KV state into the slot cache.

    ``window_q``: [L, B, H, W, D] observation-window queries from the LAST
    chunk.  Each layer rebuilds a bucket-length query buffer that is zero
    except at the window — ``compress_layer`` reads only those rows for
    every supported method (think's channel scorer reads the last 32 rows,
    inside the window by the ``supports_chunked`` guard), so the
    compression math is bit-identical to the monolithic prefill's.  The
    three per-layer tails (plain compact / think narrow split / region
    quantization) mirror ``llama.prefill``'s layer_fn exactly, feeding the
    shared ``assemble_cache``.
    """
    assert supports_chunked(plan), plan.spec.method
    # h2o's statistic cannot be built from window queries — it MUST come
    # from the reconstruction pass (module docstring)
    assert (plan.spec.method != "h2o") or (h2o_raw_scores is not None)
    n = plan.bucket_len
    w = plan.window
    l_, b, h, wq_w, dh = window_q.shape
    assert wq_w == w, (wq_w, w)
    ctxs = layer_contexts(plan, true_len, spec.num_attention_heads, rng)
    tl = true_len.astype(jnp.int32)

    seg_ckvs = []
    for start, stop, sub in plan.segment_plans():
        def body(_, li, sub=sub):
            ctx = jax.tree_util.tree_map(lambda x: x[li], ctxs)
            qfull = jnp.zeros((b, h, n, dh), window_q.dtype)
            qfull = jax.lax.dynamic_update_slice(
                qfull, window_q[li], (0, 0, n - w, 0))
            ckv = compress_layer(
                sub, ctx, qfull, state.k[li], state.v[li], true_len=tl,
                h2o_raw_scores=(None if h2o_raw_scores is None
                                else h2o_raw_scores[li]))
            if sub.think_narrow:
                from ..policy import think_split

                kp, kc, krest = think_split(ckv, qfull, sub, tl)
                return None, (ckv._replace(k=krest), kp, kc)
            if sub.spec.quant_method is not None:
                # quantize the compacted prefill region per layer, exactly
                # like the monolithic scan (models/llama.py layer_fn)
                from ..ops.quant import quantize_kv_region

                qs = sub.spec
                sp_q = sub.prefill_slots
                reg = quantize_kv_region(
                    ckv.k[:, :, :sp_q, :], ckv.v[:, :, :sp_q, :],
                    nbits=qs.nbits, group_size=qs.q_group_size,
                    outlier_threshold=(
                        qs.outlier_threshold
                        if qs.quant_method == "kvquant" else None
                    ),
                    layout=qs.q_layout,
                )
                return None, (
                    ckv._replace(k=ckv.k[:, :, sp_q:, :],
                                 v=ckv.v[:, :, sp_q:, :]),
                    reg,
                )
            return None, ckv

        _, ckv = jax.lax.scan(
            body, None, jnp.arange(start, stop, dtype=jnp.int32))
        seg_ckvs.append(ckv)
    logits = llama._logits(hidden_last, params, spec)
    return logits, llama.assemble_cache(plan, seg_ckvs, true_len)


# ---------------------------------------------------------------------------
# Quantized chunk carry (fullkv + KIVI): blockwise prefill quantization
# ---------------------------------------------------------------------------


class QuantChunkState(NamedTuple):
    """Quantized full-KV carry: each chunk's K/V are quantized AS THEY EXIT
    the chunk forward, so the bf16 full-context cache is never materialised
    — the enabler for 128k full-KV on one chip (the post-hoc path OOMs:
    BASELINE "128k fullkv kivi4 does NOT fit").

    Packing is CHUNK-LOCAL planar (each chunk's ``per`` bit-planes span
    that chunk's slots); `prefill_finish_quant` repacks to the region-global
    planar layout so the finished cache is byte-compatible with the
    post-hoc `ops.quant.quantize_kv_region` output (groups align because
    the chunk is a multiple of group_size * per — layer 0 repacks
    bit-identically, tested)."""

    k_codes: jax.Array   # [L,B,KV,N/per,D] int8, chunk-local planar
    #: (slot-major since r4 — the layout every consumer dot prefers;
    #: the old channel-major carry was whole-buffer relayout-copied)
    k_scale: jax.Array   # [L,B,KV,D,N/gs,1] f32
    k_zero: jax.Array
    v_codes: jax.Array   # [L,B,KV,N/per,Dp] int8, chunk-local planar (slots)
    v_scale: jax.Array   # [L,B,KV,N,Dp/gs,1] f32
    v_zero: jax.Array


def _quant_groups(cs, chunk: int, dp: int) -> Tuple[int, int]:
    """(K slot-group, V channel-group) sizes for the chunk carry.

    ``q_layout='pa'``: K groups are ONE PER CHUNK (the chunk is the widest
    slot span whose values exist together during prefill — the finished
    region is 'grouped with group=chunk', which the factored decode path
    handles like any grouped layout), V stays exactly per-token (channel
    grouping is untouched by slot chunking)."""
    if cs.q_layout == "pa":
        return chunk, dp
    return cs.q_group_size, cs.q_group_size


def supports_chunked_quant(plan: PolicyPlan, chunk: int) -> bool:
    """fullkv + KIVI only: compression methods already fit long contexts
    (their caches are capacity-bounded); kvquant's outlier sidecars keep
    the post-hoc path (its dequant-in-prefill would need outlier
    injection per history tile)."""
    spec = plan.spec
    if spec.method != "fullkv" or spec.quant_method != "kivi":
        return False
    per = 8 // spec.nbits
    if spec.q_layout == "pa":
        # per-chunk K groups: the planar repack and the factored decode's
        # per-plane group slicing need whole groups per bit-plane
        ok = (chunk % per == 0
              and (plan.bucket_len // chunk) % per == 0)
    else:
        ok = chunk % (spec.q_group_size * per) == 0
    return (ok
            and plan.prefill_slots == plan.bucket_len
            and plan.bucket_len % chunk == 0)


def init_quant_state(spec: ModelSpec, plan: PolicyPlan, batch: int,
                     chunk: int) -> QuantChunkState:
    from ..ops.quant import _round_up

    cs = plan.spec
    per = 8 // cs.nbits
    L, kv, d = (spec.num_hidden_layers, spec.num_key_value_heads,
                spec.head_dim)
    n = plan.bucket_len
    dp = _round_up(d, cs.q_group_size)
    kg, vg = _quant_groups(cs, chunk, dp)
    return QuantChunkState(
        k_codes=jnp.zeros((L, batch, kv, n // per, d), jnp.int8),
        k_scale=jnp.zeros((L, batch, kv, d, n // kg, 1), jnp.float32),
        k_zero=jnp.zeros((L, batch, kv, d, n // kg, 1), jnp.float32),
        v_codes=jnp.zeros((L, batch, kv, n // per, dp), jnp.int8),
        v_scale=jnp.zeros((L, batch, kv, n, dp // vg, 1), jnp.float32),
        v_zero=jnp.zeros((L, batch, kv, n, dp // vg, 1), jnp.float32),
    )


def prefill_chunk_quant(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    state: QuantChunkState,
    tokens: jax.Array,
    true_len: jax.Array,
    chunk_start: jax.Array,
    *,
    q_block: int = 1024,
    attention_impl: str = "xla",
) -> Tuple[QuantChunkState, jax.Array, jax.Array]:
    """One chunk forward with a QUANTIZED history: the chunk's own K/V stay
    bf16 for its causal self-attention; earlier chunks are dequantized one
    tile at a time into flash partials (`ops.attention.
    tile_attention_partials`) and merged online — HBM holds only packed
    codes plus one bf16 tile.  Returns (state', window_q, hidden_last)
    like :func:`prefill_chunk` (window_q is unused by the fullkv finish
    but keeps the engine driver uniform).

    Unlike the bf16 path, ``chunk_start`` is a TRACED scalar: the history
    is consumed in fixed C-slot tiles whose count rides a ``fori_loop``
    bound, so ONE compile covers every chunk index — at 128k/4k that is
    1 compile instead of 32."""
    from ..ops.quant import QuantizedTensor, _round_up, dequantize, quantize

    cs = plan.spec
    nbits = cs.nbits
    per = 8 // nbits
    b, c = tokens.shape
    n = plan.bucket_len
    w = plan.window
    kvh = spec.num_key_value_heads
    dh = spec.head_dim
    dp = _round_up(dh, cs.q_group_size)
    kg, vg = _quant_groups(cs, c, dp)   # pa: per-chunk K, per-token V
    chunk_start = jnp.asarray(chunk_start, jnp.int32)
    n_hist = chunk_start // c  # traced loop bound
    inv_freq = llama.rope_inv_freq(spec)
    pad = (n - true_len).astype(jnp.int32)
    cols = chunk_start + jnp.arange(c, dtype=jnp.int32)
    positions = cols[None, :] - pad[:, None]
    rows_g = cols  # query rows sit at the same global columns

    act_dtype = params["final_norm"].dtype
    hidden0 = embed_lookup(params["embed"], tokens, act_dtype)
    if spec.scale_embeddings:
        hidden0 = hidden0 * jnp.asarray(
            math.sqrt(spec.hidden_size), dtype=act_dtype)
    unit = spec.rmsnorm_unit_offset
    ascale = (spec.attn_scale
              if spec.query_pre_attn_scalar is not None else None)
    asoftcap = spec.attn_logit_softcapping
    # per-layer effective window (sliding layers; full layers get a
    # sentinel no context can exceed) — lets the mask stay branch-free
    big = 1 << 30
    if spec.mixed_sliding:
        win_arr = jnp.asarray(
            [spec.sliding_window if spec.layer_is_sliding(i) else big
             for i in range(spec.num_hidden_layers)], jnp.int32)
    else:
        win_arr = jnp.full((spec.num_hidden_layers,),
                           spec.sliding_window or big, jnp.int32)
    # flash-partials path: self tile + each dequantized history tile run
    # through the flash kernel (the XLA tile partials cost the 128k quant
    # prefill ~3.9x the bf16 snapkv prefill — BASELINE Round 3); sliding
    # windows keep the XLA masks (the fori-traced tile offset can't feed
    # the kernel's static window geometry)
    use_flash = (attention_impl in ("pallas", "pallas_interpret")
                 and not spec.mixed_sliding and spec.sliding_window is None)
    interp = attention_impl == "pallas_interpret"
    fb = min(1024, c)

    def _merge2(a, b2):
        # exp2 domain: every source below is flash_attention_partials
        neg_half = float(jnp.finfo(jnp.float32).min) / 2
        a_acc, a_m, a_l = a
        b_acc, b_m, b_l = b2
        m = jnp.maximum(a_m, b_m)
        w1 = jnp.where(a_m <= neg_half, 0.0,
                       jnp.exp2(jnp.minimum(a_m - m, 0.0)))
        w2 = jnp.where(b_m <= neg_half, 0.0,
                       jnp.exp2(jnp.minimum(b_m - m, 0.0)))
        return (a_acc * w1[..., None] + b_acc * w2[..., None], m,
                a_l * w1 + b_l * w2)

    def layer_fn(carry, xs):
        hidden, kc_f, ks_f, kz_f, vc_f, vs_f, vz_f = carry
        wts, li = xs
        win = win_arr[li]
        x = llama.rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps, unit)
        q, k, v = llama._qkv(x, wts, spec)
        q = llama.apply_rope(q, positions, inv_freq)
        k = llama.apply_rope(k, positions, inv_freq)

        # self tile (bf16, causal)
        if use_flash:
            from ..kernels import flash_attention_partials

            tl_self = c - jnp.clip(pad - chunk_start, 0, c)
            parts = flash_attention_partials(
                q, k, v, tl_self, block_q=fb, block_k=fb,
                interpret=interp, scale=ascale, softcap=asoftcap,
                q_start=0)
        else:
            self_mask = (
                (cols[None, :] <= rows_g[:, None])
                & ((rows_g[:, None] - cols[None, :]) < win)
            )[None] & (cols[None, None, :] >= pad[:, None, None])
            parts = tile_attention_partials(
                q, k, v, self_mask, scale=ascale, softcap=asoftcap,
                q_block=q_block)

        def hist_body(hc, pcarry):
            kc = jnp.swapaxes(jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_index_in_dim(kc_f, li, 0, False),
                hc * (c // per), c // per, axis=-2), -1, -2)
            ks = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_index_in_dim(ks_f, li, 0, False),
                hc * (c // kg), c // kg, axis=-2)
            kz = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_index_in_dim(kz_f, li, 0, False),
                hc * (c // kg), c // kg, axis=-2)
            vc = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_index_in_dim(vc_f, li, 0, False),
                hc * (c // per), c // per, axis=-2)
            vs = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_index_in_dim(vs_f, li, 0, False),
                hc * c, c, axis=-3)
            vz = jax.lax.dynamic_slice_in_dim(
                jax.lax.dynamic_index_in_dim(vz_f, li, 0, False),
                hc * c, c, axis=-3)
            # Sever layout propagation from the per-tile consumers back to
            # the CARRY buffers: the flash path's k_tile transpose made
            # XLA relayout the whole [L,B,KV,D,N] code buffer D-minor —
            # a 4 GB HLO-temp copy PER CHUNK CALL at 128k kivi8 (the r4b
            # OOM; kivi4's 2 GB copy merely fit).  With the barrier the
            # transpose lands on the sliced 8 MB tile instead.
            kc, ks, kz, vc, vs, vz = jax.lax.optimization_barrier(
                (kc, ks, kz, vc, vs, vz))
            kt = dequantize(QuantizedTensor(kc, ks, kz, None),
                            nbits=nbits, group_size=kg, dtype=act_dtype)
            k_tile = jnp.swapaxes(kt, 2, 3)               # [B,KV,C,Dh]
            v_tile = dequantize(QuantizedTensor(vc, vs, vz, None),
                                nbits=nbits, group_size=vg,
                                dtype=act_dtype,
                                pack_axis=-2)[..., :dh]   # [B,KV,C,Dh]
            if use_flash:
                from ..kernels import flash_attention_partials

                # all keys precede the chunk's queries: q_start = c marks
                # the all-visible rectangle; validity via the tile's
                # effective length (left pad may reach into this tile)
                tl_tile = c - jnp.clip(pad - hc * c, 0, c)
                tile = flash_attention_partials(
                    q, k_tile, v_tile, tl_tile, block_q=fb, block_k=fb,
                    interpret=interp, scale=ascale, softcap=asoftcap,
                    q_start=c)
                return _merge2(pcarry, tile)
            hcols = hc * c + jnp.arange(c, dtype=jnp.int32)
            hmask = ((hcols[None, None, :] >= pad[:, None, None])
                     & ((rows_g[None, :, None] - hcols[None, None, :])
                        < win))
            tile = tile_attention_partials(
                q, k_tile, v_tile, hmask, scale=ascale,
                softcap=asoftcap, q_block=q_block)
            return merge_partials_pair(pcarry, tile)

        parts = jax.lax.fori_loop(0, n_hist, hist_body, parts)

        acc, m, l = parts
        attn = (acc / jnp.maximum(l, 1e-30)[..., None]).astype(act_dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, c, -1)
        ao = mm(attn, wts["wo"])
        if spec.post_block_norms:
            ao = llama.rms_norm(ao, wts["attn_post_norm"],
                                spec.rms_norm_eps, unit)
        hidden = hidden + ao
        x2 = llama.rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps, unit)
        mo = llama._mlp(
            x2, wts, spec.num_experts_per_tok,
            capacity_factor=spec.moe_capacity_factor,
            valid=positions >= 0, hidden_act=spec.hidden_act,
        )
        if spec.post_block_norms:
            mo = llama.rms_norm(mo, wts["mlp_post_norm"],
                                spec.rms_norm_eps, unit)
        hidden = hidden + mo

        # quantize THIS chunk's K/V (chunk-local planar; groups align with
        # the global grid because c % (gs*per) == 0 — same scales/codes as
        # post-hoc quantization of the same values).  Padding columns are
        # zeroed first, exactly like compact_kv does before the post-hoc
        # quantize_kv_region — garbage there would poison group scales.
        colv = (cols[None, :] >= pad[:, None])[:, None, :, None]  # [B,1,C,1]
        kz_in = jnp.where(colv, k.astype(jnp.float32), 0.0)
        vz_in = jnp.where(colv, v.astype(jnp.float32), 0.0)
        kq = quantize(jnp.swapaxes(kz_in, 2, 3), nbits=nbits, group_size=kg)
        vpad = jnp.pad(vz_in, ((0, 0), (0, 0), (0, 0), (0, dp - dh)))
        vq = quantize(vpad, nbits=nbits, group_size=vg, pack_axis=-2)
        kc_f = jax.lax.dynamic_update_slice(
            kc_f, jnp.swapaxes(kq.codes, -1, -2)[None],
            (li, 0, 0, chunk_start // per, 0))
        ks_f = jax.lax.dynamic_update_slice(
            ks_f, kq.scale[None], (li, 0, 0, 0, chunk_start // kg, 0))
        kz_f = jax.lax.dynamic_update_slice(
            kz_f, kq.zero[None], (li, 0, 0, 0, chunk_start // kg, 0))
        vc_f = jax.lax.dynamic_update_slice(
            vc_f, vq.codes[None], (li, 0, 0, chunk_start // per, 0))
        vs_f = jax.lax.dynamic_update_slice(
            vs_f, vq.scale[None], (li, 0, 0, chunk_start, 0, 0))
        vz_f = jax.lax.dynamic_update_slice(
            vz_f, vq.zero[None], (li, 0, 0, chunk_start, 0, 0))
        return ((hidden, kc_f, ks_f, kz_f, vc_f, vs_f, vz_f),
                q[:, :, c - w:, :])

    (hidden, kc_f, ks_f, kz_f, vc_f, vs_f, vz_f), window_q = jax.lax.scan(
        layer_fn, (hidden0,) + tuple(state),
        (params["layers"],
         jnp.arange(spec.num_hidden_layers, dtype=jnp.int32)),
    )
    state = QuantChunkState(kc_f, ks_f, kz_f, vc_f, vs_f, vz_f)
    return state, window_q, hidden[:, -1, :]


def prefill_finish_quant(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    state: QuantChunkState,
    hidden_last: jax.Array,
    true_len: jax.Array,
    chunk: int,
) -> Tuple[jax.Array, KVCache]:
    """Repack chunk-local codes to the region-global planar layout and
    assemble the fullkv quantized cache (same structure as the monolithic
    quant prefill: bf16 decode slots + [L, ...] QuantizedKVRegion)."""
    from ..ops.quant import QuantizedKVRegion, QuantizedTensor, _pack, _unpack

    cs = plan.spec
    nbits = cs.nbits
    per = 8 // nbits
    n = plan.bucket_len
    nc = n // chunk
    L = spec.num_hidden_layers
    b = hidden_last.shape[0]
    kvh = spec.num_key_value_heads
    dh = spec.head_dim
    ds = plan.decode_slots

    def repack(_, li):
        kc = state.k_codes[li]                       # [B,KV,N/per,D]
        kc = kc.reshape(kc.shape[0], kc.shape[1], nc, chunk // per,
                        kc.shape[-1])
        kc = _unpack(kc, nbits, axis=3)              # [B,KV,nc,chunk,D]
        kc = _pack(kc.reshape(kc.shape[0], kc.shape[1], n, kc.shape[-1]),
                   nbits, axis=-2)
        vc = state.v_codes[li]                       # [B,KV,N/per,Dp]
        vc = vc.reshape(vc.shape[0], vc.shape[1], nc, chunk // per,
                        vc.shape[-1])
        vc = _unpack(vc, nbits, axis=3)              # [B,KV,nc,chunk,Dp]
        vc = _pack(vc.reshape(vc.shape[0], vc.shape[1], n, vc.shape[-1]),
                   nbits, axis=-2)
        return None, (kc, vc)

    _, (k_codes, v_codes) = jax.lax.scan(
        repack, None, jnp.arange(L, dtype=jnp.int32))
    reg = QuantizedKVRegion(
        k=QuantizedTensor(k_codes, state.k_scale, state.k_zero, None),
        v=QuantizedTensor(v_codes, state.v_scale, state.v_zero, None),
        k_out_idx=None, k_out_val=None, v_out_idx=None, v_out_val=None,
    )
    act_dtype = params["final_norm"].dtype
    pad = (n - true_len).astype(jnp.int32)
    col = jnp.arange(n, dtype=jnp.int32)
    colv = jnp.broadcast_to(col[None, None, :] >= pad[:, None, None],
                            (b, kvh, n))
    pos = jnp.where(colv, col[None, None, :] - pad[:, None, None], -1)
    mask = jnp.concatenate([colv, jnp.zeros((b, kvh, ds), bool)], axis=2)
    positions = jnp.concatenate([pos, jnp.zeros((b, kvh, ds), jnp.int32)],
                                axis=2)
    zkv = jnp.zeros((L, b, kvh, ds, dh), act_dtype)
    cache = KVCache(
        k=zkv, v=jnp.zeros_like(zkv),
        mask=jnp.broadcast_to(mask[None], (L,) + mask.shape),
        positions=jnp.broadcast_to(positions[None], (L,) + positions.shape),
        true_len=true_len.astype(jnp.int32),
        step=jnp.zeros((), jnp.int32),
        quant=reg,
    )
    return llama._logits(hidden_last, params, spec), cache


def quant_state_from_prefix(
    spec: ModelSpec,
    plan: PolicyPlan,
    hstate: QuantChunkState,
    p_full: int,
    pads: jax.Array,
    k0: jax.Array,
    chunk: int,
    handle_nbits: "int | None" = None,
) -> QuantChunkState:
    """Resumed quant carry from a QUANTIZED prefix handle (prefix caching
    for the fullkv+KIVI chunked carry — the path where prefills are
    longest and the bf16 handle would not fit, engine.py::PrefixHandle).

    The handle is the prefix's own chunk-local carry (built unpadded, so
    its chunk grid starts at slot 0); each request chunk j < ``k0``
    covers slots ``[j*chunk, (j+1)*chunk)`` whose content is the handle
    span shifted by the row's pad: dequantize the (<= 2) overlapping
    handle chunks, window, zero the pre-pad columns (mirroring
    ``prefill_chunk_quant``'s pad zeroing), and REQUANTIZE on the
    request chunk grid.  When ``pad % chunk == 0`` the grids coincide
    and requantizing already-snapped grid values is the identity (affine
    min/max quantization maps grid endpoints to themselves) — the carry
    is bit-identical to the no-handle run.  Misaligned pads pay one
    extra bounded quantization roundtrip on the covered spans.

    ``handle_nbits``: the handle may be encoded at FEWER bits than the
    carry (e.g. a kivi2 handle resumed into a kivi4 carry) — the
    capacity answer for 128k kivi4 where a same-width 3.4 GB handle
    next to the 4.6 GB carry RESOURCE_EXHAUSTs a 16 GB chip
    (logs/tpu_r4m; VERDICT r4 weak #4).  Dequantization uses the
    handle's bit width; requantization onto the request grid uses the
    carry's.  The prefix spans then carry the handle's (coarser)
    quantization error — bounded like the misaligned-resume roundtrip
    (tests/test_prefix_cache.py::test_quant_prefix_roundtrip_error_bounded).

    Memory: the fori bodies touch one (layer, chunk-pair) window at a
    time — no bf16 full-context buffer exists at any point (the quant
    carry's defining property is preserved).
    """
    from ..ops.quant import QuantizedTensor, _round_up, dequantize, quantize

    cs = plan.spec
    nbits = cs.nbits
    per = 8 // nbits
    h_nbits = handle_nbits or nbits
    h_per = 8 // h_nbits
    c = chunk
    n = plan.bucket_len
    L, kvh, dh = (spec.num_hidden_layers, spec.num_key_value_heads,
                  spec.head_dim)
    dp = _round_up(dh, cs.q_group_size)
    kg, vg = _quant_groups(cs, c, dp)
    n_hc = p_full // c                      # handle chunk count
    k0 = jnp.asarray(k0, jnp.int32)

    def row(p):
        """One batch row: build [L, KV, ...] carry arrays for pad ``p``."""
        kc_o = jnp.zeros((L, kvh, n // per, dh), jnp.int8)
        ks_o = jnp.zeros((L, kvh, dh, n // kg, 1), jnp.float32)
        kz_o = jnp.zeros((L, kvh, dh, n // kg, 1), jnp.float32)
        vc_o = jnp.zeros((L, kvh, n // per, dp), jnp.int8)
        vs_o = jnp.zeros((L, kvh, n, dp // vg, 1), jnp.float32)
        vz_o = jnp.zeros((L, kvh, n, dp // vg, 1), jnp.float32)

        def chunk_body(j, st):
            a = j * c - p                   # handle-slot start of window
            m0 = jnp.floor_divide(a, c)
            off = a - m0 * c                # in [0, c)
            valid = (a + jnp.arange(c, dtype=jnp.int32)) >= 0  # slot >= pad

            def li_body(li, st2):
                kc_o, ks_o, kz_o, vc_o, vs_o, vz_o = st2

                def dq(m):
                    """Dequantized handle chunk m ([KV, c, dh] K,
                    [KV, c, dh] V), zeros outside [0, n_hc)."""
                    ok = (m >= 0) & (m < n_hc)
                    mc = jnp.clip(m, 0, n_hc - 1)
                    kc = jnp.swapaxes(jax.lax.dynamic_slice_in_dim(
                        hstate.k_codes[li, 0], mc * (c // h_per), c // h_per,
                        axis=-2), -1, -2)            # [KV, dh, c//h_per]
                    ks = jax.lax.dynamic_slice_in_dim(
                        hstate.k_scale[li, 0], mc * (c // kg), c // kg,
                        axis=-2)
                    kz = jax.lax.dynamic_slice_in_dim(
                        hstate.k_zero[li, 0], mc * (c // kg), c // kg,
                        axis=-2)
                    kt = dequantize(QuantizedTensor(kc, ks, kz, None),
                                    nbits=h_nbits, group_size=kg,
                                    dtype=jnp.float32)  # [KV, dh, c]
                    kt = jnp.swapaxes(kt, -1, -2)       # [KV, c, dh]
                    vc = jax.lax.dynamic_slice_in_dim(
                        hstate.v_codes[li, 0], mc * (c // h_per), c // h_per,
                        axis=-2)
                    vs = jax.lax.dynamic_slice_in_dim(
                        hstate.v_scale[li, 0], mc * c, c, axis=-3)
                    vz = jax.lax.dynamic_slice_in_dim(
                        hstate.v_zero[li, 0], mc * c, c, axis=-3)
                    vt = dequantize(QuantizedTensor(vc, vs, vz, None),
                                    nbits=h_nbits, group_size=vg,
                                    dtype=jnp.float32,
                                    pack_axis=-2)[..., :dh]  # [KV, c, dh]
                    okf = ok.astype(jnp.float32)
                    return kt * okf, vt * okf

                k_a, v_a = dq(m0)
                k_b, v_b = dq(m0 + 1)
                kcat = jnp.concatenate([k_a, k_b], axis=-2)  # [KV, 2c, dh]
                vcat = jnp.concatenate([v_a, v_b], axis=-2)
                kwin = jax.lax.dynamic_slice(
                    kcat, (0, off, 0), (kvh, c, dh))
                vwin = jax.lax.dynamic_slice(
                    vcat, (0, off, 0), (kvh, c, dh))
                vmask = valid[None, :, None]
                kwin = jnp.where(vmask, kwin, 0.0)
                vwin = jnp.where(vmask, vwin, 0.0)
                # requantize on the request chunk grid — the exact
                # recipe prefill_chunk_quant applies to its own chunk
                kq = quantize(jnp.swapaxes(kwin, -1, -2), nbits=nbits,
                              group_size=kg)
                vq = quantize(jnp.pad(vwin, ((0, 0), (0, 0),
                                             (0, dp - dh))),
                              nbits=nbits, group_size=vg, pack_axis=-2)
                kc_o = jax.lax.dynamic_update_slice(
                    kc_o, jnp.swapaxes(kq.codes, -1, -2)[None],
                    (li, 0, j * (c // per), 0))
                ks_o = jax.lax.dynamic_update_slice(
                    ks_o, kq.scale[None], (li, 0, 0, j * (c // kg), 0))
                kz_o = jax.lax.dynamic_update_slice(
                    kz_o, kq.zero[None], (li, 0, 0, j * (c // kg), 0))
                vc_o = jax.lax.dynamic_update_slice(
                    vc_o, vq.codes[None], (li, 0, j * (c // per), 0))
                vs_o = jax.lax.dynamic_update_slice(
                    vs_o, vq.scale[None], (li, 0, j * c, 0, 0))
                vz_o = jax.lax.dynamic_update_slice(
                    vz_o, vq.zero[None], (li, 0, j * c, 0, 0))
                return (kc_o, ks_o, kz_o, vc_o, vs_o, vz_o)

            return jax.lax.fori_loop(0, L, li_body, st)

        return jax.lax.fori_loop(
            0, k0, chunk_body, (kc_o, ks_o, kz_o, vc_o, vs_o, vz_o))

    outs = jax.vmap(row, out_axes=1)(pads.astype(jnp.int32))
    return QuantChunkState(*outs)
