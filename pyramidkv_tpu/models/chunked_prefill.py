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

Method coverage: every method whose scoring reads only the window queries
(or none) — snapkv / pyramidkv / adakv / headkv / streamingllm / l2norm /
random / fullkv.  h2o and cam need full-sequence attention statistics,
think prunes channels against window queries but splits storage, and
minference replaces prefill attention itself — those fall back to the
monolithic prefill (`supports_chunked`).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache import KVCache
from ..config import ModelSpec
from ..ops.attention import causal_prefill_attention
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
    """True when the plan's compression reads only window queries."""
    spec = plan.spec
    return (
        spec.method in ("snapkv", "pyramidkv", "adakv", "headkv",
                        "streamingllm", "l2norm", "random", "fullkv")
        and spec.quant_method is None
        and not plan.think_narrow
        and spec.merge is None
    )


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
) -> Tuple[ChunkState, jax.Array, jax.Array]:
    """Forward one token chunk through all layers against the state so far.

    Args:
      tokens: [B, C] the chunk's token ids (columns [chunk_start,
        chunk_start + C) of the left-padded bucket buffer).
      chunk_start: STATIC global column of the chunk's first token.

    Returns:
      (state', window_q [L, B, H, W, D] — the plan-window queries of this
      chunk (consumed by ``prefill_finish`` when this was the last chunk),
      hidden_last [B, Dm] — the chunk's final hidden row).
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

            return flash_causal_attention(
                q, kh, vh, eff_len,
                block_q=min(prefill_block, c),
                block_k=min(prefill_block, kv_extent),
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
        hidden, kf, vf = carry
        wts, li = xs
        x = llama.rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps, unit)
        q, k, v = llama._qkv(x, wts, spec)
        q = llama.apply_rope(q, positions, inv_freq)
        k = llama.apply_rope(k, positions, inv_freq)
        kf = jax.lax.dynamic_update_slice(
            kf, k[None].astype(kf.dtype), (li, 0, 0, chunk_start, 0))
        vf = jax.lax.dynamic_update_slice(
            vf, v[None].astype(vf.dtype), (li, 0, 0, chunk_start, 0))
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
        return (hidden, kf, vf), q[:, :, c - w:, :]

    (hidden, kf, vf), window_q = jax.lax.scan(
        layer_fn, (hidden0, state.k, state.v),
        (params["layers"],
         jnp.arange(spec.num_hidden_layers, dtype=jnp.int32)),
    )
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
) -> Tuple[jax.Array, KVCache]:
    """Compress the accumulated full-KV state into the slot cache.

    ``window_q``: [L, B, H, W, D] observation-window queries from the LAST
    chunk.  Each layer rebuilds a bucket-length query buffer that is zero
    except at the window — ``compress_layer`` reads only those rows for
    every supported method, so the compression math is bit-identical to
    the monolithic prefill's.
    """
    assert supports_chunked(plan), plan.spec.method
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
            ckv = compress_layer(sub, ctx, qfull, state.k[li], state.v[li],
                                 true_len=tl)
            return None, ckv

        _, ckv = jax.lax.scan(
            body, None, jnp.arange(start, stop, dtype=jnp.int32))
        seg_ckvs.append(ckv)
    logits = llama._logits(hidden_last, params, spec)
    return logits, llama.assemble_cache(plan, seg_ckvs, true_len)
