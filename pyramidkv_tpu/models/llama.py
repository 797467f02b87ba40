"""Pure-functional JAX decoder for the Llama-2/3 and Mistral families.

The reference monkeypatches HF ``transformers`` attention forwards
(/root/reference/pyramidkv/llama_model.py, mistral_model.py — ~40 patched
(method x backend) variants).  Here the model is owned code: ONE attention
implementation whose prefill ends with a first-class compression step
(``policy.compress_layer``), covering every method without patching.

Architecture (GQA + RoPE + RMSNorm + SwiGLU) matches HF ``LlamaModel`` /
``MistralModel`` numerics; Mistral differs only by ``sliding_window``
(handled as an attention-mask term, replacing the reference's past-KV
slicing at mistral_model.py:~2100-2120).

Layout decisions (TPU-first):
- Layer weights are STACKED along a leading ``[L, ...]`` axis and the layer
  loop is one ``lax.scan`` — single compiled layer body, fast compile,
  scan-carried activations stay in HBM-friendly shapes.
- Prefill buffers are left-padded to a static bucket length; real tokens
  occupy the trailing ``true_len`` columns.
- The KV cache is the static slot buffer of ``pyramidkv_tpu.cache``.
"""

from __future__ import annotations

import math
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache import KVCache, LayerCacheView
from ..config import ModelSpec
from .weights import (QuantW, _int4_kernel_mm, dq_codes, embed_lookup,
                      expert_mm, is_packed4, layer_view, mm)
from ..ops.attention import (causal_prefill_attention, decode_attention,
                             verify_attention, verify_attention_append)
from ..policy import (PolicyPlan, compress_layer, layer_contexts,
                      stores_kv_heads)

# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.bfloat16) -> dict:
    """Random-normal initialised parameter pytree (tests / benchmarks)."""
    ks = jax.random.split(key, 12)
    L, Dm, I = spec.num_hidden_layers, spec.hidden_size, spec.intermediate_size
    H, KV, Dh, V = (
        spec.num_attention_heads,
        spec.num_key_value_heads,
        spec.head_dim,
        spec.vocab_size,
    )

    def w(k, shape, scale=None):
        scale = scale or 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
        return (jax.random.normal(k, shape, dtype=jnp.float32) * scale).astype(dtype)

    # unit-offset RMSNorm ((1+w), Gemma-2) zero-initialises norm weights
    norm1 = jnp.zeros if spec.rmsnorm_unit_offset else jnp.ones
    layers = {
        "wq": w(ks[1], (L, Dm, H * Dh)),
        "wk": w(ks[2], (L, Dm, KV * Dh)),
        "wv": w(ks[3], (L, Dm, KV * Dh)),
        "wo": w(ks[4], (L, H * Dh, Dm)),
        "attn_norm": norm1((L, Dm), dtype=dtype),
        "mlp_norm": norm1((L, Dm), dtype=dtype),
    }
    if spec.post_block_norms:
        layers["attn_post_norm"] = norm1((L, Dm), dtype=dtype)
        layers["mlp_post_norm"] = norm1((L, Dm), dtype=dtype)
    if spec.attention_bias:
        # Qwen2-style QKV biases (o_proj stays bias-free)
        kb = jax.random.split(ks[10], 3)
        layers["bq"] = w(kb[0], (L, H * Dh), scale=0.02)
        layers["bk"] = w(kb[1], (L, KV * Dh), scale=0.02)
        layers["bv"] = w(kb[2], (L, KV * Dh), scale=0.02)
    E = spec.num_local_experts
    if E:
        # Mixtral-style MoE (the reference's unchecked TODO, README.md:45)
        layers["router"] = w(ks[9], (L, Dm, E))
        layers["w_gate"] = w(ks[5], (L, E, Dm, I))
        layers["w_up"] = w(ks[6], (L, E, Dm, I))
        layers["w_down"] = w(ks[7], (L, E, I, Dm))
    else:
        layers["w_gate"] = w(ks[5], (L, Dm, I))
        layers["w_up"] = w(ks[6], (L, Dm, I))
        layers["w_down"] = w(ks[7], (L, I, Dm))
    params = {
        "embed": w(ks[0], (V, Dm), scale=0.02),
        "final_norm": norm1((Dm,), dtype=dtype),
        "layers": layers,
    }
    if not spec.tie_word_embeddings:
        params["lm_head"] = w(ks[8], (Dm, V), scale=0.02)
    return params


def param_count(params: dict) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# RoPE / norms (HF-numerics-compatible)
# ---------------------------------------------------------------------------


def rope_inv_freq(spec: ModelSpec) -> jax.Array:
    """Inverse frequencies, including Llama-3.1 'llama3' frequency scaling
    (matches HF ``_compute_llama3_parameters``)."""
    d = spec.head_dim
    inv = 1.0 / (
        spec.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d)
    )
    if spec.rope_scaling_type == "llama3":
        factor = spec.rope_scaling_factor
        low = spec.rope_low_freq_factor
        high = spec.rope_high_freq_factor
        orig = spec.rope_original_max_position
        low_wl = orig / low
        high_wl = orig / high
        wl = 2 * math.pi / inv
        smooth = (orig / wl - low) / (high - low)
        smoothed = (1 - smooth) * inv / factor + smooth * inv
        inv = jnp.where(wl < high_wl, inv, jnp.where(wl > low_wl, inv / factor, smoothed))
    elif spec.rope_scaling_type in ("linear",):
        inv = inv / spec.rope_scaling_factor
    return inv


def apply_rope(x: jax.Array, positions: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """HF rotate-half RoPE.

    x: [B, H, T, D]; positions: [B, T] (negative positions are clamped to 0 —
    they only occur at padding rows whose outputs are masked anyway).
    """
    pos = jnp.maximum(positions, 0).astype(jnp.float32)  # [B, T]
    ang = pos[:, :, None] * inv_freq[None, None, :]  # [B, T, D/2]
    cos = jnp.cos(ang)[:, None, :, :]  # [B, 1, T, D/2]
    sin = jnp.sin(ang)[:, None, :, :]
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out = jnp.concatenate(
        [xf1 * cos - xf2 * sin, xf2 * cos + xf1 * sin], axis=-1
    )
    return out.astype(x.dtype)


def rms_norm(x: jax.Array, w: jax.Array, eps: float,
             unit_offset: bool = False) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    if unit_offset:
        # Gemma2RMSNorm: multiply by (1 + w) in fp32, THEN cast (Llama
        # casts first) — w is zero-initialised under this convention.
        return (normed * (1.0 + w.astype(jnp.float32))).astype(x.dtype)
    return normed.astype(x.dtype) * w


def _act(x: jax.Array, hidden_act: str) -> jax.Array:
    """Gated-MLP activation in fp32 (matches HF's ACT2FN usage)."""
    if hidden_act == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)  # gelu_pytorch_tanh
    return jax.nn.silu(x)


def _repeat_kv(x: jax.Array, groups: int) -> jax.Array:
    """[B, KV, T, D] -> [B, KV*groups, T, D] (HF repeat_kv order)."""
    if groups == 1:
        return x
    b, kv, t, d = x.shape
    return jnp.broadcast_to(x[:, :, None], (b, kv, groups, t, d)).reshape(
        b, kv * groups, t, d
    )


# ---------------------------------------------------------------------------
# Projections shared by prefill and decode
# ---------------------------------------------------------------------------


def _qkv(x: jax.Array, wts: dict, spec: ModelSpec) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: [B, T, Dm] -> q [B, H, T, Dh], k/v [B, KV, T, Dh].

    ``wqkv`` (out-axis-fused packed-int4 leaf, `weights.fuse_packed_
    matmuls`) computes all three in one matmul — one decode-kernel launch
    instead of three — and splits statically."""
    b, t, _ = x.shape
    H, KV, Dh = spec.num_attention_heads, spec.num_key_value_heads, spec.head_dim
    if "wqkv" in wts:
        y = mm(x, wts["wqkv"])
        q, k, v = jnp.split(y, [H * Dh, (H + KV) * Dh], axis=-1)
    else:
        q = mm(x, wts["wq"])
        k = mm(x, wts["wk"])
        v = mm(x, wts["wv"])
    if "bq" in wts:
        # Qwen2-style QKV biases (applied post-split, so the fused wqkv
        # path composes; o_proj is bias-free in every supported family)
        q = q + wts["bq"].astype(q.dtype)
        k = k + wts["bk"].astype(k.dtype)
        v = v + wts["bv"].astype(v.dtype)
    q = q.reshape(b, t, H, Dh).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, KV, Dh).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, KV, Dh).transpose(0, 2, 1, 3)
    return q, k, v


#: Token-chunk the dense prefill MLP above this many rows: the monolithic
#: gate-up projection materialises a [B, N, 2*ffn] bf16 temp — 7.00 GB at
#: N=131072 on Llama-3-8B (the r4b pyramidkv-128k OOM culprit,
#: weights.py:650 dot) — while the MLP is position-wise, so slicing rows
#: is exact.  16384-row chunks bound it at 0.875 GB; the threshold leaves
#: every measured <=64k row on the monolithic schedule.
_MLP_CHUNK_THRESHOLD = 65536 + 1
_MLP_CHUNK_ROWS = 16384


def _mlp(x: jax.Array, wts: dict, top_k: int = 2,
         capacity_factor: Optional[float] = None,
         valid: Optional[jax.Array] = None,
         hidden_act: str = "silu") -> jax.Array:
    if "router" in wts:
        return _moe_mlp(x, wts, top_k=top_k,
                        capacity_factor=capacity_factor, valid=valid)

    def dense(xr):
        if "w_gateup" in wts:
            g, u = jnp.split(mm(xr, wts["w_gateup"]), 2, axis=-1)
        else:
            g, u = mm(xr, wts["w_gate"]), mm(xr, wts["w_up"])
        return mm(_act(g.astype(jnp.float32), hidden_act).astype(xr.dtype)
                  * u, wts["w_down"])

    rows = x.shape[1] if x.ndim == 3 else 0
    ck = _MLP_CHUNK_ROWS
    if rows >= _MLP_CHUNK_THRESHOLD and rows % ck == 0:
        out = jnp.zeros_like(x)  # w_down projects back to hidden size

        def body(i, o):
            xr = jax.lax.dynamic_slice_in_dim(x, i * ck, ck, axis=1)
            return jax.lax.dynamic_update_slice(
                o, dense(xr).astype(o.dtype), (0, i * ck, 0))

        return jax.lax.fori_loop(0, rows // ck, body, out)
    return dense(x)


def _moe_mlp(x: jax.Array, wts: dict, top_k: int = 2,
             chunk: int = 512, capacity_factor: Optional[float] = None,
             valid: Optional[jax.Array] = None) -> jax.Array:
    """Mixtral sparse-MoE block with EXACT HF numerics under static shapes.

    HF routing (MixtralSparseMoeBlock): full softmax over router logits,
    top-k, renormalise the k weights, weighted sum of the chosen experts'
    SwiGLU outputs.  TPU-native formulation: compute ALL experts densely
    and weight by the (zero-padded) routing weights — bit-equivalent (a
    zero weight contributes exactly 0), fully static, and it shards
    naturally: with the expert axis sharded over the mesh each device
    computes only its local experts and the weighted sum becomes one psum
    (inference expert-parallelism without any dispatch/combine gathers).
    Token chunking bounds the [T_c, E, I] transient during prefill.

    ``capacity_factor`` (ModelSpec.moe_capacity_factor) switches prefill
    to capacity-bounded token dispatch — see :func:`_moe_mlp_dispatch`.
    """
    orig_shape = x.shape
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, None, :]  # decode: [B, Dm] -> [B, 1, Dm]
    b, t, dm = x.shape
    router = wts["router"]
    # expert count from the SCALE for QuantW (packed-int4 codes halve
    # their last axis; the per-channel/grouped scale always ends in E)
    e = (router.scale if isinstance(router, QuantW) else router).shape[-1]
    k = top_k

    # NOTE: a bf16 router rounds its logits to bf16 before the fp32
    # softmax — exactly what HF's bf16 nn.Linear gate does (torch bf16
    # linear accumulates fp32, rounds the output), so parity holds.
    logits = mm(x, wts["router"]).astype(jnp.float32)  # [B, T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, k)
    wnorm = vals / jnp.maximum(vals.sum(-1, keepdims=True), 1e-20)
    weight = (jax.nn.one_hot(idx, e, dtype=jnp.float32)
              * wnorm[..., None]).sum(-2)  # [B, T, E]

    if capacity_factor is not None and t > 1:
        out = _moe_mlp_dispatch(
            x, wts, weight, e, top_k, capacity_factor,
            valid=valid, chunk=chunk,
        )
        return out[:, 0, :] if squeeze else out

    def ffn(xc, wc):
        # xc [B, Tc, Dm]; wc [B, Tc, E]; per-(expert, out-channel) QuantW
        # scales factor out of each expert einsum (weights.expert_mm)
        g = expert_mm(xc, wts["w_gate"], "btd,edi->btei")
        u = expert_mm(xc, wts["w_up"], "btd,edi->btei")
        a = jax.nn.silu(g.astype(jnp.float32)).astype(xc.dtype) * u
        o = expert_mm(a, wts["w_down"], "btei,eid->bted")
        return (o.astype(jnp.float32) * wc[..., None]).sum(2).astype(xc.dtype)

    if t <= chunk or t % chunk != 0:
        out = ffn(x, weight)
    else:
        nb = t // chunk
        xb = x.reshape(b, nb, chunk, dm).transpose(1, 0, 2, 3)
        wb = weight.reshape(b, nb, chunk, e).transpose(1, 0, 2, 3)
        _, outs = jax.lax.scan(
            lambda _, xw: (None, ffn(xw[0], xw[1])), None, (xb, wb)
        )
        out = outs.transpose(1, 0, 2, 3).reshape(b, t, dm)
    return out[:, 0, :] if squeeze else out


def _moe_mlp_dispatch(x: jax.Array, wts: dict, weight: jax.Array, e: int,
                      top_k: int, capacity_factor: float,
                      valid: Optional[jax.Array] = None,
                      chunk: int = 512) -> jax.Array:
    """Capacity-factor MoE prefill: each expert computes only its routed
    tokens (up to a static per-chunk capacity) instead of every token.

    TPU-native dispatch/combine: tokens reach their expert through a
    one-hot MXU contraction (``[B,T,E,C] x [B,T,D] -> [B,E,C,D]``), never
    a row gather (scalar-gather pathology — CLAUDE.md invariant).  The
    slot rank of token t within expert e is an exclusive cumsum of the
    routing one-hot over the chunk; ``one_hot(rank, C)`` is identically
    zero for rank >= C, so over-capacity tokens silently lose that
    expert's contribution (standard MoE token dropping, weights NOT
    renormalised).  Expert FFN FLOPs drop from ``E * T`` token-passes
    (dense-all-experts) to ``k * C_f * T`` — ~E/(k*C_f) less; the
    dispatch/combine matmuls add only O(T * chunk * D) per chunk.

    ``valid`` masks left-pad columns out of the routing one-hot so bucket
    padding cannot consume capacity slots ahead of real tokens.

    With ``capacity_factor >= E / top_k`` the per-chunk capacity reaches
    chunk length: no token can drop and the result equals the dense path
    (up to fp summation order).  Expert-parallel sharding works unchanged
    — every einsum carries the E axis, so GSPMD keeps expert shards local
    and inserts one psum at the combine.
    """
    b, t, dm = x.shape
    if valid is None:
        valid = jnp.ones((b, t), dtype=bool)
    # 0/1 routing indicator [B, T, E] (top-k experts of each valid token)
    route = (weight > 0).astype(jnp.int32) * valid[..., None].astype(jnp.int32)

    tc = min(t, chunk)
    nb = t // tc
    if t % tc:  # ragged tail: fall back to one whole-T chunk
        tc, nb = t, 1
    cap = int(-(-tc * top_k * capacity_factor // e))  # ceil
    cap = min(tc, -(-cap // 8) * 8)  # round up to a multiple of 8 lanes

    def ffn_chunk(xc, wc, rc):
        # xc [B,Tc,D]; wc [B,Tc,E] combine weights; rc [B,Tc,E] 0/1 routing
        rank = jnp.cumsum(rc, axis=1) - rc  # exclusive rank within expert
        disp = jax.nn.one_hot(rank, cap, dtype=xc.dtype) * (
            rc[..., None].astype(xc.dtype)
        )  # [B,Tc,E,C]
        xe = jnp.einsum("btec,btd->becd", disp, xc)  # [B,E,C,D]

        g = expert_mm(xe, wts["w_gate"], "becd,edi->beci")
        u = expert_mm(xe, wts["w_up"], "becd,edi->beci")
        a = jax.nn.silu(g.astype(jnp.float32)).astype(xc.dtype) * u
        oe = expert_mm(a, wts["w_down"], "beci,eid->becd")
        # combine: y[t] = sum_e w[t,e] * oe[slot(t,e)]  (fp32 accumulation)
        dispw = disp.astype(jnp.float32) * wc[..., None]
        y = jnp.einsum("btec,becd->btd", dispw, oe.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        return y.astype(xc.dtype)

    if nb == 1:
        return ffn_chunk(x, weight, route)
    xb = x.reshape(b, nb, tc, dm).transpose(1, 0, 2, 3)
    wb = weight.reshape(b, nb, tc, e).transpose(1, 0, 2, 3)
    rb = route.reshape(b, nb, tc, e).transpose(1, 0, 2, 3)
    _, outs = jax.lax.scan(
        lambda _, xwr: (None, ffn_chunk(*xwr)), None, (xb, wb, rb)
    )
    return outs.transpose(1, 0, 2, 3).reshape(b, t, dm)


def _logits(hidden: jax.Array, params: dict, spec: ModelSpec) -> jax.Array:
    out = _logits_raw(hidden, params, spec)
    if spec.final_logit_softcapping is not None:
        cap = spec.final_logit_softcapping
        out = jnp.tanh(out * (1.0 / cap)) * cap
    return out


def _logits_raw(hidden: jax.Array, params: dict, spec: ModelSpec) -> jax.Array:
    """fp32 logits, sliced back to the true vocab when the lm_head was
    tile-padded (``weights.quantize_weights(lm_head_pad_to=...)``: Llama-3's
    128256-wide projection tiles as 128x3x167 — no tile wider than 384
    packed bytes — so padding to a 2048-multiple lets the streaming kernels
    run power-of-two tiles; pad channels are all-zero and sliced off here,
    bit-identical logits)."""
    out = _logits_wide(hidden, params, spec)
    v = spec.vocab_size
    if out.shape[-1] != v:
        out = jax.lax.slice_in_dim(out, 0, v, axis=out.ndim - 1)
    return out


def _logits_wide(hidden: jax.Array, params: dict, spec: ModelSpec) -> jax.Array:
    """fp32 logits WITHOUT upcasting the vocab projection: an explicit
    ``astype(fp32)`` on the [Dm, V] matrix gets hoisted out of the decode
    loop by XLA as a persistent fp32 copy (~2x the weight's HBM)."""
    h = rms_norm(hidden, params["final_norm"], spec.rms_norm_eps,
                 spec.rmsnorm_unit_offset)
    w = params["embed"] if spec.tie_word_embeddings else params.get("lm_head")
    if isinstance(w, QuantW):
        if not spec.tie_word_embeddings and is_packed4(w):
            # packed int4 lm_head (quantize_weights(lm_head_nbits=4)):
            # decode-shaped rows route through the fused kernel with f32
            # x (f32 accumulation + f32 scale epilogue = f32 logits);
            # prefill rows fall back to the fusable s4->dtype convert.
            y = _int4_kernel_mm(h.astype(jnp.float32), w)
            if y is not None:
                return y
            out = jax.lax.dot_general(
                h, dq_codes(w, h.dtype), (((h.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out * w.scale.astype(jnp.float32)
        if not spec.tie_word_embeddings and w.scale.ndim == 1:
            # int8 lm_head, decode-shaped rows: the streaming kernel
            # (kernels/int4_matmul.py::int8_matmul) — XLA lowers the
            # 1-row product to a VPU multiply-reduce at ~56% of HBM
            # bandwidth (1.15 ms/step of the d32 step, logs/r3a_trace)
            from .weights import _int8_kernel_mm

            y = _int8_kernel_mm(h.astype(jnp.float32), w)
            if y is not None:
                return y
        # tied: codes [V, Dm] (contract last); untied lm_head: [Dm, V]
        cdim = 1 if spec.tie_word_embeddings else 0
        out = jax.lax.dot_general(
            h, w.codes.astype(h.dtype),
            (((h.ndim - 1,), (cdim,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out * w.scale.astype(jnp.float32)
    w = w.T if spec.tie_word_embeddings else w
    return jax.lax.dot_general(
        h, w, (((h.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------


def prefill(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    tokens: jax.Array,
    true_len: jax.Array,
    *,
    rng: Optional[jax.Array] = None,
    prefill_block: int = 512,
    prefill_sub_k: int = 1,
    prefill_two_pass: bool = False,
    attention_impl: str = "xla",
) -> Tuple[jax.Array, KVCache]:
    """Run the prompt through the model, compressing each layer's KV.

    Args:
      tokens: [B, N] left-padded token ids (padding id irrelevant; those
        columns are masked).
      true_len: [B] number of real tokens.
      attention_impl: "xla" (chunked-scan fallback), "pallas" (fused flash
        kernel, TPU), or "pallas_interpret" (kernel under the interpreter,
        for CPU tests).

    Returns:
      (logits [B, vocab] for the LAST position, compressed KVCache).
    """
    b, n = tokens.shape
    assert n == plan.bucket_len, (n, plan.bucket_len)
    groups = spec.num_query_groups
    inv_freq = rope_inv_freq(spec)
    pad = (n - true_len).astype(jnp.int32)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :] - pad[:, None]  # [B, N]

    ctxs = layer_contexts(plan, true_len, spec.num_attention_heads, rng)
    act_dtype = params["final_norm"].dtype
    hidden0 = embed_lookup(params["embed"], tokens, act_dtype)  # [B, N, Dm]
    if spec.scale_embeddings:
        # Gemma-2 multiplies by sqrt(hidden) ROUNDED through the activation
        # dtype (modeling_gemma2.py normalizer cast)
        hidden0 = hidden0 * jnp.asarray(
            math.sqrt(spec.hidden_size), dtype=act_dtype)
    unit = spec.rmsnorm_unit_offset
    ascale = (spec.attn_scale
              if spec.query_pre_attn_scalar is not None else None)
    asoftcap = spec.attn_logit_softcapping
    # static per-layer sliding flags (Gemma-2 alternates sliding/full)
    sliding_flags = (
        jnp.asarray([spec.layer_is_sliding(i)
                     for i in range(spec.num_hidden_layers)])
        if spec.mixed_sliding else None
    )

    def make_layer_fn(subplan, by_index=False):
        def layer_fn(hidden, xs):
            if by_index:
                # segmented plans scan over LAYER INDICES and load each
                # layer's weights with a dynamic slice — materialising
                # sliced sub-stacks would copy the weights per prefill call
                li, ctx = xs
                wts = jax.tree_util.tree_map(
                    lambda x: x[li], params["layers"]
                )
            else:
                wts, ctx, li = xs
            x = rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps, unit)
            q, k, v = _qkv(x, wts, spec)
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)
            # k/v stay at num_kv_heads everywhere: attention, scoring, and
            # compaction all expand GQA groups inside their contractions, so no
            # O(H*N*D) repeat_kv buffer is ever materialised (the reference
            # repeats first, llama_model.py:158-159 — same numbers, 4x the HBM).
            def dense_attn(win):
                if attention_impl in ("pallas", "pallas_interpret"):
                    from ..kernels import flash_causal_attention

                    # flash tiles floor at 1024: the online-softmax's
                    # per-k-tile accumulator rescale scales with nk, and
                    # 1024x1024 tiles measured 32k prefill 6.44 -> 5.14 s
                    # (1.25x, logs/tpu_r3k; 2048 tiles blow VMEM)
                    fb = min(max(prefill_block, 1024), n)
                    # sub_k > 1: fetched blocks stay fb wide; block_q
                    # shrinks so sub_k fp32 logit sub-tiles fit VMEM
                    bq = fb if prefill_sub_k == 1 else min(
                        max(fb // prefill_sub_k, 512), n)
                    return flash_causal_attention(
                        q, k, v, true_len,
                        block_q=bq,
                        block_k=fb,
                        sub_k=prefill_sub_k,
                        two_pass=prefill_two_pass,
                        sliding_window=win,
                        interpret=attention_impl == "pallas_interpret",
                        scale=ascale, softcap=asoftcap,
                    )
                return causal_prefill_attention(
                    q, k, v, true_len=true_len,
                    block=prefill_block, sliding_window=win,
                    scale=ascale, softcap=asoftcap,
                )

            def sparse_attn():
                from ..ops.sparse_prefill import (
                    estimate_vertical_slash,
                    sparse_prefill_attention,
                )

                pcfg = subplan.spec.minference_pattern_config
                if pcfg is not None:
                    # per-layer/per-head offline budgets (the reference's
                    # MODEL2PATH JSON, minference.py:9-12): [L, H, 2]
                    # constant indexed by the traced layer — static top-k
                    # widths from the config maxima, per-head rank caps
                    cfg = jnp.asarray(pcfg, jnp.int32)  # [L, H, 2]
                    vsz, ssz = cfg[li, :, 0], cfg[li, :, 1]
                    mv = max(v for layer_ in pcfg for v, _ in layer_)
                    ms_ = max(s for layer_ in pcfg for _, s in layer_)
                else:
                    vsz = subplan.spec.minference_vertical_size
                    ssz = subplan.spec.minference_slash_size
                    mv = ms_ = None
                pattern = estimate_vertical_slash(
                    q, k, true_len=true_len,
                    vertical_size=vsz, slash_size=ssz,
                    last_q=subplan.spec.minference_last_q,
                    scale=ascale, softcap=asoftcap,
                    max_vertical=mv, max_slash=ms_,
                )
                return sparse_prefill_attention(
                    q, k, v, pattern, true_len=true_len,
                    tile_budget=subplan.spec.minference_tile_budget,
                    interpret=attention_impl != "pallas",
                    slash_impl=subplan.spec.minference_slash_impl,
                    scale=ascale, softcap=asoftcap,
                )

            if (subplan.spec.method == "minference"
                    and n >= subplan.spec.minference_dense_below):
                if sliding_flags is None:
                    attn = sparse_attn()
                else:
                    # Gemma-2 alternating layers: the vertical+slash
                    # pattern has no window semantics, and a sliding
                    # layer's banded flash prefill is already linear-cost
                    # — MInference only pays off on FULL-attention layers
                    attn = jax.lax.cond(
                        sliding_flags[li],
                        lambda: dense_attn(spec.sliding_window),
                        sparse_attn,
                    )
            elif sliding_flags is None:
                attn = dense_attn(spec.sliding_window)
            else:
                # alternating sliding/full layers (Gemma-2): both
                # branches are compiled statically (the sliding branch
                # keeps its banded tile pruning) and the traced layer
                # index picks one at run time
                attn = jax.lax.cond(
                    sliding_flags[li],
                    lambda: dense_attn(spec.sliding_window),
                    lambda: dense_attn(None),
                )
            attn = attn.transpose(0, 2, 1, 3).reshape(b, n, -1)
            ao = mm(attn, wts["wo"])
            if spec.post_block_norms:
                ao = rms_norm(ao, wts["attn_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + ao
            x2 = rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps, unit)
            mo = _mlp(
                x2, wts, spec.num_experts_per_tok,
                capacity_factor=spec.moe_capacity_factor,
                valid=positions >= 0, hidden_act=spec.hidden_act,
            )
            if spec.post_block_norms:
                mo = rms_norm(mo, wts["mlp_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + mo
            ckv = compress_layer(subplan, ctx, q, k, v, true_len=true_len)
            if subplan.think_narrow:
                from ..policy import think_split

                kp, kc, krest = think_split(ckv, q, subplan, true_len)
                return hidden, (ckv._replace(k=krest), kp, kc)
            if subplan.spec.quant_method is not None:
                # Quantize the (immutable) compacted prefill region PER
                # LAYER inside the scan: only one layer's bf16 region is
                # ever live, so full-KV quant caches fit contexts whose
                # stacked bf16 cache would OOM (64k fullkv d32: 8.6 GB
                # bf16 vs 1.1 GB int4 codes).  Decode slots stay bf16 —
                # the static analogue of the reference's fp16 residual
                # buffer (quantcache.py:79-82).
                from ..ops.quant import quantize_kv_region

                qs = subplan.spec
                sp_q = subplan.prefill_slots
                reg = quantize_kv_region(
                    ckv.k[:, :, :sp_q, :], ckv.v[:, :, :sp_q, :],
                    nbits=qs.nbits, group_size=qs.q_group_size,
                    outlier_threshold=(
                        qs.outlier_threshold
                        if qs.quant_method == "kvquant" else None
                    ),
                    layout=qs.q_layout,
                )
                return hidden, (
                    ckv._replace(k=ckv.k[:, :, sp_q:, :],
                                 v=ckv.v[:, :, sp_q:, :]),
                    reg,
                )
            return hidden, ckv

        return layer_fn

    def _slice_layers(tree, start, stop):
        return jax.tree_util.tree_map(lambda x: x[start:stop], tree)

    # One lax.scan per width segment (a single segment — the common case —
    # is exactly the old full-stack scan; multi-segment scans address the
    # stacked weights by layer index, never copying them).
    hidden = hidden0
    seg_ckvs = []
    seg_plans = plan.segment_plans()
    if len(seg_plans) == 1:
        _, _, sub = seg_plans[0]
        hidden, ckv = jax.lax.scan(
            make_layer_fn(sub), hidden,
            (params["layers"], ctxs,
             jnp.arange(spec.num_hidden_layers, dtype=jnp.int32)),
        )
        seg_ckvs.append(ckv)
    else:
        for start, stop, sub in seg_plans:
            xs = (
                jnp.arange(start, stop, dtype=jnp.int32),
                _slice_layers(ctxs, start, stop),
            )
            hidden, ckv = jax.lax.scan(
                make_layer_fn(sub, by_index=True), hidden, xs
            )
            seg_ckvs.append(ckv)
    logits = _logits(hidden[:, -1, :], params, spec)  # [B, V]
    return logits, assemble_cache(plan, seg_ckvs, true_len)


def assemble_cache(plan: PolicyPlan, seg_ckvs: list, true_len: jax.Array
                   ) -> KVCache:
    """Build the KVCache from per-segment layer-stacked CompactedKVs (the
    shared tail of :func:`prefill` and the chunked-prefill finish step)."""
    cs = plan.spec
    if plan.think_narrow:
        from ..cache import ThinKRegion

        ckvs, kps, kcs = seg_ckvs[0]  # think never segments
        return KVCache(
            k=ckvs.k, v=ckvs.v, mask=ckvs.mask, positions=ckvs.positions,
            true_len=true_len.astype(jnp.int32),
            step=jnp.zeros((), jnp.int32),
            think=ThinKRegion(k_pruned=kps, kept_channels=kcs),
        )
    if len(seg_ckvs) > 1:
        assert cs.quant_method is None  # make_plan keeps quant plans uniform
        return KVCache(
            k=tuple(c.k for c in seg_ckvs),
            v=tuple(c.v for c in seg_ckvs),
            mask=tuple(c.mask for c in seg_ckvs),
            positions=tuple(c.positions for c in seg_ckvs),
            true_len=true_len.astype(jnp.int32),
            step=jnp.zeros((), jnp.int32),
        )
    if cs.quant_method is not None:
        # regions were quantized per layer inside the scan (one layer's
        # bf16 K/V live at a time); the scan ys stacked them to [L, ...]
        ckvs, reg = seg_ckvs[0]
        return KVCache(
            k=ckvs.k, v=ckvs.v,
            mask=ckvs.mask, positions=ckvs.positions,
            true_len=true_len.astype(jnp.int32), step=jnp.zeros((), jnp.int32),
            quant=reg,
        )
    ckvs = seg_ckvs[0]
    return KVCache(
        k=ckvs.k, v=ckvs.v, mask=ckvs.mask, positions=ckvs.positions,
        true_len=true_len.astype(jnp.int32), step=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

#: Test hook: force the fused dequant decode kernel (in interpret mode) off
#: the TPU.  Mutated by tests only.
_FORCE_QUANT_KERNEL = [False]

#: Test hook: force the STREAMING factored-dequant kernel (interpret mode)
#: for pa-layout regions.  Mutated by tests only.
_FORCE_QUANT_FUSED_KERNEL = [False]

#: KIVI regions larger than this many padded slots decode via the chunked
#: online-softmax dequant scan (ops/quant.py::quant_region_attention_
#: partials) instead of the one-shot dequant+concat (which materialises a
#: full bf16 region copy per step).  Lowered by tests to exercise chunking.
_QUANT_CHUNK_THRESHOLD = [4096]

#: Slot-chunk size of that scan (bench knob; clamped to group*per
#: alignment inside quant_region_attention_partials).
_QUANT_CHUNK_SIZE = [4096]


#: Decode layer-scan unroll factor (PKV_DECODE_SCAN_UNROLL, default 1).
#: Unrolling lets XLA schedule across adjacent layers (overlap one layer's
#: weight loads with the previous layer's compute) at the cost of a larger
#: compiled body; per-layer dispatch — not weight bandwidth — is the d32
#: int4 decode headroom (logs/tpu_r2ag decomposition), so this is a
#: measurable knob rather than a default.
_DECODE_SCAN_UNROLL = [int(_os.environ.get("PKV_DECODE_SCAN_UNROLL", "1"))]

#: TIMING ABLATION ONLY (wrong results): skip the lane-path cache
#: appends in verify_step to isolate per-layer scatter cost
#: (scripts/tpu_round2aq_bench.py).
_SPEC_NO_APPEND = [_os.environ.get("PKV_SPEC_NO_APPEND") == "1"]


def decode_step(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    cache: KVCache,
    token: jax.Array,
    *,
    lane_steps: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """One greedy-decode forward step against the compressed cache.

    Args:
      token: [B] int32 — the token generated at the previous step.
      lane_steps: optional [B] int32 per-lane step counts (continuous
        batching: lanes join mid-flight).  When given, each row writes its
        own decode slot; ``cache.step`` is ignored for slot arithmetic.


    Returns:
      (logits [B, vocab], cache with the new token appended).  The append is
      an O(1) slot write (vs the reference's O(cache) CUDA re-materialising
      append, csrc/csrc/cuda_api.cu:11-53).
    """
    b = token.shape[0]
    groups = spec.num_query_groups
    inv_freq = rope_inv_freq(spec)
    quantized = cache.quant is not None
    if lane_steps is None:
        pos = cache.current_position()  # [B]
    else:
        pos = cache.true_len.astype(jnp.int32) + lane_steps
    hidden0 = embed_lookup(params["embed"], token,
                           params["final_norm"].dtype)  # [B, Dm]
    if spec.scale_embeddings:
        hidden0 = hidden0 * jnp.asarray(
            math.sqrt(spec.hidden_size), dtype=hidden0.dtype)
    unit = spec.rmsnorm_unit_offset
    ascale = (spec.attn_scale
              if spec.query_pre_attn_scalar is not None else None)
    asoftcap = spec.attn_logit_softcapping
    # per-layer effective window (Gemma-2 alternation): full-attention
    # layers get a sentinel no layer can exceed
    win_arr = (
        jnp.asarray([spec.sliding_window if spec.layer_is_sliding(i)
                     else (1 << 30) for i in range(spec.num_hidden_layers)],
                    dtype=jnp.int32)
        if spec.mixed_sliding else None
    )

    store_kv = stores_kv_heads(plan.spec)
    cs = plan.spec
    think = cache.think is not None
    #: lane path without region buffers: stage the new K/V row through
    #: the scan ys and commit once per step (scatters are per-step, not
    #: per-layer); quant/think keep in-scan writes (their K index maps
    #: differ from the mask index)
    staged = lane_steps is not None and not quantized and not think

    def commit_lane_rows(kf, vf, mf, pf, ys, subplan):
        k_stack, v_stack = ys                      # [Lseg, B, Hm, Dh]
        slots = subplan.prefill_slots + lane_steps  # [B]
        rows = jnp.arange(b)
        hm = mf.shape[2]
        lseg = kf.shape[0]
        kf = kf.at[:, rows, :, slots].set(
            k_stack.transpose(1, 0, 2, 3).astype(kf.dtype))
        vf = vf.at[:, rows, :, slots].set(
            v_stack.transpose(1, 0, 2, 3).astype(vf.dtype))
        mf = mf.at[:, rows, :, slots].set(
            jnp.ones((b, lseg, hm), mf.dtype))
        pf = pf.at[:, rows, :, slots].set(
            jnp.broadcast_to(pos[:, None, None], (b, lseg, hm)
                             ).astype(jnp.int32))
        return kf, vf, mf, pf

    def make_layer_fn(subplan, layer0):
        """Scan body over layers ``[layer0, layer0 + L_seg)``.

        The cache buffers ride the scan CARRY as full ``[L_seg, B, H, S, D]``
        stacks: the append is a one-slot ``dynamic_update_slice`` (in-place
        in the loop carry) and the attention reads the layer's slice by
        index.  Threading the buffers through scan xs/ys instead makes XLA
        re-stack — i.e. fully COPY — the cache every decode step: invisible
        at 4k ctx, but at 64k the 2.1 GB full-KV cache turned a ~10 ms
        roofline step into 29 ms (34 tok/s) on v5e.  Weights load by index
        for the analogous reason (sliced sub-stacks re-copy per token)."""
        sp = subplan.think_pruned_slots if think else 0
        if lane_steps is None:
            full_slot = subplan.prefill_slots + cache.step  # mask/positions
            # K-buffer index: quant holds only decode slots; think holds
            # only recent+window+decode slots (narrow region excluded)
            kv_slot = cache.step if quantized else full_slot - sp
            v_slot = full_slot if think else kv_slot  # V is full-length
            full_slots = kv_slots = v_slots = None
        else:
            full_slots = subplan.prefill_slots + lane_steps  # [B]
            kv_slots = lane_steps if quantized else full_slots - sp
            v_slots = full_slots if think else kv_slots
            full_slot = kv_slot = v_slot = None

        def layer_fn(carry, i):
            hidden, kf, vf, mf, pf = carry
            # packed-int4 codes stay STACKED (LayerView): the fused decode
            # kernel indexes the layer via scalar prefetch instead of a
            # materialised per-layer slice (weights.layer_view docstring)
            wts = layer_view(params["layers"], layer0 + i)
            qreg = (jax.tree_util.tree_map(lambda x: x[i], cache.quant)
                    if quantized else None)
            treg = (jax.tree_util.tree_map(lambda x: x[i], cache.think)
                    if think else None)
            x = rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps,
                         unit)[:, None, :]
            q, k, v = _qkv(x, wts, spec)  # [B, H/KV, 1, Dh]
            q = apply_rope(q, pos[:, None], inv_freq)[:, :, 0, :]  # [B, H, Dh]
            k = apply_rope(k, pos[:, None], inv_freq)
            if store_kv:
                k_new, v_new = k[:, :, 0, :], v[:, :, 0, :]  # [B, KV, Dh]
            else:
                k_new = _repeat_kv(k, groups)[:, :, 0, :]  # [B, H, Dh]
                v_new = _repeat_kv(v, groups)[:, :, 0, :]
            hm = mf.shape[2]
            if lane_steps is None:
                kf = jax.lax.dynamic_update_slice(
                    kf, k_new[None, :, :, None, :].astype(kf.dtype),
                    (i, 0, 0, kv_slot, 0))
                vf = jax.lax.dynamic_update_slice(
                    vf, v_new[None, :, :, None, :].astype(vf.dtype),
                    (i, 0, 0, v_slot, 0))
                mf = jax.lax.dynamic_update_slice(
                    mf, jnp.ones((1, b, hm, 1), mf.dtype),
                    (i, 0, 0, full_slot))
                pf = jax.lax.dynamic_update_slice(
                    pf, jnp.broadcast_to(
                        pos[None, :, None, None], (1, b, hm, 1)
                    ).astype(pf.dtype),
                    (i, 0, 0, full_slot))
            elif not staged:
                rows = jnp.arange(b)
                kf = kf.at[i, rows, :, kv_slots].set(k_new.astype(kf.dtype))
                vf = vf.at[i, rows, :, v_slots].set(v_new.astype(vf.dtype))
                mf = mf.at[i, rows, :, full_slots].set(True)
                pf = pf.at[i, rows, :, full_slots].set(
                    jnp.broadcast_to(pos[:, None], (b, hm)).astype(jnp.int32))
            layer = LayerCacheView(kf[i], vf[i], mf[i], pf[i])
            visible = layer.mask
            # Sliding-window masking at decode applies only to UNCOMPRESSED
            # caches (rows ARE positions there).  A compressed cache attends
            # ALL its kept keys — the reference's own decode semantics: its
            # eager path sizes everything by the compressed row count and
            # its flash/sdpa row-slicing (`key_states[:, :, -window:]`,
            # mistral_model.py:277-289) never triggers on a
            # shorter-than-window compressed cache.  Masking kept keys by
            # TRUE position instead measurably diverged token-level A/B
            # (test_mistral_decode_token_ab).
            if cs.method in ("fullkv", "minference"):
                if win_arr is not None:
                    visible = visible & (
                        layer.positions
                        > (pos[:, None, None] - win_arr[layer0 + i])
                    )
                elif spec.sliding_window is not None:
                    visible = visible & (
                        layer.positions
                        > (pos[:, None, None] - spec.sliding_window)
                    )
            if quantized:
                sp_ = subplan.prefill_slots
                from ..kernels.quant_decode import MAX_KERNEL_SLOTS

                s_pad_k = qreg.k.codes.shape[-2] * (8 // cs.nbits)
                use_fused = (
                    cs.quant_method == "kivi"
                    and (cs.q_layout == "pa"
                         or subplan.use_quant_fused
                         # DEFAULT for every KIVI region size since r3q:
                         # long regions 64k kivi4 32.1 -> 57.8 tok/s vs
                         # the chunked scan (r3p), short cap-2048 regions
                         # 89.8 -> 109.6 vs one-shot dequant (r3q).  The
                         # tiled/scan/kernel knobs select the
                         # counterfactuals; _FORCE_QUANT_KERNEL tests them
                         or (not subplan.use_quant_tiled
                             and not subplan.use_quant_scan
                             and not subplan.use_quant_kernel
                             and not _FORCE_QUANT_KERNEL[0]))
                )
                use_kernel = (
                    (subplan.use_quant_kernel or _FORCE_QUANT_KERNEL[0])
                    and not use_fused
                    and cs.quant_method == "kivi"
                    and cs.q_layout == "group"
                    and s_pad_k <= MAX_KERNEL_SLOTS
                    # kernel has no softcap/custom-scale support
                    and ascale is None and asoftcap is None
                )
                if use_fused:
                    # factored dequant: scales fold into query/probs, the
                    # dots read only the packed codes (ops/quant.py::
                    # quant_region_attention_fused) — always for the "pa"
                    # layout (its scale shapes fit no other path), opt-in
                    # for grouped regions via EngineSpec.use_quant_fused
                    from ..ops.attention import (
                        decode_attention_partials,
                        merge_attention_partials,
                    )
                    from ..ops.quant import quant_region_attention_fused

                    use_fk = (subplan.use_quant_fused_kernel
                              or _FORCE_QUANT_FUSED_KERNEL[0])
                    if use_fk:
                        from ..kernels.quant_fused_decode import (
                            supports_fused_kernel)

                        use_fk = supports_fused_kernel(
                            qreg, nbits=cs.nbits, softcap=asoftcap)
                    if use_fk:
                        # streaming Pallas variant: unpack + online softmax
                        # + PV stay in VMEM — region HBM traffic is the
                        # packed codes alone (kernels/quant_fused_decode)
                        from ..kernels.quant_fused_decode import (
                            region_attention_fused_kernel)

                        part_r = region_attention_fused_kernel(
                            q, qreg, visible[:, :, :sp_],
                            head_dim=spec.head_dim, nbits=cs.nbits,
                            scale=ascale,
                            interpret=_FORCE_QUANT_FUSED_KERNEL[0],
                        )
                    else:
                        part_r = quant_region_attention_fused(
                            q, qreg, visible[:, :, :sp_], num_slots=sp_,
                            head_dim=spec.head_dim, nbits=cs.nbits,
                            scale=ascale, softcap=asoftcap,
                        )
                    part_t = decode_attention_partials(
                        q, layer.k, layer.v, visible[:, :, sp_:],
                        scale=ascale, softcap=asoftcap,
                    )
                    attn = merge_attention_partials(
                        [part_r, part_t]).astype(q.dtype)
                elif use_kernel:
                    # fused dequant-attention over the packed region: HBM
                    # traffic = codes + scales only (~nbits/16 of bf16)
                    from ..kernels.quant_decode import quant_decode_attention
                    from ..ops.attention import (
                        decode_attention_partials,
                        merge_attention_partials,
                    )

                    rmask = jnp.pad(
                        visible[:, :, :sp_],
                        ((0, 0), (0, 0), (0, s_pad_k - sp_)),
                    )
                    part_r = quant_decode_attention(
                        q, qreg.k.codes,
                        qreg.k.scale[..., 0], qreg.k.zero[..., 0],
                        qreg.v.codes,
                        qreg.v.scale[..., 0], qreg.v.zero[..., 0],
                        rmask, nbits=cs.nbits,
                        group_size=cs.q_group_size,
                        interpret=_FORCE_QUANT_KERNEL[0],
                    )
                    part_t = decode_attention_partials(
                        q, layer.k, layer.v, visible[:, :, sp_:]
                    )
                    attn = merge_attention_partials([part_r, part_t]).astype(
                        q.dtype
                    )
                elif (cs.quant_method == "kivi"
                      and s_pad_k > _QUANT_CHUNK_THRESHOLD[0]):
                    # long regions.  Default: the chunked XLA scan
                    # (ops/quant.py).  The TILED fused kernel (grid over
                    # slot tiles, dequant stays in VMEM) was built to cut
                    # the scan's HBM chunk round-trips, but MEASURED SLOWER
                    # on every row (BASELINE r2az: 32k kivi4 37.3 vs 46.2
                    # tok/s, 64k kivi4 23.1 vs 29.3 — per-tile scale-fold
                    # setup + f32 code matmuls outweigh the saved chunk
                    # traffic); it stays opt-in via PKV_QUANT_TILED=1.
                    from ..ops.attention import (
                        decode_attention_partials,
                        merge_attention_partials,
                    )

                    rmask = visible[:, :, :sp_]
                    tile_k = 0
                    use_tiled = (
                        subplan.use_quant_tiled
                        or _os.environ.get("PKV_QUANT_TILED", "0") == "1"
                    )
                    if ((subplan.use_pallas and use_tiled)
                            or _FORCE_QUANT_KERNEL[0]):
                        from ..kernels.quant_decode import (
                            quant_decode_attention_tiled,
                            tiled_kernel_tile,
                        )

                        tile_k = tiled_kernel_tile(cs.nbits,
                                                   cs.q_group_size)
                        if _FORCE_QUANT_KERNEL[0]:
                            # interpret-mode tests: tiny aligned tiles
                            tile_k = math.gcd(s_pad_k, tile_k)
                        if s_pad_k % tile_k != 0:
                            tile_k = 0  # unaligned region: XLA fallback
                    if tile_k:
                        part_r = quant_decode_attention_tiled(
                            q, qreg.k.codes,
                            qreg.k.scale[..., 0], qreg.k.zero[..., 0],
                            qreg.v.codes,
                            qreg.v.scale[..., 0], qreg.v.zero[..., 0],
                            rmask, nbits=cs.nbits,
                            group_size=cs.q_group_size,
                            tile=tile_k,
                            interpret=_FORCE_QUANT_KERNEL[0],
                            scale=ascale, softcap=asoftcap,
                            mm_bf16=_os.environ.get(
                                "PKV_QUANT_MM_BF16", "0") == "1",
                        )
                    else:
                        from ..ops.quant import (
                            quant_region_attention_partials,
                        )

                        part_r = quant_region_attention_partials(
                            q, qreg, rmask, num_slots=sp_,
                            head_dim=spec.head_dim, nbits=cs.nbits,
                            group_size=cs.q_group_size,
                            chunk=_QUANT_CHUNK_SIZE[0],
                            scale=ascale, softcap=asoftcap,
                        )
                    part_t = decode_attention_partials(
                        q, layer.k, layer.v, visible[:, :, sp_:],
                        scale=ascale, softcap=asoftcap,
                    )
                    attn = merge_attention_partials([part_r, part_t]).astype(
                        q.dtype
                    )
                else:
                    from ..ops.quant import dequantize_kv_region

                    k_pre, v_pre = dequantize_kv_region(
                        qreg, num_slots=sp_,
                        head_dim=spec.head_dim,
                        nbits=cs.nbits, group_size=cs.q_group_size,
                        dtype=layer.k.dtype,
                    )
                    k_all = jnp.concatenate([k_pre, layer.k], axis=2)
                    v_all = jnp.concatenate([v_pre, layer.v], axis=2)
                    attn = decode_attention(q, k_all, v_all, visible,
                                            scale=ascale, softcap=asoftcap)
            elif think:
                from ..ops.attention import decode_attention_think

                attn = decode_attention_think(
                    q, treg.k_pruned, treg.kept_channels, layer.k, layer.v,
                    visible, scale=ascale, softcap=asoftcap,
                )
            elif staged:
                # lane path: the new row is NOT in the buffers — it rides
                # the scan ys and commits once after the scan (one scatter
                # per buffer per STEP instead of per layer; TPU scatters
                # have high fixed cost — logs/tpu_r2ap/aq)
                from ..ops.attention import decode_attention_append

                attn = decode_attention_append(
                    q, layer.k, layer.v, visible, k_new, v_new,
                    scale=ascale, softcap=asoftcap)
            else:
                attn = decode_attention(q, layer.k, layer.v, visible,
                                        scale=ascale, softcap=asoftcap)
            ao = mm(attn.reshape(b, -1), wts["wo"])
            if spec.post_block_norms:
                ao = rms_norm(ao, wts["attn_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + ao
            x2 = rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps, unit)
            mo = _mlp(x2, wts, spec.num_experts_per_tok,
                      hidden_act=spec.hidden_act)
            if spec.post_block_norms:
                mo = rms_norm(mo, wts["mlp_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + mo
            ys = (k_new, v_new) if staged else None
            return (hidden, kf, vf, mf, pf), ys

        return layer_fn

    segs = plan.segment_plans()
    if len(segs) == 1:
        _, _, sub = segs[0]
        carry0 = (hidden0, cache.k, cache.v, cache.mask, cache.positions)
        (hidden, k, v, m, p), ys = jax.lax.scan(
            make_layer_fn(sub, 0), carry0,
            jnp.arange(spec.num_hidden_layers, dtype=jnp.int32),
            unroll=min(_DECODE_SCAN_UNROLL[0], spec.num_hidden_layers),
        )
        if staged:
            k, v, m, p = commit_lane_rows(k, v, m, p, ys, sub)
        logits = _logits(hidden, params, spec)
        new_cache = KVCache(
            k=k, v=v, mask=m, positions=p, true_len=cache.true_len,
            step=cache.step + 1, quant=cache.quant, think=cache.think,
        )
        return logits, new_cache

    assert not quantized and not think  # make_plan keeps these uniform
    hidden = hidden0
    outk, outv, outm, outp = [], [], [], []
    for i, (start, stop, sub) in enumerate(segs):
        carry0 = (hidden, cache.k[i], cache.v[i], cache.mask[i],
                  cache.positions[i])
        (hidden, k1, v1, m1, p1), ys = jax.lax.scan(
            make_layer_fn(sub, start), carry0,
            jnp.arange(stop - start, dtype=jnp.int32),
            unroll=min(_DECODE_SCAN_UNROLL[0], stop - start),
        )
        if staged:
            k1, v1, m1, p1 = commit_lane_rows(k1, v1, m1, p1, ys, sub)
        outk.append(k1)
        outv.append(v1)
        outm.append(m1)
        outp.append(p1)
    logits = _logits(hidden, params, spec)
    new_cache = KVCache(
        k=tuple(outk), v=tuple(outv), mask=tuple(outm),
        positions=tuple(outp),
        true_len=cache.true_len, step=cache.step + 1, quant=None,
    )
    return logits, new_cache


def verify_step(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    cache: KVCache,
    tokens: jax.Array,
    *,
    lane_steps: Optional[jax.Array] = None,
) -> Tuple[jax.Array, KVCache]:
    """Multi-token forward for speculative verification.

    ``tokens`` is ``[B, T]``: the last accepted token followed by ``T-1``
    draft tokens (`ops/ngram.py`).  All ``T`` candidate K/V rows are
    appended (contiguous slots ``step .. step+T``) and every query sees
    the cache plus its in-segment predecessors via the position-bound
    mask in :func:`ops.attention.verify_attention` — so the ``T`` logits
    rows equal ``T`` sequential :func:`decode_step` calls on the same
    tokens.  The caller computes the accepted prefix and rewinds the
    rejected tail with :func:`rollback_decode`.

    Decode is weight-bound (one d32 int4 step reads ~4 GB of weights for
    ~1.6 + 0.25/layer ms — BASELINE.md r2ag), so verifying T tokens costs
    barely more than one step; each accepted draft is nearly free.

    Scope: every B=1 cache layout — plain bf16, QUANTIZED (KIVI fused
    factored region partials fold the T queries into the group axis, so
    the packed codes are read once per verify; kvquant / counterfactual
    knobs fall back to one-shot dequant + position-bound attention), and
    ThinK-narrow (two-block verify logits).  ``lane_steps`` (continuous
    batching) gives each row its own append offset, exactly like
    :func:`decode_step`'s lane path — lanes keep plain bf16 caches (the
    staged commit has no region analogue).

    Reference counterpart: none (the reference decodes strictly one token
    per forward, run_longbench.py:266-275).
    """
    quantized = cache.quant is not None
    think = cache.think is not None
    assert lane_steps is None or (not quantized and not think)
    b, t_seg = tokens.shape
    groups = spec.num_query_groups
    inv_freq = rope_inv_freq(spec)
    if lane_steps is None:
        pos0 = cache.current_position()                       # [B]
    else:
        pos0 = cache.true_len.astype(jnp.int32) + lane_steps
    q_pos = pos0[:, None] + jnp.arange(t_seg, dtype=jnp.int32)[None, :]
    hidden0 = embed_lookup(params["embed"], tokens,
                           params["final_norm"].dtype)        # [B, T, Dm]
    if spec.scale_embeddings:
        hidden0 = hidden0 * jnp.asarray(
            math.sqrt(spec.hidden_size), dtype=hidden0.dtype)
    unit = spec.rmsnorm_unit_offset
    ascale = (spec.attn_scale
              if spec.query_pre_attn_scalar is not None else None)
    asoftcap = spec.attn_logit_softcapping
    win_arr = (
        jnp.asarray([spec.sliding_window if spec.layer_is_sliding(i)
                     else (1 << 30) for i in range(spec.num_hidden_layers)],
                    dtype=jnp.int32)
        if spec.mixed_sliding else None
    )
    store_kv = stores_kv_heads(plan.spec)
    lanes = lane_steps is not None

    def commit_seg(kf, vf, mf, pf, ys, subplan):
        """Write all T candidate rows once per verify (the caller's
        rollback mask-clears the rejected tail): per-layer scatters cost
        ~4.8 ms of a ~25 ms 8-lane iteration (logs/tpu_r2aq)."""
        k_stack, v_stack = ys                  # [Lseg, B, Hm, T, Dh]
        rows = jnp.arange(b)[:, None]
        tgrid = (subplan.prefill_slots + lane_steps)[:, None] \
            + jnp.arange(t_seg)[None, :]
        hm = mf.shape[2]
        lseg = kf.shape[0]
        # update subspace [B, T] + remaining [Lseg, Hm, (Dh)]
        kf = kf.at[:, rows, :, tgrid].set(
            k_stack.transpose(1, 3, 0, 2, 4).astype(kf.dtype))
        vf = vf.at[:, rows, :, tgrid].set(
            v_stack.transpose(1, 3, 0, 2, 4).astype(vf.dtype))
        mf = mf.at[:, rows, :, tgrid].set(
            jnp.ones((b, t_seg, lseg, hm), mf.dtype))
        pf = pf.at[:, rows, :, tgrid].set(
            jnp.broadcast_to(q_pos[:, :, None, None],
                             (b, t_seg, lseg, hm)).astype(jnp.int32))
        return kf, vf, mf, pf

    def make_layer_fn(subplan, layer0):
        sp_t = subplan.think_pruned_slots if think else 0
        if lanes:
            slot = kv_slot = v_slot = None
        else:
            slot = subplan.prefill_slots + cache.step  # mask/positions
            # K-buffer index mirrors decode_step: quant buffers hold only
            # decode slots; think K holds only recent+window+decode
            kv_slot = cache.step if quantized else slot - sp_t
            v_slot = slot if think else kv_slot

        def layer_fn(carry, i):
            hidden, kf, vf, mf, pf = carry
            wts = layer_view(params["layers"], layer0 + i)
            qreg = (jax.tree_util.tree_map(lambda x: x[i], cache.quant)
                    if quantized else None)
            treg = (jax.tree_util.tree_map(lambda x: x[i], cache.think)
                    if think else None)
            # compressed caches attend ALL kept keys (reference decode
            # semantics — see decode_step); window masking only where
            # cache rows are positions
            if subplan.spec.method in ("fullkv", "minference"):
                win_i = (win_arr[layer0 + i] if win_arr is not None
                         else spec.sliding_window)
            else:
                win_i = None
            x = rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps, unit)
            q, k, v = _qkv(x, wts, spec)                      # [B,H/KV,T,Dh]
            q = apply_rope(q, q_pos, inv_freq)
            k = apply_rope(k, q_pos, inv_freq)
            if store_kv:
                k_new, v_new = k, v                           # [B,KV,T,Dh]
            else:
                k_new = _repeat_kv(k, groups)                 # [B,H,T,Dh]
                v_new = _repeat_kv(v, groups)
            hm = mf.shape[2]
            if lanes:
                # staged: candidates ride the ys, commit_seg writes once
                layer = LayerCacheView(kf[i], vf[i], mf[i], pf[i])
                attn = verify_attention_append(
                    q, layer.k, layer.v, layer.mask, layer.positions,
                    q_pos, k_new, v_new,
                    sliding_window=win_i, scale=ascale, softcap=asoftcap,
                )
            else:
                kf = jax.lax.dynamic_update_slice(
                    kf, k_new[None].astype(kf.dtype), (i, 0, 0, kv_slot, 0))
                vf = jax.lax.dynamic_update_slice(
                    vf, v_new[None].astype(vf.dtype), (i, 0, 0, v_slot, 0))
                mf = jax.lax.dynamic_update_slice(
                    mf, jnp.ones((1, b, hm, t_seg), mf.dtype),
                    (i, 0, 0, slot))
                pf = jax.lax.dynamic_update_slice(
                    pf, jnp.broadcast_to(
                        q_pos[None, :, None, :], (1, b, hm, t_seg)
                    ).astype(pf.dtype),
                    (i, 0, 0, slot))
                layer = LayerCacheView(kf[i], vf[i], mf[i], pf[i])
                cs_ = subplan.spec
                if quantized:
                    sp_ = subplan.prefill_slots
                    use_fused = (
                        cs_.quant_method == "kivi"
                        and win_i is None  # window needs per-query region vis
                        and (cs_.q_layout == "pa"
                             or subplan.use_quant_fused
                             or (not subplan.use_quant_tiled
                                 and not subplan.use_quant_scan
                                 and not subplan.use_quant_kernel
                                 and not _FORCE_QUANT_KERNEL[0]))
                    )
                    if use_fused:
                        from ..ops.attention import (
                            merge_attention_partials,
                            verify_attention_partials,
                        )
                        from ..ops.quant import (
                            quant_region_attention_fused_multi,
                        )

                        part_r = quant_region_attention_fused_multi(
                            q, qreg, layer.mask[:, :, :sp_], num_slots=sp_,
                            head_dim=spec.head_dim, nbits=cs_.nbits,
                            scale=ascale, softcap=asoftcap,
                        )
                        part_t = verify_attention_partials(
                            q, layer.k, layer.v, layer.mask[:, :, sp_:],
                            layer.positions[:, :, sp_:], q_pos,
                            scale=ascale, softcap=asoftcap,
                        )
                        attn = merge_attention_partials(
                            [part_r, part_t]).astype(q.dtype)
                    else:
                        # kvquant / counterfactual knobs / sliding-window
                        # full-KV: one-shot dequant + position-bound
                        # attention over the concat (decode's else branch)
                        from ..ops.quant import dequantize_kv_region

                        k_pre, v_pre = dequantize_kv_region(
                            qreg, num_slots=sp_, head_dim=spec.head_dim,
                            nbits=cs_.nbits, group_size=cs_.q_group_size,
                            dtype=layer.k.dtype,
                        )
                        attn = verify_attention(
                            q, jnp.concatenate([k_pre, layer.k], axis=2),
                            jnp.concatenate([v_pre, layer.v], axis=2),
                            layer.mask, layer.positions, q_pos,
                            sliding_window=win_i, scale=ascale,
                            softcap=asoftcap,
                        )
                elif think:
                    from ..ops.attention import verify_attention_think

                    attn = verify_attention_think(
                        q, treg.k_pruned, treg.kept_channels, layer.k,
                        layer.v, layer.mask, layer.positions, q_pos,
                        scale=ascale, softcap=asoftcap,
                    )
                else:
                    attn = verify_attention(
                        q, layer.k, layer.v, layer.mask, layer.positions,
                        q_pos, sliding_window=win_i, scale=ascale,
                        softcap=asoftcap,
                    )                                         # [B,H,T,Dh]
            attn = attn.transpose(0, 2, 1, 3).reshape(b, t_seg, -1)
            ao = mm(attn, wts["wo"])
            if spec.post_block_norms:
                ao = rms_norm(ao, wts["attn_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + ao
            x2 = rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps, unit)
            mo = _mlp(x2, wts, spec.num_experts_per_tok,
                      hidden_act=spec.hidden_act)
            if spec.post_block_norms:
                mo = rms_norm(mo, wts["mlp_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + mo
            ys = (k_new, v_new) if lanes else None
            return (hidden, kf, vf, mf, pf), ys

        return layer_fn

    segs = plan.segment_plans()
    if len(segs) == 1:
        _, _, sub = segs[0]
        carry0 = (hidden0, cache.k, cache.v, cache.mask, cache.positions)
        (hidden, k, v, m, p), ys = jax.lax.scan(
            make_layer_fn(sub, 0), carry0,
            jnp.arange(spec.num_hidden_layers, dtype=jnp.int32),
        )
        if lanes and not _SPEC_NO_APPEND[0]:
            k, v, m, p = commit_seg(k, v, m, p, ys, sub)
        logits = _logits(hidden, params, spec)                # [B,T,V]
        return logits, KVCache(
            k=k, v=v, mask=m, positions=p, true_len=cache.true_len,
            step=cache.step if lanes else cache.step + t_seg,
            quant=cache.quant, think=cache.think,
        )
    hidden = hidden0
    outk, outv, outm, outp = [], [], [], []
    for i, (start, stop, sub) in enumerate(segs):
        carry0 = (hidden, cache.k[i], cache.v[i], cache.mask[i],
                  cache.positions[i])
        (hidden, k1, v1, m1, p1), ys = jax.lax.scan(
            make_layer_fn(sub, start), carry0,
            jnp.arange(stop - start, dtype=jnp.int32),
        )
        if lanes and not _SPEC_NO_APPEND[0]:
            k1, v1, m1, p1 = commit_seg(k1, v1, m1, p1, ys, sub)
        outk.append(k1)
        outv.append(v1)
        outm.append(m1)
        outp.append(p1)
    logits = _logits(hidden, params, spec)
    return logits, KVCache(
        k=tuple(outk), v=tuple(outv), mask=tuple(outm), positions=tuple(outp),
        true_len=cache.true_len,
        step=cache.step if lanes else cache.step + t_seg,
    )


def rollback_decode(cache: KVCache, plan: PolicyPlan,
                    new_step: jax.Array) -> KVCache:
    """Rewind the decode region to ``new_step`` appended tokens.

    Clears validity (and positions, for hygiene) of every decode slot at
    index >= ``new_step`` — the rejected tail of a speculative
    :func:`verify_step`.  K/V bytes are left stale: masked slots are
    invisible to attention and the next verification overwrites them
    (appends are contiguous from ``step``).

    ``new_step`` may be a scalar (shared step, `Engine.generate`) or a
    ``[B]`` vector of per-lane step counts (continuous batching); the
    vector form leaves ``cache.step`` untouched.

    Quantized / ThinK caches need no extra work: their regions are
    immutable (only the bf16 decode tail's validity is rewound — the
    mask layout puts decode slots at ``prefill_slots + step`` for every
    cache kind) and ``_replace`` carries ``quant``/``think`` through.
    """
    new_step = jnp.asarray(new_step, jnp.int32)
    per_lane = new_step.ndim == 1
    bound = new_step[None, :, None, None] if per_lane else new_step

    def clear(mask_f, pos_f, ps):
        s = mask_f.shape[-1]
        keep = jnp.arange(s, dtype=jnp.int32)[None, None, None, :] < (
            ps + bound)
        return mask_f & keep, jnp.where(keep, pos_f, -1)

    seg_ps = [s[2] + plan.window for s in plan.segments]
    if isinstance(cache.mask, tuple):
        cleared = [clear(m, p, ps) for m, p, ps in
                   zip(cache.mask, cache.positions, seg_ps)]
        return cache._replace(
            mask=tuple(c[0] for c in cleared),
            positions=tuple(c[1] for c in cleared),
            step=cache.step if per_lane else new_step,
        )
    m, p = clear(cache.mask, cache.positions, seg_ps[0])
    return cache._replace(mask=m, positions=p,
                          step=cache.step if per_lane else new_step)
