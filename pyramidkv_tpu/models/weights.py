"""Weight quantization (int8 / int4, optional group-wise scales) for
single-chip large-depth serving.

Decode is HBM-bandwidth-bound: reading int8 weights halves the dominant
traffic term and int4 halves it again (XLA stores s4 packed two-per-byte
in HBM), and — unlike cache quantization — the dequant never needs a
kernel: with PER-OUTPUT-CHANNEL symmetric scales the dequant factors out
of the matmul exactly,

    x @ (codes * scale_col)  ==  (x @ codes) * scale_col,

so the only approximation is the integer rounding of the weights
themselves and XLA keeps the HBM reads at nbits/8 bytes/param.  This is
what makes the full 32-layer Llama-3-8B geometry fit one 16 GB v5e
(bf16 weights ~16 GB; int8 ~8 GB; int4 ~4 GB + int8 embeddings).

int4 per-channel rounding is coarse, so ``group_size`` (AWQ/GPTQ-style,
e.g. 128) additionally splits the CONTRACTION dimension into groups with
one scale per (group, out_channel).  Grouped dequant no longer factors
out of the whole matmul, but it factors out of each group's partial
product:

    y = sum_G (x_G @ codes_G) * scale[G]

which `mm` computes either as one batched einsum with a small
``[..., G, out]`` transient (decode-sized x) or as a fori_loop of
per-group matmul accumulations (prefill-sized x — transient stays
``[..., out]``).

The embedding table quantizes per ROW (token vector): lookup dequantizes
the selected rows; tied/untied logits reuse the same per-row scales as
per-output-channel scales of the vocab projection.  Embedding and
lm_head stay int8 even under ``nbits=4`` — they are the quality-critical
ends of the network and the embed lookup is a row gather where group
scales have no meaning.

Reference counterpart: the reference quantizes the KV cache only
(quantcache.py); weight quantization is the piece that makes its 8B
flagship servable on one 16 GB TPU chip at all.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantW(NamedTuple):
    """Quantized weight (a pytree; scan-sliceable along a leading stack
    axis).

    - per-channel: ``scale.ndim == codes.ndim - 1`` (``[..., out]``; the
      embedding's per-row variant is ``[vocab]``).
    - group-wise:  ``scale.ndim == codes.ndim`` (``[..., G, out]`` with
      ``G = in_dim // group_size``).
    """

    codes: jax.Array  #: int8 or int4, original weight shape [..., in, out]
    scale: jax.Array  #: f32, [..., out] (per-channel) or [..., G, out]


def _qdtype(nbits: int):
    if nbits == 8:
        return 127.0, jnp.int8
    if nbits == 4:
        return 7.0, jnp.int4
    raise ValueError(f"weight nbits must be 4 or 8, got {nbits}")


def _quantize_leaf(w: jax.Array, nbits: int = 8,
                   group_size: Optional[int] = None) -> QuantW:
    qmax, dt = _qdtype(nbits)
    wf = w.astype(jnp.float32)
    in_dim = wf.shape[-2]
    if group_size and in_dim % group_size == 0 and in_dim > group_size:
        g = group_size
        lead = wf.shape[:-2]
        wg = wf.reshape(*lead, in_dim // g, g, wf.shape[-1])
        amax = jnp.max(jnp.abs(wg), axis=-2)          # [..., G, out]
        scale = jnp.maximum(amax, 1e-8) / qmax
        codes = jnp.clip(jnp.round(wg / scale[..., None, :]), -qmax, qmax)
        return QuantW(codes=codes.reshape(wf.shape).astype(dt), scale=scale)
    amax = jnp.max(jnp.abs(wf), axis=-2)              # [..., out]
    scale = jnp.maximum(amax, 1e-8) / qmax
    codes = jnp.clip(jnp.round(wf / scale[..., None, :]), -qmax, qmax)
    return QuantW(codes=codes.astype(dt), scale=scale)


#: weight leaves that flow through matmuls (norm vectors stay bf16)
_MATMUL_LEAVES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                  "router")


def quantize_weights(params: dict, nbits: int = 8,
                     group_size: Optional[int] = None) -> dict:
    """bf16/f32 param pytree -> quantized pytree (same structure, matmul
    leaves replaced by :class:`QuantW`).

    ``group_size`` applies to DENSE stacked layer leaves ([L, in, out]);
    expert-stacked MoE leaves ([L, E, in, out]) always use per-channel
    scales (the expert einsums contract the whole in-dim at once).
    Embedding and lm_head are always int8 (see module docstring).
    """
    _qdtype(nbits)  # validate early
    out = dict(params)
    out["layers"] = {
        k: (_quantize_leaf(
                v, nbits,
                group_size if isinstance(v, jax.Array) and v.ndim == 3
                else None)
            if k in _MATMUL_LEAVES else v)
        for k, v in params["layers"].items()
    }
    # embed: per-row scales serve both the lookup and the (tied) logits
    emb = params["embed"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(emb), axis=-1)
    esc = jnp.maximum(amax, 1e-8) / 127.0
    out["embed"] = QuantW(
        codes=jnp.clip(jnp.round(emb / esc[:, None]), -127, 127).astype(jnp.int8),
        scale=esc,
    )
    if "lm_head" in params:
        out["lm_head"] = _quantize_leaf(params["lm_head"], 8)
    return out


#: above this many x rows the grouped path switches from the batched
#: einsum (transient [rows, G, out] f32) to a fori_loop accumulation
#: (transient [rows, out]); 256 rows x 32 groups x 14336 out x 4 B
#: = 470 MB is the worst case the einsum path will allocate.
_GROUP_EINSUM_MAX_ROWS = 256


def _mm_grouped(x: jax.Array, w: QuantW) -> jax.Array:
    """x @ dequant(w) for group-wise scales; codes [in, out],
    scale [G, out]."""
    in_dim, out_dim = w.codes.shape
    n_groups = w.scale.shape[0]
    g = in_dim // n_groups
    xr = x.reshape(*x.shape[:-1], n_groups, g)
    rows = math.prod(x.shape[:-1]) if x.ndim > 1 else 1
    codes_g = w.codes.reshape(n_groups, g, out_dim)
    if rows <= _GROUP_EINSUM_MAX_ROWS:
        p = jnp.einsum("...Gg,Ggo->...Go", xr, codes_g.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = jnp.sum(p * w.scale.astype(jnp.float32), axis=-2)
        return y.astype(x.dtype)

    def body(i, acc):
        xg = jax.lax.dynamic_index_in_dim(xr, i, axis=-2, keepdims=False)
        cg = jax.lax.dynamic_index_in_dim(codes_g, i, axis=0,
                                          keepdims=False)
        sg = jax.lax.dynamic_index_in_dim(w.scale, i, axis=0,
                                          keepdims=False)
        p = jnp.einsum("...g,go->...o", xg, cg.astype(x.dtype),
                       preferred_element_type=jnp.float32)
        return acc + p * sg.astype(jnp.float32)

    acc = jnp.zeros((*x.shape[:-1], out_dim), jnp.float32)
    return jax.lax.fori_loop(0, n_groups, body, acc).astype(x.dtype)


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized weights (dequant factored out)."""
    if isinstance(w, QuantW):
        if w.scale.ndim == w.codes.ndim:          # group-wise scales
            return _mm_grouped(x, w)
        y = x @ w.codes.astype(x.dtype)
        return y * w.scale[..., None, :].astype(y.dtype) if w.scale.ndim > 1 \
            else y * w.scale.astype(y.dtype)
    return x @ w


def embed_lookup(embed, tokens: jax.Array, dtype) -> jax.Array:
    if isinstance(embed, QuantW):
        rows = jnp.take(embed.codes, tokens, axis=0).astype(dtype)
        sc = jnp.take(embed.scale, tokens, axis=0).astype(dtype)
        return rows * sc[..., None]
    return jnp.take(embed, tokens, axis=0)


def weight_dtype(params: dict):
    """The activation dtype to use (embed codes are int8 when quantized)."""
    emb = params["embed"]
    if isinstance(emb, QuantW):
        return jnp.bfloat16
    return emb.dtype
