"""Weight quantization (int8) for single-chip large-depth serving.

Decode is HBM-bandwidth-bound: reading int8 weights halves the dominant
traffic term, and — unlike cache quantization — the dequant never needs a
kernel: with PER-OUTPUT-CHANNEL symmetric scales the dequant factors out
of the matmul exactly,

    x @ (codes * scale_col)  ==  (x @ codes) * scale_col,

so the only approximation is the int8 rounding of the weights themselves
and XLA keeps the HBM reads at one byte/param.  This is also what makes
the full 32-layer Llama-3-8B geometry fit one 16 GB v5e (bf16 weights are
~16 GB; int8 ~8 GB).

The embedding table quantizes per ROW (token vector): lookup dequantizes
the selected rows; tied/untied logits reuse the same per-row scales as
per-output-channel scales of the vocab projection.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuantW(NamedTuple):
    """int8 weight + per-output-channel scale (a pytree; scan-sliceable)."""

    codes: jax.Array  #: int8, original weight shape [..., in, out]
    scale: jax.Array  #: f32, [..., out]


def _quantize_leaf(w: jax.Array) -> QuantW:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)  # [..., out]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    codes = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127)
    return QuantW(codes=codes.astype(jnp.int8), scale=scale)


#: weight leaves that flow through matmuls (norm vectors stay bf16)
_MATMUL_LEAVES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                  "router")


def quantize_weights(params: dict) -> dict:
    """bf16/f32 param pytree -> int8-weight pytree (same structure, matmul
    leaves replaced by :class:`QuantW`)."""
    out = dict(params)
    out["layers"] = {
        k: (_quantize_leaf(v) if k in _MATMUL_LEAVES else v)
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
        out["lm_head"] = _quantize_leaf(params["lm_head"])
    return out


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or int8-quantized weights (dequant factored out)."""
    if isinstance(w, QuantW):
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
