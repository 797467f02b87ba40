"""Fused single-token decode attention (Pallas TPU).

The XLA decode-attention path (`ops/attention.py::decode_attention`) is
QK-einsum -> mask -> softmax -> PV-einsum: ~5 small dispatches per layer
whose tensors are decode-sized (q is one token).  The depth-split
decomposition (logs/tpu_r2ag) shows d32 int4 decode spends ~0.25 ms per
layer against ~0.1 ms of weight bytes — per-layer dispatch, not
bandwidth, is the headroom.  This kernel runs the whole attention read
in ONE launch per layer: each grid cell (batch, kv-head) loads its
``[S, D]`` K/V strips into VMEM once and computes the GQA group's
queries against them (grouped compute — never materialises repeat_kv,
per the repo invariant).

Numerics mirror the XLA path exactly: logits scaled by 1/sqrt(D) in f32,
masked to float32.min, single-pass softmax in f32 (S fits VMEM — no
online rescaling), probabilities cast to the V dtype before the PV dot
with f32 accumulation.

Scope: the COMMON compressed-cache case — S*D small enough for VMEM
(``MAX_KERNEL_SLOTS``); fullkv's multi-thousand-slot caches keep the XLA
path (its big-S batched matmuls are already bandwidth-efficient).  Used
for both per-query-head caches (Hk == H) and true-GQA storage
(Hk == num_kv_heads).

Reference counterpart: flash_attn_varlen_func over the ragged per-head
cache (/root/reference/pyramidkv/llama_model.py:2386-2388).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)

#: K strip bytes per grid cell stay under ~4 MB of VMEM (bf16, D=128):
#: 4096 slots x 128 x 2 B = 1 MB for K + 1 MB for V + logits.  Compressed
#: caches (cap + window + decode slots) are far below this.
MAX_KERNEL_SLOTS = 4096


def _kernel(q_ref, k_ref, v_ref, m_ref, o_ref):
    d = q_ref.shape[-1]
    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / math.sqrt(d))                       # [g, S] f32
    valid = m_ref[0, 0] > 0                        # [1, S] (i32 cmp —
    # Mosaic rejects cmpi on i8 vectors: "Target does not support this
    # comparison", logs/tpu_r2ai)
    s = jnp.where(valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v_ref.dtype)
    o = jax.lax.dot_general(
        p, v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [g, D] f32
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """One-launch masked decode attention.

    Args:
      q: [B, H, D].
      k, v: [B, Hk, S, D] slot buffers (Hk == H or H % Hk == 0).
      mask: [B, Hk, S] bool validity.

    Returns [B, H, D] in q's dtype.
    """
    b, h, d = q.shape
    _, hk, s, _ = k.shape
    g = h // hk
    qg = q.reshape(b, hk, g, d)
    mi = mask.astype(jnp.int32).reshape(b, hk, 1, s)
    out = pl.pallas_call(
        _kernel,
        grid=(b, hk),
        in_specs=[
            pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, s), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, g, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hk, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qg, k, v, mi)
    return out.reshape(b, h, d)
