"""Attention-map extraction for visualization.

Counterpart of the reference's ``viztools.infer.infer_attention``
(/root/reference/pyramidkv/viztools/infer.py) which reruns the HF model
with ``output_attentions=True``.  Here we run our own decoder eagerly,
materialising each layer's softmax matrix — viz prompts are short, so the
O(N^2) maps are fine.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelSpec
from ..models.llama import (
    _mlp,
    _qkv,
    _repeat_kv,
    apply_rope,
    rms_norm,
    rope_inv_freq,
)


def capture_attentions(
    params: dict,
    spec: ModelSpec,
    token_ids: Sequence[int],
) -> List[np.ndarray]:
    """Returns one [num_heads, seq_len, seq_len] softmax matrix per layer
    (causal, no padding)."""
    tokens = jnp.asarray(token_ids, jnp.int32)[None, :]
    b, n = tokens.shape
    inv_freq = rope_inv_freq(spec)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :]
    groups = spec.num_query_groups
    scale = 1.0 / math.sqrt(spec.head_dim)
    causal = jnp.tril(jnp.ones((n, n), dtype=bool))

    hidden = jnp.take(params["embed"], tokens, axis=0)
    lw = params["layers"]
    maps = []
    for l in range(spec.num_hidden_layers):
        wts = {k: v[l] for k, v in lw.items()}
        x = rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps)
        q, k, v = _qkv(x, wts, spec)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        k_rep = _repeat_kv(k, groups)
        v_rep = _repeat_kv(v, groups)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k_rep.astype(jnp.float32)
        ) * scale
        logits = jnp.where(causal[None, None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        maps.append(np.asarray(probs[0]))
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v_rep.astype(jnp.float32))
        out = out.astype(hidden.dtype).transpose(0, 2, 1, 3).reshape(b, n, -1)
        hidden = hidden + out @ wts["wo"]
        x2 = rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps)
        hidden = hidden + _mlp(x2, wts)
    return maps
