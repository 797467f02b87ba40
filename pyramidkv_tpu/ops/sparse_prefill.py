"""MInference-style sparse prefill attention (vertical + slash pattern).

The reference integrates the external ``minference`` package as an optional
prefill plugin (/root/reference/pyramidkv/minference.py: per-model pattern
config :9-12, prefill dispatch :49-59; decode falls back to dense flash).
Its dominant pattern is ``vertical_and_slash``: keep a per-head set of
VERTICAL key columns (globally attended tokens) plus SLASH diagonals
(fixed relative offsets), estimated from the last 64 queries' attention.

TPU-native expression: the pattern is two boolean sets per head —
``vert[j]`` over absolute columns and ``slash[d]`` over diagonal offsets
``d = i - j`` — and the sparse mask for any (i, j) is
``vert[j] | slash[i - j]``, materialised blockwise (never O(N^2) at once).
Estimation and attention are static-shape; the per-head top-k counts are
fixed by config.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


class VerticalSlashPattern(NamedTuple):
    vert: jax.Array   #: [B, H, N] bool — kept absolute key columns
    slash: jax.Array  #: [B, H, N] bool — kept diagonal offsets (i - j)


def estimate_vertical_slash(
    q: jax.Array,
    k: jax.Array,
    *,
    true_len: jax.Array,
    vertical_size: int,
    slash_size: int,
    last_q: int = 64,
) -> VerticalSlashPattern:
    """Estimate the per-head pattern from the last ``last_q`` queries
    (the MInference estimation recipe).

    q, k: [B, H, N, D] post-RoPE, left-padded.  Sinks (first 4 real tokens)
    and the local diagonals (offsets 0..last_q) are always included, as in
    the reference implementation's pattern construction.
    """
    b, h, n, d = q.shape
    w = min(last_q, n)
    pad = (n - true_len).astype(jnp.int32)
    col = jnp.arange(n, dtype=jnp.int32)
    colv = col[None, :] >= pad[:, None]  # [B, N]

    qw = q[:, :, n - w :, :].astype(jnp.float32)
    logits = jnp.einsum("bhwd,bhnd->bhwn", qw, k.astype(jnp.float32)) / math.sqrt(d)
    # causal inside the trailing w x w block
    i = jnp.arange(w)[:, None]
    j = jnp.arange(w)[None, :]
    tri = jnp.where(j > i, _NEG_INF, 0.0)
    logits = logits.at[:, :, :, n - w :].add(tri[None, None])
    logits = jnp.where(colv[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)  # [B, H, w, N]

    # vertical scores: column sums
    vscore = probs.sum(axis=2)  # [B, H, N]
    vscore = jnp.where(colv[:, None, :], vscore, -jnp.inf)

    # slash scores: sum along diagonals d = i - j, where row i is a window
    # row with absolute index (n - w + r).  d ranges [0, N).
    rows = (n - w) + jnp.arange(w, dtype=jnp.int32)  # [w]
    diag = rows[:, None] - col[None, :]  # [w, N] values in [-(n-1), n-1]
    diag = jnp.where((diag >= 0) & (diag < n), diag, n)  # clamp invalid -> bin n
    oh = jax.nn.one_hot(diag, n + 1, dtype=jnp.float32)  # [w, N, n+1]
    sscore = jnp.einsum("bhwn,wnd->bhd", probs, oh)[..., :n]  # [B, H, N]

    # top-k sets (+ forced sinks / local diagonals)
    vs = min(vertical_size, n)
    ss = min(slash_size, n)
    _, vidx = jax.lax.top_k(vscore, vs)
    vert = jnp.zeros((b, h, n), bool)
    bi = jnp.arange(b)[:, None, None]
    hi = jnp.arange(h)[None, :, None]
    vert = vert.at[bi, hi, vidx].set(True)
    # always keep attention sinks: first 4 real tokens
    sink = (col[None, :] >= pad[:, None]) & (col[None, :] < (pad + 4)[:, None])
    vert = vert | sink[:, None, :]

    _, sidx = jax.lax.top_k(sscore, ss)
    slash = jnp.zeros((b, h, n), bool)
    slash = slash.at[bi, hi, sidx].set(True)
    # always keep the local band (offsets 0..last_q)
    slash = slash | (jnp.arange(n)[None, None, :] <= w)
    return VerticalSlashPattern(vert=vert, slash=slash)


def sparse_prefill_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pattern: VerticalSlashPattern,
    *,
    true_len: jax.Array,
    block: int = 512,
) -> jax.Array:
    """Causal attention restricted to the vertical/slash pattern,
    accumulated blockwise over query rows (O(block x N) memory)."""
    b, h, n, d = q.shape
    if n % block != 0:
        block = math.gcd(n, block) or n
    nblocks = n // block
    scale = 1.0 / math.sqrt(d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    pad = (n - true_len).astype(jnp.int32)
    col = jnp.arange(n, dtype=jnp.int32)
    colv = col[None, :] >= pad[:, None]

    q_blocks = q.reshape(b, h, nblocks, block, d).transpose(2, 0, 1, 3, 4)

    def body(_, inputs):
        bi_, qb = inputs
        rows = bi_ * block + jnp.arange(block, dtype=jnp.int32)  # [block]
        logits = jnp.einsum(
            "bhqd,bhnd->bhqn", qb.astype(jnp.float32), kf,
            preferred_element_type=jnp.float32,
        ) * scale
        causal = col[None, :] <= rows[:, None]
        # diagonal offsets for this block: d = i - j
        doff = rows[:, None] - col[None, :]
        doff_c = jnp.clip(doff, 0, n - 1)
        slash_hit = jnp.take_along_axis(
            pattern.slash[:, :, None, :].repeat(block, 2),
            jnp.broadcast_to(doff_c[None, None], (b, h, block, n)),
            axis=3,
        )
        allowed = pattern.vert[:, :, None, :] | (slash_hit & (doff >= 0)[None, None])
        mask = causal[None, None] & allowed & colv[:, None, None, :]
        logits = jnp.where(mask, logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        # fully-masked (padding) rows produce uniform rows; zero them
        any_valid = mask.any(axis=-1, keepdims=True)
        probs = jnp.where(any_valid, probs, 0.0)
        out = jnp.einsum(
            "bhqn,bhnd->bhqd", probs, vf, preferred_element_type=jnp.float32
        )
        return None, out

    _, outs = jax.lax.scan(body, None, (jnp.arange(nblocks), q_blocks))
    out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, n, d)
    return out.astype(q.dtype)
