"""On-device n-gram draft proposal (prompt-lookup speculative decoding).

Speculative decoding is a serving extension the reference never ships
(its generate loop is the plain HF greedy loop, run_longbench.py:266-275).
Decode is weight-bandwidth-bound — one v5e decode step at d32 int4 reads
~4 GB of weights to produce ONE token — so verifying ``k+1`` draft tokens
in a single forward costs nearly the same wall time as a single-token
step, and every accepted draft token is close to free throughput.  The
draft source here is the sequence itself (prompt + generated so far):
long-context summarisation/QA — the reference's own LongBench regime —
copies long spans from the prompt, which an n-gram match finds without a
second model.

Everything is static-shape and on-device (no host round-trip inside the
decode loop): the n-gram match is ``n`` shifted vector compares ANDed
together, the most recent match is an argmax over masked window indices,
and the draft gather is a tiny ``[B, k]`` integer gather.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n", "k"))
def ngram_draft(
    hist: jax.Array,
    start: jax.Array,
    end: jax.Array,
    *,
    n: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Propose up to ``k`` draft tokens by prompt-lookup.

    Finds the most recent earlier occurrence of the trailing ``n``-gram
    ``hist[end-n:end]`` inside the known region ``hist[start:end]`` and
    drafts the ``k`` tokens that followed it.

    Args:
      hist: [B, H] int32 token history (prompt + generated); entries
        outside ``[start, end)`` are ignored.
      start: [B] int32 first valid index (inclusive).
      end: [B] int32 one past the last valid index.  Requires
        ``end - start >= n`` for a meaningful match; callers below that
        just get ``n_draft == 0``.
      n: n-gram width (static).
      k: max draft length (static).

    Returns:
      (draft [B, k] int32, n_draft [B] int32) — ``draft[:, :n_draft]`` are
      proposals (a contiguous known span), the rest is padding (0).
    """
    b, h = hist.shape
    w = h - n + 1  # number of window start positions

    # trailing n-gram, one tiny [B, n] gather
    gram_idx = jnp.clip(end[:, None] - n + jnp.arange(n)[None, :], 0, h - 1)
    gram = jnp.take_along_axis(hist, gram_idx, axis=1)  # [B, n]

    # match[b, i] == True iff hist[b, i:i+n] == gram[b] — n shifted compares
    match = jnp.ones((b, w), dtype=bool)
    for j in range(n):
        match = match & (
            jax.lax.dynamic_slice_in_dim(hist, j, w, axis=1)
            == gram[:, j:j + 1]
        )
    idx = jnp.arange(w, dtype=jnp.int32)[None, :]
    # window fully inside the known region, excluding the trailing
    # occurrence itself (i + n <= end - 1 keeps >= 1 continuation token)
    valid = (idx >= start[:, None]) & (idx + n <= end[:, None] - 1)
    cand = match & valid
    found = jnp.any(cand, axis=1)  # [B]
    # most recent match (recency bias: repeated spans tend to continue
    # the way they continued LAST time)
    p = jnp.max(jnp.where(cand, idx, -1), axis=1)  # [B]

    draft_idx = p[:, None] + n + jnp.arange(k, dtype=jnp.int32)[None, :]
    tok_valid = found[:, None] & (draft_idx < end[:, None])
    draft = jnp.take_along_axis(hist, jnp.clip(draft_idx, 0, h - 1), axis=1)
    draft = jnp.where(tok_valid, draft, 0)
    # tok_valid is a prefix (draft_idx ascending against one bound)
    n_draft = tok_valid.sum(axis=1).astype(jnp.int32)
    return draft, n_draft
