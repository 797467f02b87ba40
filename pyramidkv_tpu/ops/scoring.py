"""Key-importance scoring for KV-cache compression — pure, static-shape JAX.

All scorers take post-RoPE projections laid out in a *left-padded* buffer of
static length N (real tokens occupy positions ``[N - true_len, N)``), and
return a score per *non-window* buffer column, shape ``[B, H, N - W]``, with
``-inf`` at padding columns so that selection can run as one static top-k.

Behavioral contracts reproduced from the reference:

- Observation-window score (SnapKV/PyramidKV/CAM; AdaKV/HeadKV use mean):
  last-W queries attend all keys, causal mask applied ONLY inside the last
  W x W block, softmax in fp32, aggregate over the W rows, then 1-D pooling
  (/root/reference/pyramidkv/pyramidkv_utils.py:317-333, :647-672).
- H2O: full q_len x q_len score matrix (causal mask again only on the last
  W x W block — a reference quirk we keep for parity), column sums over the
  non-window columns, NO pooling (pyramidkv_utils.py:544-561).
- L2Norm: keys with the LOWEST key-vector L2 norm are kept
  (pyramidkv_utils.py:419-421), so the score is the negated norm.
- StreamingLLM keeps the first ``cap - window`` tokens (attention sinks), so
  the score is the negated position (pyramidkv_utils.py:607-608).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .pooling import pool1d

_NEG_INF = float("-inf")


def _column_valid(n: int, true_len: jax.Array) -> jax.Array:
    """[B, n] bool: buffer column holds a real token (left padding)."""
    col = jnp.arange(n, dtype=jnp.int32)[None, :]
    pad = (n - true_len).astype(jnp.int32)[:, None]
    return col >= pad


def _window_causal_bias(window: int, n: int) -> jax.Array:
    """[W, n] additive bias: -inf where window query i may not see window
    key j (j > i inside the trailing W x W block); 0 elsewhere.

    Matches the reference's mask construction, which touches only the last
    W x W block of the logits (pyramidkv_utils.py:318-324)."""
    bias = jnp.zeros((window, n), dtype=jnp.float32)
    i = jnp.arange(window)[:, None]
    j = jnp.arange(window)[None, :]
    tri = jnp.where(j > i, _NEG_INF, 0.0)
    return bias.at[:, n - window :].set(tri)


def window_scores(
    q: jax.Array,
    k: jax.Array,
    *,
    window_size: int,
    true_len: jax.Array,
    kernel_size: int,
    pooling: str,
    aggregation: str = "sum",
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """SnapKV-family observation-window score.

    Args:
      q: [B, H, N, D] queries (post-RoPE), left-padded buffer.
      k: [B, Hk, N, D] keys (post-RoPE).  Hk == H reproduces the reference's
         post-repeat_kv scoring (llama_model.py:158-159) directly; with
         Hk == num_kv_heads the grouped einsum computes the SAME per-query-
         head scores without materialising the repeat.
      window_size: W — the last W queries are the observation window.
      true_len: [B] int32 count of real tokens.
      kernel_size / pooling: 1-D smoothing of the raw score.
      aggregation: "sum" (SnapKV/PyramidKV, pyramidkv_utils.py:327) or
         "mean" (AdaKV/HeadKV, pyramidkv_utils.py:661).

    Returns:
      [B, H, N - W] float32 scores, -inf at padding columns.
    """
    b, h, n, d = q.shape
    hk = k.shape[1]
    w = window_size
    qw = q[:, :, n - w :, :].astype(jnp.float32)
    kf = k.astype(jnp.float32)
    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    if hk == h:
        logits = jnp.einsum("bhwd,bhnd->bhwn", qw, kf) * sc
    else:
        g = h // hk
        logits = jnp.einsum(
            "bkgwd,bknd->bkgwn", qw.reshape(b, hk, g, w, d), kf
        ).reshape(b, h, w, n) * sc
    if softcap is not None:
        # mirror the model's Gemma-2 logit soft-capping so selection
        # follows the ACTUAL attention distribution (cap before mask)
        logits = jnp.tanh(logits * (1.0 / softcap)) * softcap
    logits = logits + _window_causal_bias(w, n)[None, None]
    colv = _column_valid(n, true_len)  # [B, N]
    logits = jnp.where(colv[:, None, None, :], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    past = probs[..., : n - w]
    if aggregation == "sum":
        s = past.sum(axis=2)
    elif aggregation == "mean":
        s = past.mean(axis=2)
    else:
        raise ValueError(f"unknown aggregation {aggregation!r}")
    past_valid = colv[:, None, : n - w]
    s = jnp.where(past_valid, s, 0.0)  # zero padding so pooling edges match
    s = pool1d(s, kernel_size, pooling)
    return jnp.where(past_valid, s, _NEG_INF)


def h2o_partial_scores(
    q_rows: jax.Array,
    k: jax.Array,
    *,
    row_start: int,
    window_size: int,
    true_len: jax.Array,
    block: int = 512,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """Column-sum contribution of the query rows ``[row_start,
    row_start + C)`` to the h2o statistic, given the FULL key buffer.

    Every row's softmax normalises over ALL n columns (the reference's
    non-causal quirk, pyramidkv_utils.py:544-561), so a row's
    contribution is final the moment the whole K buffer exists — the
    chunked-prefill reconstruction pass (pass 2) accumulates these per
    token chunk and the sum over all chunks equals :func:`h2o_scores`
    exactly (f32 adds of per-row terms commute).

    Returns the UNMASKED [B, H, n - w] accumulator (callers apply the
    past-column validity mask once, after all rows are in).
    """
    b, h, c, d = q_rows.shape
    n = k.shape[2]
    hk = k.shape[1]
    if hk != h:
        # grouped keys: expand per-query-head logits via the grouped einsum
        g = h // hk
    w = window_size
    # cap the transient [B, H, block, N] fp32 logits at ~256 MB
    budget = (1 << 26) // max(b * h * n, 1)
    block = max(min(block, budget), 8)
    if c % block != 0:
        block = math.gcd(c, block) or c
    nblocks = c // block
    colv = _column_valid(n, true_len)  # [B, N]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    q_blocks = q_rows.reshape(b, h, nblocks, block, d).transpose(2, 0, 1, 3, 4)
    row = jnp.arange(n, dtype=jnp.int32)
    pad = (n - true_len).astype(jnp.int32)

    def body(acc, inputs):
        bi, qb = inputs
        # bf16 operands, fp32 accumulation (reference: fp16 matmul,
        # fp32 softmax — pyramidkv_utils.py:544, :553)
        if hk == h:
            logits = jnp.einsum(
                "bhqd,bhnd->bhqn", qb, k, preferred_element_type=jnp.float32
            ) * scale
        else:
            logits = jnp.einsum(
                "bkgqd,bknd->bkgqn", qb.reshape(b, hk, g, block, d), k,
                preferred_element_type=jnp.float32,
            ).reshape(b, h, block, n) * scale
        if softcap is not None:
            logits = jnp.tanh(logits * (1.0 / softcap)) * softcap
        r = row_start + bi * block + jnp.arange(block, dtype=jnp.int32)
        # Causal bias only where both row and col are inside the last W block.
        jcol = row[None, :]
        in_blk = (r[:, None] >= n - w) & (jcol >= n - w)
        bias = jnp.where(in_blk & (jcol - (n - w) > r[:, None] - (n - w)), _NEG_INF, 0.0)
        logits = logits + bias[None, None]
        logits = jnp.where(colv[:, None, None, :], logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        row_valid = (r[None, :] >= pad[:, None]).astype(jnp.float32)  # [B, block]
        probs = probs * row_valid[:, None, :, None]
        acc = acc + probs[..., : n - w].sum(axis=2)
        return acc, None

    acc0 = jnp.zeros((b, h, n - w), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (jnp.arange(nblocks), q_blocks))
    return acc


def h2o_scores(
    q: jax.Array,
    k: jax.Array,
    *,
    window_size: int,
    true_len: jax.Array,
    block: int = 512,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """H2O heavy-hitter score: softmax attention of ALL queries, summed
    column-wise over the non-window keys; no pooling.

    Parity notes (pyramidkv_utils.py:544-561): the reference applies the
    causal mask only inside the trailing W x W block, so non-window query
    rows "see" future keys in the score.  We reproduce that, mask padding
    rows/columns, and accumulate blockwise over query rows (via
    :func:`h2o_partial_scores` at row_start 0) so that peak memory is
    O(block * N) instead of O(N^2) per head.
    """
    b, h, n, _ = q.shape
    w = window_size
    acc = h2o_partial_scores(
        q, k, row_start=0, window_size=window_size, true_len=true_len,
        block=block, scale=scale, softcap=softcap,
    )
    colv = _column_valid(n, true_len)
    past_valid = colv[:, None, : n - w]
    return jnp.where(past_valid, acc, _NEG_INF)


def l2norm_scores(k: jax.Array, *, true_len: jax.Array) -> jax.Array:
    """Negative key L2 norm over ALL columns (no window split): keeping the
    top-k of this score keeps the lowest-norm keys, matching the ascending
    argsort + head slice of pyramidkv_utils.py:419-426."""
    b, h, n, d = k.shape
    norms = jnp.linalg.norm(k.astype(jnp.float32), axis=-1)  # [B, H, N]
    colv = _column_valid(n, true_len)[:, None]
    return jnp.where(colv, -norms, _NEG_INF)


def position_scores(
    shape_ref: jax.Array, *, window_size: int, true_len: jax.Array
) -> jax.Array:
    """StreamingLLM 'score': earliest real tokens first.  Top-k of this score
    selects the first ``budget`` real (sink) tokens in position order,
    matching the ``range(cap - w)`` index selection of
    pyramidkv_utils.py:607-608."""
    b, h, n, d = shape_ref.shape
    w = window_size
    col = jnp.arange(n - w, dtype=jnp.float32)[None, None, :]
    s = -col
    past_valid = _column_valid(n, true_len)[:, None, : n - w]
    return jnp.where(past_valid, jnp.broadcast_to(s, (b, h, n - w)), _NEG_INF)


def random_scores(
    key: jax.Array, shape_ref: jax.Array, *, window_size: int, true_len: jax.Array
) -> jax.Array:
    """Uniform-random eviction baseline (the 'random' row of the reference's
    results table, /root/reference/eval.py:99-110)."""
    b, h, n, d = shape_ref.shape
    w = window_size
    s = jax.random.uniform(key, (b, h, n - w), dtype=jnp.float32)
    past_valid = _column_valid(n, true_len)[:, None, : n - w]
    return jnp.where(past_valid, s, _NEG_INF)
