"""KV merging: LOOK-M pivot merge and CAM value merging.

- ``pivot_merge`` reproduces the intent of ``merge_kv`` (/root/reference/
  pyramidkv/pyramidkv_utils.py:119-170): every *evicted* KV entry is folded
  into its nearest (cosine-similarity) *kept* entry by averaging.  Three
  reference accidents are intentionally NOT replicated (cross-impl A/B in
  tests/test_reference_ab.py::test_ab_pivot_merge pins the agreeing part):
  (1) it concatenates K as [recent, selected] but V as [selected, recent]
  (:146-148), silently misaligning K/V rows — we keep both aligned;
  (2) its drop set is the complement of the UNION of all heads' selections
  (:130-136 flattens indices across heads before ``torch.isin``) — ours is
  per-head; (3) its drop set also contains the window rows themselves
  (self-merges that skew the scatter-mean counts of window pool entries) —
  ours evicts only non-kept past rows.
- ``cam_value_merge`` reproduces CAMKVCluster's sequential Bernoulli value
  merging (pyramidkv_utils.py:488-502) as a ``lax.scan`` with cumulative
  column means instead of the reference's O(n^3) Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .selection import Selection


def pivot_merge(
    k: jax.Array,
    v: jax.Array,
    sel: Selection,
    *,
    window_size: int,
    true_len: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Fold evicted entries into their most-similar kept entry.

    Args:
      k, v: [B, H, N, D] left-padded buffers.
      sel: fixed-width selection over the past columns (width C).
      window_size: recency window kept verbatim.

    Returns:
      (k_merged, v_merged): [B, H, N, D] buffers where the *kept* rows have
      been replaced by the merge result; evicted rows are untouched (they are
      dropped by compaction anyway).  Merging is mean-style: each kept row
      becomes the average of itself and the mean of all evicted rows assigned
      to it (scatter-mean of the pairwise (pruned + kept)/2 values, matching
      the ``scatter_reduce('mean', include_self=True)`` of :159-162).
    """
    b, h, n, d = k.shape
    w = window_size
    npast = n - w
    col = jnp.arange(npast, dtype=jnp.int32)[None, None, :]
    pad = (n - true_len).astype(jnp.int32)[:, None, None]
    col_real = col >= pad  # [B,1,npast]

    # kept mask over past columns
    width = sel.indices.shape[-1]
    kept_mask = jnp.zeros((b, h, npast), dtype=bool)
    bidx = jnp.arange(b)[:, None, None]
    hidx = jnp.arange(h)[None, :, None]
    kept_mask = kept_mask.at[bidx, hidx, sel.indices].max(sel.valid)
    evicted = col_real & ~kept_mask  # [B,H,npast] (window excluded)

    k_past = k[:, :, :npast, :].astype(jnp.float32)
    v_past = v[:, :, :npast, :].astype(jnp.float32)

    # Kept pool = selected past rows + the window rows, matching the
    # reference's recent+selected pool (:146).
    kept_k = jnp.take_along_axis(
        k_past, jnp.broadcast_to(sel.indices[..., None], (b, h, width, d)), axis=2
    )
    kept_v = jnp.take_along_axis(
        v_past, jnp.broadcast_to(sel.indices[..., None], (b, h, width, d)), axis=2
    )
    win_k = k[:, :, npast:, :].astype(jnp.float32)
    win_v = v[:, :, npast:, :].astype(jnp.float32)
    pool_k = jnp.concatenate([kept_k, win_k], axis=2)  # [B,H,width+w,D]
    pool_v = jnp.concatenate([kept_v, win_v], axis=2)
    pool_valid = jnp.concatenate(
        [sel.valid, jnp.broadcast_to((jnp.arange(npast, n)[None, None, :] >= pad), (b, h, w))],
        axis=2,
    )

    def _norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    sim = jnp.einsum("bhnd,bhmd->bhnm", _norm(k_past), _norm(pool_k))
    sim = jnp.where(pool_valid[:, :, None, :], sim, -jnp.inf)
    nearest = jnp.argmax(sim, axis=-1)  # [B,H,npast] index into pool

    # pairwise merged values (pruned + kept)/2, then scatter-mean into the pool
    tgt_k = jnp.take_along_axis(pool_k, nearest[..., None].repeat(d, -1), axis=2)
    tgt_v = jnp.take_along_axis(pool_v, nearest[..., None].repeat(d, -1), axis=2)
    mk = (k_past + tgt_k) / 2.0
    mv = (v_past + tgt_v) / 2.0

    m = pool_k.shape[2]
    wgt = evicted.astype(jnp.float32)
    onehot = jax.nn.one_hot(nearest, m, dtype=jnp.float32) * wgt[..., None]  # [B,H,npast,m]
    cnt = onehot.sum(axis=2)  # [B,H,m]
    sum_k = jnp.einsum("bhnm,bhnd->bhmd", onehot, mk)
    sum_v = jnp.einsum("bhnm,bhnd->bhmd", onehot, mv)
    denom = (cnt + 1.0)[..., None]  # include_self=True
    new_pool_k = (pool_k + sum_k) / denom
    new_pool_v = (pool_v + sum_v) / denom

    # write the merged kept rows back into the buffer layout
    k_out = k.astype(jnp.float32)
    v_out = v.astype(jnp.float32)
    upd_k = new_pool_k[:, :, :width, :]
    upd_v = new_pool_v[:, :, :width, :]
    safe_idx = jnp.where(sel.valid, sel.indices, 0)
    k_sc = k_out[:, :, :npast, :].at[bidx, hidx, safe_idx].set(
        jnp.where(sel.valid[..., None], upd_k, jnp.take_along_axis(
            k_out[:, :, :npast, :], jnp.broadcast_to(safe_idx[..., None], (b, h, width, d)), axis=2))
    )
    v_sc = v_out[:, :, :npast, :].at[bidx, hidx, safe_idx].set(
        jnp.where(sel.valid[..., None], upd_v, jnp.take_along_axis(
            v_out[:, :, :npast, :], jnp.broadcast_to(safe_idx[..., None], (b, h, width, d)), axis=2))
    )
    k_out = jnp.concatenate([k_sc, new_pool_k[:, :, width:, :]], axis=2)
    v_out = jnp.concatenate([v_sc, new_pool_v[:, :, width:, :]], axis=2)
    return k_out.astype(k.dtype), v_out.astype(v.dtype)


def cam_value_merge(
    v: jax.Array,
    attn_colmean_cum: jax.Array,
    *,
    rng: jax.Array,
    start_budget: jax.Array,
    recent_budget: int,
    true_len: jax.Array,
) -> jax.Array:
    """CAM's sequential stochastic value merging (pyramidkv_utils.py:488-502).

    For each token t in [start+recent, q_len): with probability
    ``colmean_t[t - recent] / max(colmean_t over sinks+recent window)`` the
    evicted value row ``t - recent`` is added, scaled by 1/recent_budget,
    into the following ``recent_budget`` value rows.

    Args:
      v: [B, H, N, D] value buffer (left-padded).
      attn_colmean_cum: [B, H, N, N] is NOT materialised — instead we take
        the cumulative row-sums of the softmax matrix so that
        ``colmean_t[j] = cum[t-1, j] / t``.  Shape [B, H, N, N] would be
        O(N^2); callers pass the full probs cumsum row-block by row-block.
        For practicality this function takes ``cum``: [B, H, N, N] replaced
        by a callback-free exact form: we require the caller to supply
        ``probs_cumsum`` of shape [B, H, N, N].  (Used only by the CAM path,
        which the reference itself runs at O(n^3); we keep N modest.)
      rng: PRNG key for the Bernoulli draws (the reference inherits torch's
        global seed, run_longbench.py:85-92).

    Returns the merged value buffer.
    """
    b, h, n, d = v.shape
    cum = attn_colmean_cum  # [B,H,N,N] cumulative over rows
    pad = (n - true_len).astype(jnp.int32)

    vout = v.astype(jnp.float32)
    col = jnp.arange(n, dtype=jnp.int32)

    unif = jax.random.uniform(rng, (b, h, n))

    def body(carry, t):
        vbuf = carry
        # true index of t within the sequence: tt = t - pad (per batch)
        tt = t - pad  # [B]
        rows = jnp.maximum(tt, 1).astype(jnp.float32)
        colmean = cum[:, :, t - 1, :] / rows[:, None, None]  # [B,H,N]
        src_col = t - recent_budget
        # max over sinks [pad, pad+start_budget) and recent (src_col, t)
        in_sink = (col[None, :] >= pad[:, None]) & (
            col[None, :] < (pad + start_budget)[:, None]
        )
        in_recent = (col[None, :] >= src_col) & (col[None, :] < t)
        sel = in_sink | in_recent
        mean_attn = jnp.max(jnp.where(sel[:, None, :], colmean, -jnp.inf), axis=-1)
        p = colmean[:, :, src_col] / mean_attn
        p = jnp.nan_to_num(p, nan=0.0, posinf=1.0, neginf=0.0)
        p = jnp.clip(p, 0.0, 1.0)
        active = (tt >= (start_budget + recent_budget)) & (src_col >= pad)
        draw = (unif[:, :, t % n] < p) & active[:, None]
        add = vbuf[:, :, src_col, :] * draw[..., None] / recent_budget
        # add into rows (src_col, src_col + recent_budget]
        tgt = (col[None, :] > src_col) & (col[None, :] <= src_col + recent_budget)
        vbuf = vbuf + add[:, :, None, :] * tgt[:, None, :, None]
        return vbuf, None

    ts = jnp.arange(recent_budget, n, dtype=jnp.int32)
    vout, _ = jax.lax.scan(body, vout, ts)
    return vout.astype(v.dtype)
