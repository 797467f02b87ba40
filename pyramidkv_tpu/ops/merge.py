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
- CAM's sequential Bernoulli value merging lives in
  ``policy._cam_merge_values`` (the hoisted-colmean ``lax.scan`` form).
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


def cam_banded_solve(v, c, r: int, u_prev, c_prev):
    """Solve the CAM banded recurrence u[j] = v[j] + sum_{s=j-r}^{j-1} c[s] u[s]
    over one contiguous region, given the carry from the preceding region.

    Args:
      v: [B, H, L, D] fp32 values (L a multiple of r).
      c: [B, H, L] fp32 merge coefficients.
      u_prev, c_prev: [B, H, r, D] / [B, H, r] — the final values and
        coefficients of the r rows immediately BEFORE this region.

    Returns (u [B,H,L,D], (u_last [B,H,r,D], c_last [B,H,r])).
    """
    b, h, L, d = v.shape
    nc = L // r
    v_chunks = v.reshape(b, h, nc, r, d).transpose(2, 0, 1, 3, 4)
    c_chunks = c.reshape(b, h, nc, r).transpose(2, 0, 1, 3)
    rows = jnp.arange(r)
    lower = (rows[:, None] > rows[None, :]).astype(jnp.float32)
    upper_inc = (rows[:, None] <= rows[None, :]).astype(jnp.float32)
    eye = jnp.eye(r, dtype=jnp.float32)

    def chunk(carry, xs):
        u_p, c_p = carry
        v_i, c_i = xs
        cmat_prev = upper_inc[None, None] * c_p[:, :, None, :]
        rhs = v_i + jnp.einsum("bhrs,bhsd->bhrd", cmat_prev, u_p)
        lmat = lower[None, None] * c_i[:, :, None, :]
        t_mat = eye[None, None] - lmat
        u_i = jax.lax.linalg.triangular_solve(
            t_mat, rhs, left_side=True, lower=True
        )
        return (u_i, c_i), u_i

    (u_last, c_last), us = jax.lax.scan(chunk, (u_prev, c_prev),
                                        (v_chunks, c_chunks))
    u = us.transpose(1, 2, 0, 3, 4).reshape(b, h, L, d)
    return u, (u_last, c_last)
