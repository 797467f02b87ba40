"""ThinK query-driven key-channel pruning.

Reproduces ``key_pruner_query_driven`` (/root/reference/pyramidkv/
pyramidkv_utils.py:13-26): per (head, channel) importance =
mean(q^2 over the last 32 queries) * mean(k^2 over the sequence); the
``ratio * head_dim`` lowest-scoring channels of the *non-recent* keys are
dropped.  The recent ``recent_size`` keys keep all channels.  Decode then
computes two partial logit blocks — channel-gathered query x pruned keys and
full query x recent keys — concatenated before softmax
(llama_model_think.py:175-181).

TPU-native layout: instead of the reference's ragged (head_dim - k) tensors
we return the kept-channel indices (static count) so the pruned keys live in
a dense [B, H, S, D_kept] buffer and the decode query gather is one
take_along_axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ChannelPrune(NamedTuple):
    #: [B, H, D_kept] int32 — kept channel indices, ascending.
    kept_channels: jax.Array
    #: [B, H, D] bool — True at kept channels (reference returns ~mask).
    channel_mask: jax.Array


def think_channel_selection(
    k: jax.Array,
    q: jax.Array,
    *,
    ratio: float,
    true_len: jax.Array,
    obs_queries: int = 32,
    valid_mask: jax.Array | None = None,
) -> ChannelPrune:
    """Score channels and pick the kept set.

    Args:
      k: [B, H, N, D] keys to be pruned (left-padded buffer — padding rows
         are masked out of the key-norm mean).
      q: [B, H, N, D] queries; the last ``obs_queries`` real rows drive the
         score (pyramidkv_utils.py:17 uses q[..., -32:, :]).
      ratio: fraction of channels dropped (k = int(D * ratio)).
      valid_mask: optional [B, H, N] bool overriding the left-pad validity
         assumption — pass the compacted cache's mask when ``k`` is a
         COMPACTED buffer (valid rows lead, invalid trail), so the key-norm
         mean matches the reference's mean over real rows only
         (pyramidkv_utils.py:18 on an unpadded compacted tensor).
    """
    b, h, n, d = k.shape
    drop = int(d * ratio)
    keep = d - drop
    qq = q[:, :, -obs_queries:, :].astype(jnp.float32)
    q_norm = (qq**2).mean(axis=2)  # [B,H,D]
    kf = k.astype(jnp.float32) ** 2
    if valid_mask is None:
        col = jnp.arange(n, dtype=jnp.int32)[None, :]
        pad = (n - true_len).astype(jnp.int32)[:, None]
        valid = (col >= pad)[:, None, :, None]  # [B,1,N,1]
        denom = jnp.maximum(true_len.astype(jnp.float32), 1.0)[:, None, None]
    else:
        valid = valid_mask[..., None]  # [B,H,N,1]
        denom = jnp.maximum(
            valid_mask.sum(axis=2).astype(jnp.float32), 1.0
        )[..., None]  # [B,H,1]
    k_norm = jnp.where(valid, kf, 0.0).sum(axis=2) / denom  # [B,H,D]
    score = q_norm * k_norm
    # Reference: topk(largest=False) picks the `drop` smallest to prune; the
    # kept channels are the (D - drop) largest.
    _, kept = jax.lax.top_k(score, keep)
    kept = jnp.sort(kept, axis=-1).astype(jnp.int32)
    mask = jnp.zeros((b, h, d), dtype=bool)
    bidx = jnp.arange(b)[:, None, None]
    hidx = jnp.arange(h)[None, :, None]
    mask = mask.at[bidx, hidx, kept].set(True)
    return ChannelPrune(kept_channels=kept, channel_mask=mask)


def gather_channels(x: jax.Array, kept_channels: jax.Array) -> jax.Array:
    """Gather kept channels: x [B, H, N, D] -> [B, H, N, D_kept]."""
    b, h, n, d = x.shape
    dk = kept_channels.shape[-1]
    idx = jnp.broadcast_to(kept_channels[:, :, None, :], (b, h, n, dk))
    return jnp.take_along_axis(x, idx, axis=3)
