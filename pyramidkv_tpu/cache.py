"""Static-shape compressed KV cache.

Replaces the reference's dynamically-sized caches — HF ``DynamicCache``
(torch ``cat`` per decode step) and the ragged ``DynamicCacheSplitHeadFlatten``
whose CUDA ``update_flatten_view`` kernel re-materialises the WHOLE cache on
every appended token (/root/reference/csrc/csrc/cuda_api.cu:11-53, an
O(cache) copy per token).  Here every layer owns a fixed
``[B, H, S, D]`` slot buffer laid out as::

    [ selected past (width) | recency window (W) | decode slots (max_new) ]

with a boolean validity mask.  Per-layer pyramid budgets and per-head
AdaKV/HeadKV budgets are expressed through the mask, not through ragged
shapes, so the decode append is one O(1) ``dynamic_update_slice`` — the
TPU-native equivalent of the reference's native cache layer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .ops.quant import QuantizedKVRegion


class ThinKRegion(NamedTuple):
    """ThinK narrow key storage — the TPU-native equivalent of the
    reference's ``cache_utils_think`` fork (``update_think`` stores
    channel-pruned keys separately, cache_utils_think.py:390-424): the
    pruned-region slots' keys live at ``D_kept = D - int(D*ratio)``
    channels, cutting the selected-past key bytes by ``pruning_ratio``.
    V and the recent/window/decode keys stay full width in the main cache
    buffers."""

    k_pruned: jax.Array       #: [L, B, H, S_pruned, D_kept]
    kept_channels: jax.Array  #: [L, B, H, D_kept] int32, ascending


class KVCache(NamedTuple):
    """Layer-stacked compressed KV cache (a scan-friendly pytree).

    With a segmented plan (``PolicyPlan.segments`` — per-layer-run slot
    widths, e.g. l2norm skip_layers or PyramidKV's pyramid), ``k``/``v``/
    ``mask``/``positions`` each hold a TUPLE of per-segment stacks
    ``[L_seg, B, H, S_seg, D]`` instead of one array; everything stays one
    pytree, so jit/sharding/batching treat both layouts uniformly."""

    k: jax.Array          #: [L, B, H, S, D] (or tuple per segment)
    v: jax.Array          #: [L, B, H, S, D]
    mask: jax.Array       #: [L, B, H, S] bool — slot holds a real token
    positions: jax.Array  #: [L, B, H, S] int32 — original token position (-1 invalid)
    #: [B] int32 — true prompt length (the reference's per-module
    #: ``kv_seq_len`` bookkeeping, llama_model.py:139-145, collapses to this
    #: plus the step counter).
    true_len: jax.Array
    #: int32 scalar — decode steps taken so far.
    step: jax.Array
    #: When the engine runs a quantized cache (KIVI/KVQuant), the prefill
    #: region lives here (leaves stacked [L, ...]) and ``k``/``v`` hold ONLY
    #: the bf16 decode slots — the static-shape analogue of the reference's
    #: fp16 residual buffer (quantcache.py:79-82), except ours never needs
    #: re-quantisation because compacted prefill slots are immutable.
    quant: Optional[QuantizedKVRegion] = None
    #: ThinK narrow key region: when set, ``k`` holds ONLY the
    #: recent+window+decode slots (full width) and the pruned-region keys
    #: live here at D_kept channels.  ``v``/``mask``/``positions`` stay
    #: full-length.
    think: Optional[ThinKRegion] = None

    @property
    def segmented(self) -> bool:
        return isinstance(self.k, tuple)

    @property
    def num_layers(self) -> int:
        if self.segmented:
            return sum(k.shape[0] for k in self.k)
        return self.k.shape[0]

    @property
    def num_slots(self) -> int:
        assert not self.segmented, "per-segment slot counts differ"
        return self.k.shape[3]

    def current_position(self) -> jax.Array:
        """[B] position id for the NEXT token to be generated."""
        return self.true_len.astype(jnp.int32) + self.step


def empty_cache(
    num_layers: int,
    batch: int,
    heads: int,
    slots: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    return KVCache(
        k=jnp.zeros((num_layers, batch, heads, slots, head_dim), dtype=dtype),
        v=jnp.zeros((num_layers, batch, heads, slots, head_dim), dtype=dtype),
        mask=jnp.zeros((num_layers, batch, heads, slots), dtype=bool),
        positions=jnp.full((num_layers, batch, heads, slots), -1, dtype=jnp.int32),
        true_len=jnp.zeros((batch,), dtype=jnp.int32),
        step=jnp.zeros((), dtype=jnp.int32),
    )


class LayerCacheView(NamedTuple):
    """One layer's slice, as threaded through the decode layer-scan."""

    k: jax.Array          #: [B, H, S, D]
    v: jax.Array          #: [B, H, S, D]
    mask: jax.Array       #: [B, H, S]
    positions: jax.Array  #: [B, H, S]


def cache_memory_bytes(cache: KVCache) -> int:
    """HBM footprint of the KV buffers (the reference never measures this)."""
    total = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves((cache.k, cache.v))
    )
    if cache.quant is not None:
        total += sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(cache.quant)
        )
    if cache.think is not None:
        total += sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(cache.think)
        )
    return total


def segment_cache(cache: KVCache, plan) -> KVCache:
    """Re-layout a UNIFORM cache into a plan's segmented layout.

    Used by producers that build the max-width uniform layout (e.g. the
    sequence-parallel prefill) when the engine's plan is segmented.  Safe
    because every layer's valid slots occupy the leading ranks: slots beyond
    a segment's width are invalid by the width-bound construction."""
    if not plan.segmented or cache.segmented:
        return cache
    width = plan.width

    def cut(x, start, stop, seg_w):
        return jnp.concatenate(
            [x[start:stop, :, :, :seg_w], x[start:stop, :, :, width:]], axis=3
        )

    segs = plan.segments
    return cache._replace(
        k=tuple(cut(cache.k, a, b, w) for a, b, w in segs),
        v=tuple(cut(cache.v, a, b, w) for a, b, w in segs),
        mask=tuple(cut(cache.mask, a, b, w) for a, b, w in segs),
        positions=tuple(cut(cache.positions, a, b, w) for a, b, w in segs),
    )


def used_kv_tokens(cache: KVCache) -> jax.Array:
    """Total number of live KV entries (sum over layers/heads of per-head
    lengths) — the compression-diagnostics metric."""
    if cache.segmented:
        return sum(m.sum() for m in cache.mask)
    return cache.mask.sum()
