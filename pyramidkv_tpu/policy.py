"""Per-layer KV-compression policy: scoring -> selection -> compaction.

This is the engine-level equivalent of the reference's ``kv_cluster.update_kv``
dispatch (/root/reference/pyramidkv/pyramidkv_utils.py:173-1086 and
monkeypatch.py:19-145), but as one pure function evaluated inside the jitted
prefill, with all shapes static.  Method dispatch happens at trace time (the
method string is static config); the reference's data-dependent Python
branches (``q_len < cap`` early exits, pyramid regimes) become traced
keep-counts computed in ``ops.selection``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .config import CompressionSpec
from .ops import (
    CompactedKV,
    Selection,
    adakv_allocate,
    compact_kv,
    h2o_scores,
    headkv_allocate,
    l2norm_keep_counts,
    l2norm_scores,
    pivot_merge,
    position_scores,
    pyramid_keep_counts,
    selection_from_allocation,
    selection_window,
    static_selection_width,
    think_channel_selection,
    topk_select,
    uniform_keep_counts,
    window_scores,
)


@dataclass(frozen=True)
class PolicyPlan:
    """Static (trace-time) layout decisions for one (spec, bucket) pair."""

    spec: CompressionSpec
    num_layers: int
    bucket_len: int
    decode_slots: int
    width: int   #: static top-k width (selected-past slots per layer/head)
    window: int  #: recency slots kept verbatim
    #: use the Pallas scoring kernels (TPU hot path; set by the engine)
    use_pallas: bool = False
    #: model attention semantics mirrored by the scorers: softmax scale
    #: (None = 1/sqrt(head_dim)) and Gemma-2 tanh logit soft-capping.
    #: Selection scores follow the model's ACTUAL attention distribution.
    attn_scale: Optional[float] = None
    attn_softcap: Optional[float] = None
    #: opt-in fused dequant decode kernel (EngineSpec.use_quant_kernel)
    use_quant_kernel: bool = False
    #: opt-in tiled long-region dequant kernel (EngineSpec.use_quant_tiled)
    use_quant_tiled: bool = False
    #: opt-in factored dequant attention for grouped KIVI regions
    #: (EngineSpec.use_quant_fused; q_layout="pa" always uses it)
    use_quant_fused: bool = False
    #: opt-in streaming factored-dequant kernel for pa regions
    #: (EngineSpec.use_quant_fused_kernel)
    use_quant_fused_kernel: bool = False
    #: counterfactual: chunked XLA dequant scan for long grouped regions
    use_quant_scan: bool = False
    #: Contiguous layer runs with their own static slot widths:
    #: ((start, stop, width), ...).  One entry == the uniform layout (the
    #: default for most methods).  Multiple entries let methods whose
    #: per-layer budgets differ wildly (l2norm skip_layers keep the WHOLE
    #: bucket; PyramidKV's pyramid spans ~2x) stop paying the max width at
    #: every layer — the reference's dynamically-sized caches get this for
    #: free, our static layout gets it via per-segment buffers.
    segments: "Tuple[Tuple[int, int, int], ...]" = ()

    def __post_init__(self):
        if not self.segments:
            object.__setattr__(
                self, "segments", ((0, self.num_layers, self.width),)
            )

    @property
    def prefill_slots(self) -> int:
        return self.width + self.window

    @property
    def total_slots(self) -> int:
        return self.width + self.window + self.decode_slots

    @property
    def segmented(self) -> bool:
        return len(self.segments) > 1

    @property
    def think_narrow(self) -> bool:
        """ThinK stores pruned-region keys at D_kept channels (the
        reference fork's memory benefit, cache_utils_think.py:390-424);
        dense (zeroed full-width) only on request or under quantization."""
        cs = self.spec
        return (cs.method == "think" and not cs.think_dense
                and cs.quant_method is None)

    @property
    def think_pruned_slots(self) -> int:
        """Static slot count of the narrow (channel-pruned) key region."""
        recent_sel = max(self.spec.recent_size - self.window, 0)
        return max(self.width - recent_sel, 0)

    def segment_plans(self):
        """Per-segment sub-plans: (start, stop, plan-with-that-width)."""
        import dataclasses

        out = []
        for start, stop, w in self.segments:
            sub = dataclasses.replace(
                self, width=w, num_layers=stop - start,
                segments=((0, stop - start, w),),
            )
            out.append((start, stop, sub))
        return out


def _merge_segments(widths, max_segments=4):
    """Contiguous per-layer widths -> at most ``max_segments`` runs, each
    taking the max width inside it.  Greedy: repeatedly merge the adjacent
    pair of runs whose merge wastes the fewest layer-slots."""
    runs = []  # (start, stop, width)
    for i, w in enumerate(widths):
        if runs and runs[-1][2] == w:
            runs[-1] = (runs[-1][0], i + 1, w)
        else:
            runs.append((i, i + 1, w))
    while len(runs) > max_segments:
        best, cost = None, None
        for j in range(len(runs) - 1):
            a, b = runs[j], runs[j + 1]
            w = max(a[2], b[2])
            c = (w - a[2]) * (a[1] - a[0]) + (w - b[2]) * (b[1] - b[0])
            if cost is None or c < cost:
                best, cost = j, c
        a, b = runs[best], runs[best + 1]
        runs[best: best + 2] = [(a[0], b[1], max(a[2], b[2]))]
    return tuple(runs)


def _per_layer_width_bounds(spec, num_layers, bucket_len):
    """Per-layer STATIC selection-width bounds (max keep count over any
    true_len <= bucket), or None when the method's widths are uniform."""
    import numpy as np

    cap, w = spec.max_capacity_prompt, spec.window_size
    if spec.method == "l2norm" and spec.skip_layers:
        base = min(cap, bucket_len)
        return [
            bucket_len if l in set(spec.skip_layers) else base
            for l in range(num_layers)
        ]
    if spec.method == "pyramidkv":
        # numpy sweep of pyramid_keep_counts' exact arithmetic over every
        # possible true_len (cheap: O(L * bucket) once per compile)
        capw = cap - w
        q = np.arange(1, bucket_len + 1)
        qlw = q - w
        min0 = capw // spec.beta
        max0 = capw * 2 - min0
        clamped = max0 >= qlw
        max_num = np.where(clamped, qlw, max0)
        min_num = np.where(clamped, capw * 2 - qlw, min0)
        steps = (max_num - min_num) // max(num_layers - 1, 1)
        layer = np.arange(num_layers)[:, None]
        b_l = max_num[None, :] - layer * steps[None, :]
        avail = np.maximum(qlw, 0)[None, :]
        n = np.where(
            (q < cap)[None, :], avail,
            np.where((q < 2 * capw)[None, :],
                     np.minimum(capw, avail), np.minimum(b_l, avail)),
        )
        return [int(x) for x in n.max(axis=1)]
    return None


def make_plan(
    spec: CompressionSpec,
    num_layers: int,
    bucket_len: int,
    decode_slots: int,
    use_pallas: bool = False,
    allow_segments: bool = True,
    attn_scale: Optional[float] = None,
    attn_softcap: Optional[float] = None,
) -> PolicyPlan:
    window = min(selection_window(spec), bucket_len)
    width = static_selection_width(spec, num_layers, bucket_len)
    if spec.method in ("fullkv", "minference"):
        window = 0
        width = bucket_len
    # Note: the reference's no-compression early exit (q_len < cap keeps all,
    # pyramidkv_utils.py:314-315) always fits: q_len < cap implies
    # q_len - window < width for every method's static width.
    width = min(width, bucket_len)

    segments = ()
    if allow_segments and spec.quant_method is None:
        bounds = _per_layer_width_bounds(spec, num_layers, bucket_len)
        if bounds is not None:
            # sublane-align the slot widths, clamp at the uniform bound
            bounds = [min(((b + 7) // 8) * 8, width) for b in bounds]
            segs = _merge_segments(bounds)
            # segment only when it actually saves slots (>= 1/8 of the
            # uniform layout)
            uniform = width * num_layers
            used = sum((stop - start) * w for start, stop, w in segs)
            if len(segs) > 1 and used <= uniform * 7 // 8:
                segments = segs
    return PolicyPlan(
        spec=spec,
        num_layers=num_layers,
        bucket_len=bucket_len,
        decode_slots=decode_slots,
        width=width,
        window=window,
        use_pallas=use_pallas,
        segments=segments,
        attn_scale=attn_scale,
        attn_softcap=attn_softcap,
    )


class LayerContext(NamedTuple):
    """Per-layer traced inputs threaded through the prefill layer scan."""

    #: [B] past-token keep count for this layer (single-budget + pyramid +
    #: l2norm methods); unused by adakv/headkv/fullkv.
    keep_counts: jax.Array
    #: [H] static per-head capacities for this layer (headkv), else zeros.
    head_capacity: jax.Array
    #: per-layer PRNG key (random eviction, CAM bernoulli draws).
    rng: jax.Array


def layer_contexts(
    plan: PolicyPlan,
    true_len: jax.Array,
    num_heads: int,
    rng: Optional[jax.Array] = None,
) -> LayerContext:
    """Build the stacked [L, ...] LayerContext consumed by the layer scan."""
    spec = plan.spec
    L = plan.num_layers
    b = true_len.shape[0]
    if spec.layer_capacity is not None and spec.method in (
        "snapkv", "h2o", "cam", "streamingllm", "random", "think"
    ):
        from .ops.selection import per_layer_keep_counts

        counts = per_layer_keep_counts(
            spec, L, true_len,
            plan.window if spec.method == "streamingllm" else spec.window_size,
        )
    elif spec.method == "pyramidkv":
        counts = pyramid_keep_counts(spec, L, true_len)
    elif spec.method == "l2norm":
        counts = l2norm_keep_counts(spec, L, true_len)
    elif spec.method in ("snapkv", "h2o", "cam", "streamingllm", "random", "think"):
        counts = jnp.broadcast_to(
            uniform_keep_counts(
                spec,
                true_len,
                plan.window if spec.method == "streamingllm" else spec.window_size,
            )[None],
            (L, b),
        )
    else:  # fullkv / adakv / headkv manage their own counts
        counts = jnp.broadcast_to(true_len[None].astype(jnp.int32), (L, b))
    if spec.method == "headkv":
        assert spec.head_capacity is not None
        head_caps = jnp.asarray(spec.head_capacity, dtype=jnp.int32)
        assert head_caps.shape == (L, num_heads), head_caps.shape
    else:
        head_caps = jnp.zeros((L, num_heads), dtype=jnp.int32)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, L)
    return LayerContext(keep_counts=counts, head_capacity=head_caps, rng=rngs)


def _cam_merge_values(
    v: jax.Array,
    win_probs: jax.Array,
    *,
    rng: jax.Array,
    start_budget: jax.Array,
    recent_budget: int,
    true_len: jax.Array,
) -> jax.Array:
    """CAM's sequential stochastic value merging (pyramidkv_utils.py:488-502).

    ``win_probs``: [B, H, W, N] observation-window softmax (padding columns
    already ~0).  The reference's ``attn_score`` = mean over the first
    ``min(t, W)`` window rows of column j; for every loop iteration
    ``t >= start + recent >= W`` so it equals the mean over ALL W rows — a
    constant we hoist out of the scan.  The merge itself is a sequential
    V-carry scan (each merged row feeds later draws), exactly like the
    reference's Python loop.  The reference reads batch row 0 for the merge
    probability (:496, a bsz==1 artifact); we use each batch's own row.
    """
    b, h, w, n = win_probs.shape
    r = recent_budget
    colmean = win_probs.mean(axis=2)  # [B, H, N]
    pad = (n - true_len).astype(jnp.int32)  # [B]
    col = jnp.arange(n, dtype=jnp.int32)
    unif = jax.random.uniform(rng, (b, h, n))
    start_buf = pad + start_budget.astype(jnp.int32)  # buffer col where sinks end

    # ---- the merge is a BANDED LINEAR RECURRENCE, solved blockwise ----
    # A source row s is merged at step t = s + r, by which point it is FINAL
    # (its own incoming merges came from steps <= t-1), so
    #     u[j] = v[j] + sum_{s=j-r}^{j-1} c[s] * u[s],
    # with c[s] = 1{unif[s] < p[s]} * active[s] / r.  The draw probability
    # p[s] only needs the CONSTANT column means (the hoisted attn_score), so
    # every coefficient is precomputable and the reference's O(N)-step
    # full-buffer scan (128 MB of V traffic PER STEP at 4k — measured
    # ~1 s of the cam prefill) collapses into N/r chunked triangular
    # solves over [r, D] tiles.
    # mean_attn[s] = max(colmean over sinks [pad, start_buf) and the recent
    # window [s, s+r))
    sink_mask = (col[None, :] >= pad[:, None]) & (col[None, :] < start_buf[:, None])
    sink_max = jnp.max(
        jnp.where(sink_mask[:, None, :], colmean, -jnp.inf), axis=-1
    )  # [B, H]
    cm_pad = jnp.pad(colmean, ((0, 0), (0, 0), (0, r)),
                     constant_values=-jnp.inf)
    win_max = cm_pad[:, :, :n]
    for k in range(1, r):
        win_max = jnp.maximum(win_max, cm_pad[:, :, k:k + n])
    mean_attn = jnp.maximum(sink_max[..., None], win_max)  # [B, H, N]
    p = colmean / mean_attn
    p = jnp.nan_to_num(p, nan=0.0, posinf=1.0, neginf=0.0)
    p = jnp.clip(p, 0.0, 1.0)
    active = (col[None, :] >= start_buf[:, None]) \
        & (col[None, :] < (n - r))  # merge steps run t in [r, n)
    c = jnp.where((unif < p) & active[:, None, :], 1.0 / r, 0.0)  # [B,H,N]

    from .ops.merge import cam_banded_solve

    n_pad = ((n + r - 1) // r) * r
    vf = jnp.pad(v.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    cf = jnp.pad(c, ((0, 0), (0, 0), (0, n_pad - n)))
    d = v.shape[-1]
    u0 = jnp.zeros((b, h, r, d), jnp.float32)
    c0 = jnp.zeros((b, h, r), jnp.float32)
    vout, _ = cam_banded_solve(vf, cf, r, u0, c0)
    return vout[:, :, :n].astype(v.dtype)


def _think_zero_channels(
    ckv: CompactedKV,
    q: jax.Array,
    k: jax.Array,
    sel: Selection,
    plan: PolicyPlan,
    true_len: jax.Array,
    keep_counts: jax.Array,
) -> CompactedKV:
    """ThinK: zero the dropped key channels of all but the last
    ``recent_size`` rows of the compressed cache.

    Zeroing channels of K is numerically identical to the reference's
    channel-gathered ``q_pruned @ k_pruned^T`` partial logits
    (llama_model_think.py:175-181): dropped channels contribute exactly 0 to
    the dot product.  The channel score is computed on the *compressed* keys,
    as ``update_think`` does (pyramidkv_utils.py:390 calls the pruner on the
    already-compacted cache).
    """
    spec = plan.spec
    b, h, s, d = ckv.k.shape
    w, width = plan.window, plan.width
    # Compressed keys in reference row order: [selected (desc score) | window].
    comp_k = ckv.k[:, :, : width + w, :]
    # The compacted buffer's validity is ckv.mask (valid rows LEAD, trailing
    # slots empty), not left-padding — feed it to the channel statistics so
    # short-prompt rows don't drop their highest-score leading keys.
    prune = think_channel_selection(
        comp_k, q, ratio=spec.pruning_ratio, true_len=true_len,
        valid_mask=ckv.mask[:, :, : width + w],
    )
    # "Recent" rows = last recent_size rows of the compressed sequence =
    # window rows + the (recent_size - W) lowest-score selected rows.
    n_valid = keep_counts[:, None] + 0  # [B,1] selected-past count
    rank = jnp.arange(width, dtype=jnp.int32)[None, None, :]
    recent_sel = jnp.maximum(spec.recent_size - w, 0)
    is_recent_past = rank >= (n_valid[:, :, None] - recent_sel)  # [B,1,width]
    keep_ch = prune.channel_mask[:, :, None, :]  # [B,H,1,D]
    # Reference short-prompt regime: update_think returns UNPRUNED K/V when
    # q_len < max_capacity_prompt (pyramidkv_utils.py:357-358).
    long_enough = true_len >= spec.max_capacity_prompt  # [B]
    pruned_region = (
        (~is_recent_past)[..., None]
        & (~keep_ch)
        & long_enough[:, None, None, None]
    )
    new_past_k = jnp.where(pruned_region, 0.0, ckv.k[:, :, :width, :].astype(jnp.float32))
    k_out = jnp.concatenate(
        [new_past_k.astype(ckv.k.dtype), ckv.k[:, :, width:, :]], axis=2
    )
    return CompactedKV(k=k_out, v=ckv.v, mask=ckv.mask, positions=ckv.positions)


def stores_kv_heads(spec: CompressionSpec) -> bool:
    """True when the cache stores ``num_kv_heads`` entries (true GQA) instead
    of the reference's per-query-head post-``repeat_kv`` layout."""
    return spec.method in ("fullkv", "minference") or spec.gqa_aggregate


def compress_layer(
    plan: PolicyPlan,
    ctx: LayerContext,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    true_len: jax.Array,
    k_kv: jax.Array | None = None,
    v_kv: jax.Array | None = None,
    h2o_raw_scores: jax.Array | None = None,
) -> CompactedKV:
    """Compress one layer's prefill KV into the static slot layout.

    Args:
      q, k, v: [B, H, N, D] post-RoPE, left-padded; k/v already repeated to
        the H query heads (the reference compresses AFTER repeat_kv,
        llama_model.py:158-159, so GQA groups may keep different tokens).
      k_kv, v_kv: [B, KV, N, D] unrepeated projections; used when
        :func:`stores_kv_heads` — fullkv always, and ``gqa_aggregate`` mode
        where per-query-head scores are group-averaged and the cache stays at
        ``num_kv_heads`` (group_size x less HBM than the reference layout).
      h2o_raw_scores: [B, H, N - W] precomputed raw h2o column sums (the
        chunked-prefill reconstruction pass accumulates them per token
        chunk — ``ops.scoring.h2o_partial_scores``); replaces the (q, k)
        scoring here, masking applied identically.
    """
    spec = plan.spec
    b, h, n, d = q.shape
    w = plan.window
    m = spec.method
    if k_kv is None:
        k_kv, v_kv = k, v  # new contract: k/v may already be grouped
    hk = k_kv.shape[1]
    groups = h // hk

    def _rep(x):
        """Materialise per-query-head copies (only the CAM / pivot-merge /
        think-compat paths need a full repeated buffer)."""
        return x if x.shape[1] == h else jnp.repeat(x, groups, axis=1)

    if spec.gqa_aggregate:
        if m in ("cam", "think", "headkv"):
            raise NotImplementedError(f"gqa_aggregate unsupported for {m}")

        def _group_mean(scores: jax.Array) -> jax.Array:
            return scores.reshape(b, hk, groups, scores.shape[-1]).mean(axis=2)

        k, v = k_kv, v_kv  # storage at kv heads
    else:
        _group_mean = lambda s: s  # noqa: E731
        if m in ("fullkv", "minference"):
            k, v = k_kv, v_kv  # true-GQA storage
        else:
            # per-query-head storage; scoring/compaction read k_kv grouped
            k, v = k_kv, v_kv
    k_score = k_kv  # scorers expand groups internally (ops/scoring.py)
    hs = hk if stores_kv_heads(spec) else h  # stored head count

    if m in ("fullkv", "minference"):
        # Fast path: the buffer IS the compacted layout — no gather.
        # (minference compresses nothing — it sparsifies PREFILL attention
        # only, minference.py:49-59; decode runs dense on the full cache.)
        col = jnp.arange(n, dtype=jnp.int32)
        pad = (n - true_len).astype(jnp.int32)[:, None, None]
        colv = jnp.broadcast_to(col[None, None, :] >= pad, (b, hs, n))
        pos = jnp.where(colv, col[None, None, :] - pad, -1)
        ds = plan.decode_slots
        zkv = jnp.zeros((b, hs, ds, d), dtype=k.dtype)
        return CompactedKV(
            k=jnp.concatenate([jnp.where(colv[..., None], k, 0), zkv], axis=2),
            v=jnp.concatenate([jnp.where(colv[..., None], v, 0), zkv], axis=2),
            mask=jnp.concatenate([colv, jnp.zeros((b, hs, ds), bool)], axis=2),
            positions=jnp.concatenate(
                [pos, jnp.zeros((b, hs, ds), jnp.int32)], axis=2
            ),
        )

    def _expand(scores_kv):
        """[B, hk, C] -> [B, hs, C] (selection identical within a group for
        position/norm scores)."""
        if scores_kv.shape[1] == hs:
            return scores_kv
        return jnp.repeat(scores_kv, hs // scores_kv.shape[1], axis=1)

    if m == "l2norm":
        scores = _expand(l2norm_scores(k_kv, true_len=true_len))
        sel = topk_select(scores, plan.width, ctx.keep_counts)
        return compact_kv(k_kv, v_kv, sel, window_size=0,
                          decode_slots=plan.decode_slots, true_len=true_len)

    if m == "streamingllm":
        scores = _expand(position_scores(k_kv, window_size=w, true_len=true_len))
        sel = topk_select(scores, plan.width, ctx.keep_counts)
        return compact_kv(k_kv, v_kv, sel, window_size=w,
                          decode_slots=plan.decode_slots, true_len=true_len)

    if m == "random":
        # per-(query-)head randomness like the reference's results-table row
        u = jax.random.uniform(ctx.rng, (b, hs, n - w), dtype=jnp.float32)
        colv = jnp.arange(n - w, dtype=jnp.int32)[None, :] >= (
            n - true_len
        ).astype(jnp.int32)[:, None]
        scores = jnp.where(colv[:, None, :], u, -jnp.inf)
        sel = topk_select(scores, plan.width, ctx.keep_counts)
        return compact_kv(k_kv, v_kv, sel, window_size=w,
                          decode_slots=plan.decode_slots, true_len=true_len)

    if m == "h2o":
        if h2o_raw_scores is not None:
            # chunked-prefill reconstruction pass: the accumulated column
            # sums, needing only the shared past-column masking
            from .ops.scoring import _column_valid

            raw = jnp.where(
                _column_valid(n, true_len)[:, None, : n - w],
                h2o_raw_scores, -jnp.inf)
        elif plan.use_pallas and plan.attn_scale is None and plan.attn_softcap is None:
            from .kernels.h2o_scores import h2o_scores_pallas

            raw = h2o_scores_pallas(q, k_score, window_size=w, true_len=true_len)
        else:
            raw = h2o_scores(q, k_score, window_size=w, true_len=true_len,
                             scale=plan.attn_scale, softcap=plan.attn_softcap)
        scores = _group_mean(raw)
        sel = topk_select(scores, plan.width, ctx.keep_counts)
        return compact_kv(k_kv, v_kv, sel, window_size=w,
                          decode_slots=plan.decode_slots, true_len=true_len)

    if m in ("snapkv", "pyramidkv", "think"):
        scores = _group_mean(window_scores(
            q, k_score, window_size=w, true_len=true_len,
            kernel_size=spec.kernel_size, pooling=spec.pooling,
            scale=plan.attn_scale, softcap=plan.attn_softcap,
        ))
        sel = topk_select(scores, plan.width, ctx.keep_counts)
        if spec.merge == "pivot":
            kr, vr = pivot_merge(_rep(k_kv), _rep(v_kv), sel, window_size=w,
                                 true_len=true_len)
            ckv = compact_kv(kr, vr, sel, window_size=w,
                             decode_slots=plan.decode_slots, true_len=true_len)
        else:
            ckv = compact_kv(k_kv, v_kv, sel, window_size=w,
                             decode_slots=plan.decode_slots, true_len=true_len)
        if m == "think" and not plan.think_narrow:
            ckv = _think_zero_channels(ckv, q, ckv.k, sel, plan, true_len,
                                       ctx.keep_counts)
        return ckv

    if m == "cam":
        # Selection uses the UNpooled window score (the reference comments the
        # pooling out, pyramidkv_utils.py:473-480); the merge consumes the
        # window softmax itself.
        from .ops.scoring import _column_valid, _window_causal_bias

        kr = _rep(k_kv)
        v = _rep(v_kv)
        qw = q[:, :, n - w :, :].astype(jnp.float32)
        _sc = (plan.attn_scale if plan.attn_scale is not None
               else 1.0 / math.sqrt(d))
        logits = jnp.einsum("bhwd,bhnd->bhwn", qw, kr.astype(jnp.float32)) * _sc
        if plan.attn_softcap is not None:
            logits = jnp.tanh(logits / plan.attn_softcap) * plan.attn_softcap
        logits = logits + _window_causal_bias(w, n)[None, None]
        colv = _column_valid(n, true_len)
        logits = jnp.where(colv[:, None, None, :], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        scores = probs[..., : n - w].sum(axis=2)
        scores = jnp.where(colv[:, None, : n - w], scores, -jnp.inf)
        start_budget = jnp.ceil(
            spec.start_budget_ratio * true_len.astype(jnp.float32)
        ).astype(jnp.int32)
        v = _cam_merge_values(
            v, probs, rng=ctx.rng, start_budget=start_budget,
            recent_budget=w, true_len=true_len,
        )
        sel = topk_select(scores, plan.width, ctx.keep_counts)
        return compact_kv(kr, v, sel, window_size=w,
                          decode_slots=plan.decode_slots, true_len=true_len)

    if m in ("adakv", "headkv"):
        scores = _group_mean(window_scores(
            q, k_score, window_size=w, true_len=true_len,
            kernel_size=spec.kernel_size, pooling=spec.pooling,
            aggregation="mean",
            scale=plan.attn_scale, softcap=plan.attn_softcap,
        ))
        base = spec.max_capacity_prompt - spec.window_size
        if m == "adakv":
            alloc = adakv_allocate(
                scores, base_capacity=base, floor_ratio=spec.floor_ratio,
                normalize=spec.normalize, true_len=true_len,
                window_size=w, max_head_capacity=plan.width,
            )
        else:
            alloc = headkv_allocate(
                scores, head_capacity=ctx.head_capacity, base_capacity=base,
                true_len=true_len, window_size=w, max_head_capacity=plan.width,
            )
        sel = selection_from_allocation(alloc, plan.width)
        return compact_kv(k_kv, v_kv, sel, window_size=w,
                          decode_slots=plan.decode_slots, true_len=true_len)

    raise ValueError(f"unknown method {m!r}")


def think_split(ckv, q, plan: PolicyPlan, true_len: jax.Array):
    """Split a think-compacted layer into the narrow key region + the rest.

    Returns ``(k_pruned [B,H,Sp,D_kept], kept_channels [B,H,D_kept],
    k_rest [B,H,S-Sp,D])`` where ``Sp = plan.think_pruned_slots``.  The
    channel selection is the SAME computation the dense zeroing path uses
    (``_think_zero_channels``), so for prompts with ``true_len >= cap`` the
    two layouts produce bit-identical attention logits
    (llama_model_think.py:175-181 partial-logit concat).  Short prompts are
    channel-pruned too under this layout (the reference's early-out needs
    full-width storage — see CompressionSpec.think_dense).
    """
    from .ops.think import gather_channels

    spec = plan.spec
    w, width = plan.window, plan.width
    sp = plan.think_pruned_slots
    comp_k = ckv.k[:, :, : width + w, :]
    prune = think_channel_selection(
        comp_k, q, ratio=spec.pruning_ratio, true_len=true_len,
        valid_mask=ckv.mask[:, :, : width + w],
    )
    k_pruned = gather_channels(ckv.k[:, :, :sp, :], prune.kept_channels)
    k_rest = ckv.k[:, :, sp:, :]
    return k_pruned, prune.kept_channels.astype(jnp.int32), k_rest
