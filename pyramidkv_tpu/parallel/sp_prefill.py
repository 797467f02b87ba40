"""Sequence-parallel prefill: shard the PROMPT over a mesh axis, compress,
return a small replicated cache.

The reference cannot scale sequence length mechanically at all (SURVEY §5);
its long-context story is compression + truncation.  This module is the
TPU-native extension that makes the two compose: a context too long for one
chip's HBM is sharded over the `sp` axis, attention runs as a ppermute ring
(`ring_attention.py`), the observation-window scores are computed with
distributed softmax statistics (pmax/psum over shards), and the global
top-k selection gathers only the WINNING rows — so the compressed cache
(cap ~ 128-2048 tokens) comes out replicated and decode proceeds without
any cross-chip traffic.

Supported methods: ALL of them — the window-score family (snapkv,
pyramidkv), streamingllm, l2norm, random, H2O (a dedicated two-pass ring:
per-row stats, then rotated-row column accumulation), the per-head
allocators (adakv, headkv — global scores are all_gathered [N floats/
head], winning rows fetched by local one-hot contraction + psum), think
(channel stats on the already-replicated kept rows), and cam (the value
merge as a banded linear recurrence whose r-row carry crosses shards via
a sequential ppermute chain).

All collectives are XLA primitives inside one `shard_map`; the layer loop
stays a `lax.scan`.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..cache import KVCache
from ..config import ModelSpec
from ..models.llama import (
    _logits,
    _mlp,
    _qkv,
    apply_rope,
    rms_norm,
    rope_inv_freq,
)
from ..models.weights import embed_lookup, mm, weight_dtype
from ..policy import PolicyPlan, layer_contexts
from .ring_attention import _ring_body

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _repeat_heads(x, g):
    """[B, KV, Nl, D] -> [B, KV*g, Nl, D] (per-query-head CAM merge)."""
    if g == 1:
        return x
    return jnp.repeat(x, g, axis=1)


def _sp_cam_merge(v_rep, colmean_l, rng, plan, cols, true_len, axis, nl, n):
    """CAM's value merge under sequence sharding.

    The merge is the banded linear recurrence of
    ``ops.merge.cam_banded_solve``; its coefficients are LOCAL (global
    softmax colmeans + a halo of r-1 columns for the rolling window max and
    a psum for the sink max), and the r-row chunk carry crosses shards via
    a sequential ppermute chain (each shard re-runs its local solve per
    chain step and keeps the pass whose incoming carry is real — prefill-
    once cost, exact parity with the single-chip path including the
    Bernoulli draws, which come from the same full-length uniform table).
    """
    from ..ops.merge import cam_banded_solve

    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b, h, _, d = v_rep.shape
    r = plan.window
    assert nl % r == 0, (nl, r)
    pad = (n - true_len).astype(jnp.int32)
    start_budget = jnp.ceil(
        plan.spec.start_budget_ratio * true_len.astype(jnp.float32)
    ).astype(jnp.int32)
    start_buf = pad + start_budget

    # sink max: global over columns [pad, start_buf)
    sink_mask = (cols[None, :] >= pad[:, None]) & (cols[None, :] < start_buf[:, None])
    sink_max_l = jnp.max(
        jnp.where(sink_mask[:, None, :], colmean_l, -jnp.inf), axis=-1
    )
    sink_max = jax.lax.pmax(sink_max_l, axis)  # [B, H]

    # rolling window max over [s, s+r): halo of r-1 columns from the right
    halo = jax.lax.ppermute(
        colmean_l[..., : r - 1], axis, [(i, (i - 1) % p) for i in range(p)]
    )
    halo = jnp.where(me == p - 1, -jnp.inf, halo)
    cm_ext = jnp.concatenate([colmean_l, halo], axis=-1)  # [B,H,Nl+r-1]
    win_max = cm_ext[..., :nl]
    for k_ in range(1, r):
        win_max = jnp.maximum(win_max, cm_ext[..., k_:k_ + nl])
    mean_attn = jnp.maximum(sink_max[..., None], win_max)
    prob = colmean_l / mean_attn
    prob = jnp.nan_to_num(prob, nan=0.0, posinf=1.0, neginf=0.0)
    prob = jnp.clip(prob, 0.0, 1.0)
    active = (cols[None, :] >= start_buf[:, None]) & (cols[None, :] < (n - r))
    # identical draws to the single-chip path: the SAME full-length table
    unif_full = jax.random.uniform(rng, (b, h, n))
    unif_l = jax.lax.dynamic_slice_in_dim(unif_full, me * nl, nl, axis=-1)
    c_l = jnp.where((unif_l < prob) & active[:, None, :], 1.0 / r, 0.0)

    # sequential chunk-carry chain over shards
    vf = v_rep.astype(jnp.float32)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def chain(i, state):
        cu, cc, store = state
        u_full, (u_last, c_last) = cam_banded_solve(vf, c_l, r, cu, cc)
        mine = (me == i)
        store = jnp.where(mine, u_full, store)
        sel_u = jnp.where(mine, u_last, jnp.zeros_like(u_last))
        sel_c = jnp.where(mine, c_last, jnp.zeros_like(c_last))
        cu = jax.lax.ppermute(sel_u, axis, perm)
        cc = jax.lax.ppermute(sel_c, axis, perm)
        return cu, cc, store

    u0 = jnp.zeros((b, h, r, d), jnp.float32)
    c0 = jnp.zeros((b, h, r), jnp.float32)
    _, _, u = jax.lax.fori_loop(0, p, chain, (u0, c0, jnp.zeros_like(vf)))
    return u


def _sp_window_scores(
    qw: jax.Array,       # [B, H, W, D] — window queries (replicated)
    k_local: jax.Array,  # [B, H, Nl, D] — this shard's keys
    *,
    axis: str,
    n_global: int,
    window: int,
    true_len: jax.Array,
    kernel_size: int,
    pooling: str,
    aggregation: str,
    return_colmean: bool = False,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """Scores for the LOCAL columns with globally-normalised softmax.

    Returns [B, H, Nl] (window columns masked to -inf like the single-device
    scorer's past-column slice; the caller handles the window region).
    With ``return_colmean`` also returns the UNPOOLED per-column mean of the
    window softmax (CAM's merge-probability input).
    """
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b, h, w, d = qw.shape
    hk = k_local.shape[1]
    nl = k_local.shape[2]
    pad = (n_global - true_len).astype(jnp.int32)  # [B]
    cols = me * nl + jnp.arange(nl, dtype=jnp.int32)  # global col ids

    sc = scale if scale is not None else 1.0 / math.sqrt(d)
    if hk == h:
        logits = jnp.einsum(
            "bhwd,bhnd->bhwn", qw, k_local, preferred_element_type=jnp.float32
        ) * sc
    else:
        g = h // hk
        logits = jnp.einsum(
            "bkgwd,bknd->bkgwn", qw.reshape(b, hk, g, w, d), k_local,
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, nl) * sc
    if softcap is not None:
        # Gemma-2 order (ops.scoring.window_scores): softcap the SCALED
        # logits, masks come after.
        logits = jnp.tanh(logits * (1.0 / softcap)) * softcap
    # causal inside the trailing W x W block (global rows n-W..n-1)
    row_g = n_global - w + jnp.arange(w, dtype=jnp.int32)  # [W]
    tri_mask = cols[None, :] > row_g[:, None]  # key after query, only hits
    in_window_cols = cols[None, :] >= (n_global - w)
    bias = jnp.where(tri_mask & in_window_cols, _NEG_INF, 0.0)
    logits = logits + bias[None, None]
    colv = cols[None, :] >= pad[:, None]  # [B, Nl]
    logits = jnp.where(colv[:, None, None, :], logits, _NEG_INF)

    # distributed softmax over the global column axis
    m_loc = jnp.max(logits, axis=-1)                       # [B,H,W]
    m = jax.lax.pmax(m_loc, axis)
    e = jnp.exp(logits - jnp.maximum(m, _NEG_INF / 2)[..., None])
    e = jnp.where(colv[:, None, None, :], e, 0.0)
    z = jax.lax.psum(e.sum(-1), axis)                       # [B,H,W]
    probs = e / jnp.maximum(z, 1e-30)[..., None]
    if aggregation == "sum":
        s = probs.sum(axis=2)
    else:
        s = probs.mean(axis=2)

    # The single-device scorer pools the PAST slice only (window columns
    # dropped, zero pad at the right edge — ops/scoring.py:98-107).  Zero
    # the window columns BEFORE the halo exchange so the last shard's
    # near-diagonal window scores don't bleed into adjacent past columns.
    s = jnp.where((cols < (n_global - w))[None, None, :], s, 0.0)

    # pooling crosses shard boundaries: halo-exchange kernel//2 columns
    halo = kernel_size // 2
    if halo > 0:
        left_halo = s[..., -halo:]
        right_halo = s[..., :halo]
        perm_r = [(i, (i + 1) % p) for i in range(p)]
        perm_l = [(i, (i - 1) % p) for i in range(p)]
        from_left = jax.lax.ppermute(left_halo, axis, perm_r)
        from_right = jax.lax.ppermute(right_halo, axis, perm_l)
        from_left = jnp.where(me == 0, 0.0, from_left)
        from_right = jnp.where(me == p - 1, 0.0, from_right)
        s_ext = jnp.concatenate([from_left, s, from_right], axis=-1)
    else:
        s_ext = s
    from ..ops.pooling import pool1d

    s_pooled = pool1d(s_ext, kernel_size, pooling)
    if halo > 0:
        s_pooled = s_pooled[..., halo:-halo]
    # valid past columns only (window columns excluded from selection)
    past_valid = colv & (cols[None, :] < (n_global - w))
    out = jnp.where(past_valid[:, None, :], s_pooled, _NEG_INF)
    if return_colmean:
        return out, probs.mean(axis=2)  # [B, H, Nl], unmasked colmean
    return out


def _h2o_ring_scores(
    q: jax.Array,       # [B, H, Nl, D] local query rows
    k_local: jax.Array, # [B, Hk, Nl, D] local key cols
    *,
    axis: str,
    n_global: int,
    window: int,
    true_len: jax.Array,
    scale: float | None = None,
    softcap: float | None = None,
) -> jax.Array:
    """H2O column sums under sequence sharding: two ring passes.

    Pass 1 rotates K to compute each local ROW's softmax stats (m, l) under
    the reference's quirky mask (causal only inside the trailing W x W
    block, pyramidkv_utils.py:544-561).  Pass 2 rotates (Q, m, l) so every
    shard accumulates all rows' normalised probabilities for its LOCAL
    columns.  Returns [B, H, Nl] scores (window/pad columns -inf).
    """
    p = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b, h, nl, d = q.shape
    hk = k_local.shape[1]
    g = h // hk
    n = n_global
    w = window
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    pad = (n - true_len).astype(jnp.int32)  # [B]

    def quirk_mask(rows, cols):
        # rows/cols: [..., Nl] global ids; visibility per h2o parity
        in_blk = (rows[:, None] >= n - w) & (cols[None, :] >= n - w)
        return (cols[None, :] >= pad[:, None, None]) & ~(
            in_blk & (cols[None, :] > rows[:, None])
        )

    loc = jnp.arange(nl, dtype=jnp.int32)
    my_rows = me * nl + loc

    def qk(qrows, kc):
        if g == 1:
            s = jnp.einsum(
                "bhqd,bhcd->bhqc", qrows, kc, preferred_element_type=jnp.float32
            ) * scale
        else:
            s = jnp.einsum(
                "bkgqd,bkcd->bkgqc", qrows.reshape(b, hk, g, nl, d), kc,
                preferred_element_type=jnp.float32,
            ).reshape(b, h, nl, nl) * scale
        if softcap is not None:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        return s

    # ---- pass 1: per-local-row stats over all columns ----
    def step1(carry, s_idx):
        m, l, kc = carry
        src = (me - s_idx) % p
        cols = src * nl + loc
        sλ = qk(q, kc)
        vis = quirk_mask(my_rows, cols)[:, None]  # [B,1,Nl,Nl]
        sλ = jnp.where(vis, sλ, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(sλ, axis=-1, keepdims=True))
        pe = jnp.where(vis, jnp.exp(sλ - jnp.maximum(m_new, _NEG_INF / 2)), 0.0)
        alpha = jnp.where(m <= _NEG_INF / 2, 0.0,
                          jnp.exp(jnp.minimum(m - m_new, 0.0)))
        l = alpha * l + pe.sum(-1, keepdims=True)
        perm = [(i, (i + 1) % p) for i in range(p)]
        return (m_new, l, jax.lax.ppermute(kc, axis, perm)), None

    m0 = jnp.full((b, h, nl, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, nl, 1), jnp.float32)
    (m, l, _), _ = jax.lax.scan(step1, (m0, l0, k_local), jnp.arange(p))

    # ---- pass 2: rotate (q, m, l, row-origin) and accumulate local cols ----
    my_cols = me * nl + loc

    def step2(carry, s_idx):
        acc, qc, mc, lc = carry
        src = (me - s_idx) % p  # shard whose ROWS qc currently holds
        rows = src * nl + loc
        sλ = qk(qc, k_local)
        vis = quirk_mask(rows, my_cols)[:, None]
        rows_real = (rows[None, :] >= pad[:, None])  # [B, Nl]
        pe = jnp.where(
            vis & rows_real[:, None, :, None],
            jnp.exp(sλ - jnp.maximum(mc, _NEG_INF / 2)) /
            jnp.maximum(lc, 1e-30),
            0.0,
        )
        acc = acc + pe.sum(axis=2)  # sum over rows -> [B, H, Nl]
        perm = [(i, (i + 1) % p) for i in range(p)]
        qc = jax.lax.ppermute(qc, axis, perm)
        mc = jax.lax.ppermute(mc, axis, perm)
        lc = jax.lax.ppermute(lc, axis, perm)
        return (acc, qc, mc, lc), None

    acc0 = jnp.zeros((b, h, nl), jnp.float32)
    (acc, _, _, _), _ = jax.lax.scan(step2, (acc0, q, m, l), jnp.arange(p))
    past_valid = (my_cols[None, :] >= pad[:, None]) & (my_cols[None, :] < n - w)
    return jnp.where(past_valid[:, None, :], acc, _NEG_INF)


def sequence_parallel_prefill(
    params: dict,
    spec: ModelSpec,
    plan: PolicyPlan,
    tokens: jax.Array,
    true_len: jax.Array,
    mesh: Mesh,
    axis: str = "model",
) -> Tuple[jax.Array, KVCache]:
    """Prefill with the sequence dim sharded over ``mesh[axis]``.

    Returns (last-token logits [B, V], replicated compressed KVCache) —
    identical (up to fp reorder) to `models.llama.prefill` on one device.
    """
    m = plan.spec.method
    assert m in ("snapkv", "pyramidkv", "streamingllm", "l2norm", "random",
                 "adakv", "headkv", "h2o", "think", "cam"), m
    if m == "think":
        # narrow layout only (the default); channel stats need the last 32
        # queries on the final shard
        assert plan.think_narrow, "SP think requires the narrow K layout"
        assert tokens.shape[1] // mesh.shape[axis] >= 32
    b, n = tokens.shape
    p = mesh.shape[axis]
    assert n % p == 0 and n == plan.bucket_len
    nl = n // p
    w = plan.window
    width = plan.width
    groups = spec.num_query_groups
    inv_freq = rope_inv_freq(spec)
    ctxs = layer_contexts(plan, true_len, spec.num_attention_heads)
    agg = "sum"
    unit = spec.rmsnorm_unit_offset
    # Gemma-2 attention semantics mirror the single-chip path
    # (models/llama.py prefill): query_pre_attn_scalar softmax scale, tanh
    # logit soft-capping, alternating sliding/full layers.  The per-layer
    # window is threaded into the ring as a TRACED scalar (full layers get
    # window = n, a no-op bound) so no lax.cond has to carry ppermutes.
    ascale = (spec.attn_scale
              if spec.query_pre_attn_scalar is not None else None)
    asoftcap = spec.attn_logit_softcapping
    sliding_flags = (
        jnp.asarray([spec.layer_is_sliding(i)
                     for i in range(spec.num_hidden_layers)])
        if spec.mixed_sliding else None
    )

    def body(tokens_l, true_len_, ctxs_):
        me = jax.lax.axis_index(axis)
        pad = (n - true_len_).astype(jnp.int32)
        cols = me * nl + jnp.arange(nl, dtype=jnp.int32)
        positions = cols[None, :] - pad[:, None]  # [B, Nl]
        hidden0 = embed_lookup(params["embed"], tokens_l,
                               weight_dtype(params))
        if spec.scale_embeddings:
            hidden0 = hidden0 * jnp.asarray(
                math.sqrt(spec.hidden_size), dtype=hidden0.dtype)

        def layer_fn(hidden, xs):
            wts, ctx, li = xs
            x = rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps, unit)
            q, k, v = _qkv(x, wts, spec)
            q = apply_rope(q, positions, inv_freq)
            k = apply_rope(k, positions, inv_freq)
            if sliding_flags is not None:
                win_i = jnp.where(sliding_flags[li], spec.sliding_window, n)
            else:
                win_i = spec.sliding_window
            attn = _ring_body(q, k, v, true_len_, axis, scale=ascale,
                              softcap=asoftcap, sliding_window=win_i)
            # grouped ring: only KV heads rotate (group_size x less ICI)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, nl, -1)
            ao = mm(attn, wts["wo"])
            if spec.post_block_norms:
                ao = rms_norm(ao, wts["attn_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + ao
            x2 = rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps, unit)
            mo = _mlp(x2, wts, spec.num_experts_per_tok,
                      capacity_factor=spec.moe_capacity_factor,
                      valid=positions >= 0, hidden_act=spec.hidden_act)
            if spec.post_block_norms:
                mo = rms_norm(mo, wts["mlp_post_norm"], spec.rms_norm_eps,
                              unit)
            hidden = hidden + mo

            hk = k.shape[1]
            hh = q.shape[1]  # per-query-head cache (reference layout)
            g = hh // hk

            def _grouped_fetch(onehot, src):
                """One-hot row fetch with GROUPED keys: [B,H,W,Nl] x
                [B,KV,Nl,D] -> [B,H,W,D] without a repeat_kv buffer."""
                wdt = onehot.shape[2]
                oh = onehot.reshape(b, hk, g, wdt, nl)
                out = jnp.einsum(
                    "bkgwn,bknd->bkgwd", oh, src,
                    preferred_element_type=jnp.float32,
                )
                return out.reshape(b, hh, wdt, src.shape[-1]).astype(src.dtype)
            # ---- scoring (local columns, global normalisation) ----
            if m in ("adakv", "headkv"):
                # per-head allocation needs the global score vector: gather
                # scores (N floats/head — small), allocate, then fetch the
                # winning ROWS via local one-hot contractions + psum.
                from ..ops.selection import (
                    adakv_allocate,
                    headkv_allocate,
                    selection_from_allocation,
                )

                qw_local = q[:, :, nl - w:, :]
                qw = jax.lax.psum(
                    jnp.where(me == p - 1, qw_local, jnp.zeros_like(qw_local)),
                    axis,
                )
                sc_local = _sp_window_scores(
                    qw, k, axis=axis, n_global=n, window=w,
                    true_len=true_len_, kernel_size=plan.spec.kernel_size,
                    pooling=plan.spec.pooling, aggregation="mean",
                    scale=ascale, softcap=asoftcap,
                )
                sc_full = jax.lax.all_gather(sc_local, axis, axis=2, tiled=True)
                base = plan.spec.max_capacity_prompt - plan.spec.window_size
                if m == "adakv":
                    alloc = adakv_allocate(
                        sc_full, base_capacity=base,
                        floor_ratio=plan.spec.floor_ratio,
                        normalize=plan.spec.normalize, true_len=true_len_,
                        window_size=w, max_head_capacity=width,
                    )
                else:
                    alloc = headkv_allocate(
                        sc_full, head_capacity=ctx.head_capacity,
                        base_capacity=base, true_len=true_len_,
                        window_size=w, max_head_capacity=width,
                    )
                sel = selection_from_allocation(alloc, width)
                onehot_l = (
                    sel.indices[..., None] == cols[None, None, None, :]
                ).astype(k.dtype)  # [B,H,width,Nl]
                kept_k = jax.lax.psum(
                    _grouped_fetch(onehot_l, k).astype(jnp.float32), axis
                ).astype(k.dtype)
                kept_v = jax.lax.psum(
                    _grouped_fetch(onehot_l, v).astype(jnp.float32), axis
                ).astype(v.dtype)
                kept_cols = sel.indices
                kept_valid = sel.valid
                scores = None  # handled
            elif m in ("snapkv", "pyramidkv", "think"):
                # window queries live on the LAST shard; broadcast them
                qw_local = q[:, :, nl - w:, :]
                qw = jax.lax.psum(
                    jnp.where(me == p - 1, qw_local, jnp.zeros_like(qw_local)),
                    axis,
                )
                scores = _sp_window_scores(
                    qw, k, axis=axis, n_global=n, window=w,
                    true_len=true_len_, kernel_size=plan.spec.kernel_size,
                    pooling=plan.spec.pooling, aggregation=agg,
                    scale=ascale, softcap=asoftcap,
                )
            elif m == "cam":
                # CAM: UNPOOLED window-score selection + the stochastic
                # value merge expressed as a banded linear recurrence
                # (policy._cam_merge_values) — coefficients are local
                # (colmean + a halo for the rolling window max); the chunk
                # carry crosses shards via a sequential ppermute chain.
                qw_local = q[:, :, nl - w:, :]
                qw = jax.lax.psum(
                    jnp.where(me == p - 1, qw_local, jnp.zeros_like(qw_local)),
                    axis,
                )
                scores, colmean_l = _sp_window_scores(
                    qw, k, axis=axis, n_global=n, window=w,
                    true_len=true_len_, kernel_size=1, pooling="avgpool",
                    aggregation="sum", return_colmean=True,
                    scale=ascale, softcap=asoftcap,
                )
                v_merged_l = _sp_cam_merge(
                    _repeat_heads(v, g), colmean_l, ctx.rng, plan, cols,
                    true_len_, axis, nl, n,
                )
            elif m == "h2o":
                scores = _h2o_ring_scores(
                    q, k, axis=axis, n_global=n, window=w,
                    true_len=true_len_, scale=ascale, softcap=asoftcap,
                )
            elif m == "streamingllm":
                colv = cols[None, :] >= pad[:, None]
                past = colv & (cols[None, :] < (n - w))
                scores = jnp.where(
                    past[:, None, :],
                    -cols[None, None, :].astype(jnp.float32),
                    _NEG_INF,
                )
                scores = jnp.broadcast_to(scores, (b, hh, nl))
            elif m == "l2norm":
                colv = cols[None, :] >= pad[:, None]
                norms = jnp.sqrt(
                    (k.astype(jnp.float32) ** 2).sum(-1)
                )  # [B, KV, Nl]; selection identical within a GQA group
                norms = jnp.repeat(norms, g, axis=1)
                scores = jnp.where(colv[:, None, :], -norms, _NEG_INF)
            else:  # random
                u = jax.random.uniform(
                    jax.random.fold_in(ctx.rng, me), (b, hh, nl)
                )
                colv = cols[None, :] >= pad[:, None]
                past = colv & (cols[None, :] < (n - w))
                scores = jnp.where(past[:, None, :], u, _NEG_INF)

            # ---- local top-k candidates, then global merge ----
            if m not in ("adakv", "headkv"):
                kw = min(width, nl)
                lv, li = jax.lax.top_k(scores, kw)  # [B,H,kw] local cols
                gcols = jnp.take_along_axis(
                    jnp.broadcast_to(cols[None, None, :], scores.shape), li,
                    axis=-1,
                )
                onehot = (
                    li[..., None]
                    == jnp.arange(nl, dtype=jnp.int32)[None, None, None, :]
                ).astype(k.dtype)
                cand_k = _grouped_fetch(onehot, k)
                if m == "cam":
                    oh_full = onehot.reshape(b, hh, -1, nl)
                    cand_v = jnp.einsum(
                        "bhwn,bhnd->bhwd", oh_full, v_merged_l,
                        preferred_element_type=jnp.float32,
                    ).astype(v.dtype)
                else:
                    cand_v = _grouped_fetch(onehot, v)
                # gather candidates from all shards: [B, H, P*kw, ...]
                allv = jax.lax.all_gather(lv, axis, axis=2, tiled=True)
                allc = jax.lax.all_gather(gcols, axis, axis=2, tiled=True)
                allk = jax.lax.all_gather(cand_k, axis, axis=2, tiled=True)
                av = jax.lax.all_gather(cand_v, axis, axis=2, tiled=True)
                fv, fi = jax.lax.top_k(allv, width)  # global winners
                sel_onehot = (
                    fi[..., None]
                    == jnp.arange(allv.shape[2], dtype=jnp.int32)[None, None, None, :]
                ).astype(allk.dtype)
                kept_k = jnp.einsum(
                    "bhwn,bhnd->bhwd", sel_onehot, allk,
                    preferred_element_type=jnp.float32,
                ).astype(allk.dtype)
                kept_v = jnp.einsum(
                    "bhwn,bhnd->bhwd", sel_onehot, av,
                    preferred_element_type=jnp.float32,
                ).astype(av.dtype)
                kept_cols = jnp.take_along_axis(allc, fi, axis=-1)
                rank = jnp.arange(width, dtype=jnp.int32)[None, None, :]
                counts = ctx.keep_counts
                if counts.ndim == 1:
                    counts = counts[:, None]
                kept_valid = (rank < counts[:, :, None]) & jnp.isfinite(fv)

            # ---- recency window rows (last shard) broadcast; assembly is
            # shared with the single-chip path (ops.selection.assemble_slots)
            if w > 0:
                win_k_l = jnp.repeat(k[:, :, nl - w:, :], g, axis=1)  # W rows
                if m == "cam":
                    win_v_l = v_merged_l[:, :, nl - w:, :].astype(v.dtype)
                else:
                    win_v_l = jnp.repeat(v[:, :, nl - w:, :], g, axis=1)
                win_k = jax.lax.psum(
                    jnp.where(me == p - 1, win_k_l, jnp.zeros_like(win_k_l)), axis
                )
                win_v = jax.lax.psum(
                    jnp.where(me == p - 1, win_v_l, jnp.zeros_like(win_v_l)), axis
                )
                win_cols = jnp.arange(n - w, n, dtype=jnp.int32)[None, None, :]
                win_valid = jnp.broadcast_to(
                    win_cols >= pad[:, None, None], (b, hh, w)
                )
                win_pos = jnp.broadcast_to(
                    win_cols - pad[:, None, None], (b, hh, w)
                )
            else:
                win_k = win_v = win_valid = win_pos = None
            from ..ops.selection import assemble_slots

            ckv = assemble_slots(
                kept_k, kept_v, kept_valid, kept_cols - pad[:, None, None],
                win_k, win_v, win_valid, win_pos, plan.decode_slots,
            )
            if m == "think":
                # ThinK: the kept rows are already REPLICATED, so the
                # channel statistics need no extra collectives — only the
                # last 32 queries (pyramidkv_utils.py:17), broadcast from
                # the final shard like the observation window.
                from ..ops.think import think_channel_selection

                obs = min(32, nl)
                q32_l = q[:, :, nl - obs:, :]
                q32 = jax.lax.psum(
                    jnp.where(me == p - 1, q32_l, jnp.zeros_like(q32_l)), axis
                )
                if plan.think_narrow:
                    from ..ops.think import gather_channels

                    sp_slots = plan.think_pruned_slots
                    prune = think_channel_selection(
                        ckv.k[:, :, : width + w, :], q32,
                        ratio=plan.spec.pruning_ratio, true_len=true_len_,
                        valid_mask=ckv.mask[:, :, : width + w],
                    )
                    kp = gather_channels(
                        ckv.k[:, :, :sp_slots, :], prune.kept_channels
                    )
                    krest = ckv.k[:, :, sp_slots:, :]
                    return hidden, (krest, ckv.v, ckv.mask, ckv.positions,
                                    kp, prune.kept_channels.astype(jnp.int32))
            return hidden, (ckv.k, ckv.v, ckv.mask, ckv.positions)

        hidden, outs = jax.lax.scan(
            layer_fn, hidden0,
            (params["layers"], ctxs_,
             jnp.arange(spec.num_hidden_layers, dtype=jnp.int32)),
        )
        # last real token's hidden state lives on the last shard's last col
        last_local = hidden[:, -1, :]
        last = jax.lax.psum(
            jnp.where(me == p - 1, last_local, jnp.zeros_like(last_local)), axis
        )
        logits = _logits(last, params, spec)
        return (logits,) + tuple(outs)

    n_out = 7 if plan.think_narrow else 5
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P()),
        out_specs=(P(),) * n_out,
        check_vma=False,
    )
    outs = fn(tokens, true_len, ctxs)
    if plan.think_narrow:
        from ..cache import ThinKRegion

        logits, ck, cv, cm, cp, kp, kc = outs
        cache = KVCache(
            k=ck, v=cv, mask=cm, positions=cp,
            true_len=true_len.astype(jnp.int32),
            step=jnp.zeros((), jnp.int32),
            think=ThinKRegion(k_pruned=kp, kept_channels=kc),
        )
        return logits, cache
    logits, ck, cv, cm, cp = outs
    cache = KVCache(
        k=ck, v=cv, mask=cm, positions=cp,
        true_len=true_len.astype(jnp.int32), step=jnp.zeros((), jnp.int32),
    )
    if plan.spec.quant_method is not None:
        # The compressed cache is replicated and SMALL (cap slots), so the
        # region is quantized after the shard_map, per layer via vmap —
        # same storage as the single-chip scan's per-layer quantization
        # (models/llama.py prefill quant branch), so the engine's three
        # quantized decode paths work unchanged on an SP-produced cache.
        from ..ops.quant import quantize_kv_region

        qs = plan.spec
        sp_q = plan.prefill_slots
        reg = jax.vmap(lambda kk, vv: quantize_kv_region(
            kk, vv, nbits=qs.nbits, group_size=qs.q_group_size,
            outlier_threshold=(qs.outlier_threshold
                               if qs.quant_method == "kvquant" else None),
            layout=qs.q_layout,
        ))(cache.k[:, :, :, :sp_q, :], cache.v[:, :, :, :sp_q, :])
        cache = cache._replace(k=cache.k[:, :, :, sp_q:, :],
                               v=cache.v[:, :, :, sp_q:, :], quant=reg)
    if plan.segmented:
        from ..cache import segment_cache

        cache = segment_cache(cache, plan)
    return logits, cache
