"""H2O heavy-hitter scoring as a two-pass Pallas kernel.

H2O needs column sums of the FULL (q_len x q_len) softmax matrix
(/root/reference/pyramidkv/pyramidkv_utils.py:544-561 — with the reference
quirk that the causal mask touches only the trailing W x W block).  The XLA
blockwise path (`ops.scoring.h2o_scores`) measured 11.8 ms/layer at 4k on
v5e (~3% MXU); the logits never need to leave VMEM:

pass 1: per-row softmax statistics (m_i, l_i) via online max/sum tiles;
pass 2: column-block accumulation of exp(s_ij - m_i)/l_i over row tiles.

Both passes stream [block_q, block_k] tiles; nothing O(N^2) is
materialised.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _mask(rows, cols, pad, n, w):
    """H2O visibility: padding columns hidden; causal ONLY inside the
    trailing W x W block (reference quirk kept for parity)."""
    in_blk = (rows >= n - w) & (cols >= n - w)
    return (cols >= pad) & ~(in_blk & (cols > rows))


def _stats_kernel(pad_ref, q_ref, k_ref, m_ref, l_ref, m_acc, l_acc, *,
                  block_q, block_k, num_k_blocks, batch, n, w):
    # m_ref/l_ref blocks are [1, 8, block_q] — the stats are broadcast over
    # 8 sublanes purely to satisfy TPU tiling (see wrapper).
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    b = bh // (pl.num_programs(0) // batch)
    pad = pad_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_acc[:] = jnp.full_like(m_acc, _NEG_INF)
        l_acc[:] = jnp.zeros_like(l_acc)

    # q arrives pre-scaled (1/sqrt(d), and log2(e) for the base-2 softmax)
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    def _update(s):
        m_prev = m_acc[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        # masked entries (s == _NEG_INF) underflow to exactly 0 through the
        # clamped subtraction — no post-exp re-mask needed
        p = jnp.exp2(s - jnp.maximum(m_new, _NEG_INF / 2))
        alpha = jnp.exp2(jnp.minimum(m_prev - m_new, 0.0))
        l_acc[:] = jnp.broadcast_to(
            alpha * l_acc[:, :1] + jnp.sum(p, axis=1, keepdims=True),
            l_acc.shape,
        )
        m_acc[:] = jnp.broadcast_to(m_new, m_acc.shape)

    # only the trailing W x W block is causally masked (reference quirk):
    # tiles touching rows >= n-w AND cols >= n-w take the masked path,
    # every other tile past the left pad skips mask work entirely
    q0 = (n - w) // block_q  # first q-tile whose row_max reaches n-w
    k0 = (n - w) // block_k
    fast = ~((qi >= q0) & (ki >= k0)) & (pad <= ki * block_k)

    @pl.when(fast)
    def _fast():
        _update(s)

    @pl.when(~fast)
    def _slow():
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        _update(jnp.where(_mask(rows, cols, pad, n, w), s, _NEG_INF))

    @pl.when(ki == num_k_blocks - 1)
    def _fin():
        m_ref[0] = jnp.broadcast_to(m_acc[:, 0][None, :], (8, block_q))
        l_ref[0] = jnp.broadcast_to(l_acc[:, 0][None, :], (8, block_q))


def _colsum_kernel(pad_ref, q_ref, k_ref, m_ref, l_ref, out_ref, acc, *,
                   block_q, block_k, num_q_blocks, batch, n, w):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)
    b = bh // (pl.num_programs(0) // batch)
    pad = pad_ref[b]

    @pl.when(qi == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = m_ref[0, 0][:, None]   # [bq, 1]
    l = l_ref[0, 0][:, None]
    p0 = jnp.exp2(s - jnp.maximum(m, _NEG_INF / 2)) / jnp.maximum(l, 1e-30)

    def _add(p):
        acc[:] = acc[:] + jnp.broadcast_to(
            jnp.sum(p, axis=0, keepdims=True), acc.shape)

    # fast iff the tile avoids the trailing W x W block, sits past the left
    # pad (columns AND rows — padding rows contribute nothing)
    q0 = (n - w) // block_q
    k0 = (n - w) // block_k
    fast = (~((qi >= q0) & (ki >= k0))
            & (pad <= ki * block_k) & (pad <= qi * block_q))

    @pl.when(fast)
    def _fast():
        _add(p0)

    @pl.when(~fast)
    def _slow():
        rows = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        cols = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1)
        # zero masked entries and padding ROWS
        _add(jnp.where(_mask(rows, cols, pad, n, w) & (rows >= pad), p0, 0.0))

    @pl.when(qi == num_q_blocks - 1)
    def _fin():
        out_ref[0] = jnp.broadcast_to(acc[0, :][None, :], (8, block_k))


@functools.partial(
    jax.jit, static_argnames=("window_size", "block_q", "block_k", "interpret")
)
def h2o_scores_pallas(
    q: jax.Array,
    k: jax.Array,
    *,
    window_size: int,
    true_len: jax.Array,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ``ops.scoring.h2o_scores``:
    q [B, H, N, D], k [B, Hk, N, D] -> [B, H, N - W] fp32 scores, -inf at
    padding columns.  Hk may be num_kv_heads (GQA): each query-head grid row
    reads its group's KV-head key block via the BlockSpec index map — no
    repeat_kv materialisation (same contract as ``ops.scoring.h2o_scores``)."""
    b, h, n, d = q.shape
    hk = k.shape[1]
    assert h % hk == 0, (h, hk)
    g = h // hk
    w = window_size
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    assert n % block_q == 0 and n % block_k == 0
    nq, nk = n // block_q, n // block_k
    # base-2 online softmax: fold 1/sqrt(d) * log2(e) into q once
    scale = math.log2(math.e) / math.sqrt(d)
    pad = (n - true_len).astype(jnp.int32)
    qr = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, d)
    kr = k.reshape(b * hk, n, d)

    def _krow(bh):
        """Grid row bh = b_idx*h + h_idx -> KV buffer row b_idx*hk + h_idx//g."""
        return (bh // h) * hk + (bh % h) // g

    stats = pl.pallas_call(
        functools.partial(
            _stats_kernel, block_q=block_q, block_k=block_k,
            num_k_blocks=nk, batch=b, n=n, w=w,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, ki, pad: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, d),
                             lambda bh, qi, ki, pad: (_krow(bh), ki, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, block_q), lambda bh, qi, ki, pad: (bh, 0, qi)),
                pl.BlockSpec((1, 8, block_q), lambda bh, qi, ki, pad: (bh, 0, qi)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, 8, n), jnp.float32),
            jax.ShapeDtypeStruct((b * h, 8, n), jnp.float32),
        ],
        interpret=interpret,
    )(pad, qr, kr)
    m_rows, l_rows = stats

    colsums = pl.pallas_call(
        functools.partial(
            _colsum_kernel, block_q=block_q, block_k=block_k,
            num_q_blocks=nq, batch=b, n=n, w=w,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, nk, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, ki, qi, pad: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, d),
                             lambda bh, ki, qi, pad: (_krow(bh), ki, 0)),
                pl.BlockSpec((1, 8, block_q), lambda bh, ki, qi, pad: (bh, 0, qi)),
                pl.BlockSpec((1, 8, block_q), lambda bh, ki, qi, pad: (bh, 0, qi)),
            ],
            out_specs=pl.BlockSpec((1, 8, block_k),
                                   lambda bh, ki, qi, pad: (bh, 0, ki)),
            scratch_shapes=[pltpu.VMEM((8, block_k), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, 8, n), jnp.float32),
        interpret=interpret,
    )(pad, qr, kr, m_rows, l_rows)

    scores = colsums[:, 0, :].reshape(b, h, n)[..., : n - w]
    col = jnp.arange(n - w, dtype=jnp.int32)
    valid = col[None, :] >= pad[:, None]
    return jnp.where(valid[:, None, :], scores, -jnp.inf)
