"""Ring attention: sequence-sharded causal attention over a device ring.

The reference has NO mechanical long-context scaling — its long-context
story is compression + hard truncation (SURVEY §5).  This op is the
TPU-native extension: the sequence dimension is sharded over a mesh axis;
K/V shards rotate around the ring via ``ppermute`` (ICI neighbours) while
every device accumulates online-softmax partial attention for its local
query rows.  Peak per-device memory is O(N/P · block) regardless of total
sequence length.

Usage (inside shard_map, or via the convenience wrapper below):

    out = ring_causal_attention_sharded(q, k, v, mesh, axis="sp")

Current integration status: standalone op with single-device-parity tests
(CPU mesh); wiring into the prefill+compression pipeline (global top-k over
sharded scores) is the round-2 item noted in PARITY.md.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _ring_body(q, k, v, true_len, axis_name: str, *, scale=None,
               softcap=None, sliding_window=None):
    """Per-shard computation (runs under shard_map).

    q: [B, H, Nl, D]; k, v: [B, Hk, Nl, D] — this device's sequence shard
    (global layout: shard p owns rows [p*Nl, (p+1)*Nl)).  Hk may be
    num_kv_heads (grouped-query): only the KV heads rotate around the ring,
    cutting ICI traffic by the group factor.
    true_len: [B] GLOBAL true length (left padding at the global front).
    scale/softcap: Gemma-2 attention semantics (``query_pre_attn_scalar``
    softmax scale, tanh logit soft-capping applied to the SCALED logits
    before masking — same order as ``ops.attention._scale_softcap``).
    sliding_window: key j visible to query i only when i - j < window; may
    be a traced scalar (the SP path passes a per-layer value so Gemma-2's
    alternating sliding/full layers need no collective-carrying lax.cond).
    """
    p = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    hk = k.shape[1]
    grouped = hk != h
    if grouped:
        g = h // hk
        qg = q.reshape(b, hk, g, nl, d)
    n = nl * p
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    pad = (n - true_len).astype(jnp.int32)  # [B]

    rows = me * nl + jnp.arange(nl, dtype=jnp.int32)  # global row ids [Nl]

    def step(carry, s_idx):
        acc, m, l, kc, vc = carry
        # kc/vc currently hold the shard originally owned by device
        # (me - s_idx) mod p
        src = (me - s_idx) % p
        cols = src * nl + jnp.arange(nl, dtype=jnp.int32)  # [Nl]
        if grouped:
            s = jnp.einsum(
                "bkgqd,bkcd->bkgqc", qg, kc, preferred_element_type=jnp.float32
            ).reshape(b, h, nl, nl) * scale
        else:
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", q, kc, preferred_element_type=jnp.float32
            ) * scale
        if softcap is not None:
            s = jnp.tanh(s * (1.0 / softcap)) * softcap
        causal = cols[None, :] <= rows[:, None]
        if sliding_window is not None:
            causal &= (rows[:, None] - cols[None, :]) < sliding_window
        mask = causal[None, None] & (
            cols[None, None, None, :] >= pad[:, None, None, None]
        )
        s = jnp.where(mask, s, _NEG_INF)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        pexp = jnp.exp(s - jnp.maximum(m_new, _NEG_INF / 2))
        pexp = jnp.where(mask, pexp, 0.0)
        alpha = jnp.exp(jnp.minimum(m - m_new, 0.0))
        alpha = jnp.where(m <= _NEG_INF / 2, 0.0, alpha)
        l_new = alpha * l + pexp.sum(-1, keepdims=True)
        pv = pexp.astype(vc.dtype)
        if grouped:
            upd = jnp.einsum(
                "bkgqc,bkcd->bkgqd", pv.reshape(b, hk, g, nl, nl), vc,
                preferred_element_type=jnp.float32,
            ).reshape(b, h, nl, d)
        else:
            upd = jnp.einsum(
                "bhqk,bhkd->bhqd", pv, vc, preferred_element_type=jnp.float32
            )
        acc_new = acc * alpha + upd
        # rotate K/V shards one step around the ring
        perm = [(i, (i + 1) % p) for i in range(p)]
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return (acc_new, m_new, l_new, kc, vc), None

    acc0 = jnp.zeros((b, h, nl, d), jnp.float32)
    m0 = jnp.full((b, h, nl, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, nl, 1), jnp.float32)
    (acc, m, l, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), jnp.arange(p)
    )
    out = acc / jnp.where(l == 0.0, 1.0, l)
    return out.astype(q.dtype)


def ring_causal_attention_sharded(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    true_len: jax.Array,
    mesh: Mesh,
    axis: str = "model",
) -> jax.Array:
    """Causal attention with the SEQUENCE dim sharded over ``axis``.

    q, k, v: [B, H, N, D] with N divisible by the axis size; inputs may be
    unsharded (shard_map partitions them).  Returns [B, H, N, D].
    """
    n = q.shape[2]
    p = mesh.shape[axis]
    assert n % p == 0, (n, p)
    fn = jax.shard_map(
        functools.partial(_ring_body, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, None, axis, None),) * 3 + (P(),),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )
    return fn(q, k, v, true_len)
