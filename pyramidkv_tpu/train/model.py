"""Full-sequence training forward over the inference model's EXACT
parameter pytree and math.

Reuses `models.llama`'s building blocks (`rms_norm`, `_qkv`,
`apply_rope`, `_mlp`) and `ops.attention.causal_prefill_attention` (the
blockwise causal attention the engine's XLA prefill uses), so trained
parameters drop straight into `Engine` with no conversion — the
train/infer parity test pins last-position logits equal to
`llama.prefill` under a fullkv plan.

Differences from the inference prefill: logits at EVERY position (the
inference path projects only the last hidden row), layers scanned with
``jax.checkpoint`` (rematerialised backward), f32 params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelSpec
from ..models.llama import (_mlp, _qkv, apply_rope, rms_norm,
                            rope_inv_freq)
from ..models.weights import embed_lookup, mm


def forward_logits(params: dict, spec: ModelSpec, tokens: jax.Array,
                   use_rope: bool = True) -> jax.Array:
    """tokens [B, N] (right-padded or full) -> logits [B, N, V] f32.

    Causal attention over the whole buffer (true_len = N: training
    sequences are full/right-padded and padding columns never contribute
    to the loss, so masking them out of attention is unnecessary)."""
    b, n = tokens.shape
    inv_freq = rope_inv_freq(spec)
    positions = jnp.arange(n, dtype=jnp.int32)[None, :].repeat(b, axis=0)
    if not use_rope:   # NoPE diagnostic (causal mask gives implicit order)
        positions = jnp.zeros_like(positions)
    true_len = jnp.full((b,), n, jnp.int32)
    act_dtype = params["final_norm"].dtype
    hidden = embed_lookup(params["embed"], tokens, act_dtype)
    unit = spec.rmsnorm_unit_offset

    from ..ops.attention import causal_prefill_attention

    @jax.checkpoint
    def layer_fn(hidden, wts):
        x = rms_norm(hidden, wts["attn_norm"], spec.rms_norm_eps, unit)
        q, k, v = _qkv(x, wts, spec)
        q = apply_rope(q, positions, inv_freq)
        k = apply_rope(k, positions, inv_freq)
        attn = causal_prefill_attention(
            q, k, v, true_len=true_len, block=min(512, n),
            sliding_window=spec.sliding_window)
        h = attn.transpose(0, 2, 1, 3).reshape(b, n, -1)
        hidden = hidden + mm(h.astype(act_dtype), wts["wo"])
        x = rms_norm(hidden, wts["mlp_norm"], spec.rms_norm_eps, unit)
        hidden = hidden + _mlp(x, wts, hidden_act=spec.hidden_act)
        return hidden, None

    hidden, _ = jax.lax.scan(layer_fn, hidden, params["layers"])
    hidden = rms_norm(hidden, params["final_norm"], spec.rms_norm_eps, unit)
    if spec.tie_word_embeddings:
        w = params["embed"].astype(jnp.float32)
        logits = jnp.einsum("bnd,vd->bnv", hidden.astype(jnp.float32), w)
    else:
        logits = jnp.einsum("bnd,dv->bnv", hidden.astype(jnp.float32),
                            params["lm_head"].astype(jnp.float32))
    return logits


def loss_fn(params: dict, spec: ModelSpec, tokens: jax.Array,
            weights: jax.Array, use_rope: bool = True) -> jax.Array:
    """Weighted next-token cross entropy.

    ``weights`` [B, N] applies to the PREDICTION of token t+1 made at
    position t — i.e. weight[t+1] gates logits[t] vs target tokens[t+1]
    (answer tokens carry 1.0, context a small LM weight, padding 0)."""
    logits = forward_logits(params, spec, tokens,
                            use_rope=use_rope)             # [B, N, V]
    targets = tokens[:, 1:]                                 # [B, N-1]
    w = weights[:, 1:].astype(jnp.float32)
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(
        logp, targets[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
