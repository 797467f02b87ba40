"""Device mesh and sharding layouts.

The reference has NO real parallelism: multi-GPU is HF ``accelerate``'s
``device_map="auto"`` layer placement (pipeline-ish, one layer block per GPU,
activations hop devices — /root/reference/run_longbench.py:390) and a dead
``tensor_parallel`` import (run_needle_in_haystack.py:21,208).  The TPU-native
design replaces that with one SPMD mesh ``(data, model)``:

- **data** axis: batch dimension of every activation/cache tensor (requests).
- **model** axis: attention heads + MLP intermediate dim (megatron-style
  column/row sharding), KV-cache head axis, vocab dim of embed/lm_head.

XLA inserts the all-reduces after ``wo``/``w_down`` contractions
automatically (GSPMD); collectives ride ICI inside a slice.  Multi-host
scale-out uses the same mesh built from ``jax.devices()`` after
``jax.distributed.initialize``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelSpec


def make_mesh(
    shape: Sequence[int] = (1, 1),
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    assert n <= len(devices), f"mesh {shape} needs {n} devices, have {len(devices)}"
    dev = np.asarray(devices[:n]).reshape(*shape)
    return Mesh(dev, tuple(axis_names))


def param_pspecs(spec: ModelSpec) -> dict:
    """PartitionSpecs matching the stacked param pytree of models.llama.

    Column-parallel: wq/wk/wv/w_gate/w_up shard their OUTPUT dim over
    ``model``; row-parallel: wo/w_down shard their INPUT dim, so XLA emits
    one all-reduce per attention/MLP block (the Megatron pattern, expressed
    purely through shardings).  Embed/lm_head shard the vocab dim.
    """
    lp = {
        "wq": P(None, None, "model"),
        "wk": P(None, None, "model"),
        "wv": P(None, None, "model"),
        "wo": P(None, "model", None),
        "attn_norm": P(None, None),
        "mlp_norm": P(None, None),
    }
    if spec.post_block_norms:
        lp["attn_post_norm"] = P(None, None)
        lp["mlp_post_norm"] = P(None, None)
    if spec.attention_bias:
        # QKV biases follow their matmul's OUT (column-parallel) axis
        lp["bq"] = P(None, "model")
        lp["bk"] = P(None, "model")
        lp["bv"] = P(None, "model")
    if spec.num_local_experts:
        # expert parallelism: the EXPERT axis shards over `model` — each
        # chip computes its local experts' SwiGLU for all tokens and the
        # routed weighted sum reduces with one psum (no dispatch gathers)
        lp["router"] = P(None, None, None)
        lp["w_gate"] = P(None, "model", None, None)
        lp["w_up"] = P(None, "model", None, None)
        lp["w_down"] = P(None, "model", None, None)
    else:
        lp["w_gate"] = P(None, None, "model")
        lp["w_up"] = P(None, None, "model")
        lp["w_down"] = P(None, "model", None)
    out = {
        "embed": P("model", None),
        "final_norm": P(None),
        "layers": lp,
    }
    if not spec.tie_word_embeddings:
        out["lm_head"] = P(None, "model")
    return out


def param_shardings(spec: ModelSpec, mesh: Mesh) -> dict:
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, p),
        param_pspecs(spec),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, spec: ModelSpec, mesh: Mesh) -> dict:
    """Place a param pytree on the mesh.  int8-quantized leaves
    (models.weights.QuantW) shard their codes with the weight's spec and
    the per-output-channel scale with the spec's LAST axis (per-row for the
    embedding, whose scales follow the vocab axis)."""
    from ..models.weights import QuantW

    pspecs = param_pspecs(spec)

    def place(path, v, p):
        if isinstance(v, QuantW):
            axes = list(p)
            if path and path[0] == "embed":
                scale_p = P(axes[0])          # per-row (vocab) scales
            elif v.scale.ndim == v.codes.ndim:
                # group-wise: [..., G, out] — G replicated, out follows
                scale_p = P(*axes[:-2], None, axes[-1])
            else:
                scale_p = P(*axes[:-2], axes[-1])  # per-out-channel scales
            return QuantW(
                codes=jax.device_put(v.codes, NamedSharding(mesh, p)),
                scale=jax.device_put(v.scale, NamedSharding(mesh, scale_p)),
            )
        return jax.device_put(v, NamedSharding(mesh, p))

    def walk(path, pv, pp):
        if isinstance(pv, dict):
            return {k: walk(path + (k,), pv[k], pp[k]) for k in pv}
        return place(path, pv, pp)

    return walk((), params, pspecs)


def cache_pspec() -> P:
    """KVCache k/v/mask/positions: [L, B, H, S, (D)] — batch over data,
    heads over model (each chip holds its heads' compressed slots; decode
    attention then needs NO cross-chip traffic for the cache)."""
    return P(None, "data", "model")


def data_pspec() -> P:
    """Token/activation batch dim over data axis."""
    return P("data")


def validate_divisibility(spec: ModelSpec, mesh: Mesh) -> None:
    tp = mesh.shape.get("model", 1)
    assert spec.num_attention_heads % tp == 0, (
        f"num_attention_heads {spec.num_attention_heads} not divisible by model axis {tp}"
    )
    if spec.num_local_experts:
        assert spec.num_local_experts % tp == 0, (
            f"num_local_experts {spec.num_local_experts} not divisible by "
            f"model axis {tp}"
        )
    assert spec.num_key_value_heads % tp == 0, (
        f"num_key_value_heads {spec.num_key_value_heads} not divisible by model axis {tp}"
    )
    assert spec.intermediate_size % tp == 0
