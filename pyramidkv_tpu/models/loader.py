"""HF checkpoint -> JAX parameter pytree.

Replaces the reference's ``AutoModelForCausalLM.from_pretrained(...,
device_map="auto")`` weight path (/root/reference/run_longbench.py:386-393)
with a direct safetensors -> (optionally sharded) ``jax.Array`` load: no
torch in the serving path, weights go straight from the memory-mapped
checkpoint into device buffers with the target sharding, layer-stacked for
the scan layout of ``models.llama``.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelSpec


def spec_from_hf_dir(model_dir: str) -> ModelSpec:
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    name = cfg.get("model_type", "llama")
    return ModelSpec.from_hf(cfg, name=name)


def _open_safetensors(model_dir: str):
    """Yield (name, numpy array) for every tensor in the checkpoint."""
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    else:
        files = [
            f for f in sorted(os.listdir(model_dir)) if f.endswith(".safetensors")
        ]
    for fname in files:
        with safe_open(os.path.join(model_dir, fname), framework="numpy") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def load_params_from_hf(
    model_dir: str,
    spec: Optional[ModelSpec] = None,
    dtype=jnp.bfloat16,
    device_put_fn=None,
) -> dict:
    """Load an HF Llama/Mistral safetensors checkpoint into the stacked
    parameter layout of :mod:`pyramidkv_tpu.models.llama`.

    Args:
      device_put_fn: optional ``f(path_tuple, np_array) -> jax.Array`` used to
        place each stacked tensor (e.g. with a NamedSharding for tensor
        parallelism).  Defaults to plain ``jnp.asarray``.
    """
    spec = spec or spec_from_hf_dir(model_dir)
    L = spec.num_hidden_layers
    staging: dict = {"layers": {}}
    per_layer: dict = {}

    for name, arr in _open_safetensors(model_dir):
        arr = np.asarray(arr)
        if name == "model.embed_tokens.weight":
            staging["embed"] = arr
        elif name == "model.norm.weight":
            staging["final_norm"] = arr
        elif name == "lm_head.weight":
            staging["lm_head"] = arr.T  # torch [out,in] -> [in,out]
        elif name.startswith("model.layers."):
            parts = name.split(".")
            idx = int(parts[2])
            sub = ".".join(parts[3:])
            per_layer.setdefault(sub, {})[idx] = arr
        # rotary inv_freq buffers etc. are recomputed, not loaded

    name_map = {
        "self_attn.q_proj.weight": "wq",
        "self_attn.k_proj.weight": "wk",
        "self_attn.v_proj.weight": "wv",
        "self_attn.o_proj.weight": "wo",
        "input_layernorm.weight": "attn_norm",
        "post_attention_layernorm.weight": "mlp_norm",
    }
    if spec.post_block_norms:
        # Gemma-2 block: input/post_attention wrap attention;
        # pre/post_feedforward wrap the MLP (modeling_gemma2.py)
        name_map.update({
            "post_attention_layernorm.weight": "attn_post_norm",
            "pre_feedforward_layernorm.weight": "mlp_norm",
            "post_feedforward_layernorm.weight": "mlp_post_norm",
        })
    if spec.attention_bias:
        # Qwen2: QKV biases (1-D rows, no transpose; o_proj has none)
        name_map.update({
            "self_attn.q_proj.bias": "bq",
            "self_attn.k_proj.bias": "bk",
            "self_attn.v_proj.bias": "bv",
        })
    E = spec.num_local_experts
    if E:
        # Mixtral MoE: router + per-expert SwiGLU (w1=gate, w3=up, w2=down)
        name_map["block_sparse_moe.gate.weight"] = "router"
        for m in range(E):
            name_map[f"block_sparse_moe.experts.{m}.w1.weight"] = f"_e{m}_gate"
            name_map[f"block_sparse_moe.experts.{m}.w3.weight"] = f"_e{m}_up"
            name_map[f"block_sparse_moe.experts.{m}.w2.weight"] = f"_e{m}_down"
    else:
        name_map.update({
            "mlp.gate_proj.weight": "w_gate",
            "mlp.up_proj.weight": "w_up",
            "mlp.down_proj.weight": "w_down",
        })
    put = device_put_fn or (lambda path, x: jnp.asarray(x, dtype=dtype))

    params: dict = {"layers": {}}
    staged_layers: dict = {}
    for hf_name, ours in name_map.items():
        if hf_name not in per_layer:
            raise ValueError(f"checkpoint missing {hf_name}")
        rows = per_layer[hf_name]
        assert len(rows) == L, (hf_name, len(rows), L)
        mats = [rows[i] for i in range(L)]
        if (hf_name.endswith("proj.weight") or ".experts." in hf_name
                or hf_name.endswith("gate.weight")):
            mats = [m.T for m in mats]  # torch [out,in] -> [in,out]
        staged_layers[ours] = np.stack(mats, axis=0)
    if E:
        # stack the per-expert mats along a new E axis: [L, E, in, out]
        for kind in ("gate", "up", "down"):
            exp = np.stack(
                [staged_layers.pop(f"_e{m}_{kind}") for m in range(E)], axis=1
            )
            staged_layers[f"w_{kind}"] = exp
    for ours, stacked in staged_layers.items():
        params["layers"][ours] = put(("layers", ours), stacked)

    params["embed"] = put(("embed",), staging["embed"])
    params["final_norm"] = put(("final_norm",), staging["final_norm"])
    if spec.tie_word_embeddings:
        pass
    elif "lm_head" in staging:
        params["lm_head"] = put(("lm_head",), staging["lm_head"])
    else:
        raise ValueError("untied checkpoint without lm_head.weight")
    return params
