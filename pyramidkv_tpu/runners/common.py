"""Shared CLI plumbing for the eval runners.

Mirrors the reference runners' flag surface (/root/reference/
run_longbench.py:321-367: --method, --model_path, --max_capacity_prompts,
--attn_implementation, --quant_method/--nbits, --merge, --floor,
--head_path/--head_beta, --pruning_ratio/--recent_size) but builds our
owned engine instead of monkeypatching transformers.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np

from ..config import (
    CompressionSpec,
    EngineSpec,
    ModelSpec,
    headkv_capacity_from_scores,
    load_headkv_scores,
)
from ..engine import Engine
from ..evalsuite.tasks import model_family_max_len


def add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model_path", type=str, required=True,
                   help="HF checkpoint dir (config.json + safetensors)")
    p.add_argument("--model_name", type=str, default=None)
    p.add_argument("--method", type=str, default="fullkv")
    p.add_argument("--max_capacity_prompts", type=int, default=512)
    p.add_argument("--max_capacity_prompts_ratio", type=float, default=-1)
    p.add_argument("--window_size", type=int, default=8)
    p.add_argument("--kernel_size", type=int, default=7)
    p.add_argument("--pooling", type=str, default="maxpool")
    p.add_argument("--merge", type=str, default=None, choices=[None, "pivot"])
    p.add_argument("--floor", type=float, default=0.2, help="AdaKV floor ratio")
    p.add_argument("--normalize", action="store_true", default=True)
    p.add_argument("--head_path", type=str, default=None,
                   help="HeadKV heads_score JSON")
    p.add_argument("--head_beta", type=float, default=1.005)
    p.add_argument("--pruning_ratio", type=float, default=0.4, help="ThinK")
    p.add_argument("--recent_size", type=int, default=32, help="ThinK")
    p.add_argument("--minference_config", type=str, default=None,
                   help="MInference per-layer/per-head pattern JSON (the "
                        "reference's MODEL2PATH format, minference.py:9-12)"
                        "; omitted = uniform online-estimated budgets")
    p.add_argument("--quant_method", type=str, default=None,
                   choices=[None, "kivi", "kvquant"])
    p.add_argument("--nbits", type=int, default=8)
    p.add_argument("--gqa_aggregate", action="store_true",
                   help="store num_kv_heads cache entries (group-mean scores)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--quant_weights", type=str, default=None,
                   choices=[None, "int8", "int4"],
                   help="quantized weights (per-out-channel scales; int8 "
                        "halves the weight HBM — fits 32-layer 8B on one "
                        "16 GB chip — int4 halves it again)")
    p.add_argument("--quant_weights_group_size", type=int, default=None,
                   help="AWQ-style group size for weight scales (e.g. 128;"
                        " recommended with int4)")
    p.add_argument("--quant_lm_head", type=str, default=None,
                   choices=[None, "int8", "int4"],
                   help="override the lm_head width (default int8 whenever "
                        "--quant_weights is set; int4 halves the fixed "
                        "per-step vocab-projection read)")
    p.add_argument("--q_layout", type=str, default="group",
                   choices=["group", "pa"],
                   help="KV-quant group layout: 'group' = HQQ group-64 on "
                        "the KIVI axes (reference parity); 'pa' = per-axis "
                        "(per-channel K / per-token V, the KIVI paper's "
                        "axes) — decodes through the factored fused path "
                        "at packed-code bandwidth, ~1.5x group's K "
                        "roundtrip error")
    p.add_argument("--quant_lm_head_pad", type=int, default=None,
                   help="zero-pad the lm_head vocab axis to this multiple "
                        "before quantizing (e.g. 2048): power-of-two kernel "
                        "tiles for odd vocab widths; logits sliced back — "
                        "bit-identical outputs")
    p.add_argument("--speculative", type=str, default=None,
                   choices=[None, "ngram"],
                   help="speculative decoding (greedy, B=1): on-device "
                        "prompt-lookup drafts verified spec_draft_len at a "
                        "time — output tokens are unchanged")
    p.add_argument("--spec_ngram", type=int, default=3)
    p.add_argument("--spec_draft_len", type=int, default=8)
    p.add_argument("--temperature", type=float, default=None,
                   help="enable sampling with this temperature (default: greedy)")
    p.add_argument("--top_k", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_num_examples", type=int, default=None)
    p.add_argument("--model_max_len", type=int, default=None,
                   help="override the model-family context cap "
                        "(run_longbench.py:75-81 model2maxlen)")
    p.add_argument("--sample_method", type=str, default="topk")
    p.add_argument("--use_pallas", action="store_true", default=None)
    p.add_argument("--moe_capacity_factor", type=float, default=None,
                   help="MoE prefill capacity factor (None = exact dense-"
                        "all-experts; >= E/top_k is drop-free)")
    p.add_argument("--platform", type=str, default=None,
                   choices=[None, "cpu", "tpu"],
                   help="force a jax backend BEFORE initialization (the "
                        "axon image pins a TPU tunnel that env vars can't "
                        "override; use cpu for pipeline smoke runs)")


def set_seed(seed: int) -> None:
    np.random.seed(seed)
    random.seed(seed)


def build_compression_spec(args, model_spec: ModelSpec) -> CompressionSpec:
    method = args.method.lower()
    window = args.window_size
    kw = dict(
        method=method,
        max_capacity_prompt=args.max_capacity_prompts,
        window_size=window,
        kernel_size=args.kernel_size,
        pooling=args.pooling,
        merge=args.merge,
        floor_ratio=args.floor,
        normalize=args.normalize,
        pruning_ratio=args.pruning_ratio,
        recent_size=args.recent_size,
        quant_method=args.quant_method,
        nbits=args.nbits,
        q_layout=getattr(args, "q_layout", "group"),
        gqa_aggregate=args.gqa_aggregate,
    )
    if method == "headkv":
        if not args.head_path:
            raise SystemExit("--head_path required for headkv")
        scores = load_headkv_scores(args.head_path)
        kw["head_capacity"] = headkv_capacity_from_scores(
            scores,
            model_spec.num_hidden_layers,
            model_spec.num_attention_heads,
            args.max_capacity_prompts,
            head_beta=args.head_beta,
        )
    if method == "minference" and getattr(args, "minference_config", None):
        from ..config import load_minference_pattern_config

        kw["minference_pattern_config"] = load_minference_pattern_config(
            args.minference_config,
            model_spec.num_hidden_layers,
            model_spec.num_attention_heads,
        )
    return CompressionSpec(**kw)


def apply_platform(args) -> None:
    """Honor --platform before any jax computation runs. jax.config works
    where the JAX_PLATFORMS env var is ignored (the axon sitecustomize
    pre-imports jax and pins its tunnel backend)."""
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)


def build_engine(args, max_new_tokens: int, model_max_len: int) -> "tuple":
    """Returns (engine, tokenizer, model_name, model_max_len)."""
    apply_platform(args)
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from ..models.loader import load_params_from_hf, spec_from_hf_dir

    model_name = args.model_name or os.path.basename(args.model_path.rstrip("/"))
    spec = spec_from_hf_dir(args.model_path)
    if getattr(args, "moe_capacity_factor", None):
        import dataclasses

        spec = dataclasses.replace(
            spec, moe_capacity_factor=args.moe_capacity_factor)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
             "float16": jnp.float16}[args.dtype]
    params = load_params_from_hf(args.model_path, spec, dtype=dtype)
    if getattr(args, "quant_weights", None):
        from ..models.weights import quantize_weights

        from ..models.weights import fuse_packed_matmuls

        lm_nb = getattr(args, "quant_lm_head", None)
        params = quantize_weights(
            params, nbits=int(args.quant_weights.removeprefix("int")),
            group_size=getattr(args, "quant_weights_group_size", None),
            lm_head_nbits=int(lm_nb.removeprefix("int")) if lm_nb else None,
            lm_head_pad_to=getattr(args, "quant_lm_head_pad", None))
        # int4: QKV / gate+up out-axis fusion (one decode-kernel launch
        # per group; bit-identical math — weights.fuse_packed_matmuls)
        params = fuse_packed_matmuls(params)
    comp = build_compression_spec(args, spec)
    # buckets: powers-of-two style ladder up to the model cap
    buckets = tuple(
        b for b in (1024, 2048, 4096, 8192, 16384, 32768)
        if b <= model_max_len * 2
    ) or (model_max_len,)
    eng = Engine(
        spec, comp,
        EngineSpec(
            max_new_tokens=max_new_tokens, prefill_buckets=buckets,
            greedy=args.temperature is None,
            temperature=args.temperature or 1.0,
            sample_top_k=args.top_k,
            speculative=getattr(args, "speculative", None),
            spec_ngram=getattr(args, "spec_ngram", 3),
            spec_draft_len=getattr(args, "spec_draft_len", 8),
        ),
        params,
    )
    tokenizer = AutoTokenizer.from_pretrained(args.model_path, padding_side="left")
    if tokenizer.pad_token is None and tokenizer.eos_token is not None:
        tokenizer.pad_token = tokenizer.eos_token
    return eng, tokenizer, model_name, model_max_len


def resolve_model_max_len(args) -> int:
    if getattr(args, "model_max_len", None):
        return args.model_max_len
    name = args.model_name or os.path.basename(args.model_path.rstrip("/"))
    return model_family_max_len(name)
