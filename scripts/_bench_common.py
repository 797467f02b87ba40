"""Shared TPU-bench harness helpers (round-3 consolidation of the ~30
`tpu_round2*_bench.py` one-off drivers — VERDICT r2 weak #6).

Every TPU measurement script builds the same pieces: the full-depth
Llama-3-8B geometry, random packed-int4 weights in the real checkpoint
layout, an Engine, and a timed `generate` that emits one JSON row per
config.  Those live here exactly once; round-3+ scripts import them.

Measurement discipline (CLAUDE.md): engine-level host-observed wall
times only — standalone per-kernel timings through the axon tunnel have
a ~29 ms floor, so microbenches must amortise over many iterations
INSIDE one jit (see `time_loop_ms`).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models.weights import QuantW, fuse_packed_matmuls


def make_logger(tag: str):
    def log(msg):
        print(f"[{tag}] {msg}", file=sys.stderr, flush=True)

    return log


def emit(row: dict):
    print(json.dumps(row), flush=True)


def spec_depth(layers: int, max_pos: int = 131072) -> ModelSpec:
    """Llama-3-8B geometry truncated to ``layers`` decoder layers."""
    return ModelSpec(
        name=f"llama3-8b-d{layers}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=max_pos,
    )


def random_int4_params(spec: ModelSpec, key, fused: bool = True,
                       lm_head_nbits: int = 8,
                       lm_head_pad_to: int | None = None) -> dict:
    """Random packed-int4 weights in the real checkpoint layout (QuantW
    codes = two nibbles/byte, int8 embed/lm_head) so benches exercise the
    same fused dequant-matmul path as a quantized real checkpoint.
    ``fused`` applies `weights.fuse_packed_matmuls` (wqkv / w_gateup —
    the runners do this after ``--quant_weights int4``);
    ``lm_head_nbits=4`` packs the lm_head too (--quant_lm_head int4);
    ``lm_head_pad_to`` mirrors quantize_weights(lm_head_pad_to=...) —
    zero-padded vocab columns, logits sliced back by the model."""
    ks = iter(jax.random.split(key, 16))
    L, Dm, I = spec.num_hidden_layers, spec.hidden_size, spec.intermediate_size
    H, KV, Dh, V = (spec.num_attention_heads, spec.num_key_value_heads,
                    spec.head_dim, spec.vocab_size)
    Vp = V
    if lm_head_pad_to and V % lm_head_pad_to:
        Vp = V + lm_head_pad_to - V % lm_head_pad_to

    def qw(shape):
        fan_in = shape[-2]
        codes = jax.random.randint(
            next(ks), shape[:-1] + (shape[-1] // 2,), -128, 128, jnp.int8)
        sval = 1.0 / (7.0 * np.sqrt(fan_in))
        return QuantW(codes=codes,
                      scale=jnp.full(shape[:-2] + (shape[-1],), sval,
                                     jnp.float32))

    emb_codes = jax.random.randint(next(ks), (V, Dm), -127, 128, jnp.int8)
    if lm_head_nbits == 4:
        lm_head = QuantW(
            codes=jax.random.randint(next(ks), (Dm, Vp // 2), -128, 128,
                                     jnp.int8),
            scale=jnp.full((Vp,), 1.0 / (7.0 * np.sqrt(Dm)), jnp.float32))
    else:
        lm_head = QuantW(
            codes=jax.random.randint(next(ks), (Dm, Vp), -127, 128,
                                     jnp.int8),
            scale=jnp.full((Vp,), 1.0 / (127.0 * np.sqrt(Dm)), jnp.float32))
    params = {
        "embed": QuantW(codes=emb_codes,
                        scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": jnp.ones((Dm,), jnp.bfloat16),
        "lm_head": lm_head,
        "layers": {
            "wq": qw((L, Dm, H * Dh)),
            "wk": qw((L, Dm, KV * Dh)),
            "wv": qw((L, Dm, KV * Dh)),
            "wo": qw((L, H * Dh, Dm)),
            "w_gate": qw((L, Dm, I)),
            "w_up": qw((L, Dm, I)),
            "w_down": qw((L, I, Dm)),
            "attn_norm": jnp.ones((L, Dm), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, Dm), jnp.bfloat16),
        },
    }
    return fuse_packed_matmuls(params) if fused else params


def build_engine(spec, params, method="snapkv", ctx=4096, cap=128,
                 window=8, max_new=128, batch=1, prefill_block=512,
                 comp_kw=None, eng_kw=None) -> Engine:
    del batch  # batch is a generate-time property; kept for call-site clarity
    es_kw = dict(max_new_tokens=max_new, prefill_buckets=(ctx,),
                 prefill_block=prefill_block)
    es_kw.update(eng_kw or {})  # callers may override the bucket ladder
    return Engine(
        spec,
        CompressionSpec(method=method, max_capacity_prompt=cap,
                        window_size=window, **(comp_kw or {})),
        EngineSpec(**es_kw),
        params,
    )


def run_generate(tag, eng, ctx, max_new=None, batch=1, log=None,
                 extra=None, repeats=2, return_tokens=False):
    """Compile+warm one engine config, emit one JSON row, return the row.
    On error, emits the row with a truncated traceback instead of dying."""
    log = log or make_logger(tag)
    try:
        rng = np.random.default_rng(0)
        prompts = [[int(t) for t in rng.integers(0, eng.model_spec.vocab_size,
                                                 size=ctx - 1)]
                   for _ in range(batch)]
        log(f"{tag}: compiling ...")
        t0 = time.perf_counter()
        out = eng.generate(prompts, max_new_tokens=max_new)
        log(f"{tag}: compiled+first run in {time.perf_counter() - t0:.1f}s")
        best = None
        for _ in range(repeats):
            out = eng.generate(prompts, max_new_tokens=max_new)
            tps = batch * out.decode_steps / max(out.decode_seconds, 1e-9)
            if best is None or tps > best[0]:
                best = (tps, out)
        tps, out = best
        row = {"bench": tag, "decode_tokens_per_s": round(tps, 2),
               "prefill_ms": round(out.prefill_seconds * 1e3, 1),
               "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
               "batch": batch, "ctx": ctx,
               "layers": eng.model_spec.num_hidden_layers}
        if extra:
            row.update(extra)
        emit(row)
        if return_tokens:
            return row, out.tokens
        return row
    except Exception:
        tb = traceback.format_exc()
        # Keep the alloc list: XLA OOM messages bury "Largest program
        # allocations" after kB of axon service noise — naive head/tail
        # windows lose the culprit buffers (r3x kivi8-pa, r4a retakes).
        if len(tb) > 5000:
            mark = tb.find("Largest program allocations")
            if mark >= 0:
                tb = tb[:800] + "\n...[snip]...\n" + tb[mark:mark + 6000]
            else:
                tb = tb[:3000] + "\n...[snip]...\n" + tb[-1500:]
        emit({"bench": tag, "error": tb})
        return None


def time_loop_ms(fn, args, iters, label="", log=None, warmup=True):
    """Wall-time a pre-jitted fn whose body loops ``iters`` times on
    device; returns host-observed ms per iteration.  One warmup call
    first (compile + tunnel floor)."""
    if warmup:
        r = fn(*args)
        jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = fn(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) * 1e3 / iters
    if log and label:
        log(f"{label}: {ms:.3f} ms/iter")
    return ms
