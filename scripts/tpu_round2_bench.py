"""Round-2 batched TPU measurement run (ONE process — the axon tunnel's
first compile stalls 10-50 min, later compiles in the same process are
fast).  Appends one JSON line per measurement to stdout; run under nohup
and poll the log.

Covers (BASELINE.md round-2 additions):
  A. per-method sweep at 4k/cap128 incl. the round-1 unbenched methods
     (cam, think, minference, headkv) and the l2norm segmented-cache fix;
  B. quantized decode: bf16 vs KIVI int8/4/2, fused Pallas kernel vs XLA
     dequant, caps 512 and 2048;
  C. MInference prefill wall time vs dense fullkv prefill at 8k/16k/32k;
  D. 32k single-chip prefill (snapkv);
  E. depth-16 point for the full-depth (32-layer) flagship extrapolation.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama


def log(msg):
    print(f"[tpu-bench] {msg}", file=sys.stderr, flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


def spec_depth(layers):
    return ModelSpec(
        name=f"llama3-8b-d{layers}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=40960,
    )


PARAMS = {}


def params_for(spec):
    key = spec.num_hidden_layers
    if key not in PARAMS:
        PARAMS[key] = llama.init_params(spec, jax.random.PRNGKey(0),
                                        dtype=jnp.bfloat16)
    return PARAMS[key]


RNG = np.random.default_rng(0)


def prompt_of(n, vocab=128256):
    return [int(t) for t in RNG.integers(0, vocab, size=n - 1)]


def run_engine(tag, spec, cs, ctx, max_new=128, use_pallas=True, reps=2):
    eng = Engine(
        spec, cs,
        EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                   prefill_block=512, use_pallas=use_pallas),
        params_for(spec),
    )
    prompt = prompt_of(ctx)
    log(f"{tag}: compiling ...")
    t0 = time.perf_counter()
    eng.generate([prompt])
    log(f"{tag}: warmup {time.perf_counter()-t0:.1f}s")
    best = None
    for _ in range(reps):
        out = eng.generate([prompt])
        tps = out.decode_steps / max(out.decode_seconds, 1e-9)
        if best is None or tps > best[0]:
            best = (tps, out)
    tps, out = best
    row = {
        "bench": tag,
        "method": cs.method,
        "ctx": ctx,
        "decode_tokens_per_s": round(tps, 2),
        "prefill_ms": round(out.prefill_seconds * 1e3, 1),
        "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
        "layers": spec.num_hidden_layers,
    }
    emit(row)
    return row


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    log(f"devices: {jax.devices()}")
    d8 = spec_depth(8)

    # ---- A: per-method sweep (4k ctx, cap 128) ----
    L, H = 8, 32
    head_caps = tuple(
        tuple(60 + ((i * 7 + j * 13) % 120) for j in range(H)) for i in range(L)
    )
    sweep = [
        ("fullkv", {}),
        ("snapkv", {}),
        ("pyramidkv", {}),
        ("h2o", {}),
        ("streamingllm", {}),
        ("l2norm", {}),
        ("random", {}),
        ("adakv", {}),
        ("headkv", {"head_capacity": head_caps}),
        ("think", {"recent_size": 32}),
        ("cam", {}),
        ("minference", {}),
    ]
    for method, kw in sweep:
        cs = CompressionSpec(method=method, max_capacity_prompt=128,
                             window_size=8, kernel_size=7, pooling="maxpool",
                             **kw)
        try:
            run_engine(f"sweep4k/{method}", d8, cs, 4096)
        except Exception as e:
            emit({"bench": f"sweep4k/{method}", "error": repr(e)[:300]})
            log(f"{method} FAILED: {e!r}")

    # ---- B: quantized decode (snapkv), kernel vs XLA ----
    for cap in (512, 2048):
        for nbits, use_kernel in [
            (None, True),  # bf16 reference
            (8, True), (8, False),
            (4, True), (4, False),
            (2, True), (2, False),
        ]:
            kw = {}
            if nbits is not None:
                kw = dict(quant_method="kivi", nbits=nbits)
            cs = CompressionSpec(method="snapkv", max_capacity_prompt=cap,
                                 window_size=8, **kw)
            tag = (f"quant/cap{cap}/"
                   + ("bf16" if nbits is None else f"int{nbits}")
                   + ("_kernel" if use_kernel and nbits else
                      ("" if nbits is None else "_xla")))
            try:
                # use_pallas gates the fused dequant kernel (and flash
                # prefill); the XLA variant disables both — decode numbers
                # are what we compare.
                run_engine(tag, d8, cs, 4096, use_pallas=use_kernel)
            except Exception as e:
                emit({"bench": tag, "error": repr(e)[:300]})
                log(f"{tag} FAILED: {e!r}")

    # ---- C+D: prefill wall time, minference vs dense + 32k ----
    for ctx in (8192, 16384, 32768):
        for method, kw in (
            ("fullkv", {}),
            ("minference", dict(minference_vertical_size=1000,
                                minference_slash_size=200,
                                minference_tile_budget=16)),
            ("snapkv", {}),
        ):
            cs = CompressionSpec(method=method, max_capacity_prompt=128,
                                 window_size=8, **kw)
            tag = f"prefill{ctx}/{method}"
            try:
                run_engine(tag, d8, cs, ctx, max_new=16)
            except Exception as e:
                emit({"bench": tag, "error": repr(e)[:300]})
                log(f"{tag} FAILED: {e!r}")

    # ---- E: depth scaling (flagship accounting) ----
    d16 = spec_depth(16)
    for spec in (d8, d16):
        for method in ("fullkv", "snapkv"):
            cs = CompressionSpec(method=method, max_capacity_prompt=128,
                                 window_size=8)
            tag = f"depth{spec.num_hidden_layers}/{method}"
            try:
                run_engine(tag, spec, cs, 4096)
            except Exception as e:
                emit({"bench": tag, "error": repr(e)[:300]})
                log(f"{tag} FAILED: {e!r}")

    log("ALL DONE")


if __name__ == "__main__":
    main()
