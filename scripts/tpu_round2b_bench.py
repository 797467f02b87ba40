"""Round-2b batched TPU measurements (after the segment-scan weight fix,
the fused block-sparse MInference kernel, and the Mosaic-conformant quant
decode kernel).  ONE process; JSON line per row."""

import gc
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
    print(f"[tpu-bench2b] {msg}", file=sys.stderr, flush=True)


def emit(row):
    print(json.dumps(row), flush=True)


def spec_depth(layers):
    return ModelSpec(
        name=f"llama3-8b-d{layers}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=40960,
    )


RNG = np.random.default_rng(0)


def prompt_of(n, vocab=128256):
    return [int(t) for t in RNG.integers(0, vocab, size=n - 1)]


def run_engine(tag, spec, params, cs, ctx, max_new=128, use_pallas=True,
               reps=2):
    eng = Engine(
        spec, cs,
        EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                   prefill_block=512, use_pallas=use_pallas),
        params,
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
    emit({
        "bench": tag,
        "method": cs.method,
        "ctx": ctx,
        "decode_tokens_per_s": round(tps, 2),
        "prefill_ms": round(out.prefill_seconds * 1e3, 1),
        "kv_cache_mb": round(out.kv_cache_bytes / 1e6, 2),
        "layers": spec.num_hidden_layers,
    })


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    log(f"devices: {jax.devices()}")
    d8 = spec_depth(8)
    p8 = llama.init_params(d8, jax.random.PRNGKey(0), dtype=jnp.bfloat16)

    def safe(tag, *args, **kw):
        try:
            run_engine(tag, *args, **kw)
        except Exception as e:
            emit({"bench": tag, "error": repr(e)[:300]})
            log(f"{tag} FAILED: {e!r}")

    # ---- A: re-measure the segmented methods after the by-index fix ----
    for method in ("pyramidkv", "l2norm"):
        cs = CompressionSpec(method=method, max_capacity_prompt=128,
                             window_size=8, kernel_size=7, pooling="maxpool")
        safe(f"sweep4k/{method}", d8, p8, cs, 4096)

    # ---- B: fused block-sparse MInference prefill vs dense ----
    for ctx in (8192, 16384, 32768):
        cs = CompressionSpec(method="minference",
                             minference_vertical_size=1000,
                             minference_slash_size=200,
                             minference_tile_budget=16)
        safe(f"prefill{ctx}/minference_fused", d8, p8, cs, ctx, max_new=16)

    # ---- C: fused quant decode kernel ----
    for cap in (512, 2048):
        for nbits in (8, 4, 2):
            cs = CompressionSpec(method="snapkv", max_capacity_prompt=cap,
                                 window_size=8, quant_method="kivi",
                                 nbits=nbits)
            safe(f"quant/cap{cap}/int{nbits}_kernel", d8, p8, cs, 4096)

    # ---- D: depth-16 point (free the depth-8 params first) ----
    del p8
    gc.collect()
    d16 = spec_depth(16)
    p16 = llama.init_params(d16, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    for method in ("fullkv", "snapkv"):
        cs = CompressionSpec(method=method, max_capacity_prompt=128,
                             window_size=8)
        safe(f"depth16/{method}", d16, p16, cs, 4096)

    log("ALL DONE")


if __name__ == "__main__":
    main()
