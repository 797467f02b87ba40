"""Headline benchmark: compressed-KV decode throughput vs full-KV baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no perf numbers (README "Performence" is an
empty heading — see BASELINE.md), so the baseline is the engine's own
full-KV decode at the same context length: the number the compression
methods exist to beat.  ``vs_baseline`` = snapkv decode tokens/s divided
by fullkv decode tokens/s at a 64k-token prompt — the long-context regime
the reference's methods (and its MInference plugin, which targets
100k-1M) exist for.  At 64k the full cache is 2.1 GB/8 layers: fullkv
decode runs ~103 tok/s (85% of its HBM roofline after the round-2r
cache-copy fix) while snapkv holds ~146 at 33 MB of cache — a 1.4x
bandwidth win on top of the 60x cache-footprint win (see BASELINE.md
round-2r table).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main():
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    log(f"platform={platform} devices={len(jax.devices())}")

    from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
    from pyramidkv_tpu.engine import Engine
    from pyramidkv_tpu.models import llama

    if on_tpu:
        # Llama-3-8B geometry, depth-reduced to fit one v5e-class chip with
        # room for the 64k full-KV cache (2.1 GB); per-layer compute
        # identical to 8B.
        spec = ModelSpec(
            name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
            intermediate_size=14336, num_hidden_layers=8,
            num_attention_heads=32, num_key_value_heads=8, head_dim=128,
            rope_theta=500000.0, max_position_embeddings=131072,
        )
        ctx, cap, window, max_new = 65536, 128, 8, 128
    else:
        spec = ModelSpec.tiny()
        ctx, cap, window, max_new = 256, 32, 8, 32

    params = llama.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]

    def run(method):
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=cap,
                            window_size=window, kernel_size=7, pooling="maxpool"),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                       prefill_block=512),
            params,
        )
        log(f"{method}: compiling + warmup ...")
        t0 = time.perf_counter()
        eng.generate([prompt])  # compile + warmup
        log(f"{method}: warmup done in {time.perf_counter()-t0:.1f}s; timing ...")
        best_tps = 0.0
        out = None
        for _ in range(2):
            out = eng.generate([prompt])
            tps = out.decode_steps / out.decode_seconds
            best_tps = max(best_tps, tps)
        log(
            f"{method}: decode {best_tps:.1f} tok/s, prefill {out.prefill_seconds*1e3:.0f} ms, "
            f"kv_cache {out.kv_cache_bytes/1e6:.1f} MB"
        )
        return best_tps, out.kv_cache_bytes

    full_tps, full_bytes = run("fullkv")
    snap_tps, snap_bytes = run("snapkv")

    print(json.dumps({
        "metric": f"snapkv_decode_tokens_per_s_{ctx // 1024}k_ctx",
        "value": round(snap_tps, 2),
        "unit": "tokens/s",
        "vs_baseline": round(snap_tps / max(full_tps, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
