"""Round-2s TPU measurements (one batched process): 128k-token context.

The reference's longest grid is Mistral at 31.5k (run_longbench.py:75-81);
MInference exists for 100k-1M contexts (minference.py purpose).  This run
establishes the single-chip 128k story on one v5e (d8 Llama-3-8B
geometry, bf16 weights): dense flash prefill (adaptive 1024-wide tiles
keep the scalar-prefetch tables inside SMEM), snapkv compression, and
the sparse MInference prefill in its target regime.

Legs:
A. 128k fullkv   (cache 4.3 GB; decode expected ~80-90 tok/s roofline)
B. 128k snapkv   (cache 33 MB; decode ~146)
C. 128k minference (sparse prefill; dense 64k was 4.94 s -> ~20 s at 128k,
   sparse should stay near-linear from 2.55 s)

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2s_bench.py
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama


def log(m):
    print(f"[2s] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def main():
    log(f"platform={jax.devices()[0].platform}")
    ctx = 131072
    spec = ModelSpec(
        name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=8,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=262144,
    )
    params = llama.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]

    legs = [
        ("engine128k/snapkv", "snapkv", {}),
        ("engine128k/fullkv", "fullkv", {}),
        ("engine128k/minference", "minference",
         dict(minference_dense_below=0)),
    ]
    for tag, method, kw in legs:
        try:
            eng = Engine(
                spec,
                CompressionSpec(method=method, max_capacity_prompt=128,
                                window_size=8, kernel_size=7,
                                pooling="maxpool", **kw),
                EngineSpec(max_new_tokens=32, prefill_buckets=(ctx,),
                           prefill_block=512),
                params,
            )
            log(f"{tag} compiling")
            eng.generate([prompt])
            best_pf, best_tps = float("inf"), 0.0
            for _ in range(3):
                out = eng.generate([prompt])
                best_pf = min(best_pf, out.prefill_seconds)
                best_tps = max(best_tps,
                               out.decode_steps / out.decode_seconds)
            emit({"bench": tag, "prefill_ms": round(best_pf * 1e3, 1),
                  "decode_tok_s": round(best_tps, 1),
                  "kv_mb": round(out.kv_cache_bytes / 1e6, 1)})
        except Exception as e:  # noqa: BLE001 — record and continue
            emit({"bench": tag, "error": repr(e)[:300]})

    log("ALL DONE")


if __name__ == "__main__":
    main()
