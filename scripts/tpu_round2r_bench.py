"""Round-2r TPU measurements (one batched process): decode layer-scan
cache-copy elimination A/B.

Round-2q closed the books on prefill; this run measures the decode-side
fix: the decode layer scan used to thread the cache through scan xs/ys,
making XLA RE-STACK (copy) the entire cache every decode step.  Now the
cache rides the scan carry and the append is a one-slot
dynamic_update_slice.  Cost model: at 64k the fullkv cache is 2.1 GB, so
the old path moved ~6.4 GB/step (read xs + write ys + attention reads)
vs the ~2.1 GB roofline — measured 30-34 tok/s where ~100+ should stand.

Legs (prior numbers in parens, from logs/tpu_r2p/q + BASELINE round 2):
A. 64k fullkv + snapkv decode            (34.2 / 147.6 tok/s)
B. d32 int8-weights fullkv + snapkv 4k   (67.2 / 82.2 tok/s)
C. d32 int8w snapkv serving B=8, 2k ctx  (399 tok/s)
D. snapkv cap2048 KIVI int4 4k           (119.0 tok/s)
E. l2norm 4k (segmented cache path)      (125.7 tok/s)

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2r_bench.py
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


def log(m):
    print(f"[2r] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def spec_depth(d):
    return ModelSpec(
        name=f"llama3-8b-d{d}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=d,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=131072,
    )


RNG = np.random.default_rng(0)


def run_engine(tag, params, spec, method, ctx, batch=1, max_new=128, reps=3,
               comp_kw=None, eng_kw=None):
    prompts = [
        [int(t) for t in RNG.integers(0, spec.vocab_size, size=ctx - 1)]
        for _ in range(batch)
    ]
    comp = dict(method=method, max_capacity_prompt=128, window_size=8,
                kernel_size=7, pooling="maxpool")
    comp.update(comp_kw or {})
    eng = Engine(
        spec,
        CompressionSpec(**comp),
        EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                   prefill_block=512, **(eng_kw or {})),
        params,
    )
    log(f"{tag} compiling")
    eng.generate(prompts)
    best_pf, best_tps = float("inf"), 0.0
    for _ in range(reps):
        out = eng.generate(prompts)
        best_pf = min(best_pf, out.prefill_seconds)
        best_tps = max(best_tps, batch * out.decode_steps / out.decode_seconds)
    emit({"bench": tag, "prefill_ms": round(best_pf * 1e3, 1),
          "decode_tok_s": round(best_tps, 1),
          "kv_mb": round(out.kv_cache_bytes / 1e6, 1)})


def main():
    log(f"platform={jax.devices()[0].platform}")

    # A. 64k headline regime (d8, bf16 weights) — measured in the first
    # 2r run (fullkv 103.2 / snapkv 146.2 tok/s); skippable on re-runs
    import os
    s8 = spec_depth(8)
    p8 = llama.init_params(s8, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if os.environ.get("R2R_SKIP_64K") != "1":
        run_engine("engine64k/fullkv", p8, s8, "fullkv", 65536)
        run_engine("engine64k/snapkv", p8, s8, "snapkv", 65536)

    # D/E on the d8 params while they are resident
    run_engine("engine4k/snapkv_kivi4_cap2048", p8, s8, "snapkv", 4096,
               comp_kw=dict(max_capacity_prompt=2048, quant_method="kivi",
                            nbits=4))
    run_engine("engine4k/l2norm", p8, s8, "l2norm", 4096)
    del p8

    # B/C. full-depth flagship with int8 weights, built directly as int8
    # codes (the 32-layer bf16 pytree would not fit HBM — same recipe as
    # tpu_round2f_bench.random_int8_params)
    from pyramidkv_tpu.models.weights import QuantW
    s32 = spec_depth(32)
    ks = iter(jax.random.split(jax.random.PRNGKey(1), 16))
    L, Dm, I = (s32.num_hidden_layers, s32.hidden_size,
                s32.intermediate_size)
    H, KV, Dh, V = (s32.num_attention_heads, s32.num_key_value_heads,
                    s32.head_dim, s32.vocab_size)

    def qw(shape):
        codes = jax.random.randint(next(ks), shape, -127, 128, jnp.int8)
        scale = jnp.full(shape[:-2] + (shape[-1],),
                         1.0 / (127.0 * np.sqrt(shape[-2])), jnp.float32)
        return QuantW(codes=codes, scale=scale)

    p32 = {
        "embed": QuantW(
            codes=jax.random.randint(next(ks), (V, Dm), -127, 128, jnp.int8),
            scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": jnp.ones((Dm,), jnp.bfloat16),
        "lm_head": qw((Dm, V)),
        "layers": {
            "wq": qw((L, Dm, H * Dh)), "wk": qw((L, Dm, KV * Dh)),
            "wv": qw((L, Dm, KV * Dh)), "wo": qw((L, H * Dh, Dm)),
            "w_gate": qw((L, Dm, I)), "w_up": qw((L, Dm, I)),
            "w_down": qw((L, I, Dm)),
            "attn_norm": jnp.ones((L, Dm), jnp.bfloat16),
            "mlp_norm": jnp.ones((L, Dm), jnp.bfloat16),
        },
    }
    run_engine("engine4k_d32int8/fullkv", p32, s32, "fullkv", 4096)
    run_engine("engine4k_d32int8/snapkv", p32, s32, "snapkv", 4096)
    run_engine("engine2k_d32int8/snapkv_B8", p32, s32, "snapkv", 2048,
               batch=8, max_new=64)

    log("ALL DONE")


if __name__ == "__main__":
    main()
