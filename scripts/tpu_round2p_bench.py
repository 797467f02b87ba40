"""Round-2p TPU measurements (one batched process): flash-prefill kernel
VPU optimizations A/B.

The round-2 slash-kernel bisection (logs/tpu_r2n.jsonl) showed the
remaining flash-prefill gap over the MXU roofline is online-softmax VPU
work (exp + mask/select), not DMA.  This run measures the two kernel
changes that attack it:

- fast_path: interior tiles (statically causal/in-band, dynamically past
  the left pad) skip ALL iota/compare/select work — at 64k that is ~97%
  of visited tiles;
- use_exp2: base-2 online softmax with log2(e) folded into the q scale
  (one fewer VPU multiply per logit), plus the post-exp re-mask dropped
  (masked logits underflow to exactly 0 through the clamped subtraction).

A. kernel-level A/B at 4k / 32k / 64k (8/4/2 reps inside one jit to
   amortise the ~29 ms tunnel floor) + block-size sweep on the winner.
B. engine-level 64k fullkv + snapkv prefill/decode with the new defaults
   (prior: fullkv 6382 ms / snapkv 6378 ms prefill; snapkv 146.7 tok/s).

Run:  PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python scripts/tpu_round2p_bench.py
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TINY = os.environ.get("R2P_TINY") == "1"  # CPU smoke mode

if TINY:
    jax.config.update("jax_platforms", "cpu")

from pyramidkv_tpu.kernels.flash_prefill import flash_causal_attention  # noqa: E402


def log(m):
    print(f"[2p] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def part_a_kernel_ab():
    interp = TINY
    shapes = (
        [(1, 4, 2, 512, 64, 4)] if TINY else
        [(1, 32, 8, 4096, 128, 8), (1, 32, 8, 32768, 128, 4),
         (1, 32, 8, 65536, 128, 2)]
    )
    for b, h, hk, n, d, reps in shapes:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, hk, n, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, hk, n, d), jnp.bfloat16)
        tl = jnp.full((b,), n - 1, jnp.int32)

        def mk(bq, bk, fp, e2):
            def run(qq, kk2, vv, tl_):
                def body(c, i):
                    out = flash_causal_attention(
                        qq + (i * 0.0).astype(qq.dtype), kk2, vv, tl_,
                        block_q=bq, block_k=bk, fast_path=fp, use_exp2=e2,
                        interpret=interp,
                    )
                    return c + out.reshape(-1)[:1].astype(jnp.float32).sum(), None
                return jax.lax.scan(body, jnp.zeros((), jnp.float32),
                                    jnp.arange(reps))[0]
            jf = jax.jit(run)
            return lambda: jf(q, k, v, tl)

        def timeit(fn, outer=3):
            jax.block_until_ready(fn())
            best = float("inf")
            for _ in range(outer):
                t0 = time.perf_counter()
                jax.block_until_ready(fn())
                best = min(best, time.perf_counter() - t0)
            return best

        bq0 = min(512, n)
        bk0 = min(512, n)
        variants = [
            ("old", bq0, bk0, False, False),
            ("exp2", bq0, bk0, False, True),
            ("fast", bq0, bk0, True, False),
            ("fast+exp2", bq0, bk0, True, True),
        ]
        if n >= 32768 and not TINY:
            variants += [
                ("fast+exp2@1024x512", 1024, 512, True, True),
                ("fast+exp2@512x1024", 512, 1024, True, True),
                ("fast+exp2@1024x1024", 1024, 1024, True, True),
                ("fast+exp2@256x512", 256, 512, True, True),
            ]
        for name, bq, bk, fp, e2 in variants:
            log(f"flash{n//1024}k/{name} compiling")
            try:
                t = timeit(mk(bq, bk, fp, e2))
            except Exception as e:  # noqa: BLE001 — record and continue
                emit({"bench": f"flash{n//1024}k/{name}",
                      "error": repr(e)[:200]})
                continue
            emit({"bench": f"flash{n//1024}k/{name}",
                  "ms_per_call": round(t * 1e3 / reps, 2)})


def part_b_engine_64k():
    from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
    from pyramidkv_tpu.engine import Engine
    from pyramidkv_tpu.models import llama

    if TINY:
        spec = ModelSpec.tiny()
        ctx, cap, window, max_new = 256, 32, 8, 8
    else:
        spec = ModelSpec(
            name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
            intermediate_size=14336, num_hidden_layers=8,
            num_attention_heads=32, num_key_value_heads=8, head_dim=128,
            rope_theta=500000.0, max_position_embeddings=131072,
        )
        ctx, cap, window, max_new = 65536, 128, 8, 128
    params = llama.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]
    for method in ("fullkv", "snapkv"):
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=cap,
                            window_size=window, kernel_size=7,
                            pooling="maxpool"),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,),
                       prefill_block=512),
            params,
        )
        log(f"engine64k/{method} compiling")
        eng.generate([prompt])
        best_pf, best_tps = float("inf"), 0.0
        for _ in range(3):
            out = eng.generate([prompt])
            best_pf = min(best_pf, out.prefill_seconds)
            best_tps = max(best_tps, out.decode_steps / out.decode_seconds)
        emit({"bench": f"engine64k/{method}",
              "prefill_ms": round(best_pf * 1e3, 1),
              "decode_tok_s": round(best_tps, 1),
              "kv_mb": round(out.kv_cache_bytes / 1e6, 1)})


def main():
    log(f"platform={jax.devices()[0].platform}")
    part_a_kernel_ab()
    part_b_engine_64k()
    log("ALL DONE")


if __name__ == "__main__":
    main()
