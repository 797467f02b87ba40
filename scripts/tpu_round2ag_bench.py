"""Round-2ag TPU measurements: int4 decode DECOMPOSITION + kernel block
tuning.

1. Depth split d2/d8/d32 (fused int4, snapkv, 4k ctx): fit
   step_ms = a + b*L to separate the per-step fixed cost (lm_head,
   sampling, loop) from the per-layer cost; compare b against the
   per-layer packed-byte read time to locate the remaining headroom
   (d32 measures 93.8 tok/s vs ~140 at int8-effective bandwidth).
2. Block-size grid at d32: (block_in, block_out2) in {(512,1024) default,
   (512,2048), (1024,1024), (1024,2048)}.
"""

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import weights as W
from pyramidkv_tpu.models.weights import QuantW


def log(m):
    print(f"[2ag] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def spec_depth(layers, max_pos=40960):
    return ModelSpec(
        name=f"llama3-8b-d{layers}", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=max_pos,
    )


def random_int4_params(spec, key):
    ks = iter(jax.random.split(key, 16))
    L, Dm, I = spec.num_hidden_layers, spec.hidden_size, spec.intermediate_size
    H, KV, Dh, V = (spec.num_attention_heads, spec.num_key_value_heads,
                    spec.head_dim, spec.vocab_size)

    def qw(shape):
        fan_in = shape[-2]
        codes = jax.random.randint(
            next(ks), shape[:-1] + (shape[-1] // 2,), -128, 128, jnp.int8)
        sval = 1.0 / (7.0 * np.sqrt(fan_in))
        return QuantW(codes=codes,
                      scale=jnp.full(shape[:-2] + (shape[-1],), sval,
                                     jnp.float32))

    emb_codes = jax.random.randint(next(ks), (V, Dm), -127, 128, jnp.int8)
    lm_codes = jax.random.randint(next(ks), (Dm, V), -127, 128, jnp.int8)
    return {
        "embed": QuantW(codes=emb_codes,
                        scale=jnp.full((V,), 0.02 / 127.0, jnp.float32)),
        "final_norm": jnp.ones((Dm,), jnp.bfloat16),
        "lm_head": QuantW(codes=lm_codes,
                          scale=jnp.full((V,), 1.0 / (127.0 * np.sqrt(Dm)),
                                         jnp.float32)),
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


def run(tag, spec, params, ctx=4096, max_new=128):
    try:
        eng = Engine(
            spec,
            CompressionSpec(method="snapkv", max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,)),
            params,
        )
        rng = np.random.default_rng(0)
        prompts = [[int(t) for t in rng.integers(0, spec.vocab_size,
                                                 size=ctx - 1)]]
        log(f"{tag}: compiling ...")
        t0 = time.perf_counter()
        eng.generate(prompts)
        log(f"{tag}: compiled+first run in {time.perf_counter()-t0:.1f}s")
        best = None
        for _ in range(2):
            out = eng.generate(prompts)
            tps = out.decode_steps / max(out.decode_seconds, 1e-9)
            if best is None or tps > best:
                best = tps
        emit({"bench": tag, "decode_tokens_per_s": round(best, 2),
              "step_ms": round(1e3 / best, 3),
              "layers": spec.num_hidden_layers})
    except Exception:
        emit({"bench": tag, "error": traceback.format_exc()[-900:]})


def main():
    assert jax.devices()[0].platform == "tpu"

    # 1) depth split
    for L in (2, 8, 32):
        spec = spec_depth(L)
        p = W.fuse_packed_matmuls(random_int4_params(spec, jax.random.PRNGKey(0)))
        run(f"int4_depth/d{L}", spec, p)
        del p

    # 2) block grid at d32
    d32 = spec_depth(32)
    p = W.fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))
    for blocks in ((512, 2048), (1024, 1024), (1024, 2048)):
        W._INT4_KERNEL_BLOCKS[0] = blocks
        run(f"int4_blocks/bi{blocks[0]}_bo{blocks[1]}", d32, p)
    W._INT4_KERNEL_BLOCKS[0] = None
    log("ALL DONE")


if __name__ == "__main__":
    main()
