"""Round-2m TPU measurements (one batched process):

A. MoE capacity-factor dispatch, engine-level: Mixtral-style geometry
   (E=8, k=2), dense-all-experts vs --moe_capacity_factor prefill wall
   time at 8k ctx.
B. MInference sparse-prefill component bisection at 32k: each component
   repeated 8x inside ONE jit (amortises the ~29 ms tunnel floor) —
   estimation, vertical gather, vertical partials, slash tiles, merge —
   to locate the gap between the measured ~114 ms/layer sparse attention
   and its ~15-20 ms traffic/FLOP ideal before attempting a manual-DMA
   kernel rewrite.
"""

import dataclasses
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
    print(f"[2m] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def part_a_moe():
    spec = ModelSpec(
        name="mixtral-d4", vocab_size=32000, hidden_size=2048,
        intermediate_size=7168, num_hidden_layers=4,
        num_attention_heads=16, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=16384,
        num_local_experts=8, num_experts_per_tok=2,
    )
    params = llama.init_params(spec, jax.random.PRNGKey(0),
                               dtype=jnp.bfloat16)
    ctx, max_new = 8192, 16
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]
    for cf in (None, 2.0, 1.25):
        sp = dataclasses.replace(spec, moe_capacity_factor=cf)
        eng = Engine(
            sp,
            CompressionSpec(method="snapkv", max_capacity_prompt=128,
                            window_size=8),
            EngineSpec(max_new_tokens=max_new, prefill_buckets=(ctx,)),
            params,
        )
        tag = "dense" if cf is None else f"cf{cf}"
        log(f"moe/{tag} compiling")
        eng.generate([prompt])
        best_pre, best_tps = float("inf"), 0.0
        for _ in range(3):
            out = eng.generate([prompt])
            best_pre = min(best_pre, out.prefill_seconds)
            best_tps = max(best_tps, out.decode_steps / out.decode_seconds)
        emit({"bench": f"moe8k/{tag}", "prefill_ms": round(best_pre * 1e3, 1),
              "decode_tokens_per_s": round(best_tps, 2)})


def part_b_sparse_bisect():
    from pyramidkv_tpu.ops.sparse_prefill import (
        _slash_tile_selection,
        estimate_vertical_slash,
        gather_vertical_kv,
        sparse_prefill_attention,
    )
    from pyramidkv_tpu.kernels.block_sparse_prefill import (
        slash_tile_attention,
        slash_tile_attention_db,
        vertical_attention_partials_kernel,
    )

    b, h, hk, n, d = 1, 32, 8, 32768, 128
    cs = CompressionSpec(method="minference")
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, hk, n, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, hk, n, d), jnp.bfloat16)
    tl = jnp.full((b,), n, jnp.int32)
    reps = 8

    f32 = jnp.float32

    def mk(fn):
        """Run fn reps times inside one jit (a per-iteration perturbation
        of q defeats CSE) — amortises the ~29 ms tunnel floor."""
        def body(c, i):
            out = fn(q + (i * 0.0).astype(q.dtype))
            leaves = jax.tree_util.tree_leaves(out)
            acc = jnp.zeros((), f32)
            for x in leaves:
                acc = acc + jnp.sum(x.reshape(-1)[:1].astype(f32))
            return c + acc, None
        return jax.jit(lambda: jax.lax.scan(
            body, jnp.zeros((), f32), jnp.arange(reps))[0])

    pattern = estimate_vertical_slash(
        q, k, true_len=tl, vertical_size=cs.minference_vertical_size,
        slash_size=cs.minference_slash_size, last_q=cs.minference_last_q)
    pattern = jax.tree_util.tree_map(jax.block_until_ready, pattern)
    tile_idx, tile_valid = _slash_tile_selection(pattern, n, 512, 256, 8)
    k_vert, v_vert = gather_vertical_kv(k, v, pattern.vert_idx)
    jax.block_until_ready((tile_idx, k_vert))

    comps = {
        "estimate": mk(lambda qq: estimate_vertical_slash(
            qq, k, true_len=tl, vertical_size=cs.minference_vertical_size,
            slash_size=cs.minference_slash_size,
            last_q=cs.minference_last_q)),
        "vert_gather": mk(lambda qq: gather_vertical_kv(
            k + qq[:, :1, :1, :1] * 0, v, pattern.vert_idx)),
        "vert_partials": mk(lambda qq: vertical_attention_partials_kernel(
            qq, k_vert, v_vert, pattern.vert_idx, pattern.vert_valid, tl,
            q_block=512)),
        "slash_tiles": mk(lambda qq: slash_tile_attention(
            qq, k, v, tile_idx, tile_valid, pattern.vert, tl,
            q_block=512, k_tile=256)),
        "slash_tiles_db": mk(lambda qq: slash_tile_attention_db(
            qq, k, v, tile_idx, tile_valid, pattern.vert, tl,
            q_block=512, k_tile=256)),
        "full_sparse": mk(lambda qq: sparse_prefill_attention(
            qq, k, v, pattern, true_len=tl, q_block=512, k_tile=256,
            tile_budget=8)),
        "full_sparse_db": mk(lambda qq: sparse_prefill_attention(
            qq, k, v, pattern, true_len=tl, q_block=512, k_tile=256,
            tile_budget=8, slash_impl="db")),
    }
    # numerical A/B on-chip before timing
    ref = slash_tile_attention(q, k, v, tile_idx, tile_valid, pattern.vert,
                               tl, q_block=512, k_tile=256)
    got = slash_tile_attention_db(q, k, v, tile_idx, tile_valid,
                                  pattern.vert, tl, q_block=512, k_tile=256)
    d0 = float(jnp.max(jnp.abs(ref[0] - got[0])))
    emit({"bench": "sparse32k/db_parity_maxdiff", "value": d0})
    for name, fn in comps.items():
        log(f"sparse32k/{name} compiling")
        t = timeit(fn, reps=3)
        emit({"bench": f"sparse32k/{name}",
              "ms_per_call": round(t * 1e3 / reps, 2),
              "total_ms": round(t * 1e3, 1)})


def part_c_engine_32k():
    """Engine-level 32k minference prefill: grid vs db slash kernel
    (reliable host-observed wall times; prior grid number: 1281 ms)."""
    spec = ModelSpec(
        name="llama3-8b-d8", vocab_size=128256, hidden_size=4096,
        intermediate_size=14336, num_hidden_layers=8,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        rope_theta=500000.0, max_position_embeddings=65536,
    )
    params = llama.init_params(spec, jax.random.PRNGKey(0),
                               dtype=jnp.bfloat16)
    ctx = 32768
    rng = np.random.default_rng(0)
    prompt = [int(t) for t in rng.integers(0, spec.vocab_size, size=ctx - 1)]
    for impl in ("grid", "db"):
        eng = Engine(
            spec,
            CompressionSpec(method="minference", minference_dense_below=0,
                            minference_slash_impl=impl),
            EngineSpec(max_new_tokens=16, prefill_buckets=(ctx,)),
            params,
        )
        log(f"engine32k/{impl} compiling")
        eng.generate([prompt])
        best = float("inf")
        for _ in range(3):
            out = eng.generate([prompt])
            best = min(best, out.prefill_seconds)
        emit({"bench": f"engine32k/minference_{impl}",
              "prefill_ms": round(best * 1e3, 1)})


def main():
    log(f"platform={jax.devices()[0].platform}")
    part_a_moe()
    part_b_sparse_bisect()
    part_c_engine_32k()
    log("ALL DONE")


if __name__ == "__main__":
    main()
