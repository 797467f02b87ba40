"""Round-2n TPU measurements (one batched process) — reruns the legs of
tpu_round2m_bench.py that died on a remote-compile HTTP 413.

Root cause of the 413: the 2m script jitted ZERO-ARGUMENT lambdas, so the
32k q/k/v operands were baked into the jaxpr as embedded constants and the
compile request body (constants included) exceeded the tunnel service's
length limit.  Here every tensor is a jit ARGUMENT.

B. MInference sparse-prefill component bisection at 32k: each component
   repeated 8x inside ONE jit (amortises the ~29 ms tunnel floor) —
   estimation, vertical gather, vertical partials, slash tiles (grid and
   double-buffered), merged full path.
C. Engine-level 32k minference prefill: grid vs db slash kernel
   (host-observed wall times; prior grid number: 1281 ms).
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
    print(f"[2n] {m}", file=sys.stderr, flush=True)


def emit(r):
    print(json.dumps(r), flush=True)


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

    def mk(fn, *arrays):
        """jit(run)(q, *arrays): fn applied reps times inside one scan
        (a per-iteration perturbation of q defeats CSE); every tensor is
        an ARGUMENT so nothing is embedded as a compile-request constant."""
        def run(qq0, *arrs):
            def body(c, i):
                out = fn(qq0 + (i * 0.0).astype(qq0.dtype), *arrs)
                acc = jnp.zeros((), f32)
                for x in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.sum(x.reshape(-1)[:1].astype(f32))
                return c + acc, None
            return jax.lax.scan(body, jnp.zeros((), f32),
                                jnp.arange(reps))[0]
        jf = jax.jit(run)
        return lambda: jf(q, *arrays)

    def timeit(fn, reps_outer=3):
        out = fn()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps_outer):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    pattern = estimate_vertical_slash(
        q, k, true_len=tl, vertical_size=cs.minference_vertical_size,
        slash_size=cs.minference_slash_size, last_q=cs.minference_last_q)
    pattern = jax.tree_util.tree_map(jax.block_until_ready, pattern)
    tile_idx, tile_valid = _slash_tile_selection(pattern, n, 512, 256, 8)
    k_vert, v_vert = gather_vertical_kv(k, v, pattern.vert_idx)
    jax.block_until_ready((tile_idx, k_vert))

    comps = {
        "estimate": mk(
            lambda qq, kk2: estimate_vertical_slash(
                qq, kk2, true_len=tl,
                vertical_size=cs.minference_vertical_size,
                slash_size=cs.minference_slash_size,
                last_q=cs.minference_last_q),
            k),
        "vert_gather": mk(
            lambda qq, kk2, vv, vi: gather_vertical_kv(
                kk2 + qq[:, :1, :1, :1] * 0, vv, vi),
            k, v, pattern.vert_idx),
        "vert_partials": mk(
            lambda qq, kv_, vv_, vi, vva: vertical_attention_partials_kernel(
                qq, kv_, vv_, vi, vva, tl, q_block=512),
            k_vert, v_vert, pattern.vert_idx, pattern.vert_valid),
        "slash_tiles": mk(
            lambda qq, kk2, vv, ti, tv, ve: slash_tile_attention(
                qq, kk2, vv, ti, tv, ve, tl, q_block=512, k_tile=256),
            k, v, tile_idx, tile_valid, pattern.vert),
        "slash_tiles_db": mk(
            lambda qq, kk2, vv, ti, tv, ve: slash_tile_attention_db(
                qq, kk2, vv, ti, tv, ve, tl, q_block=512, k_tile=256),
            k, v, tile_idx, tile_valid, pattern.vert),
        "full_sparse": mk(
            lambda qq, kk2, vv, pat: sparse_prefill_attention(
                qq, kk2, vv, pat, true_len=tl, q_block=512, k_tile=256,
                tile_budget=8),
            k, v, pattern),
        "full_sparse_db": mk(
            lambda qq, kk2, vv, pat: sparse_prefill_attention(
                qq, kk2, vv, pat, true_len=tl, q_block=512, k_tile=256,
                tile_budget=8, slash_impl="db"),
            k, v, pattern),
    }
    for name, fn in comps.items():
        log(f"sparse32k/{name} compiling")
        t = timeit(fn)
        emit({"bench": f"sparse32k/{name}",
              "ms_per_call": round(t * 1e3 / reps, 2),
              "total_ms": round(t * 1e3, 1)})


def part_c_engine_32k():
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
    part_b_sparse_bisect()
    part_c_engine_32k()
    log("ALL DONE")


if __name__ == "__main__":
    main()
