"""r4l: can int8 x int8 MXU dots on the code planes beat the factored
path's bf16 operands?

The r4k SoL grade re-attributed the region-attention overhead (7.5 ms vs
4.2 achievable at 64k kivi4) to the DOTS' bf16 unpacked operands
materialising through HBM — shift/mask unpack alone streams at ~520 GB/s.
TPU MXUs multiply s8 natively; if the query (and the probabilities, for
the V side) are themselves quantized to int8 with per-head scales folded
outside the dot, the contraction consumes the unpacked int8 planes with
no bf16 operand traffic.  This probes the COMPUTE SKELETON only (dots at
region shapes, layer loop, xor-index to defeat hoisting); the engine
path (scale folding, zero terms, softmax, accuracy) comes after a
positive read.

Legs (64k kivi4-pa geometry: Hk=8, G=4, D=128, W=32768 slots/plane x 2):
  ctl_bf16     unpack -> bf16 -> K-dot + V-dot (factored pattern)
  int8_dot     unpack -> int8 -> K-dot + V-dot, preferred int32
  int8_kdot    int8 K-dot only (V side kept bf16) — the half measure
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_common import emit, make_logger

log = make_logger("i8dot")

ITERS = 50
L, HK, G, D, W = 32, 8, 4, 128, 32768


def probe(name, fn, args, iters=ITERS):
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))             # compile + warmup + value fetch
    ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ms = min(ms, (time.perf_counter() - t0) * 1e3 / iters)
    emit({"bench": f"r4l/{name}", "ms_per_pass": round(ms, 3)})
    log(f"{name}: {ms:.3f} ms/pass")
    return ms


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    key = jax.random.PRNGKey(0)
    kc = jax.random.randint(key, (L, HK, W, D), -128, 128, jnp.int8)
    vc = jax.random.randint(jax.random.fold_in(key, 1),
                            (L, HK, W, D), -128, 128, jnp.int8)
    qb = jax.random.normal(jax.random.fold_in(key, 2),
                           (HK, G, D), jnp.bfloat16)
    qi = jax.random.randint(jax.random.fold_in(key, 3),
                            (HK, G, D), -128, 128, jnp.int8)
    pi = jax.random.randint(jax.random.fold_in(key, 4),
                            (HK, G, W), -128, 128, jnp.int8)
    log(f"codes {2*kc.size/1e9:.2f} GB")

    def body_loop(layer_body, *extra):
        def run(kc, vc, *extra):
            def it(i, acc):
                ii = i.astype(jnp.int8)

                def layer(li, a):
                    return a + layer_body(kc[li] ^ ii, vc[li] ^ ii, *extra)
                return jax.lax.fori_loop(0, L, layer, acc)
            return jax.lax.fori_loop(0, ITERS, it,
                                     jnp.zeros((), jnp.float32))
        return run

    def ctl_bf16(k8, v8, qb):
        acc = jnp.zeros((), jnp.float32)
        for p in range(2):
            cp = (((k8.astype(jnp.uint8) >> jnp.uint8(4 * p))
                   & jnp.uint8(0xF)).astype(jnp.bfloat16))
            s = jnp.einsum("kqd,kwd->kqw", qb, cp,
                           preferred_element_type=jnp.float32)
            vp = (((v8.astype(jnp.uint8) >> jnp.uint8(4 * p))
                   & jnp.uint8(0xF)).astype(jnp.bfloat16))
            o = jnp.einsum("kqw,kwd->kqd", s.astype(jnp.bfloat16), vp,
                           preferred_element_type=jnp.float32)
            acc = acc + o.sum()
        return acc

    def int8_dot(k8, v8, qi, pi):
        acc = jnp.zeros((), jnp.float32)
        for p in range(2):
            cp = (((k8.astype(jnp.uint8) >> jnp.uint8(4 * p))
                   & jnp.uint8(0xF)).astype(jnp.int8))
            s = jnp.einsum("kqd,kwd->kqw", qi, cp,
                           preferred_element_type=jnp.int32)
            vp = (((v8.astype(jnp.uint8) >> jnp.uint8(4 * p))
                   & jnp.uint8(0xF)).astype(jnp.int8))
            o = jnp.einsum("kqw,kwd->kqd", pi, vp,
                           preferred_element_type=jnp.int32)
            acc = acc + s.sum().astype(jnp.float32) + o.sum().astype(
                jnp.float32)
        return acc

    def int8_kdot(k8, v8, qi):
        acc = jnp.zeros((), jnp.float32)
        for p in range(2):
            cp = (((k8.astype(jnp.uint8) >> jnp.uint8(4 * p))
                   & jnp.uint8(0xF)).astype(jnp.int8))
            s = jnp.einsum("kqd,kwd->kqw", qi, cp,
                           preferred_element_type=jnp.int32)
            vp = (((v8.astype(jnp.uint8) >> jnp.uint8(4 * p))
                   & jnp.uint8(0xF)).astype(jnp.bfloat16))
            o = jnp.einsum("kqw,kwd->kqd",
                           s.astype(jnp.bfloat16), vp,
                           preferred_element_type=jnp.float32)
            acc = acc + o.sum()
        return acc

    probe("ctl_bf16", body_loop(ctl_bf16), (kc, vc, qb))
    probe("int8_dot", body_loop(int8_dot), (kc, vc, qi, pi))
    probe("int8_kdot", body_loop(int8_kdot), (kc, vc, qi))
    log("ALL DONE")


if __name__ == "__main__":
    main()
