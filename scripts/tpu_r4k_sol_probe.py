"""Speed-of-light HBM-read probes for the two declared decode ceilings.

VERDICT r3 asked for "a roofline-level attribution showing the factored
path is within ~1.2x of ACHIEVABLE" — the theoretical byte roofline is
not achievable for this access pattern, so measure what is:

  leg A  pure read-reduce of the 64k kivi4-pa region code buffers
         (K+V packed bytes, layer loop like a decode step) — the
         hardware's actual streaming rate for these shapes;
  leg B1 read + per-plane unpack (shift/mask, one pass per plane — the
         factored path's access pattern);
  leg B2 read ONCE + unpack both planes (the hypothetical single-pass
         pattern the multiplane probe tried to reach and lost to
         operand materialisation, r4e);
  leg W  pure read-reduce of the d32 int4 WEIGHT code buffers — the
         achievable rate behind the ~73%-of-roofline int4 decode
         plateau (weak #4).

Every leg is a single jitted fori_loop amortising ITERS passes on
device (CLAUDE.md: the tunnel has a ~29 ms per-call floor; in-jit
amortisation is the only trustworthy microbench).  XOR with the traced
loop index defeats loop-invariant hoisting (no distributive law for
xor over sum, unlike multiply).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_common import emit, make_logger

log = make_logger("sol")

ITERS = 50


def probe(name, fn, args, nbytes, iters=ITERS):
    """Time with a forced host VALUE fetch: through the axon tunnel,
    block_until_ready on a scalar can return bogusly early (first r4k
    take read 1076 TB/s); np.asarray round-trips the actual value, which
    cannot complete before the device work does.  Best of 3."""
    jfn = jax.jit(fn)
    np.asarray(jfn(*args))             # compile + warmup + fetch
    ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(jfn(*args))
        ms = min(ms, (time.perf_counter() - t0) * 1e3 / iters)
    gbs = nbytes / 1e9 / (ms / 1e3)
    emit({"bench": f"r4k/{name}", "ms_per_pass": round(ms, 3),
          "gb": round(nbytes / 1e9, 3), "gb_per_s": round(gbs, 1)})
    log(f"{name}: {ms:.3f} ms/pass, {gbs:.1f} GB/s")
    return ms


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    key = jax.random.PRNGKey(0)

    # --- region codes, 64k kivi4-pa geometry (slot-major K, like r4) ---
    # K: [L, Hk, S/per, D] int8 (per=2 at 4 bits), V: same byte count.
    L, Hk, S, D = 32, 8, 65536 + 256, 128
    W = S // 2
    kc = jax.random.randint(key, (L, Hk, W, D), -128, 128, jnp.int8)
    vc = jax.random.randint(key, (L, Hk, W, D), -128, 128, jnp.int8)
    region_bytes = kc.size + vc.size
    log(f"region codes: {region_bytes/1e9:.2f} GB")

    def layer_loop(body):
        def run(kc, vc):
            def it(i, acc):
                def layer(li, a):
                    return a + body(kc[li], vc[li], i)
                return jax.lax.fori_loop(0, L, layer, acc)
            return jax.lax.fori_loop(0, ITERS, it, jnp.zeros((), jnp.int32))
        return run

    x = jnp.int8  # noqa: F841  (doc: xor keeps i8 lanes, sum widens)

    def read_reduce(k, v, i):
        ii = i.astype(jnp.int8)
        return ((k ^ ii).sum(dtype=jnp.int32)
                + (v ^ ii).sum(dtype=jnp.int32))

    def unpack_per_plane(k, v, i):
        ii = i.astype(jnp.int8)
        ku = (k ^ ii).astype(jnp.uint8)
        acc = jnp.zeros((), jnp.int32)
        for p in range(2):             # one full read per plane (factored)
            acc = acc + (((ku >> jnp.uint8(4 * p)) & jnp.uint8(0xF))
                         .sum(dtype=jnp.int32))
        return acc + (v ^ ii).sum(dtype=jnp.int32)

    def unpack_once(k, v, i):
        ii = i.astype(jnp.int8)
        ku = (k ^ ii).astype(jnp.uint8)
        lo = ku & jnp.uint8(0xF)
        hi = (ku >> jnp.uint8(4)) & jnp.uint8(0xF)
        return (lo.sum(dtype=jnp.int32) + hi.sum(dtype=jnp.int32)
                + (v ^ ii).sum(dtype=jnp.int32))

    probe("region_read", layer_loop(read_reduce), (kc, vc),
          region_bytes)
    probe("region_unpack_per_plane", layer_loop(unpack_per_plane), (kc, vc),
          region_bytes)
    probe("region_unpack_once", layer_loop(unpack_once), (kc, vc),
          region_bytes)
    del kc, vc

    # --- int4 weight codes, d32 8B geometry (fused wqkv/w_gateup) ------
    Dm, I, H, KV, Dh = 4096, 14336, 32, 8, 128
    shapes = {
        "wqkv": (L, Dm, (H * Dh + 2 * KV * Dh) // 2),
        "wo": (L, H * Dh, Dm // 2),
        "w_gateup": (L, Dm, 2 * I // 2),
        "w_down": (L, I, Dm // 2),
    }
    ws = {n: jax.random.randint(jax.random.fold_in(key, j), s, -128, 128,
                                jnp.int8)
          for j, (n, s) in enumerate(shapes.items())}
    wbytes = sum(w.size for w in ws.values())
    log(f"weight codes: {wbytes/1e9:.2f} GB")

    def weight_read(*warrs):
        def it(i, acc):
            ii = i.astype(jnp.int8)
            def layer(li, a):
                for w in warrs:
                    a = a + (w[li] ^ ii).sum(dtype=jnp.int32)
                return a
            return jax.lax.fori_loop(0, L, layer, acc)
        return jax.lax.fori_loop(0, ITERS, it, jnp.zeros((), jnp.int32))

    probe("weights_read", weight_read, tuple(ws.values()), wbytes)
    log("ALL DONE")


if __name__ == "__main__":
    main()
