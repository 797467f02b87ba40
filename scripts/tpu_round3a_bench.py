"""Round-3a: decode-step decomposition at the flagship config (VERDICT r2
next-round #1 — "close the decode dispatch gap").

The r2ag fit said: step_ms = 1.6 fixed + 0.25/layer at d32 int4 snapkv,
with only ~0.1 ms/layer of weight bytes — i.e. ~2x headroom vs the
bandwidth roofline sits in per-layer dispatch + fixed overhead.  This run
attributes that time by measuring the pieces in isolation (each as a
device-side loop inside ONE jit — the tunnel has a ~29 ms floor on
standalone timings):

  - lm_head        : _logits() alone (int8 [4096 x 128256] read)
  - mm_chain       : the 4 fused int4 matmuls/layer x 32 layers (weight
                     stream only)
  - attn_chain     : norms+rope+appends+attention x 32 (no matmuls)
  - dus_chain      : the 4 cache appends/layer alone
  - attnonly_chain : read-only decode attention alone

plus engine-level counterfactuals that need no code changes:

  - staged decode  : per-step commit of K/V rows (the lane path's staged
                     trick) instead of 4 dynamic_update_slice per layer
  - int4 kernel tile variants (2048,2048) / (1024,4096) / (2048,4096)

and a jax.profiler perfetto capture of 16 decode steps (best-effort over
the tunnel), top ops aggregated host-side.
"""

import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from _bench_common import (
    build_engine,
    emit,
    make_logger,
    random_int4_params,
    run_generate,
    spec_depth,
    time_loop_ms,
)

from pyramidkv_tpu.models import llama
from pyramidkv_tpu.models import weights as W
from pyramidkv_tpu.ops.attention import decode_attention

log = make_logger("r3a")

CTX, CAP, WIN, MAX_NEW = 4096, 128, 8, 128


def engine_leg(tag, spec, params, extra=None, eng_kw=None):
    eng = build_engine(spec, params, method="snapkv", ctx=CTX, cap=CAP,
                       window=WIN, max_new=MAX_NEW, eng_kw=eng_kw)
    row = run_generate(tag, eng, CTX, log=log, extra=extra,
                       return_tokens=True)
    if row is None:
        return None, None
    return row[0], row[1]


def staged_leg(spec, params):
    """Engine decode with the lane path's staged commit (K/V rows ride the
    scan ys; ONE scatter per buffer per STEP instead of 4 DUS per layer).
    Zero code change: inject lane_steps = broadcast(cache.step) — slot
    arithmetic and positions are then identical to the plain path."""
    orig = llama.decode_step

    def staged(params_, spec_, plan_, cache_, token_, *, lane_steps=None):
        if lane_steps is None:
            lane_steps = jnp.broadcast_to(
                cache_.step, token_.shape).astype(jnp.int32)
        return orig(params_, spec_, plan_, cache_, token_,
                    lane_steps=lane_steps)

    llama.decode_step = staged
    try:
        return engine_leg("r3a/staged_commit", spec, params)
    finally:
        llama.decode_step = orig


def microbenches(spec, params):
    eng = build_engine(spec, params, method="snapkv", ctx=CTX, cap=CAP,
                       window=WIN, max_new=MAX_NEW)
    plan = eng.plan_for(CTX)
    rng = np.random.default_rng(0)
    prompt = np.zeros((1, CTX), np.int32)
    prompt[0, 1:] = rng.integers(0, spec.vocab_size, size=CTX - 1)
    tl = jnp.asarray([CTX - 1], jnp.int32)
    _, cache = eng._get_prefill(CTX)(params, jnp.asarray(prompt), tl,
                                     jax.random.PRNGKey(0))
    jax.block_until_ready(cache.k)
    log(f"prefill done; cache slots={cache.k.shape}")
    B, Dm = 1, spec.hidden_size
    L = spec.num_hidden_layers
    hidden0 = jnp.ones((B, Dm), jnp.bfloat16) * 0.01
    rows = {}

    # NOTE: every jitted loop below takes ``params`` as an ARGUMENT —
    # closing over the 4 GB weight dict embeds it as jaxpr constants and
    # the serialized remote-compile payload kills the axon tunnel
    # (broken pipe at this exact point, twice: logs/tpu_r3a.log, r3b).

    # -- lm_head ----------------------------------------------------------
    ITER_LM = 64

    @jax.jit
    def lm_loop(params, h):
        def body(i, h):
            lg = llama._logits(h, params, spec)
            return h + (lg[:, :Dm] * 1e-30).astype(h.dtype)
        return jax.lax.fori_loop(0, ITER_LM, body, h)

    rows["lm_head_ms"] = time_loop_ms(lm_loop, (params, hidden0,), ITER_LM,
                                      "lm_head", log)

    # -- weight stream: 4 fused int4 matmuls x L --------------------------
    ITER_MM = 16

    @jax.jit
    def mm_loop(params, x0):
        def it(i, x):
            def layer(c, li):
                wts = W.layer_view(params["layers"], li)
                a = W.mm(c, wts["wqkv"])
                o = W.mm(a[:, :Dm], wts["wo"])
                g = W.mm(c, wts["w_gateup"])
                d = W.mm(g[:, :spec.intermediate_size], wts["w_down"])
                return c + ((o + d) * 1e-30).astype(c.dtype), None
            x, _ = jax.lax.scan(layer, x,
                                jnp.arange(L, dtype=jnp.int32))
            return x
        return jax.lax.fori_loop(0, ITER_MM, it, x0)

    rows["mm_chain_ms"] = time_loop_ms(mm_loop, (params, hidden0,), ITER_MM,
                                       "mm_chain(32L)", log)

    # -- non-matmul layer work on the real cache --------------------------
    inv = llama.rope_inv_freq(spec)
    Hm = cache.k.shape[2]
    Dh = spec.head_dim
    nw = jnp.ones((Dm,), jnp.bfloat16)
    ps = plan.prefill_slots
    ITER_AT = 32

    def make_chain(do_dus, do_attn):
        @jax.jit
        def loop(h0, kf, vf, mf, pf):
            def it(step, st):
                h, kf, vf, mf, pf = st
                posv = tl + step
                slot = ps + jnp.mod(step, MAX_NEW - 1)

                def layer(c, li):
                    h, kf, vf, mf, pf = c
                    x = llama.rms_norm(h, nw, spec.rms_norm_eps, False)
                    xq = jnp.broadcast_to(x[:, None, :Dh], (B, 32, Dh))
                    q = llama.apply_rope(xq[:, :, None, :], posv[:, None],
                                         inv)[:, :, 0, :]
                    kn = llama.apply_rope(
                        xq[:, :Hm, None, :], posv[:, None], inv)[:, :, 0, :]
                    vn = xq[:, :Hm, :]
                    if do_dus:
                        kf = jax.lax.dynamic_update_slice(
                            kf, kn[None, :, :, None, :].astype(kf.dtype),
                            (li, 0, 0, slot, 0))
                        vf = jax.lax.dynamic_update_slice(
                            vf, vn[None, :, :, None, :].astype(vf.dtype),
                            (li, 0, 0, slot, 0))
                        mf = jax.lax.dynamic_update_slice(
                            mf, jnp.ones((1, B, Hm, 1), mf.dtype),
                            (li, 0, 0, slot))
                        pf = jax.lax.dynamic_update_slice(
                            pf, jnp.broadcast_to(
                                posv[None, :, None, None], (1, B, Hm, 1)
                            ).astype(pf.dtype), (li, 0, 0, slot))
                    if do_attn:
                        attn = decode_attention(q, kf[li], vf[li], mf[li])
                        ao = attn.reshape(B, -1)[:, :Dm]
                    else:
                        ao = q.reshape(B, -1)[:, :Dm]
                    h = h + (ao * 1e-30).astype(h.dtype)
                    x2 = llama.rms_norm(h, nw, spec.rms_norm_eps, False)
                    h = h + (x2 * 1e-30).astype(h.dtype)
                    return (h, kf, vf, mf, pf), None

                (h, kf, vf, mf, pf), _ = jax.lax.scan(
                    layer, (h, kf, vf, mf, pf),
                    jnp.arange(L, dtype=jnp.int32))
                return (h, kf, vf, mf, pf)
            return jax.lax.fori_loop(0, ITER_AT, it,
                                     (h0, kf, vf, mf, pf))
        return loop

    args = (hidden0, cache.k, cache.v, cache.mask, cache.positions)
    rows["attn_chain_ms"] = time_loop_ms(
        make_chain(True, True), args, ITER_AT, "attn_chain(32L)", log)
    rows["dus_chain_ms"] = time_loop_ms(
        make_chain(True, False), args, ITER_AT, "dus_chain(32L)", log)
    rows["attnonly_chain_ms"] = time_loop_ms(
        make_chain(False, True), args, ITER_AT, "attnonly_chain(32L)", log)

    emit({"bench": "r3a/decomposition", **{k: round(v, 3)
                                           for k, v in rows.items()}})
    return eng, cache


def profile_leg(eng, spec, params):
    """Best-effort perfetto capture of 16 decode steps."""
    try:
        rng = np.random.default_rng(0)
        prompt = np.zeros((1, CTX), np.int32)
        prompt[0, 1:] = rng.integers(0, spec.vocab_size, size=CTX - 1)
        tl = jnp.asarray([CTX - 1], jnp.int32)
        _, cache = eng._get_prefill(CTX)(params, jnp.asarray(prompt), tl,
                                         jax.random.PRNGKey(0))
        decode_fn = eng._get_decode(CTX)
        first = jnp.zeros((1,), jnp.int32)
        eos = jnp.asarray([-1], jnp.int32)
        rng_k = jax.random.PRNGKey(1)
        # warm (compile outside the trace)
        out = decode_fn(params, cache, first, eos, rng_k, jnp.int32(16))
        jax.block_until_ready(out[0])
        _, cache = eng._get_prefill(CTX)(params, jnp.asarray(prompt), tl,
                                         jax.random.PRNGKey(0))
        jax.block_until_ready(cache.k)
        tdir = "/root/repo/logs/r3a_trace"
        jax.profiler.start_trace(tdir, create_perfetto_trace=True)
        out = decode_fn(params, cache, first, eos, rng_k, jnp.int32(16))
        jax.block_until_ready(out[0])
        jax.profiler.stop_trace()
        time.sleep(2)
        files = glob.glob(f"{tdir}/**/*.json.gz", recursive=True)
        log(f"trace files: {files}")
        agg, agg_g = {}, {}
        for f in files:
            with gzip.open(f, "rt") as fh:
                data = json.load(fh)
            for ev in data.get("traceEvents", []):
                if ev.get("ph") != "X" or "dur" not in ev:
                    continue
                name = ev.get("name", "?")
                dur = ev["dur"]
                t, c = agg.get(name, (0.0, 0))
                agg[name] = (t + dur, c + 1)
                g = name.split(".")[0]
                t, c = agg_g.get(g, (0.0, 0))
                agg_g[g] = (t + dur, c + 1)
        top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]
        topg = sorted(agg_g.items(), key=lambda kv: -kv[1][0])[:25]
        emit({"bench": "r3a/profile_top",
              "ops": [[n, round(t, 1), c] for n, (t, c) in top],
              "grouped": [[n, round(t, 1), c] for n, (t, c) in topg]})
    except Exception as e:  # the tunnel may not support device tracing
        emit({"bench": "r3a/profile_top", "error": repr(e)[-400:]})


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    spec = spec_depth(32)
    params = random_int4_params(spec, jax.random.PRNGKey(0), fused=True)

    ctrl, ctrl_tokens = engine_leg("r3a/control_fused", spec, params)
    st, st_tokens = staged_leg(spec, params)
    if ctrl_tokens is not None and st_tokens is not None:
        emit({"bench": "r3a/staged_tokens_equal",
              "equal": st_tokens == ctrl_tokens})

    for blocks in ((2048, 2048), (1024, 4096), (2048, 4096)):
        W._INT4_KERNEL_BLOCKS[0] = blocks
        try:
            engine_leg(f"r3a/tiles_{blocks[0]}x{blocks[1]}", spec, params,
                       extra={"blocks": list(blocks)})
        finally:
            W._INT4_KERNEL_BLOCKS[0] = None

    eng, _ = microbenches(spec, params)
    profile_leg(eng, spec, params)
    log("ALL DONE")


if __name__ == "__main__":
    main()
