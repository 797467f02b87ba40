"""Parameterized TPU bench driver (VERDICT r2 weak #6: one harness
instead of per-round one-off scripts).

Emits the same JSONL rows as the historical `tpu_round2*_bench.py`
one-offs (kept logs remain the provenance; the scripts themselves are
superseded by this driver + `_bench_common.py`).

Examples:
  # flagship decode row (d32 int4 weights, int4 lm_head, snapkv@4k)
  python scripts/tpu_bench.py --methods snapkv fullkv --ctx 4096

  # long-context KIVI decode
  python scripts/tpu_bench.py --methods fullkv --ctx 65536 \\
      --quant_method kivi --nbits 2 --max_new 64

  # chunked-prefill fullkv-quant (the 128k enabler)
  python scripts/tpu_bench.py --methods fullkv --ctx 131072 \\
      --quant_method kivi --nbits 4 --prefill_chunk 8192 --max_new 32

  # continuous-batching serving leg
  python scripts/tpu_bench.py --serving 8 --ctx 32768 --lanes 4 \\
      --prefill_chunk 8192
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _bench_common import (build_engine, emit, make_logger,
                           random_int4_params, run_generate, spec_depth)

log = make_logger("bench")


def parse():
    p = argparse.ArgumentParser()
    p.add_argument("--methods", nargs="*", default=["snapkv"])
    p.add_argument("--ctx", type=int, default=4096)
    p.add_argument("--depth", type=int, default=32)
    p.add_argument("--cap", type=int, default=128)
    p.add_argument("--caps", type=int, nargs="*", default=None,
                   help="run one engine per capacity in ONE process "
                        "(overrides --cap; r5 method-grid legs)")
    p.add_argument("--window", type=int, default=8)
    p.add_argument("--max_new", type=int, default=128)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--lm_head_nbits", type=int, default=4)
    p.add_argument("--lm_head_pad", type=int, nargs="*", default=[0],
                   help="pad the lm_head vocab axis to multiples of each "
                        "value, one engine per value in ONE process "
                        "(0 = no padding; 2048 -> 129024, 4096 -> 131072; "
                        "logits sliced back)")
    p.add_argument("--quant_method", type=str, default=None)
    p.add_argument("--nbits", type=int, default=8)
    p.add_argument("--q_group_size", type=int, default=64)
    p.add_argument("--q_layout", type=str, default="group",
                   choices=["group", "pa"])
    p.add_argument("--quant_scan", action="store_true",
                   help="EngineSpec.use_quant_scan (chunked XLA dequant "
                        "scan counterfactual; slice-level relayouts only "
                        "- the capacity fallback for kivi8@128k)")
    p.add_argument("--quant_fused", action="store_true",
                   help="EngineSpec.use_quant_fused (factored dequant "
                        "attention on grouped regions)")
    p.add_argument("--quant_fused_kernel", action="store_true",
                   help="EngineSpec.use_quant_fused_kernel (streaming "
                        "factored-dequant Pallas kernel, pa layout)")
    p.add_argument("--prefill_chunk", type=int, default=None)
    p.add_argument("--minference_config", type=str, default=None)
    p.add_argument("--dense_below", type=int, default=None,
                   help="minference_dense_below override (0 = force sparse)")
    p.add_argument("--prefill_block", type=int, default=512)
    p.add_argument("--two_pass", action="store_true",
                   help="EngineSpec.prefill_two_pass (exp-avoidance "
                        "experiment: max pass + rescale-free pass)")
    p.add_argument("--prefill_sub_k", type=int, default=1,
                   help="flash software pipelining: k-sub-tiles per fetched "
                        "block (dots hoisted before softmax updates)")
    p.add_argument("--blocks", type=int, nargs=2, default=None,
                   help="int4 kernel (block_in, block_out2)")
    p.add_argument("--sub_in", type=int, default=0)
    p.add_argument("--op", type=str, default=None, choices=[None, "bf16",
                                                            "f32"])
    p.add_argument("--int4_dma_wins", type=int, nargs="*", default=None,
                   help="sweep the manual-DMA int4 matmul: one engine per "
                        "window size (0 = auto-pipeline control)")
    p.add_argument("--serving", type=int, default=0,
                   help="N requests through the ContinuousBatcher")
    p.add_argument("--lanes", type=int, default=4)
    p.add_argument("--quantum", type=int, default=16)
    p.add_argument("--buckets", type=int, nargs="*", default=None,
                   help="override EngineSpec.prefill_buckets (serving with "
                        "mixed prompt lengths needs a bucket ladder)")
    p.add_argument("--arrival_rate", type=float, default=0.0,
                   help="serving: Poisson arrival rate (req/s); 0 = batch "
                        "arrival (the historical best case)")
    p.add_argument("--prompt_lens", type=int, nargs="*", default=None,
                   help="serving: mixed prompt lengths cycled across "
                        "requests (default: ctx-1 for all)")
    p.add_argument("--prefix_tokens", type=int, default=0,
                   help="shared-prefix caching A/B (Engine.precompute_prefix)"
                        ": every prompt shares this many leading tokens; "
                        "runs a no-handle control leg then the cached leg "
                        "in ONE process (requires --prefill_chunk)")
    p.add_argument("--prefix_host", action="store_true",
                   help="store the prefix handle on HOST (numpy): HBM "
                        "holds it only during the scatter upload")
    p.add_argument("--prefix_nbits", type=int, default=None,
                   help="encode the quant-carry handle at this NARROWER "
                        "bit width (e.g. 2 under a kivi4 plan — the 128k "
                        "kivi4 capacity answer, VERDICT r4 weak #4)")
    p.add_argument("--spec_ab", action="store_true",
                   help="speculative (ngram prompt-lookup) vs plain A/B "
                        "in ONE process: each leg runs a RANDOM prompt "
                        "(worst case: no accepted drafts) and a "
                        "REPETITIVE prompt (drafting-friendly); emits "
                        "tokens/forward (VERDICT r4 weak #1)")
    p.add_argument("--spec_draft_len", type=int, default=8)
    p.add_argument("--spec_ngram", type=int, default=3)
    p.add_argument("--tag", type=str, default="bench")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--profile", type=str, default=None,
                   help="perfetto-trace 16 decode steps of the first "
                        "method's engine into this directory and emit the "
                        "top-30 device ops (works over the axon tunnel)")
    return p.parse_args()


def profile_decode(tag, eng, ctx, tdir, steps=16):
    """Trace ``steps`` decode steps and emit per-op device-time totals
    (the r3c attribution recipe, generalized to any engine config —
    quantized regions and chunked prefill included)."""
    import glob
    import gzip
    import json

    spec = eng.model_spec
    rng = np.random.default_rng(0)
    prompt = np.zeros((1, ctx), np.int32)
    prompt[0, 1:] = rng.integers(0, spec.vocab_size, size=ctx - 1)
    tl = jnp.asarray([ctx - 1], jnp.int32)

    def fresh_cache():
        if (eng.engine_spec.prefill_chunk
                and eng.chunked_prefill_supported(ctx)):
            _, cache = eng._run_chunked_prefill(
                ctx, jnp.asarray(prompt), tl, jax.random.PRNGKey(0))
        else:
            _, cache = eng._get_prefill(ctx)(
                eng.params, jnp.asarray(prompt), tl, jax.random.PRNGKey(0))
        return jax.block_until_ready(cache)

    decode_fn = eng._get_decode(ctx)
    first = jnp.zeros((1,), jnp.int32)
    eos = jnp.asarray([-1], jnp.int32)
    cache = fresh_cache()
    out = decode_fn(eng.params, cache, first, eos, jax.random.PRNGKey(1),
                    jnp.int32(steps))
    jax.block_until_ready(out[0])  # compile + warmup
    cache = fresh_cache()
    t0 = time.perf_counter()
    out = decode_fn(eng.params, cache, first, eos, jax.random.PRNGKey(1),
                    jnp.int32(steps))
    jax.block_until_ready(out[0])
    wall_ms = (time.perf_counter() - t0) * 1e3 / steps
    emit({"bench": f"{tag}/decode_wall_ms_per_step",
          "value": round(wall_ms, 3), "steps": steps})
    cache = fresh_cache()
    jax.profiler.start_trace(tdir, create_perfetto_trace=True)
    out = decode_fn(eng.params, cache, first, eos, jax.random.PRNGKey(1),
                    jnp.int32(steps))
    jax.block_until_ready(out[0])
    jax.profiler.stop_trace()
    time.sleep(2)
    agg = {}
    for f in glob.glob(f"{tdir}/**/*.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            name = ev.get("name", "?")
            t, c = agg.get(name, (0.0, 0))
            agg[name] = (t + ev["dur"], c + 1)
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]
    emit({"bench": f"{tag}/profile_top", "steps": steps,
          "ops": [[n, round(t, 1), c] for n, (t, c) in top]})


def method_comp_kw(method, spec, cap, comp_kw):
    """Per-method CompressionSpec extras: headkv needs per-head priors
    (synthetic, same recipe as runners/bench_methods.py — the real
    heads_score asset covers only specific checkpoints)."""
    kw = dict(comp_kw)
    if method == "headkv":
        L, H = spec.num_hidden_layers, spec.num_attention_heads
        kw["head_capacity"] = tuple(
            tuple(max(cap // 2 + ((i * 7 + j * 13) % cap), 8)
                  for j in range(H)) for i in range(L))
    return kw


def main():
    args = parse()
    assert jax.devices()[0].platform == "tpu", jax.devices()
    from pyramidkv_tpu.models import weights as W

    spec = spec_depth(args.depth)
    params = random_int4_params(spec, jax.random.PRNGKey(0), fused=True,
                                lm_head_nbits=args.lm_head_nbits,
                                lm_head_pad_to=args.lm_head_pad[0] or None)
    if args.blocks:
        W._INT4_KERNEL_BLOCKS[0] = tuple(args.blocks)
    if args.sub_in:
        W._INT4_KERNEL_SUBIN[0] = args.sub_in
    if args.op:
        W._INT4_KERNEL_OP[0] = args.op

    comp_kw = {}
    if args.quant_method:
        comp_kw = dict(quant_method=args.quant_method, nbits=args.nbits,
                       q_group_size=args.q_group_size,
                       q_layout=args.q_layout)
    if args.minference_config:
        from pyramidkv_tpu.config import load_minference_pattern_config

        comp_kw["minference_pattern_config"] = load_minference_pattern_config(
            args.minference_config, spec.num_hidden_layers,
            spec.num_attention_heads)
    if args.dense_below is not None:
        comp_kw["minference_dense_below"] = args.dense_below
    eng_kw = {}
    if args.prefill_sub_k != 1:
        eng_kw["prefill_sub_k"] = args.prefill_sub_k
    if args.two_pass:
        eng_kw["prefill_two_pass"] = True
    if args.prefill_chunk:
        eng_kw["prefill_chunk"] = args.prefill_chunk
    if args.quant_fused:
        eng_kw["use_quant_fused"] = True
    if args.quant_scan:
        eng_kw["use_quant_scan"] = True
    if args.quant_fused_kernel:
        eng_kw["use_quant_fused_kernel"] = True
    if args.buckets:
        eng_kw["prefill_buckets"] = tuple(args.buckets)

    if args.serving:
        from pyramidkv_tpu.serving import (ContinuousBatcher, Request,
                                           latency_summary,
                                           poisson_workload)

        eng = build_engine(spec, params, method=args.methods[0],
                           ctx=args.ctx, cap=args.cap, window=args.window,
                           max_new=args.max_new,
                           prefill_block=args.prefill_block,
                           comp_kw=comp_kw, eng_kw=eng_kw)
        cb = ContinuousBatcher(eng, lanes=args.lanes, quantum=args.quantum)
        rng = np.random.default_rng(0)
        lens = args.prompt_lens or [args.ctx - 1]
        reqs = poisson_workload(
            args.serving, rate=args.arrival_rate, prompt_lens=lens,
            seed=0, vocab=spec.vocab_size)
        handle = None
        if args.prefix_tokens:
            # every request starts with the same span; ctl runs as-is,
            # the cached leg re-runs with the handle attached
            pfx = [int(t) for t in rng.integers(0, spec.vocab_size,
                                                size=args.prefix_tokens)]
            for r in reqs:
                r.prompt_ids = pfx + r.prompt_ids[args.prefix_tokens:]
            t0 = time.perf_counter()
            handle = eng.precompute_prefix(
                pfx, handle_nbits=args.prefix_nbits)
            emit({"bench": f"{args.tag}/prefix_handle",
                  "handle_s": round(time.perf_counter() - t0, 2),
                  "handle_mb": round(handle.kv_bytes / 1e6, 1),
                  "handle_nbits": args.prefix_nbits,
                  "prefix_tokens": args.prefix_tokens})
        log("serving: warmup (compiles all buckets) ...")
        cb.run([Request(f"w{n}", [int(t) for t in rng.integers(
                    0, spec.vocab_size, size=n)], max_new_tokens=8)
                for n in sorted(set(lens))])
        t0 = time.perf_counter()
        res = cb.run(reqs)
        wall = time.perf_counter() - t0
        total = sum(len(r.tokens) for r in res.values())
        row = {"bench": f"{args.tag}/serving_{args.methods[0]}",
               "wall_s": round(wall, 2), "total_tokens": total,
               "serving_tok_s": round(total / wall, 2),
               "requests": args.serving, "ctx": args.ctx,
               "lanes": args.lanes,
               "prefill_chunk": args.prefill_chunk,
               "arrival_rate": args.arrival_rate,
               "prompt_lens": lens if args.prompt_lens else None,
               "sum_prefill_s": round(sum(r.prefill_seconds
                                          for r in res.values()), 2),
               "sum_decode_s": round(sum(r.decode_seconds
                                         for r in res.values()), 2)}
        row.update(latency_summary(res))
        emit(row)
        if handle is not None:
            for r in reqs:
                r.prefix = handle
            cb2 = ContinuousBatcher(eng, lanes=args.lanes,
                                    quantum=args.quantum)
            t0 = time.perf_counter()
            res2 = cb2.run(reqs)
            wall2 = time.perf_counter() - t0
            total2 = sum(len(r.tokens) for r in res2.values())
            row2 = {"bench": f"{args.tag}/serving_{args.methods[0]}_prefix",
                    "wall_s": round(wall2, 2), "total_tokens": total2,
                    "serving_tok_s": round(total2 / wall2, 2),
                    "requests": args.serving,
                    "prefix_tokens": args.prefix_tokens}
            row2.update(latency_summary(res2))
            emit(row2)
        return

    if args.spec_ab:
        rng = np.random.default_rng(0)

        def mk_prompt(kind):
            n = args.ctx - 1
            if kind == "random":
                return [[int(t) for t in rng.integers(
                    0, spec.vocab_size, size=n)]]
            # repetitive: tile a short phrase — prompt-lookup drafts hit
            phrase = [int(t) for t in rng.integers(
                0, spec.vocab_size, size=64)]
            return [(phrase * (n // 64 + 1))[:n]]

        for spec_on in (False, True):
            ekw = dict(eng_kw)
            if spec_on:
                ekw.update(speculative="ngram",
                           spec_ngram=args.spec_ngram,
                           spec_draft_len=args.spec_draft_len)
            eng = build_engine(spec, params, method=args.methods[0],
                               ctx=args.ctx, cap=args.cap,
                               window=args.window, max_new=args.max_new,
                               prefill_block=args.prefill_block,
                               comp_kw=method_comp_kw(
                                   args.methods[0], spec, args.cap,
                                   comp_kw),
                               eng_kw=ekw)
            for kind in ("random", "repetitive"):
                prompts = mk_prompt(kind)
                tag = (f"{args.tag}/{args.methods[0]}_"
                       f"{'spec' if spec_on else 'plain'}_{kind}")
                log(f"{tag}: compiling ...")
                t0 = time.perf_counter()
                out = eng.generate(prompts, max_new_tokens=args.max_new)
                log(f"{tag}: first in {time.perf_counter() - t0:.1f}s")
                best = None
                for _ in range(args.repeats):
                    out = eng.generate(prompts,
                                       max_new_tokens=args.max_new)
                    tps = out.decode_steps / max(out.decode_seconds, 1e-9)
                    if best is None or tps > best[0]:
                        best = (tps, out)
                tps, out = best
                row = {"bench": tag, "ctx": args.ctx,
                       "decode_tokens_per_s": round(tps, 2),
                       "decode_steps": out.decode_steps,
                       "prefill_ms": round(out.prefill_seconds * 1e3, 1)}
                if out.spec_iterations is not None:
                    row["spec_iterations"] = out.spec_iterations
                    row["tokens_per_forward"] = round(
                        out.decode_steps / max(out.spec_iterations, 1), 2)
                if args.quant_method:
                    row["quant"] = f"{args.quant_method}{args.nbits}"
                    row["q_layout"] = args.q_layout
                emit(row)
            del eng
        log("ALL DONE")
        return

    if args.prefix_tokens:
        # generate()-mode shared-prefix A/B: one engine, control
        # (full chunked prefill) vs cached (resume past the prefix)
        eng = build_engine(spec, params, method=args.methods[0],
                           ctx=args.ctx, cap=args.cap, window=args.window,
                           max_new=args.max_new,
                           prefill_block=args.prefill_block,
                           comp_kw=comp_kw, eng_kw=eng_kw)
        rng = np.random.default_rng(0)
        pfx = [int(t) for t in rng.integers(0, spec.vocab_size,
                                            size=args.prefix_tokens)]
        prompts = [pfx + [int(t) for t in rng.integers(
            0, spec.vocab_size, size=args.ctx - 1 - args.prefix_tokens)]
            for _ in range(args.batch)]

        def leg(tag, **kw):
            log(f"{tag}: compiling ...")
            t0 = time.perf_counter()
            out = eng.generate(prompts, max_new_tokens=args.max_new, **kw)
            log(f"{tag}: compiled+first in {time.perf_counter() - t0:.1f}s")
            best = None
            for _ in range(args.repeats):
                out = eng.generate(prompts, max_new_tokens=args.max_new,
                                   **kw)
                if best is None or out.prefill_seconds < best.prefill_seconds:
                    best = out
            emit({"bench": tag,
                  "prefill_ms": round(best.prefill_seconds * 1e3, 1),
                  "decode_tokens_per_s": round(
                      args.batch * best.decode_steps
                      / max(best.decode_seconds, 1e-9), 2),
                  "ctx": args.ctx, "batch": args.batch,
                  "prefix_tokens": args.prefix_tokens})

        leg(f"{args.tag}/{args.methods[0]}_prefix_ctl")
        t0 = time.perf_counter()
        handle = eng.precompute_prefix(pfx, host=args.prefix_host,
                                       handle_nbits=args.prefix_nbits)
        emit({"bench": f"{args.tag}/prefix_handle",
              "handle_s": round(time.perf_counter() - t0, 2),
              "handle_mb": round(handle.kv_bytes / 1e6, 1),
              "handle_nbits": args.prefix_nbits,
              "prefix_tokens": args.prefix_tokens})
        leg(f"{args.tag}/{args.methods[0]}_prefix_cached", prefix=handle)
        log("ALL DONE")
        return

    if args.int4_dma_wins is not None:
        # DMA-variant sweep: one engine per window (trace-time hook)
        for win in args.int4_dma_wins:
            W._INT4_KERNEL_DMA[0] = bool(win)
            W._INT4_KERNEL_DMA[1] = win or 512
            eng = build_engine(spec, params, method=args.methods[0],
                               ctx=args.ctx, cap=args.cap,
                               window=args.window, max_new=args.max_new,
                               prefill_block=args.prefill_block,
                               comp_kw=comp_kw, eng_kw=eng_kw)
            run_generate(f"{args.tag}/dma{win}", eng, args.ctx,
                         max_new=args.max_new, batch=args.batch, log=log,
                         extra={"dma_win": win}, repeats=args.repeats)
        W._INT4_KERNEL_DMA[0] = False
        log("ALL DONE")
        return

    if args.profile:
        eng = build_engine(spec, params, method=args.methods[0],
                           ctx=args.ctx, cap=args.cap, window=args.window,
                           max_new=args.max_new,
                           prefill_block=args.prefill_block,
                           comp_kw=comp_kw, eng_kw=eng_kw)
        profile_decode(f"{args.tag}/{args.methods[0]}", eng, args.ctx,
                       args.profile)
        log("ALL DONE")
        return

    for pi, pad in enumerate(args.lm_head_pad):
        if pi:  # re-draw params with the next pad (same key: same layers)
            params = random_int4_params(spec, jax.random.PRNGKey(0),
                                        fused=True,
                                        lm_head_nbits=args.lm_head_nbits,
                                        lm_head_pad_to=pad or None)
        for method in args.methods:
          for cap in (args.caps or [args.cap]):
            eng = build_engine(spec, params, method=method, ctx=args.ctx,
                               cap=cap, window=args.window,
                               max_new=args.max_new, batch=args.batch,
                               prefill_block=args.prefill_block,
                               comp_kw=method_comp_kw(method, spec, cap,
                                                      comp_kw),
                               eng_kw=eng_kw)
            extra = {"cap": cap} if args.caps else {}
            if args.quant_method:
                # "auto": the factored path is the long-region default
                # since r3p — short grouped regions keep one-shot dequant
                extra = {"quant": f"{args.quant_method}{args.nbits}",
                         "q_layout": args.q_layout,
                         "fused": (True if (args.quant_fused
                                            or args.q_layout == "pa")
                                   else "auto")}
            if args.prefill_chunk:
                extra["prefill_chunk"] = args.prefill_chunk
            if pad:
                extra["lm_head_pad"] = pad
            tag = f"{args.tag}/{method}" + (f"_pad{pad}" if pad else "")
            if args.caps:
                tag += f"_cap{cap}"
            run_generate(tag, eng, args.ctx,
                         max_new=args.max_new, batch=args.batch, log=log,
                         extra=extra or None, repeats=args.repeats)
            del eng
    log("ALL DONE")


if __name__ == "__main__":
    main()
