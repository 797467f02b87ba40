"""Round-5 accuracy rig (VERDICT r4 next #1): train the tiny retrieval
model in-container, then run the REAL needle harness over the
method x capacity grid and emit the first numbers on the accuracy axis.

Phases (all in ONE process — the axon tunnel charges per-process compile
stalls):
  1. train  — `pyramidkv_tpu.train` Adam loop on synthetic retrieval
              data (needle-sentence + RULER-style multikey tasks),
              checkpoint to --ckpt;
  2. grid   — per (method, capacity[, quant]) Engine: NeedleTester sweep
              (context lengths x 10 depths, ROUGE-1 x 10 scoring,
              per-cell result JSONs under --results_dir) + mean scores
              as JSON rows on stdout;
  3. ruler  — synthetic RULER-niah jsonl through the evalsuite scorer.

Usage (TPU):
  python scripts/r5_accuracy_rig.py --steps 4000 --seq_len 2048 \
      --ckpt data/tiny_retrieval.npz --results_dir results_needle_tiny
CPU smoke:
  python scripts/r5_accuracy_rig.py --cpu --steps 60 --seq_len 256 \
      --eval_lens 200 --methods fullkv snapkv --caps 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--ckpt", type=str, default="data/tiny_retrieval.npz")
    p.add_argument("--skip_train", action="store_true",
                   help="load --ckpt instead of training")
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--seq_len", type=int, default=2048)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--curriculum", type=int, nargs="*", default=None,
                   help="pairs of (steps, seq_len) phases, e.g. "
                        "'--curriculum 1500 512 2500 2048': short "
                        "contexts first makes the retrieval induction "
                        "circuit form much faster, then lengthen")
    p.add_argument("--context_loss_weight", type=float, default=0.1)
    p.add_argument("--distractors", type=int, default=3)
    p.add_argument("--qa_pairs", type=int, default=1)
    p.add_argument("--repeat_frac", type=float, default=0.0)
    p.add_argument("--scan_steps", type=int, default=25)
    p.add_argument("--filler_pool", type=int, default=0,
                   help="repeat filler sentences from a per-example pool "
                        "(induction pressure; 0 = fresh sentences)")
    p.add_argument("--results_dir", type=str, default="results_needle_tiny")
    p.add_argument("--eval_lens", type=int, nargs="*", default=None,
                   help="needle context lengths (default: 6 points up to "
                        "~0.93 * seq_len)")
    p.add_argument("--methods", type=str, nargs="*", default=[
        "fullkv", "snapkv", "pyramidkv", "streamingllm", "h2o", "l2norm",
        "adakv", "think", "cam", "random"])
    p.add_argument("--caps", type=int, nargs="*", default=[64, 128])
    p.add_argument("--quant_widths", type=int, nargs="*", default=[8, 4, 2],
                   help="fullkv+KIVI widths to add to the grid (0 = none)")
    p.add_argument("--skip_ruler", action="store_true")
    return p.parse_args()


def emit(row):
    print(json.dumps(row), flush=True)


def main():
    args = parse()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from pyramidkv_tpu.config import CompressionSpec, EngineSpec
    from pyramidkv_tpu.engine import Engine
    from pyramidkv_tpu.evalsuite.harness import GenerationHarness
    from pyramidkv_tpu.evalsuite.needle import NeedleTester, depth_percents
    from pyramidkv_tpu.train import (SynthConfig, ToyTokenizer, TrainConfig,
                                     load_checkpoint, save_checkpoint,
                                     train, write_haystack)
    from pyramidkv_tpu.train.data import (code, entity, needle_question,
                                          needle_sentence, write_ruler_niah)
    from pyramidkv_tpu.train.loop import tiny_retrieval_spec

    tok = ToyTokenizer()
    log = lambda m: print(m, file=sys.stderr, flush=True)

    # ---- phase 1: train (or load) --------------------------------------
    if args.skip_train:
        params, spec = load_checkpoint(args.ckpt)
        log(f"[rig] loaded {args.ckpt}")
    else:
        spec = tiny_retrieval_spec(len(tok), max_pos=2 * args.seq_len)
        if args.cpu and args.steps <= 200:   # smoke geometry
            spec = dataclasses.replace(spec, num_hidden_layers=2)
        phases = ([(args.curriculum[i], args.curriculum[i + 1])
                   for i in range(0, len(args.curriculum), 2)]
                  if args.curriculum else [(args.steps, args.seq_len)])
        t0 = time.perf_counter()
        # stall resilience (a hung tunnel RPC stranded 900 steps,
        # logs/tpu_r5f.log): checkpoint every scan chunk; on restart,
        # resume from the newest partial (phase-granular: the .step file
        # records "phase:step")
        os.makedirs(os.path.dirname(args.ckpt) or ".", exist_ok=True)
        part = args.ckpt + ".part"
        done_phase, start_step, init_params_ = 0, 0, None
        if os.path.exists(part + ".npz") and os.path.exists(part + ".step"):
            init_params_, pspec = load_checkpoint(part + ".npz")
            assert pspec.num_hidden_layers == spec.num_hidden_layers
            rec = open(part + ".step").read().strip()
            parts_ = rec.split(":")
            done_phase, start_step = ((0, int(parts_[0]))
                                      if len(parts_) == 1
                                      else (int(parts_[0]), int(parts_[1])))
            log(f"[rig] resuming at phase {done_phase} step {start_step}")

        params = init_params_
        for pi, (steps, seq_len) in enumerate(phases):
            if pi < done_phase:
                continue
            cfg = TrainConfig(
                steps=steps, lr=args.lr, scan_steps=args.scan_steps,
                log_every=max(steps // 40, 10),
                synth=SynthConfig(seq_len=seq_len, batch=args.batch,
                                  distractors=args.distractors,
                                  context_loss_weight=args.context_loss_weight,
                                  filler_pool=args.filler_pool,
                                  qa_pairs=args.qa_pairs,
                                  repeat_frac=args.repeat_frac),
            )

            def save_cb(step, p, _pi=pi):
                save_checkpoint(part + ".npz", p, spec, dtype=np.float16)
                with open(part + ".step", "w") as f:
                    f.write(f"{_pi}:{step}")

            params, hist = train(
                spec, cfg, tok=tok, on_log=log, params=params,
                start_step=start_step if pi == done_phase else 0,
                save_cb=save_cb)
            emit({"rig": "train", "phase": pi, "steps": steps,
                  "seq_len": seq_len, "batch": args.batch,
                  "loss_first": round(hist[0][1], 4),
                  "loss_last": round(hist[-1][1], 4),
                  "train_s": round(time.perf_counter() - t0, 1)})
        os.makedirs(os.path.dirname(args.ckpt) or ".", exist_ok=True)
        save_checkpoint(args.ckpt, params, spec, dtype=np.float16)
        for ext in (".part.npz", ".part.step"):
            if os.path.exists(args.ckpt + ext):
                os.remove(args.ckpt + ext)
        log(f"[rig] checkpoint -> {args.ckpt} "
            f"({os.path.getsize(args.ckpt) / 1e6:.1f} MB)")

    act = jnp.float32 if args.cpu else jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, act), params)

    # ---- phase 2: needle grid ------------------------------------------
    hay_dir = os.path.join(args.results_dir, "haystack")
    write_haystack(hay_dir, seed=123)
    lens = args.eval_lens or [
        int(x) for x in np.linspace(400, int(args.seq_len * 0.93), 6)]
    buckets = tuple(sorted({1 << (int(n) + 160).bit_length()
                            for n in lens} | {512}))
    buckets = tuple(b for b in buckets if b <= 2 * args.seq_len)
    rng = np.random.default_rng(7)
    adj, noun = entity(rng)
    cw = code(rng)
    needle = needle_sentence(adj, noun, cw)
    question = needle_question(adj, noun)

    configs = []
    for m in args.methods:
        for cap in args.caps:
            configs.append((m, cap, None))
    for nb in args.quant_widths:
        if nb:
            configs.append(("fullkv", max(args.caps), nb))

    L, H = spec.num_hidden_layers, spec.num_attention_heads
    grid_rows = []
    for method, cap, nb in configs:
        kw = {}
        if method == "headkv":
            kw["head_capacity"] = tuple(
                tuple(max(cap // 2 + ((i * 7 + j * 13) % cap), 8)
                      for j in range(H)) for i in range(L))
        if nb:
            kw.update(quant_method="kivi", nbits=nb, q_group_size=32,
                      q_layout="pa")
        tag = f"{method}{nb or ''}_{cap}"
        try:
            eng = Engine(
                spec,
                CompressionSpec(method=method, max_capacity_prompt=cap,
                                window_size=8, kernel_size=7,
                                pooling="maxpool", **kw),
                EngineSpec(max_new_tokens=30, prefill_buckets=buckets),
                params,
            )
            harness = GenerationHarness(eng, tok, "tiny-retrieval",
                                        model_max_len=max(buckets))
            tester = NeedleTester(
                harness=harness, haystack_dir=hay_dir,
                results_dir=args.results_dir,
                model_version=f"tiny_{tag}",
                needle=needle, retrieval_question=question,
                context_lengths=lens,
                depths=depth_percents(10, "linear"),
                print_status=True,
            )
            t0 = time.perf_counter()
            results = tester.run()
            mean = (sum(r["score"] for r in results) / len(results)
                    if results else float("nan"))
            # mid-depth mean (depths 30-70%): where streamingllm dies
            mid = [r["score"] for r in results
                   if 25 <= r["depth_percent"] <= 75]
            row = {"rig": "needle", "config": tag, "method": method,
                   "cap": cap, "quant": f"kivi{nb}" if nb else None,
                   "mean_score": round(mean, 2),
                   "mid_depth_score": round(sum(mid) / len(mid), 2)
                   if mid else None,
                   "cells": len(results),
                   "wall_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # record the failure, keep the grid going
            import traceback

            row = {"rig": "needle", "config": tag,
                   "error": "".join(traceback.format_exception_only(e))
                   .strip()[:300]}
        emit(row)
        grid_rows.append(row)

    # ---- phase 3: RULER-style multikey through the evalsuite scorer ----
    if not args.skip_ruler:
        from pyramidkv_tpu.evalsuite.metrics import string_match_all

        ruler_path = os.path.join(args.results_dir, "ruler_niah.jsonl")
        write_ruler_niah(ruler_path, tok,
                         n_examples=24,
                         context_tokens=max(lens) - 260, seed=11)
        examples = [json.loads(l) for l in open(ruler_path)]
        for method, cap in [("fullkv", max(args.caps)),
                            ("snapkv", max(args.caps)),
                            ("streamingllm", max(args.caps))]:
            eng = Engine(
                spec,
                CompressionSpec(method=method, max_capacity_prompt=cap,
                                window_size=8, kernel_size=7,
                                pooling="maxpool"),
                EngineSpec(max_new_tokens=30, prefill_buckets=buckets),
                params,
            )
            harness = GenerationHarness(eng, tok, "tiny-retrieval",
                                        model_max_len=max(buckets))
            preds = [harness.generate_text(ex["input"], 30)
                     for ex in examples]
            score = string_match_all(preds, [ex["outputs"]
                                             for ex in examples])
            emit({"rig": "ruler_niah", "method": method, "cap": cap,
                  "score": score, "examples": len(examples)})

    # ---- heatmaps (viztools): per-config depth x length PNGs ----------
    try:
        from pyramidkv_tpu.viztools.plots import needle_heatmap

        hm_dir = os.path.join(args.results_dir, "heatmaps")
        os.makedirs(hm_dir, exist_ok=True)
        for row in grid_rows:
            if "error" in row:
                continue
            tag = row["config"]
            try:
                needle_heatmap(args.results_dir, f"tiny_{tag}",
                               save_path=os.path.join(hm_dir, f"{tag}.png"))
            except Exception as e:
                log(f"[rig] heatmap {tag} failed: {e}")
    except Exception as e:
        log(f"[rig] heatmaps unavailable: {e}")

    log("[rig] ALL DONE")


if __name__ == "__main__":
    main()
