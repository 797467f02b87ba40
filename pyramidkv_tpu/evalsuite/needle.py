"""Needle-in-a-haystack retrieval stress test.

Behavioral spec from /root/reference/run_needle_in_haystack.py: haystack
built by concatenating essay files until the max context length (:447-455);
needle inserted at a depth%% on a sentence boundary by scanning backwards
for a period token (:398-438); sweep = context lengths [s_len, e_len] step
x 10 linear depths (:223-230); per-run score = ROUGE-1 fmeasure x 10 against
the needle (:296-299); greedy 30-token generations stopped at newline/EOS
(:280-289); resume-by-skipping existing result files (:259-267, :352-372).
"""

from __future__ import annotations

import glob
import json
import os
import time
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

DEFAULT_NEEDLE = (
    "\nThe best thing to do in San Francisco is eat a sandwich and sit in "
    "Dolores Park on a sunny day.\n"
)
DEFAULT_QUESTION = "The best thing to do in San Francisco is: "
PROMPT_FORMAT = (
    "<|im_start|> This is a very long story book: <book> {context} </book>.\n"
    " Based on the content of the book, Question: {question}\nAnswer:"
)


def rouge1_needle_score(needle: str, response: str) -> float:
    """ROUGE-1 fmeasure x 10 with stemming (run_needle_in_haystack.py:30,
    :296-299)."""
    if not response:
        return 0.0
    from rouge_score import rouge_scorer

    sc = rouge_scorer.RougeScorer(["rouge1"], use_stemmer=True)
    return sc.score(needle, response)["rouge1"].fmeasure * 10


def depth_percents(intervals: int = 10, kind: str = "linear") -> "list[float]":
    xs = np.linspace(0, 100, num=intervals, endpoint=True)
    if kind == "linear":
        return [float(x) for x in np.round(xs).astype(int)]
    if kind == "sigmoid":
        # reference logistic: endpoints pinned, 3-decimal rounding
        # (run_needle_in_haystack.py:213-218)
        def logistic(x, L=100.0, x0=50.0, k=0.1):
            if x == 0:
                return 0.0
            if x == 100:
                return 100.0
            return float(np.round(L / (1 + np.exp(-k * (x - x0))), 3))

        return [logistic(float(x)) for x in xs]
    raise ValueError(kind)


@dataclass
class NeedleTester:
    """Drives the sweep through a :class:`GenerationHarness`."""

    harness: "object"  # GenerationHarness
    haystack_dir: str
    results_dir: str = "results_needle"
    model_version: str = "model"
    needle: str = DEFAULT_NEEDLE
    retrieval_question: str = DEFAULT_QUESTION
    #: Multi-needle mode (RULER-style extension; the reference inserts a
    #: single needle): extra needles inserted at depths evenly spaced
    #: between the anchor depth and 100%; the score becomes the MEAN
    #: per-needle ROUGE-1 x 10.
    extra_needles: Sequence[str] = ()
    context_lengths: Sequence[int] = (1000,)
    depths: Sequence[float] = field(default_factory=depth_percents)
    final_context_length_buffer: int = 200
    max_new_tokens: int = 30
    save_contexts: bool = False
    print_status: bool = True

    def _tok(self):
        return self.harness.tokenizer

    def _encode(self, text: str) -> "list[int]":
        return self._tok().encode(text, add_special_tokens=False)

    def _decode(self, ids) -> str:
        return self._tok().decode(ids, skip_special_tokens=True)

    def read_haystack(self) -> "list[int]":
        """Concatenate essay files (repeatedly) until the longest context
        fits; returns token ids."""
        target = max(self.context_lengths)
        text = ""
        files = sorted(glob.glob(os.path.join(self.haystack_dir, "*.txt")))
        if not files:
            raise FileNotFoundError(f"no .txt haystack files in {self.haystack_dir}")
        while len(self._encode(text)) < target:
            for fn in files:
                with open(fn, encoding="utf-8") as f:
                    text += f.read()
            if len(self._encode(text)) == 0:
                raise ValueError("haystack files are empty")
        return self._encode(text)

    def _period_tokens(self) -> "list[int]":
        """Sentence-boundary token ids for the active tokenizer (the
        reference hardcodes per-family ids; we derive them)."""
        cands = set()
        for s in (".", " .", ".\n", "\n"):
            ids = self._encode(s)
            if ids:
                cands.add(ids[-1])
        return list(cands)

    def _all_needles(self) -> "list[str]":
        return [self.needle, *self.extra_needles]

    def _needle_depths(self, depth: float) -> "list[float]":
        needles = self._all_needles()
        if len(needles) == 1:
            return [depth]
        # anchor + the rest evenly spaced toward 100%
        span = 100.0 - depth
        step = span / len(needles)
        return [min(depth + i * step, 100.0) for i in range(len(needles))]

    def _insert_point(self, ctx, depth: float) -> int:
        """Sentence-boundary insertion offset at ``depth``% of ``ctx``
        (reference semantics: walk back to the previous period,
        run_needle_in_haystack.py:398-438)."""
        if depth >= 100:
            return len(ctx)
        point = int(len(ctx) * depth / 100)
        periods = set(self._period_tokens())
        while point > 0 and ctx[point - 1] not in periods:
            point -= 1
        return point

    def build_context(self, haystack_tokens, context_length: int, depth: float) -> str:
        needles = self._all_needles()
        needle_toks = [self._encode(nd) for nd in needles]
        total_nd = sum(len(t) for t in needle_toks)
        budget = context_length - self.final_context_length_buffer
        ctx = list(haystack_tokens[: max(budget - total_nd, 0)])
        # Every insertion point is computed on the ORIGINAL context, then
        # needles are inserted deepest-offset-first: shallower points are
        # strictly <= the already-inserted offsets, so no point can drift
        # into (and split) a previously inserted needle — recomputing
        # points on the grown context could, at close depths.
        placed = [
            (self._insert_point(ctx, dp), toks)
            for toks, dp in zip(needle_toks, self._needle_depths(depth))
        ]
        for point, toks in sorted(placed, key=lambda x: -x[0]):
            ctx = ctx[:point] + toks + ctx[point:]
        return self._decode(ctx)

    def _result_path(self, context_length: int, depth: float) -> str:
        tag = f"{self.model_version.replace('.', '_')}_len_{context_length}_depth_{int(depth * 100)}"
        return os.path.join(self.results_dir, "results", self.model_version, f"{tag}_results.json")

    def result_exists(self, context_length: int, depth: float) -> bool:
        return os.path.exists(self._result_path(context_length, depth))

    def run(self) -> "list[dict]":
        haystack = self.read_haystack()
        results = []
        newline = self._encode("\n")
        eos_ids = [t for t in [self._tok().eos_token_id] if t is not None]
        if newline:
            eos_ids.append(newline[-1])
        for context_length in self.context_lengths:
            for depth in self.depths:
                if self.result_exists(context_length, depth):
                    continue
                t0 = time.time()
                context = self.build_context(haystack, context_length, depth)
                prompt = PROMPT_FORMAT.format(
                    context=context, question=self.retrieval_question
                )
                ids = self._tok().encode(prompt, add_special_tokens=True)
                out = self.harness.engine.generate(
                    [ids], max_new_tokens=self.max_new_tokens, eos_token_ids=eos_ids
                )
                response = self._decode(out.tokens[0]).strip()
                scores = [rouge1_needle_score(nd, response)
                          for nd in self._all_needles()]
                score = sum(scores) / len(scores)
                rec = {
                    "model": self.model_version,
                    "context_length": int(context_length),
                    "depth_percent": float(depth),
                    "needle": self.needle,
                    "model_response": response,
                    "score": score,
                    "test_duration_seconds": time.time() - t0,
                }
                results.append(rec)
                path = self._result_path(context_length, depth)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "w") as f:
                    json.dump(rec, f, ensure_ascii=False)
                if self.save_contexts:
                    cdir = os.path.join(self.results_dir, "contexts", self.model_version)
                    os.makedirs(cdir, exist_ok=True)
                    with open(
                        os.path.join(
                            cdir,
                            f"len_{context_length}_depth_{int(depth*100)}_context.txt",
                        ),
                        "w",
                    ) as f:
                        f.write(context)
                if self.print_status:
                    print(
                        f"[needle] ctx={context_length} depth={depth:.0f}% "
                        f"score={score:.1f} resp={response[:60]!r}"
                    )
        return results


def pivot_scores(results_dir: str, model_version: str) -> "dict[tuple, float]":
    """(context_length, depth) -> score map from saved result JSONs (the
    visualize.py heatmap input)."""
    out = {}
    pat = os.path.join(results_dir, "results", model_version, "*_results.json")
    for path in glob.glob(pat):
        with open(path) as f:
            r = json.load(f)
        out[(r["context_length"], r["depth_percent"])] = r["score"]
    return out
