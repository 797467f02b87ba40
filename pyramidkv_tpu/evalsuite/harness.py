"""Tokenizer + engine glue for the eval runners.

Reproduces the reference runner's prompt pipeline
(/root/reference/run_longbench.py:135-205): template fill, llama2-only
``[INST]`` chat wrap, tokenise, MIDDLE truncation of over-long prompts
(keep first+last half via decode/re-encode), greedy decode with the task's
``max_new_tokens``, prediction JSONL with the example's fields + ``pred``.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Iterable, Optional

from ..engine import Engine


def middle_truncate(token_ids: "list[int]", max_len: int, tokenizer) -> "list[int]":
    """Keep the first and last ``max_len // 2`` tokens (decode + re-encode,
    matching run_longbench.py:195-205 exactly — the re-encode may change the
    token count slightly, as in the reference)."""
    if len(token_ids) <= max_len:
        return list(token_ids)
    half = int(max_len / 2)
    text = tokenizer.decode(token_ids[:half], skip_special_tokens=True) + tokenizer.decode(
        token_ids[-half:], skip_special_tokens=True
    )
    return tokenizer(text, add_special_tokens=True).input_ids


def build_chat_llama2(prompt: str) -> str:
    """[INST] wrap — applied only when the model path contains 'llama2'
    (run_longbench.py:92-94, :146-147)."""
    return f"[INST] {prompt} [/INST]"


@dataclass
class HarnessResult:
    predictions: "list[dict]"
    total_decode_tokens: int
    total_seconds: float


class GenerationHarness:
    """Owns tokenizer + engine; used by all three eval runners."""

    def __init__(
        self,
        engine: Engine,
        tokenizer,
        model_name: str = "",
        model_max_len: int = 7950,
    ):
        self.engine = engine
        self.tokenizer = tokenizer
        self.model_name = model_name
        self.model_max_len = model_max_len

    def prepare_prompt_ids(self, prompt: str, chat_wrap: bool = False) -> "list[int]":
        if chat_wrap and "llama2" in self.model_name.lower():
            prompt = build_chat_llama2(prompt)
        ids = self.tokenizer(prompt, add_special_tokens=True).input_ids
        return middle_truncate(ids, self.model_max_len, self.tokenizer)

    def generate_text(self, prompt: str, max_new_tokens: int,
                      chat_wrap: bool = False) -> str:
        ids = self.prepare_prompt_ids(prompt, chat_wrap)
        eos = [self.tokenizer.eos_token_id] if self.tokenizer.eos_token_id else []
        out = self.engine.generate(
            [ids], max_new_tokens=max_new_tokens, eos_token_ids=eos
        )
        return self.tokenizer.decode(out.tokens[0], skip_special_tokens=True)

    def run_examples(
        self,
        examples: Iterable[dict],
        template: str,
        max_new_tokens: int,
        out_path: Optional[str] = None,
        chat_wrap: bool = True,
        max_examples: Optional[int] = None,
        capacity_ratio: Optional[float] = None,
        engine_factory=None,
    ) -> HarnessResult:
        """Run a dataset through the engine.

        ``capacity_ratio`` reproduces ``--max_capacity_prompts_ratio``
        (run_longbench.py:215-216): per-example capacity = round(prompt_len
        * ratio).  Under static shapes each distinct capacity is a compile,
        so capacities are bucketed to multiples of 64 and engines built
        on demand via ``engine_factory(capacity) -> Engine`` (cached).
        """
        preds = []
        t0 = time.perf_counter()
        total_toks = 0
        engines_by_cap: dict = {}
        fh = open(out_path, "w") if out_path else None
        try:
            for i, ex in enumerate(examples):
                if max_examples is not None and i >= max_examples:
                    break
                prompt = template.format(**ex)
                ids = self.prepare_prompt_ids(prompt, chat_wrap)
                eos = (
                    [self.tokenizer.eos_token_id]
                    if self.tokenizer.eos_token_id is not None
                    else []
                )
                engine = self.engine
                if capacity_ratio is not None:
                    assert engine_factory is not None
                    cap = max(64, (round(len(ids) * capacity_ratio) // 64) * 64)
                    engine = engines_by_cap.get(cap)
                    if engine is None:
                        engine = engines_by_cap[cap] = engine_factory(cap)
                out = engine.generate(
                    [ids], max_new_tokens=max_new_tokens, eos_token_ids=eos
                )
                text = self.tokenizer.decode(out.tokens[0], skip_special_tokens=True)
                total_toks += len(out.tokens[0])
                rec = dict(ex)
                rec["pred"] = text
                preds.append(rec)
                if fh:
                    fh.write(json.dumps(rec, ensure_ascii=False) + "\n")
                    fh.flush()
        finally:
            if fh:
                fh.close()
        return HarnessResult(
            predictions=preds,
            total_decode_tokens=total_toks,
            total_seconds=time.perf_counter() - t0,
        )


def read_jsonl(path: str) -> "list[dict]":
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out
