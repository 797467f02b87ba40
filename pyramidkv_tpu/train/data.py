"""Synthetic long-context retrieval data (the in-container stand-in for
the stripped PaulGrahamEssays / RULER blobs —
/root/reference/.MISSING_LARGE_BLOBS).

Three generators over the toy language (:mod:`tokenizer`):

- **haystack**: pseudo-natural filler sentences (subject-verb-object
  templates over the closed vocab) — written as ``*.txt`` essay files so
  `NeedleTester.read_haystack` consumes them unmodified;
- **needle**: "The secret code of the {adj} {noun} is {5 code words} ."
  sentences.  Training contexts embed one TARGET needle plus distractor
  needles for other entities (the model must BIND entity -> code, not
  copy any code it sees) and the answer restates the full needle
  sentence — mirroring the reference's needle response style
  (run_needle_in_haystack.py:296-299 scores response-vs-needle ROUGE-1);
- **multikey**: RULER-niah-style ``key : value`` lines with a single
  queried key (the generator for the missing RULER-style task data).

Training samples reuse the eval prompt template VERBATIM
(`evalsuite.needle.PROMPT_FORMAT`) so there is no train/eval
distribution shift in the harness path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from .tokenizer import (_CODE_WORDS, _ENTITY_ADJS, _ENTITY_NOUNS,
                        _FILLER_WORDS, ToyTokenizer)

# the eval template, duplicated from evalsuite.needle to avoid importing
# the eval stack into the training path; pinned equal by a test
PROMPT_FORMAT = (
    "<|im_start|> This is a very long story book: <book> {context} </book>.\n"
    " Based on the content of the book, Question: {question}\nAnswer:"
)

_SUBJ = [w for w in _FILLER_WORDS if w in (
    "king queen knight wizard farmer merchant sailor doctor teacher "
    "child bird horse wolf bear fox dragon lion eagle".split())]
_VERB = [w for w in _FILLER_WORDS if w in (
    "walked found made took gave saw went came told asked heard kept "
    "held wrote read played watched called liked loved built carried "
    "brought showed helped".split())]
_OBJ = [w for w in _FILLER_WORDS if w in (
    "river mountain forest castle village city bridge tower garden "
    "harbor market temple library road field sky ocean island valley "
    "cave desert meadow stone tree flower".split())]
_ADV = [w for w in _FILLER_WORDS if w in (
    "slowly quickly carefully quietly suddenly finally often always "
    "never sometimes".split())]


def filler_sentence(rng: np.random.Generator) -> str:
    s = [
        "the", str(rng.choice(_SUBJ)), str(rng.choice(_VERB)),
        str(rng.choice(_ADV)), "to", "the", str(rng.choice(_OBJ)), ".",
    ]
    if rng.random() < 0.5:
        s = s[:3] + ["the", str(rng.choice(_OBJ)), "."]
    return " ".join(s)


def filler_text(rng: np.random.Generator, n_tokens: int,
                tok: Optional[ToyTokenizer] = None,
                pool: int = 0) -> str:
    """~``n_tokens`` tokens of filler (each sentence is 6-8 tokens).

    ``pool > 0``: sample sentences WITH REPETITION from a per-document
    pool of that size — repeated n-grams inside the context give the
    (low-weighted) LM loss strong in-context-copy gradients, which is
    the classic accelerant for induction-circuit formation; the
    retrieval task then reuses the same circuit."""
    src_pool = [filler_sentence(rng) for _ in range(pool)] if pool else None
    parts, count = [], 0
    while count < n_tokens:
        s = (src_pool[int(rng.integers(0, pool))] if src_pool
             else filler_sentence(rng))
        parts.append(s)
        count += s.count(" ") + 1
    return " ".join(parts)


def write_haystack(path: str, n_files: int = 4, tokens_per_file: int = 6000,
                   seed: int = 0) -> None:
    """Essay-style ``*.txt`` files for `NeedleTester.read_haystack`."""
    import os

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        with open(os.path.join(path, f"essay{i:02d}.txt"), "w") as f:
            f.write(filler_text(rng, tokens_per_file) + "\n")


def entity(rng: np.random.Generator) -> "tuple[str, str]":
    return str(rng.choice(_ENTITY_ADJS)), str(rng.choice(_ENTITY_NOUNS))


def code(rng: np.random.Generator, k: int = 5) -> "list[str]":
    return [str(w) for w in rng.choice(_CODE_WORDS, size=k, replace=True)]


def needle_sentence(adj: str, noun: str, code_words: "list[str]") -> str:
    # The {noun} repeats right before the code: when the model restates
    # the sentence and has just emitted "is {noun}", a FIRST-ORDER
    # induction head (match my token's previous occurrence, copy its
    # successor) lands on this needle's unique {noun} and chain-copies
    # the code.  The v1-v3 format left only "is" as the pre-code anchor,
    # and "is" occurs in EVERY needle: trained models collapsed onto a
    # mixture of all needles' codes (logs/tpu_r5f_v1/v2 grids).
    return (f"\nthe secret code of the {adj} {noun} is {noun} "
            + " ".join(code_words) + " .\n")


def needle_question(adj: str, noun: str) -> str:
    return f"What is the secret code of the {adj} {noun} ?"


def needle_answer(adj: str, noun: str, code_words: "list[str]") -> str:
    # restate the full sentence — ROUGE-1 vs the needle scores ~1.0 when
    # correct, like the reference's sandwich/Dolores-Park response style
    return (f" the secret code of the {adj} {noun} is {noun} "
            + " ".join(code_words) + " .")


def multikey_line(key_words: "list[str]", val_words: "list[str]") -> str:
    # the trailing key word repeats after ":" — same first-order-anchor
    # rationale as `needle_sentence`
    return ("key " + " ".join(key_words) + " : " + key_words[-1] + " "
            + " ".join(val_words) + " .\n")


@dataclass
class SynthConfig:
    seq_len: int = 1024
    batch: int = 8
    #: distractor needles per context (entity binding pressure)
    distractors: int = 3
    #: fraction of samples using the multikey (RULER-style) task
    multikey_frac: float = 0.3
    #: LM loss weight on non-answer tokens (answer tokens weigh 1.0)
    context_loss_weight: float = 0.1
    #: per-example filler sentence-pool size (0 = every sentence fresh);
    #: small pools repeat n-grams in-context -> induction pressure
    filler_pool: int = 0
    #: fraction of samples using the dense repeated-span task: a random
    #: code span appears TWICE in filler at random positions and the
    #: loss weights the second occurrence (except its first token) at
    #: 1.0 — the canonical induction-head training signal (the ctrl3
    #: fixed-vs-random-position control showed content-based matching
    #: is what the needle task needs and this task trains directly)
    repeat_frac: float = 0.0
    #: QA pairs per needle example: >1 appends further
    #: "Question: ...?\nAnswer: ..." turns about OTHER needles in the
    #: same context — multiplies the retrieval gradient signal per
    #: sequence and gives the model in-context demonstrations of the
    #: task (few-shot structure is the classic induction accelerant).
    #: The eval prompt is exactly the 1-pair prefix of this format.
    qa_pairs: int = 1


def _needle_example(rng, tok: ToyTokenizer, seq_len: int, distractors: int,
                    qa_pairs: int = 1):
    ents, codes, needles, used = [], [], [], set()
    for _ in range(distractors + 1):
        while True:
            a, n = entity(rng)
            if (a, n) not in used:
                used.add((a, n))
                break
        cw = code(rng)
        ents.append((a, n))
        codes.append(cw)
        needles.append(needle_sentence(a, n, cw))
    order = rng.permutation(len(ents))[:max(qa_pairs, 1)]
    qi = int(order[0])
    question = needle_question(*ents[qi])
    answer = needle_answer(*ents[qi], codes[qi])
    for j in order[1:]:
        j = int(j)
        answer += ("\nQuestion: " + needle_question(*ents[j])
                   + "\nAnswer:" + needle_answer(*ents[j], codes[j]))
    return needles, question, answer


def _multikey_example(rng, tok: ToyTokenizer, seq_len: int, distractors: int):
    n_keys = 2 + distractors
    keys, vals = [], []
    seen = set()
    while len(keys) < n_keys:
        k = code(rng, 2)
        if tuple(k) in seen:
            continue
        seen.add(tuple(k))
        keys.append(k)
        vals.append(code(rng, 3))
    qi = int(rng.integers(0, n_keys))
    needles = ["\n" + multikey_line(k, v) for k, v in zip(keys, vals)]
    question = "What is the value of key " + " ".join(keys[qi]) + " ?"
    answer = (" the value of key " + " ".join(keys[qi]) + " is "
              + keys[qi][-1] + " " + " ".join(vals[qi]) + " .")
    return needles, question, answer


def _repeat_example(rng, tok: ToyTokenizer, cfg: SynthConfig,
                    span_len: int = 12):
    """Dense repeated-span sample (see ``SynthConfig.repeat_frac``)."""
    N = cfg.seq_len
    span = tok.encode(" ".join(code(rng, span_len)))
    nf = max(N - 2 * len(span) - 4, 8)
    fill = tok.encode(filler_text(rng, nf, pool=cfg.filler_pool))[:nf]
    a = int(rng.integers(0, len(fill)))
    gap = int(rng.integers(0, len(fill) - a + 1))
    ids = ([tok.bos_token_id] + fill[:a] + span + fill[a:a + gap]
           + span + fill[a + gap:])
    w = [cfg.context_loss_weight] * len(ids)
    s2 = 1 + a + len(span) + gap
    for i in range(s2 + 1, s2 + len(span)):
        w[i] = 1.0   # predict span tokens 2..S from the first match
    ids = (ids + [tok.pad_token_id] * N)[:N]
    w = (w + [0.0] * N)[:N]
    return ids, w


def make_example(rng: np.random.Generator, tok: ToyTokenizer,
                 cfg: SynthConfig) -> "tuple[list[int], list[float]]":
    """One (token_ids, loss_weights) pair of EXACTLY cfg.seq_len tokens.

    Layout: <bos> + PROMPT_FORMAT(context-with-needles, question) +
    answer + <eos> + <pad>...; loss weights are
    ``cfg.context_loss_weight`` on the prompt, 1.0 on answer+<eos>, 0 on
    padding.  (Targets are the NEXT token, shifted inside the loss.)
    """
    if rng.random() < cfg.repeat_frac:
        return _repeat_example(rng, tok, cfg)
    mk = rng.random() < cfg.multikey_frac
    if mk:
        needles, question, answer = _multikey_example(
            rng, tok, cfg.seq_len, cfg.distractors)
    else:
        needles, question, answer = _needle_example(
            rng, tok, cfg.seq_len, cfg.distractors, cfg.qa_pairs)

    ans_ids = tok.encode(answer) + [tok.eos_token_id]
    # budget for the filler: total - template/question/answer - needles
    template_ids = tok.encode(PROMPT_FORMAT.format(context="", question=question))
    needle_ids = [tok.encode(nd) for nd in needles]
    budget = (cfg.seq_len - 1 - len(ans_ids) - len(template_ids)
              - sum(len(n) for n in needle_ids) - 8)
    budget = max(budget, 32)
    ctx_ids = tok.encode(filler_text(rng, budget,
                                     pool=cfg.filler_pool))[:budget]
    # insert needles at random offsets (target needle anywhere, like the
    # eval's depth sweep).  Points are drawn on the ORIGINAL context and
    # applied deepest-first so no needle can split another — the same
    # rule as `evalsuite.needle.NeedleTester` (a sequential random-insert
    # variant tore the target needle apart in ~1/4 of short examples:
    # ACCURACY.md item 2).
    pts = [int(rng.integers(0, len(ctx_ids) + 1)) for _ in needle_ids]
    for at, n_ids in sorted(zip(pts, needle_ids), reverse=True):
        ctx_ids = ctx_ids[:at] + n_ids + ctx_ids[at:]
    context = tok.decode(ctx_ids)
    prompt = PROMPT_FORMAT.format(context=context, question=question)
    ids = [tok.bos_token_id] + tok.encode(prompt)
    w = [cfg.context_loss_weight] * len(ids)
    ids += ans_ids
    w += [1.0] * len(ans_ids)
    ids = ids[:cfg.seq_len]
    w = w[:cfg.seq_len]
    pad = cfg.seq_len - len(ids)
    ids += [tok.pad_token_id] * pad
    w += [0.0] * pad
    return ids, w


def make_batch(rng: np.random.Generator, tok: ToyTokenizer,
               cfg: SynthConfig) -> "tuple[np.ndarray, np.ndarray]":
    """(tokens [B, N] int32, loss_weights [B, N] float32)."""
    ids = np.zeros((cfg.batch, cfg.seq_len), np.int32)
    w = np.zeros((cfg.batch, cfg.seq_len), np.float32)
    for b in range(cfg.batch):
        i, ww = make_example(rng, tok, cfg)
        ids[b] = i
        w[b] = ww
    return ids, w


def write_ruler_niah(path: str, tok: ToyTokenizer, n_examples: int = 50,
                     context_tokens: int = 1500, n_keys: int = 4,
                     seed: int = 0) -> None:
    """RULER-niah-style jsonl (the stripped RULER 8192/16384 data's
    in-container stand-in): one record per line with ``input`` (full
    prompt text) and ``outputs`` (answer strings), the schema
    `runners/run_ruler.py` consumes."""
    import json

    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for _ in range(n_examples):
            keys, vals, seen = [], [], set()
            while len(keys) < n_keys:
                k = code(rng, 2)
                if tuple(k) in seen:
                    continue
                seen.add(tuple(k))
                keys.append(k)
                vals.append(code(rng, 3))
            qi = int(rng.integers(0, n_keys))
            ctx_ids = tok.encode(filler_text(rng, context_tokens))
            for k, v in zip(keys, vals):
                at = int(rng.integers(0, len(ctx_ids) + 1))
                line_ids = tok.encode("\n" + multikey_line(k, v))
                ctx_ids = ctx_ids[:at] + line_ids + ctx_ids[at:]
            context = tok.decode(ctx_ids)
            prompt = PROMPT_FORMAT.format(
                context=context,
                question=("What is the value of key "
                          + " ".join(keys[qi]) + " ?"))
            f.write(json.dumps({
                "index": len(seen),
                "input": prompt,
                "outputs": [" ".join(vals[qi])],
                "length": len(tok.encode(prompt)),
            }) + "\n")
