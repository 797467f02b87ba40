"""Eval-suite behavior tests: metrics math, truncation, report aggregation,
needle construction — all with mock engines/tokenizers (no model)."""

import json
import os

import pytest

from pyramidkv_tpu.engine import GenerationOutput
from pyramidkv_tpu.evalsuite import metrics as M
from pyramidkv_tpu.evalsuite.harness import GenerationHarness, middle_truncate
from pyramidkv_tpu.evalsuite.needle import NeedleTester, depth_percents
from pyramidkv_tpu.evalsuite.report import (
    score_longbench,
    score_ruler_file,
    write_results_csv,
)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_qa_f1():
    assert M.qa_f1_score("The answer is Paris", "paris") > 0
    assert M.qa_f1_score("Paris", "Paris") == 1.0
    assert M.qa_f1_score("nothing", "Paris") == 0.0
    # articles and punctuation are stripped
    assert M.qa_f1_score("the Paris!", "a Paris") == 1.0


def test_classification_score():
    classes = ["location", "location city", "person"]
    # exact label present -> 1/len(matches); superstring rule removes
    # sub-matches of the gold label
    assert M.classification_score("location city", "location city",
                                  all_classes=classes) == 1.0
    assert M.classification_score("location person", "person",
                                  all_classes=classes) == 0.5
    assert M.classification_score("none", "person", all_classes=classes) == 0.0


def test_retrieval_and_count():
    assert M.retrieval_score("Paragraph 7", "Paragraph 7") == 1.0
    assert M.retrieval_score("3 then 7", "Paragraph 7") == 0.5
    assert M.count_score("there are 4 and 4", 4) == 1.0
    assert M.count_score("maybe 3", 4) == 0.0


def test_levenshtein_ratio_matches_fuzz_formula():
    # fuzz.ratio("abcd","abce") = 75; ("kitten","sitting") = 62
    # (sub cost 2: dist=5, (6+7-5)/13 = 0.615 -> rounds to 62)
    assert M.levenshtein_ratio("abcd", "abce") == 0.75
    assert M.levenshtein_ratio("kitten", "sitting") == 0.62
    assert M.levenshtein_ratio("", "") == 1.0
    assert M.levenshtein_ratio("same", "same") == 1.0


def test_code_sim_skips_comment_lines():
    pred = "# comment\nreturn x + 1\n"
    assert M.code_sim_score(pred, "return x + 1") == 1.0


def test_rouge_and_zh():
    assert M.rouge_score("the cat sat", "the cat sat") == pytest.approx(1.0, abs=1e-6)
    assert M.rouge_score("", "x") == 0.0
    assert M.qa_f1_zh_score("北京是中国的首都", "北京") > 0


def test_string_match_all():
    assert M.string_match_all(["has KEY in it"], [["key"]]) == 100.0
    assert M.string_match_all(["a b", "nothing"], [["a", "b"], ["zz"]]) == 50.0


# ---------------------------------------------------------------------------
# mocks
# ---------------------------------------------------------------------------


class WordTokenizer:
    """Whitespace 'tokenizer' with int-coded vocab built on the fly."""

    eos_token_id = 0
    pad_token = "<pad>"
    eos_token = "<eos>"

    def __init__(self):
        self.vocab = {"<eos>": 0}
        self.rev = {0: "<eos>"}

    def _id(self, w):
        if w not in self.vocab:
            i = len(self.vocab)
            self.vocab[w] = i
            self.rev[i] = w
        return self.vocab[w]

    def encode(self, text, add_special_tokens=False):
        return [self._id(w) for w in text.split()]

    def __call__(self, text, add_special_tokens=True, **kw):
        class R:
            pass

        r = R()
        r.input_ids = self.encode(text)
        return r

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(self.rev[i] for i in ids if i in self.rev and i != 0)


class EchoEngine:
    """Returns a canned reply regardless of the prompt."""

    def __init__(self, tokenizer, reply):
        self.tok = tokenizer
        self.reply = reply

    def generate(self, prompts, max_new_tokens=None, eos_token_ids=(), **kw):
        toks = self.tok.encode(self.reply)[: max_new_tokens or 999]
        return GenerationOutput(
            tokens=[list(toks) for _ in prompts],
            prefill_seconds=0.0, decode_seconds=0.001,
            decode_steps=len(toks), kv_cache_bytes=0,
        )


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def test_middle_truncate_keeps_first_and_last_half():
    tok = WordTokenizer()
    words = " ".join(f"w{i}" for i in range(100))
    ids = tok.encode(words)
    out = middle_truncate(ids, 10, tok)
    text = tok.decode(out)
    # the halves are decode-concatenated with no separator
    # (run_longbench.py:197), so the seam token may merge ("w4w95")
    assert text.split()[:4] == ["w0", "w1", "w2", "w3"]
    assert text.split()[-4:] == ["w96", "w97", "w98", "w99"]
    assert len(out) <= 10


def test_harness_runs_examples_and_writes_jsonl(tmp_path):
    tok = WordTokenizer()
    eng = EchoEngine(tok, "Paris is the answer")
    h = GenerationHarness(eng, tok, model_name="llama3-test", model_max_len=64)
    examples = [
        {"context": "some ctx", "input": "capital of France?",
         "answers": ["Paris"], "all_classes": None, "length": 10},
    ]
    out_path = str(tmp_path / "preds.json")
    res = h.run_examples(
        examples, template="C: {context} Q: {input} A:",
        max_new_tokens=16, out_path=out_path,
    )
    assert res.predictions[0]["pred"] == "Paris is the answer"
    rec = json.loads(open(out_path).read().strip())
    assert rec["answers"] == ["Paris"]


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------


def test_score_longbench_max_over_gts_and_first_line_rule():
    # samsum is a FIRST_LINE task -> prediction cut at first newline
    s = score_longbench("samsum", ["good summary\ngarbage"], [["good summary"]], None)
    assert s == 100.0
    s2 = score_longbench("hotpotqa", ["Paris"], [["London", "Paris"]], None)
    assert s2 == 100.0


def test_write_results_csv(tmp_path):
    d = tmp_path / "res" / "hotpotqa"
    os.makedirs(d)
    with open(d / "SnapKV.json", "w") as f:
        f.write(json.dumps({"pred": "Paris", "answers": ["Paris"],
                            "all_classes": None, "length": 100}) + "\n")
    rows = write_results_csv(str(tmp_path / "res"), ["hotpotqa"],
                             methods=("FullKV", "SnapKV"))
    assert rows[0] == ["dataset", "hotpotqa"]
    assert rows[1] == ["FullKV", -1]          # missing -> -1 (eval.py:175-179)
    assert rows[2] == ["SnapKV", 100.0]
    assert os.path.exists(tmp_path / "res" / "hotpotqa" / "metrics.json")
    assert os.path.exists(tmp_path / "res" / "results.csv")


def test_score_ruler_file(tmp_path):
    p = tmp_path / "preds.json"
    with open(p, "w") as f:
        f.write(json.dumps({"pred": "the key is ABC", "answers": ["abc"]}) + "\n")
        f.write(json.dumps({"pred": "nope", "answers": ["xyz"]}) + "\n")
    assert score_ruler_file(str(p)) == 50.0


# ---------------------------------------------------------------------------
# needle
# ---------------------------------------------------------------------------


def test_needle_insertion_and_sweep(tmp_path):
    hay = tmp_path / "haystack"
    os.makedirs(hay)
    sentences = " ".join(f"filler{i} ." for i in range(400))
    with open(hay / "essay.txt", "w") as f:
        f.write(sentences)
    tok = WordTokenizer()
    eng = EchoEngine(tok, "eat a sandwich and sit in Dolores Park")
    h = GenerationHarness(eng, tok, "m", 4096)
    tester = NeedleTester(
        harness=h, haystack_dir=str(hay),
        results_dir=str(tmp_path / "results"), model_version="m",
        context_lengths=[300, 500], depths=[0.0, 50.0, 100.0],
        final_context_length_buffer=20, print_status=False,
    )
    results = tester.run()
    assert len(results) == 6
    assert all(r["score"] > 0 for r in results)  # echo contains the needle
    # needle is inserted at a sentence boundary in the middle depths
    ctx = tester.build_context(tester.read_haystack(), 300, 50.0)
    assert "sandwich" in ctx
    # resume: second run skips everything
    assert tester.run() == []


def test_depth_percents():
    lin = depth_percents(10, "linear")
    assert lin[0] == 0 and lin[-1] == 100 and len(lin) == 10


def test_depth_percents_sigmoid_matches_reference():
    """Exact parity with the reference's logistic (endpoints pinned, 3-dp
    rounding — run_needle_in_haystack.py:213-218)."""
    import numpy as np

    got = depth_percents(10, "sigmoid")

    def ref_logistic(x, L=100, x0=50, k=0.1):
        if x == 0:
            return 0
        if x == 100:
            return 100
        return np.round(L / (1 + np.exp(-k * (x - x0))), 3)

    want = [ref_logistic(x) for x in np.linspace(0, 100, 10, endpoint=True)]
    assert got == [float(w) for w in want]
    assert got[0] == 0.0 and got[-1] == 100.0


def test_zh_metrics_jieba_paths():
    """LongBench-ZH scoring paths (jieba-tokenized F1 / ROUGE / retrieval —
    metrics.py:55-95, dataset2metric rows for the 5 zh tasks)."""
    import pyramidkv_tpu.evalsuite.metrics as M

    assert M.qa_f1_zh_score("北京是中国的首都", "北京是首都") > 0.3
    assert M.rouge_zh_score("会议讨论了预算问题", "会议讨论了预算") > 0.3
    assert M.retrieval_zh_score("答案是段落3", "段落3") == 1.0
    assert M.retrieval_zh_score("答案是段落4", "段落3") == 0.0
    for ds in ("multifieldqa_zh", "dureader", "vcsum", "lsht",
               "passage_retrieval_zh"):
        assert ds in M.DATASET_METRICS


def test_zh_predictions_scored_end_to_end(tmp_path):
    """A dureader-style prediction JSONL runs through the report scorer via
    the rouge_zh (jieba) path."""
    import json as _json

    from pyramidkv_tpu.evalsuite.report import score_prediction_file

    p = tmp_path / "dureader.jsonl"
    with open(p, "w") as f:
        f.write(_json.dumps({
            "pred": "会议讨论了明年的预算安排",
            "answers": ["会议讨论了明年的预算"],
            "all_classes": None, "length": 100,
        }, ensure_ascii=False) + "\n")
    score = score_prediction_file(str(p), "dureader")
    assert float(score) > 20  # rouge_zh f-measure * 100


def test_capacity_ratio_builds_bucketed_engines(tmp_path):
    tok = WordTokenizer()
    built = []

    def factory(cap):
        built.append(cap)
        return EchoEngine(tok, "ans")

    h = GenerationHarness(EchoEngine(tok, "ans"), tok, "m", model_max_len=4096)
    examples = [
        {"context": " ".join(["w"] * n), "input": "q", "answers": ["a"]}
        for n in (100, 120, 400)
    ]
    res = h.run_examples(
        examples, template="{context} {input}", max_new_tokens=4,
        capacity_ratio=0.5, engine_factory=factory,
    )
    assert len(res.predictions) == 3
    # 100->64, 120->64 (shared engine), 400->192: two distinct buckets
    assert sorted(set(built)) == [64, 192]


def test_ruler_real_data_schema(tmp_path):
    """Exercise the RULER normalization + scoring against a real RULER
    jsonl from the reference snapshot (skipped when absent)."""
    import pytest as _pytest

    path = "/root/reference/data/RULER/4096/niah_multikey_3.jsonl"
    if not os.path.exists(path):
        _pytest.skip("reference RULER data absent")
    from pyramidkv_tpu.evalsuite.harness import read_jsonl
    from pyramidkv_tpu.evalsuite.report import score_ruler_file

    examples = read_jsonl(path)[:3]
    for ex in examples:
        ex.setdefault("context", ex.get("input", ""))
        ex.setdefault("answers", ex.get("outputs", []))
    # echo the gold uuid back -> string_match_all must give 100
    tok = WordTokenizer()
    out_path = str(tmp_path / "preds.json")
    import json as _json

    with open(out_path, "w") as f:
        for ex in examples:
            rec = dict(ex)
            rec["pred"] = "the answer is " + ex["answers"][0]
            f.write(_json.dumps(rec) + "\n")
    assert score_ruler_file(out_path) == 100.0


def test_longbench_real_data_schema(tmp_path):
    """Run the LongBench harness flow against a real LongBench jsonl from
    the reference snapshot (multi_news survived the blob strip)."""
    import pytest as _pytest

    path = "/root/reference/data/LongBench/multi_news.jsonl"
    if not os.path.exists(path):
        _pytest.skip("reference LongBench data absent")
    from pyramidkv_tpu.evalsuite.harness import read_jsonl
    from pyramidkv_tpu.evalsuite.report import score_prediction_file
    from pyramidkv_tpu.evalsuite.tasks import LONGBENCH_TASKS

    examples = read_jsonl(path)[:2]
    assert {"context", "input", "answers", "length"} <= set(examples[0])
    task = LONGBENCH_TASKS["multi_news"]
    tok = WordTokenizer()
    # echo the first gold summary -> rouge-L should be ~1
    eng = EchoEngine(tok, examples[0]["answers"][0])
    h = GenerationHarness(eng, tok, "llama3-t", model_max_len=2000)
    out_path = str(tmp_path / "multi_news")
    os.makedirs(out_path)
    res = h.run_examples(
        examples, template=task.prompt_template, max_new_tokens=task.max_gen,
        out_path=os.path.join(out_path, "SnapKV.json"),
    )
    assert len(res.predictions) == 2
    score = score_prediction_file(
        os.path.join(out_path, "SnapKV.json"), "multi_news"
    )
    assert score > 40  # echo of example-0's gold answer (example 1 differs)


def test_multi_needle_insertion_and_scoring(tmp_path):
    """Multi-needle mode: all needles inserted (deepest-first, sentence
    boundaries), score = mean per-needle ROUGE."""
    hay = tmp_path / "haystack"
    os.makedirs(hay)
    with open(hay / "essay.txt", "w") as f:
        f.write(" ".join(f"filler{i} ." for i in range(500)))
    tok = WordTokenizer()
    eng = EchoEngine(tok, "sandwich in Dolores Park and coffee at Ritual")
    h = GenerationHarness(eng, tok, "m", 4096)
    tester = NeedleTester(
        harness=h, haystack_dir=str(hay),
        results_dir=str(tmp_path / "results"), model_version="m",
        needle="eat a sandwich in Dolores Park .",
        extra_needles=["drink coffee at Ritual ."],
        context_lengths=[400], depths=[25.0],
        final_context_length_buffer=20, print_status=False,
    )
    ctx = tester.build_context(tester.read_haystack(), 400, 25.0)
    assert "sandwich" in ctx and "Ritual" in ctx
    # both needles land at distinct points (25% and ~62.5%)
    assert ctx.index("sandwich") < ctx.index("Ritual")
    results = tester.run()
    assert len(results) == 1 and results[0]["score"] > 0
