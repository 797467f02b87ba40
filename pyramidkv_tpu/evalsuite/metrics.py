"""Scoring metrics for LongBench / RULER predictions.

Behavioral spec from /root/reference/metrics.py (qa-F1 en/zh, ROUGE-L,
classification EM-set, retrieval paragraph-id frequency, count frequency,
code fuzzy-ratio, RULER string_match_all) and the dataset->metric map of
/root/reference/eval.py:18-40.  Implementations are fresh; the fuzzywuzzy
dependency (missing in this image) is replaced by an exact Levenshtein
``ratio`` (substitution cost 2 — the same formula python-Levenshtein uses,
so ``fuzz.ratio`` parity holds).
"""

from __future__ import annotations

import re
import string
from collections import Counter

_EN_PUNCT = set(string.punctuation)
_ZH_PUNCT = set(
    string.punctuation
    + "！？｡。＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃》「」"
    "『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏."
)


def normalize_answer(s: str) -> str:
    """lower -> strip punctuation -> drop articles -> squeeze whitespace
    (metrics.py:12-28)."""
    s = "".join(ch for ch in s.lower() if ch not in _EN_PUNCT)
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def normalize_zh_answer(s: str) -> str:
    s = "".join(ch for ch in s.lower() if ch not in _ZH_PUNCT)
    return "".join(s.split())


def _token_f1(pred_tokens, gt_tokens) -> float:
    common = Counter(pred_tokens) & Counter(gt_tokens)
    same = sum(common.values())
    if same == 0:
        return 0.0
    p = same / len(pred_tokens)
    r = same / len(gt_tokens)
    return 2 * p * r / (p + r)


def qa_f1_score(prediction: str, ground_truth: str, **kw) -> float:
    return _token_f1(
        normalize_answer(prediction).split(), normalize_answer(ground_truth).split()
    )


def qa_f1_zh_score(prediction: str, ground_truth: str, **kw) -> float:
    import jieba

    pt = [normalize_zh_answer(t) for t in jieba.cut(prediction, cut_all=False)]
    gt = [normalize_zh_answer(t) for t in jieba.cut(ground_truth, cut_all=False)]
    pt = [t for t in pt if t]
    gt = [t for t in gt if t]
    if not pt or not gt:
        return 0.0
    return _token_f1(pt, gt)


def rouge_score(prediction: str, ground_truth: str, **kw) -> float:
    """ROUGE-L F1 (metrics.py:105-111 uses the `rouge` package; errors -> 0)."""
    from rouge import Rouge

    try:
        scores = Rouge().get_scores([prediction], [ground_truth], avg=True)
    except Exception:
        return 0.0
    return scores["rouge-l"]["f"]


def rouge_zh_score(prediction: str, ground_truth: str, **kw) -> float:
    import jieba

    p = " ".join(jieba.cut(prediction, cut_all=False))
    g = " ".join(jieba.cut(ground_truth, cut_all=False))
    return rouge_score(p, g)


def classification_score(prediction: str, ground_truth: str, *, all_classes, **kw) -> float:
    """EM-set score (metrics.py:90-103): matched class names, minus matches
    that are substrings of the gold label (keeps the gold itself)."""
    matches = [c for c in all_classes if c in prediction]
    matches = [
        c for c in matches if not (c in ground_truth and c != ground_truth)
    ]
    if ground_truth in matches:
        return 1.0 / len(matches)
    return 0.0


def _id_frequency_score(prediction: str, gold_id: str) -> float:
    numbers = re.findall(r"\d+", prediction)
    if not numbers:
        return 0.0
    return sum(1 for x in numbers if x == gold_id) / len(numbers)


def retrieval_score(prediction: str, ground_truth: str, **kw) -> float:
    gold = re.findall(r"Paragraph (\d+)", ground_truth)[0]
    return _id_frequency_score(prediction, gold)


def retrieval_zh_score(prediction: str, ground_truth: str, **kw) -> float:
    gold = re.findall(r"段落(\d+)", ground_truth)[0]
    return _id_frequency_score(prediction, gold)


def count_score(prediction: str, ground_truth: str, **kw) -> float:
    return _id_frequency_score(prediction, str(ground_truth))


def levenshtein_ratio(a: str, b: str) -> float:
    """Similarity ratio with substitution cost 2 — the python-Levenshtein
    formula behind ``fuzz.ratio`` (rounded to 2 decimals like its int //100)."""
    if not a and not b:
        return 1.0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))  # insert cost 1
    for i in range(1, la + 1):
        cur = [i] + [0] * lb    # delete cost 1
        ai = a[i - 1]
        for j in range(1, lb + 1):
            sub = prev[j - 1] + (0 if ai == b[j - 1] else 2)
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    dist = prev[lb]
    return round(100 * (la + lb - dist) / (la + lb)) / 100


def code_sim_score(prediction: str, ground_truth: str, **kw) -> float:
    """First non-comment line of the prediction, fuzzy-matched
    (metrics.py:79-88).  Uses the C++ kernel (csrc/) when built."""
    line = ""
    for cand in prediction.lstrip("\n").split("\n"):
        if "`" not in cand and "#" not in cand and "//" not in cand:
            line = cand
            break
    from ..native import _load

    lib = _load()
    if lib is not None:
        ab, bb = line.encode(), ground_truth.encode()
        return lib.pkv_levenshtein_ratio(ab, len(ab), bb, len(bb))
    return levenshtein_ratio(line, ground_truth)


def string_match_all(preds, refs) -> float:
    """RULER metric (metrics.py:146-153): per-example fraction of reference
    strings contained in the prediction, averaged, x100."""
    score = (
        sum(
            sum(1.0 if r.lower() in p.lower() else 0.0 for r in ref) / len(ref)
            for p, ref in zip(preds, refs)
        )
        / len(preds)
        * 100
    )
    return round(score, 2)


#: dataset -> metric fn (eval.py:18-40)
DATASET_METRICS = {
    "narrativeqa": qa_f1_score,
    "qasper": qa_f1_score,
    "multifieldqa_en": qa_f1_score,
    "multifieldqa_zh": qa_f1_zh_score,
    "hotpotqa": qa_f1_score,
    "2wikimqa": qa_f1_score,
    "musique": qa_f1_score,
    "dureader": rouge_zh_score,
    "gov_report": rouge_score,
    "qmsum": rouge_score,
    "multi_news": rouge_score,
    "vcsum": rouge_zh_score,
    "trec": classification_score,
    "triviaqa": qa_f1_score,
    "samsum": rouge_score,
    "lsht": classification_score,
    "passage_retrieval_en": retrieval_score,
    "passage_count": count_score,
    "passage_retrieval_zh": retrieval_zh_score,
    "lcc": code_sim_score,
    "repobench-p": code_sim_score,
}
