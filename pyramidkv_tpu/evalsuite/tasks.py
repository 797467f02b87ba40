"""LongBench task registry: prompt templates, generation caps, metrics.

Template strings and caps are verbatim *data* from the reference runner
(/root/reference/run_longbench.py:12-62 — they must match exactly for score
parity); the registry structure (one record per task) replaces the
reference's three parallel dicts.
"""

from __future__ import annotations

from dataclasses import dataclass

from .metrics import DATASET_METRICS


@dataclass(frozen=True)
class LongBenchTask:
    name: str
    prompt_template: str
    max_gen: int
    language: str = "en"


_T = {
    "narrativeqa": ("You are given a story, which can be either a novel or a movie script, and a question. Answer the question asconcisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nStory: {context}\n\nNow, answer the question based on the story asconcisely as you can, using a single phrase if possible. Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:", 128, "en"),
    "qasper": ("You are given a scientific article and a question. Answer the question as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nArticle: {context}\n\n Answer the question based on the above article as concisely as you can, using a single phrase or sentence if possible. If the question cannot be answered based on the information in the article, write \"unanswerable\". If the question is a yes/no question, answer \"yes\", \"no\", or \"unanswerable\". Do not provide any explanation.\n\nQuestion: {input}\n\nAnswer:", 128, "en"),
    "multifieldqa_en": ("Read the following text and answer briefly.\n\n{context}\n\nNow, answer the following question based on the above text, only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 64, "en"),
    "multifieldqa_zh": ("阅读以下文字并用中文简短回答：\n\n{context}\n\n现在请基于上面的文章回答下面的问题，只告诉我答案，不要输出任何其他字词。\n\n问题：{input}\n回答：", 64, "zh"),
    "hotpotqa": ("Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 32, "en"),
    "2wikimqa": ("Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 32, "en"),
    "musique": ("Answer the question based on the given passages. Only give me the answer and do not output any other words.\n\nThe following are given passages.\n{context}\n\nAnswer the question based on the given passages. Only give me the answer and do not output any other words.\n\nQuestion: {input}\nAnswer:", 32, "en"),
    "dureader": ("请基于给定的文章回答下述问题。\n\n文章：{context}\n\n请基于上述文章回答下面的问题。\n\n问题：{input}\n回答：", 128, "zh"),
    "gov_report": ("You are given a report by a government agency. Write a one-page summary of the report.\n\nReport:\n{context}\n\nNow, write a one-page summary of the report.\n\nSummary:", 512, "en"),
    "qmsum": ("You are given a meeting transcript and a query containing a question or instruction. Answer the query in one or more sentences.\n\nTranscript:\n{context}\n\nNow, answer the query based on the above meeting transcript in one or more sentences.\n\nQuery: {input}\nAnswer:", 512, "en"),
    "multi_news": ("You are given several news passages. Write a one-page summary of all news. \n\nNews:\n{context}\n\nNow, write a one-page summary of all the news.\n\nSummary:", 512, "en"),
    "vcsum": ("下面有一段会议记录，请你阅读后，写一段总结，总结会议的内容。\n会议记录：\n{context}\n\n会议总结：", 512, "zh"),
    "trec": ("Please determine the type of the question below. Here are some examples of questions.\n\n{context}\n{input}", 64, "en"),
    "triviaqa": ("Answer the question based on the given passage. Only give me the answer and do not output any other words. The following are some examples.\n\n{context}\n\n{input}", 32, "en"),
    "samsum": ("Summarize the dialogue into a few short sentences. The following are some examples.\n\n{context}\n\n{input}", 128, "en"),
    "lsht": ("请判断给定新闻的类别，下面是一些例子。\n\n{context}\n{input}", 64, "zh"),
    "passage_count": ("There are some paragraphs below sourced from Wikipedia. Some of them may be duplicates. Please carefully read these paragraphs and determine how many unique paragraphs there are after removing duplicates. In other words, how many non-repeating paragraphs are there in total?\n\n{context}\n\nPlease enter the final count of unique paragraphs after removing duplicates. The output format should only contain the number, such as 1, 2, 3, and so on.\n\nThe final answer is: ", 32, "en"),
    "passage_retrieval_en": ("Here are 30 paragraphs from Wikipedia, along with an abstract. Please determine which paragraph the abstract is from.\n\n{context}\n\nThe following is an abstract.\n\n{input}\n\nPlease enter the number of the paragraph that the abstract is from. The answer format must be like \"Paragraph 1\", \"Paragraph 2\", etc.\n\nThe answer is: ", 32, "en"),
    "passage_retrieval_zh": ("以下是若干段落文字，以及其中一个段落的摘要。请确定给定的摘要出自哪一段。\n\n{context}\n\n下面是一个摘要\n\n{input}\n\n请输入摘要所属段落的编号。答案格式必须是\"段落1\"，\"段落2\"等格式\n\n答案是：", 32, "zh"),
    "lcc": ("Please complete the code given below. \n{context}Next line of code:\n", 64, "en"),
    "repobench-p": ("Please complete the code given below. \n{context}{input}Next line of code:\n", 64, "en"),
}

LONGBENCH_TASKS = {
    name: LongBenchTask(name, tpl, max_gen, lang) for name, (tpl, max_gen, lang) in _T.items()
}

#: the 16 English tasks the reference loops over (run_longbench.py:12-14)
LONGBENCH_EN_TASKS = (
    "narrativeqa", "qasper", "multifieldqa_en", "hotpotqa", "2wikimqa",
    "musique", "gov_report", "qmsum", "multi_news", "trec", "triviaqa",
    "samsum", "passage_count", "passage_retrieval_en", "lcc", "repobench-p",
)

#: model-family context caps; longer prompts are middle-truncated
#: (run_longbench.py:75-81)
MODEL_MAX_LEN = {
    "llama2": 3950,
    "llama-2": 3950,
    "llama3": 7950,
    "llama-3": 7950,
    "mistral": 31500,
}

#: tasks whose predictions are cut at the first newline when scoring
#: (eval.py:55-56, :73-74)
FIRST_LINE_TASKS = ("trec", "triviaqa", "samsum", "lsht")

#: RULER task names (run_ruler.py:16-17); per-task gen cap is 64 (:19-31);
#: context lengths default to (4096,) with 8192/16384 in the grid (:13-14)
RULER_TASKS = (
    "niah_single_1", "niah_single_2", "niah_single_3",
    "niah_multikey_1", "niah_multikey_2", "niah_multikey_3",
    "niah_multiquery", "niah_multivalue", "cwe", "fwe", "vt",
)
RULER_MAX_GEN = 64
RULER_CONTEXT_LENGTHS = (4096, 8192, 16384)


def model_family_max_len(model_name: str, default: int = 7950) -> int:
    low = model_name.lower()
    for key, cap in MODEL_MAX_LEN.items():
        if key in low:
            return cap
    return default


def metric_for(dataset: str):
    return DATASET_METRICS[dataset]
