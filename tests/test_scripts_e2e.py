"""Execute the shell wrappers END TO END (round 1 validated them with
``bash -n`` only): scripts/longbench.sh drives the real runner with a tiny
random-weight HF checkpoint + word-level tokenizer against a REAL LongBench
data file from the reference snapshot, and the eval runner scores it."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/data/LongBench"


def _tiny_checkpoint(d):
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=4096, tie_word_embeddings=False,
    )
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        d, safe_serialization=True
    )
    # word-level fast tokenizer (no network, no sentencepiece asset)
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    words = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, 500):
        words[f"w{i}"] = i
    for i, common in enumerate(
        ["the", "a", "of", "and", "to", "in", "is", "was", "for", "on"]
    ):
        words[common] = 500 + i
    tok = Tokenizer(WordLevel(words, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = transformers.PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>",
    )
    fast.save_pretrained(d)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DATA, "multifieldqa_zh.jsonl")),
    reason="reference LongBench data not present",
)
def test_longbench_script_end_to_end(tmp_path):
    ckpt = tmp_path / "model"
    _tiny_checkpoint(str(ckpt))
    save = tmp_path / "results"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "longbench.sh"),
         str(ckpt), "snapkv", "32", str(save), REF_DATA,
         "--datasets", "multifieldqa_zh", "--max_num_examples", "1",
         "--model_max_len", "128"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    model_name = "model_32"
    # prediction files use the reference's canonical method casing
    # (eval.py:116 row list) — snapkv -> SnapKV.json
    pred = save / model_name / "multifieldqa_zh" / "SnapKV.json"
    assert pred.exists(), proc.stdout[-2000:]
    lines = [json.loads(x) for x in open(pred)]
    assert len(lines) == 1 and all("pred" in r for r in lines)

    # score it through the eval runner (reference eval.py counterpart)
    proc2 = subprocess.run(
        [sys.executable, "-m", "pyramidkv_tpu.runners.eval",
         "--results_dir", str(save / model_name), "--methods", "snapkv"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env,
    )
    assert proc2.returncode == 0, proc2.stderr[-3000:]
    assert (save / model_name / "results.csv").exists() or \
        (save / model_name / "multifieldqa_zh" / "metrics.json").exists()
