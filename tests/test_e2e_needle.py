"""CPU-runnable end-to-end needle run with a REAL engine (tiny random
model + byte tokenizer) — the plumbing path of BASELINE config 1
(StreamingLLM, small contexts).  A random model can't retrieve; this
verifies the full stack: haystack build -> needle insertion -> engine
prefill/compress/decode -> scoring -> resume."""

import os

import jax
import jax.numpy as jnp
import pytest

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.evalsuite.harness import GenerationHarness
from pyramidkv_tpu.evalsuite.needle import NeedleTester
from pyramidkv_tpu.models import llama as jl


class ByteTokenizer:
    """UTF-8 byte-level tokenizer — vocab 256 matches ModelSpec.tiny()."""

    eos_token_id = None

    def encode(self, text, add_special_tokens=False):
        return list(text.encode("utf-8"))

    def decode(self, ids, skip_special_tokens=True):
        return bytes(int(i) % 256 for i in ids).decode("utf-8", errors="ignore")

    def __call__(self, text, add_special_tokens=True, **kw):
        class R:
            pass

        r = R()
        r.input_ids = self.encode(text)
        return r


def test_streamingllm_needle_end_to_end(tmp_path):
    hay = tmp_path / "haystack"
    os.makedirs(hay)
    with open(hay / "essay.txt", "w") as f:
        f.write("The quick brown fox jumps over the lazy dog. " * 60)

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method="streamingllm", max_capacity_prompt=96,
                        window_size=8),
        EngineSpec(max_new_tokens=16, prefill_buckets=(512, 1024)),
        params,
    )
    tok = ByteTokenizer()
    harness = GenerationHarness(eng, tok, "tiny", model_max_len=1024)
    tester = NeedleTester(
        harness=harness, haystack_dir=str(hay),
        results_dir=str(tmp_path / "results_needle"), model_version="tiny_sllm_96",
        context_lengths=[300, 500], depths=[0.0, 50.0, 100.0],
        final_context_length_buffer=50, max_new_tokens=16, print_status=False,
    )
    results = tester.run()
    assert len(results) == 6
    for r in results:
        assert 0.0 <= r["score"] <= 10.0
        assert r["context_length"] in (300, 500)
    # the compressed cache honored the 96-token budget
    plan = eng.plan_for(512)
    assert plan.prefill_slots == 96
    # resume: everything skipped on rerun
    assert tester.run() == []
