"""Engine edge cases: bucket overflow, mixed-length batches, immediate EOS,
max_new_tokens below the decode-slot allocation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl


@pytest.fixture(scope="module")
def eng():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(32, 64)),
        params,
    )


def test_prompt_beyond_largest_bucket_rounds_up(eng):
    # 70 tokens > largest bucket 64 -> padded up to a multiple of 64
    ids = [int(x) for x in np.random.default_rng(0).integers(0, 256, size=70)]
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 8


def test_mixed_length_batch(eng):
    rng = np.random.default_rng(1)
    prompts = [[int(x) for x in rng.integers(0, 256, size=n)] for n in (5, 30, 17)]
    out = eng.generate(prompts)
    assert len(out.tokens) == 3
    assert all(len(t) == 8 for t in out.tokens)


def test_eos_stops_early(eng):
    ids = [int(x) for x in np.random.default_rng(2).integers(0, 256, size=20)]
    free = eng.generate([ids]).tokens[0]
    # min_length semantics (run_longbench.py:269): EOS is banned on the
    # FIRST token, so declaring the greedy first choice as EOS forces a
    # different (non-EOS) first token.
    out = eng.generate([ids], eos_token_ids=[free[0]])
    assert len(out.tokens[0]) >= 1
    assert out.tokens[0][0] != free[0]
    # second greedy token as EOS -> exactly one token then stop
    out2 = eng.generate([ids], eos_token_ids=[free[1]])
    assert out2.tokens[0] == [free[0]]


def test_smaller_max_new_tokens(eng):
    ids = [int(x) for x in np.random.default_rng(3).integers(0, 256, size=20)]
    full = eng.generate([ids]).tokens[0]
    short = eng.generate([ids], max_new_tokens=3).tokens[0]
    assert short == full[:3]


def test_single_token_prompt(eng):
    out = eng.generate([[7]])
    assert len(out.tokens[0]) == 8
