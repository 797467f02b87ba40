"""Golden greedy-token traces per method on a fixed tiny model.

Pins the end-to-end numerics (prefill -> compress -> decode) across
refactors: any change that alters WHICH tokens a method keeps, or the
attention/score math, flips these traces.  Regenerate deliberately with
the snippet in this file's git history when an intentional change lands.
"""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_traces.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def eng_factory():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(42), dtype=jnp.float32)

    def mk(method):
        return Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=16,
                            window_size=4, kernel_size=5, recent_size=8,
                            minference_vertical_size=16,
                            minference_slash_size=16, minference_last_q=8),
            EngineSpec(max_new_tokens=8, prefill_buckets=(64,)),
            params,
        )

    return mk


@pytest.mark.parametrize(
    "method", ["fullkv", "snapkv", "pyramidkv", "h2o", "streamingllm",
               "l2norm", "adakv", "think", "minference", "cam", "random"]
)
def test_trace_matches_golden(golden, eng_factory, method):
    out = eng_factory(method).generate([golden["_prompt"]]).tokens[0]
    assert out == golden[method], (method, out, golden[method])


def test_int8_weight_trace(golden):
    from pyramidkv_tpu.models.weights import quantize_weights

    spec = ModelSpec.tiny()
    params = quantize_weights(
        jl.init_params(spec, jax.random.PRNGKey(42), dtype=jnp.float32))
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
    )
    out = eng.generate([golden["_prompt"]]).tokens[0]
    assert out == golden["snapkv_int8w"], out


@pytest.mark.parametrize(
    "name,kw",
    [
        ("snapkv_gqa", dict(method="snapkv", gqa_aggregate=True)),
        ("snapkv_kivi4", dict(method="snapkv", quant_method="kivi", nbits=4)),
        ("snapkv_kivi2", dict(method="snapkv", quant_method="kivi", nbits=2)),
        ("snapkv_pivot", dict(method="snapkv", merge="pivot")),
    ],
)
def test_variant_traces(golden, name, kw):
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(42), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(max_capacity_prompt=16, window_size=4, **kw),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)),
        params,
    )
    out = eng.generate([golden["_prompt"]]).tokens[0]
    assert out == golden[name], (name, out, golden[name])


@pytest.mark.parametrize("method", ["fullkv", "snapkv"])
def test_gemma2_traces(golden, method):
    """Pins the Gemma-2 forward semantics end-to-end: GeGLU, (1+w) norms,
    embed scaling, post-block norms, softcaps, alternating sliding."""
    spec = ModelSpec.tiny(
        name="tiny-gemma2", hidden_act="gelu_tanh",
        query_pre_attn_scalar=32.0, attn_logit_softcapping=5.0,
        final_logit_softcapping=3.0, rmsnorm_unit_offset=True,
        scale_embeddings=True, post_block_norms=True,
        tie_word_embeddings=True, sliding_window=16,
        layer_types=("sliding_attention", "full_attention") * 2,
    )
    params = jl.init_params(spec, jax.random.PRNGKey(42), dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method=method, max_capacity_prompt=16,
                        window_size=4, kernel_size=5),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
    )
    out = eng.generate([golden["_prompt"]]).tokens[0]
    assert out == golden[f"gemma2_{method}"], (method, out)


@pytest.mark.parametrize("name,gs", [("snapkv_int4w", None),
                                     ("snapkv_int4w_g16", 16)])
def test_int4_weight_trace(golden, name, gs):
    """int4 weights (per-channel + AWQ-style grouped) pin the XLA dequant
    path AND the fused kernel (interpret): both must produce the pinned
    tokens — the flagship serving config's end-to-end numerics."""
    from pyramidkv_tpu.models import weights as W

    spec = ModelSpec.tiny()
    params = W.quantize_weights(
        jl.init_params(spec, jax.random.PRNGKey(42), dtype=jnp.float32),
        nbits=4, group_size=gs)
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4),
        EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
    )
    assert eng.generate([golden["_prompt"]]).tokens[0] == golden[name]
    W._FORCE_INT4_KERNEL[0] = True
    try:
        eng2 = Engine(
            spec,
            CompressionSpec(method="snapkv", max_capacity_prompt=16,
                            window_size=4),
            EngineSpec(max_new_tokens=8, prefill_buckets=(64,)), params,
        )
        assert eng2.generate([golden["_prompt"]]).tokens[0] == golden[name]
    finally:
        W._FORCE_INT4_KERNEL[0] = False
