"""Temperature / top-k sampling (engine extension beyond the reference's
greedy-only decoding)."""

import numpy as np
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl


def _mk(greedy=True, temperature=1.0, top_k=None):
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    return Engine(
        spec,
        CompressionSpec(method="fullkv"),
        EngineSpec(max_new_tokens=8, prefill_buckets=(32,), greedy=greedy,
                   temperature=temperature, sample_top_k=top_k),
        params,
    )


IDS = [int(x) for x in np.random.default_rng(0).integers(0, 256, size=20)]


def test_sampling_is_seed_deterministic():
    eng = _mk(greedy=False, temperature=1.0)
    a = eng.generate([IDS], rng_seed=7).tokens[0]
    b = eng.generate([IDS], rng_seed=7).tokens[0]
    c = eng.generate([IDS], rng_seed=8).tokens[0]
    assert a == b
    assert a != c  # overwhelmingly likely on a random model


def test_low_temperature_approaches_greedy():
    greedy = _mk(greedy=True).generate([IDS]).tokens[0]
    cold = _mk(greedy=False, temperature=1e-4).generate([IDS]).tokens[0]
    assert cold == greedy


def test_top_k_sampling_runs():
    eng = _mk(greedy=False, temperature=1.0, top_k=5)
    out = eng.generate([IDS], rng_seed=3).tokens[0]
    assert len(out) == 8
    assert all(0 <= t < 256 for t in out)
