"""Prefix caching under SPMD sharding (VERDICT r4 weak #3).

The resumed chunk state is born sharded — `Engine._apply_prefix(mesh=...)`
builds its scatter jit with ``out_shardings`` (batch over `data`, KV-head
axis over `model`, matching the ContinuousBatcher's head-sharded cache) —
and the ContinuousBatcher passes its mesh through, so prefix resume + TP
serving compose without resharding.  Parity oracle: the unsharded scatter
and the unsharded CB run (themselves A/B'd in test_prefix_cache.py).

Runs on the conftest's virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine, PrefixRegistry
from pyramidkv_tpu.models.llama import init_params
from pyramidkv_tpu.parallel import make_mesh
from pyramidkv_tpu.serving import ContinuousBatcher, Request

BUCKET, CHUNK = 256, 64


@pytest.fixture(scope="module")
def setup():
    # KV heads (4) divisible by tp=4 so the head axis shards over `model`
    ms = ModelSpec.tiny(num_attention_heads=4, num_key_value_heads=4)
    params = init_params(ms, jax.random.PRNGKey(0), dtype=jnp.float32)
    return ms, params


def _engine(ms, params, **comp_kw):
    comp = dict(method="snapkv", max_capacity_prompt=64, window_size=8)
    comp.update(comp_kw)
    return Engine(
        ms, CompressionSpec(**comp),
        EngineSpec(max_new_tokens=8, prefill_buckets=(BUCKET,),
                   prefill_chunk=CHUNK),
        params,
    )


def _prompts(prefix, seed, lens):
    rng = np.random.default_rng(seed)
    return [list(prefix) + rng.integers(
        1, 250, size=l - len(prefix)).tolist() for l in lens]


def _assert_head_sharded(state, mesh):
    tp = dict(mesh.shape)["model"]
    for x in jax.tree_util.tree_leaves(state):
        if x.ndim >= 3:
            # KV-head axis (2) split over `model`
            shard_shape = x.sharding.shard_shape(x.shape)
            assert shard_shape[2] == x.shape[2] // tp, (
                x.shape, shard_shape, x.sharding)


def test_bf16_scatter_sharded_parity(setup):
    ms, params = setup
    mesh = make_mesh((2, 4), ("data", "model"))
    eng = _engine(ms, params)
    rng = np.random.default_rng(40)
    prefix = rng.integers(1, 250, size=128).tolist()
    h = eng.precompute_prefix(prefix)
    lens = [180, 200]

    ref_state, ref_k0 = eng._apply_prefix(BUCKET, 2, h, lens)
    with mesh:
        sh_state, sh_k0 = eng._apply_prefix(BUCKET, 2, h, lens, mesh=mesh)
    assert sh_k0 == ref_k0
    _assert_head_sharded(sh_state, mesh)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                    jax.tree_util.tree_leaves(sh_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quant_scatter_sharded_parity(setup):
    """The quantized handle (fullkv+KIVI chunk carry) scatters sharded
    too — every QuantChunkState leaf is [L, B, KV, ...]."""
    ms, params = setup
    mesh = make_mesh((2, 4), ("data", "model"))
    eng = _engine(ms, params, method="fullkv", quant_method="kivi", nbits=8,
                  q_group_size=16)
    rng = np.random.default_rng(41)
    prefix = rng.integers(1, 250, size=128).tolist()
    h = eng.precompute_prefix(prefix)
    assert h.is_quant
    lens = [192, 200]  # first pad 64 = chunk-aligned, second misaligned

    ref_state, ref_k0 = eng._apply_prefix(BUCKET, 2, h, lens)
    with mesh:
        sh_state, sh_k0 = eng._apply_prefix(BUCKET, 2, h, lens, mesh=mesh)
    assert sh_k0 == ref_k0
    _assert_head_sharded(sh_state, mesh)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                    jax.tree_util.tree_leaves(sh_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cb_prefix_on_mesh_token_parity(setup):
    """End-to-end: ContinuousBatcher with a (data, model) mesh + chunked
    refills + registry auto-matched prefix produces the same tokens as
    the meshless CB (head-sharded cache, born-sharded resume state)."""
    ms, params = setup
    mesh = make_mesh((2, 4), ("data", "model"))
    eng = _engine(ms, params)
    rng = np.random.default_rng(42)
    prefix = rng.integers(1, 250, size=128).tolist()
    reg = PrefixRegistry(eng)
    reg.get(prefix)
    prompts = _prompts(prefix, 43, lens=(180, 200, 220))
    other = rng.integers(1, 250, size=150).tolist()

    def reqs():
        rs = [Request(request_id=f"p{i}", prompt_ids=p, max_new_tokens=6)
              for i, p in enumerate(prompts)]
        rs.append(Request(request_id="o", prompt_ids=other,
                          max_new_tokens=6))
        return rs

    kw = dict(quantum=4, refill_tokens=BUCKET, prefix_registry=reg)
    want = {k: v.tokens
            for k, v in ContinuousBatcher(eng, lanes=2, **kw)
            .run(reqs()).items()}
    cb = ContinuousBatcher(eng, lanes=2, mesh=mesh, **kw)
    with mesh:
        got = {k: v.tokens for k, v in cb.run(reqs()).items()}
    assert got == want
