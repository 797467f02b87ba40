"""Multi-chip SPMD correctness on the virtual 8-device CPU mesh: sharded
prefill+decode must produce the same numbers as the single-device run."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pyramidkv_tpu.config import CompressionSpec, ModelSpec
from pyramidkv_tpu.models import llama
from pyramidkv_tpu.parallel import (
    cache_pspec,
    data_pspec,
    make_mesh,
    shard_params,
)
from pyramidkv_tpu.parallel.mesh import validate_divisibility
from pyramidkv_tpu.policy import make_plan


@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 4), (2, 2)])
def test_sharded_prefill_decode_matches_single_device(mesh_shape):
    if np.prod(mesh_shape) > len(jax.devices()):
        pytest.skip("not enough devices")
    dp, tp = mesh_shape
    spec = ModelSpec(
        name="shard-test", vocab_size=128, hidden_size=32,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=8,
    )
    mesh = make_mesh(mesh_shape, ("data", "model"))
    validate_divisibility(spec, mesh)
    comp = CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4)
    bucket, max_new, batch = 48, 4, dp
    plan = make_plan(comp, spec.num_hidden_layers, bucket, max_new)
    params = llama.init_params(spec, jax.random.PRNGKey(1), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 128, size=(batch, bucket)), jnp.int32)
    true_len = jnp.asarray([40] * batch, jnp.int32)

    def step(params, tokens, true_len):
        logits, cache = llama.prefill(params, spec, plan, tokens, true_len)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits2, cache = llama.decode_step(params, spec, plan, cache, first)
        return logits, logits2

    # single-device reference
    ref1, ref2 = jax.jit(step)(params, tokens, true_len)

    # sharded
    cache_sh = NamedSharding(mesh, cache_pspec())
    sp = shard_params(params, spec, mesh)
    st = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    sl = jax.device_put(true_len, NamedSharding(mesh, data_pspec()))

    def sharded_step(params, tokens, true_len):
        logits, cache = llama.prefill(params, spec, plan, tokens, true_len)
        cache = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, cache_sh)
            if x.ndim >= 3 else x,
            cache,
        )
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits2, cache = llama.decode_step(params, spec, plan, cache, first)
        return logits, logits2

    with mesh:
        got1, got2 = jax.jit(sharded_step)(sp, st, sl)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-4, atol=2e-4)


def test_70b_preset_divisible_on_8way_tp():
    from pyramidkv_tpu.config import ModelSpec
    from pyramidkv_tpu.parallel import make_mesh
    from pyramidkv_tpu.parallel.mesh import validate_divisibility

    spec = ModelSpec.preset("llama3-70b")
    assert spec.num_hidden_layers == 80 and spec.num_attention_heads == 64
    mesh = make_mesh((1, 8), ("data", "model"))
    validate_divisibility(spec, mesh)
    for name in ("llama2-7b", "llama3-8b", "mistral-7b"):
        s = ModelSpec.preset(name)
        assert s.hidden_size == 4096


def test_sharded_decode_with_int4_weights():
    """TP decode with packed-int4 weights: the decode layer-scan's
    LayerView leaves must trace under GSPMD (the fused kernel declines on
    multi-device and CPU — mm materializes the layer slice instead) and
    match the single-device int4 run."""
    from pyramidkv_tpu.models.weights import quantize_weights

    spec = ModelSpec(
        name="shard-int4", vocab_size=128, hidden_size=32,
        intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=8,
    )
    mesh = make_mesh((2, 4), ("data", "model"))
    comp = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                           window_size=4)
    bucket, max_new, batch = 48, 4, 2
    plan = make_plan(comp, spec.num_hidden_layers, bucket, max_new)
    params = quantize_weights(
        llama.init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32),
        nbits=4)

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 128, size=(batch, bucket)), jnp.int32)
    true_len = jnp.asarray([40] * batch, jnp.int32)

    def step(params, tokens, true_len):
        logits, cache = llama.prefill(params, spec, plan, tokens, true_len)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits2, cache = llama.decode_step(params, spec, plan, cache, first)
        return logits, logits2

    ref1, ref2 = jax.jit(step)(params, tokens, true_len)

    cache_sh = NamedSharding(mesh, cache_pspec())
    sp = shard_params(params, spec, mesh)
    st = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    sl = jax.device_put(true_len, NamedSharding(mesh, data_pspec()))

    def sharded_step(params, tokens, true_len):
        logits, cache = llama.prefill(params, spec, plan, tokens, true_len)
        cache = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, cache_sh)
            if x.ndim >= 3 else x,
            cache,
        )
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        logits2, cache = llama.decode_step(params, spec, plan, cache, first)
        return logits, logits2

    with mesh:
        got1, got2 = jax.jit(sharded_step)(sp, st, sl)

    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=3e-4, atol=3e-4)
