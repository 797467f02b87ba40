"""Orbax params checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import ModelSpec
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.models.checkpoint import load_params, save_params


def test_roundtrip(tmp_path):
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    d = str(tmp_path / "ckpt")
    save_params(d, params)
    back = load_params(d, template=params)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
