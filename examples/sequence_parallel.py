"""Sequence-parallel prefill demo: shard a prompt over an 8-device mesh,
compress it with SnapKV, decode from the replicated cache.

Run (no TPU needed — virtual CPU mesh):
    python examples/sequence_parallel.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, ModelSpec
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.parallel import make_mesh
from pyramidkv_tpu.parallel.sp_prefill import sequence_parallel_prefill
from pyramidkv_tpu.policy import make_plan


def main():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    comp = CompressionSpec(method="snapkv", max_capacity_prompt=32, window_size=8)
    n, max_new = 256, 16
    plan = make_plan(comp, spec.num_hidden_layers, n, max_new)
    mesh = make_mesh((1, 8), ("data", "model"))

    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, size=(1, n)), jnp.int32
    )
    true_len = jnp.asarray([n - 20], jnp.int32)

    logits, cache = sequence_parallel_prefill(
        params, spec, plan, toks, true_len, mesh, axis="model"
    )
    live = int(cache.mask.sum())
    print(f"prompt {int(true_len[0])} tokens sharded over {mesh.shape['model']} "
          f"devices -> compressed cache with {live} live KV entries "
          f"({live // (spec.num_hidden_layers * spec.num_attention_heads)} per head)")

    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    seq = [int(token[0])]
    for _ in range(max_new - 1):
        logits, cache = jl.decode_step(params, spec, plan, cache, token)
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        seq.append(int(token[0]))
    print("decoded:", seq)


if __name__ == "__main__":
    main()
