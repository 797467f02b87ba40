"""Worker for the TRUE 2-process `jax.distributed` smoke test
(test_distributed.py) — run as ``python distributed_worker.py <pid> <port>
<outdir>``.

Each process brings 4 virtual CPU devices (XLA_FLAGS set by the parent);
`jax.distributed.initialize` forms the 2-process group, the (data=2,
model=4) mesh spans all 8 global devices, and one TP×DP-sharded
prefill + decode step runs — the single code path the in-process
8-device mesh tests cannot exercise (`parallel/distributed.py`).
The reference has no distributed runtime at all (SURVEY §2.7)."""

import sys


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                               process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pyramidkv_tpu.config import CompressionSpec, ModelSpec
    from pyramidkv_tpu.models import llama
    from pyramidkv_tpu.parallel import (cache_pspec, data_pspec, make_mesh,
                                        param_shardings)
    from pyramidkv_tpu.policy import make_plan

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    mesh = make_mesh((2, 4), ("data", "model"))
    spec = ModelSpec(
        name="dist2p", vocab_size=256, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16,
    )
    comp = CompressionSpec(method="snapkv", max_capacity_prompt=24,
                           window_size=8)
    plan = make_plan(comp, spec.num_hidden_layers, 64, 4)
    shardings = param_shardings(spec, mesh)
    rng = np.random.default_rng(0)
    tokens_np = rng.integers(1, 256, size=(2, 64)).astype(np.int32)
    cache_sh = NamedSharding(mesh, cache_pspec())

    with mesh:
        # params/inputs are built INSIDE jit with explicit out_shardings:
        # global arrays come into existence already sharded across the
        # process group (host-local device_put can't address remote chips)
        params = jax.jit(
            lambda: llama.init_params(spec, jax.random.PRNGKey(0),
                                      dtype=jnp.float32),
            out_shardings=shardings)()
        tok = jax.jit(lambda: jnp.asarray(tokens_np),
                      out_shardings=NamedSharding(mesh, P("data", None)))()
        tl = jax.jit(lambda: jnp.full((2,), 50, jnp.int32),
                     out_shardings=NamedSharding(mesh, data_pspec()))()

        @jax.jit
        def step(params, tokens, true_len):
            logits, cache = llama.prefill(params, spec, plan, tokens,
                                          true_len)
            cache = jax.tree_util.tree_map(
                lambda x: jax.lax.with_sharding_constraint(x, cache_sh)
                if getattr(x, "ndim", 0) >= 3 else x, cache)
            first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            logits2, _ = llama.decode_step(params, spec, plan, cache, first)
            return logits, logits2

        logits, logits2 = step(params, tok, tl)
        # replicate to every process before the host fetch
        rep = jax.jit(lambda a, b: (a, b),
                      out_shardings=NamedSharding(mesh, P()))(logits,
                                                              logits2)
        l1, l2 = (np.asarray(jax.device_get(x)) for x in rep)
    np.save(f"{outdir}/logits_p{pid}.npy", np.stack([l1, l2]))
    print(f"worker {pid} OK", flush=True)


if __name__ == "__main__":
    main()
