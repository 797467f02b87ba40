"""True 2-process distributed smoke test (VERDICT r2 weak #5: the one
code path the in-process 8-device mesh tests can't exercise).

Launches coordinator + worker subprocesses (4 virtual CPU devices each)
through `jax.distributed.initialize`, runs one TP×DP-sharded
prefill+decode step on the global (data=2, model=4) mesh, and asserts
cross-process AND cross-topology logit equality against the same step on
this process's single-process 8-device mesh."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step_matches_single_process(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # prepend the repo WITHOUT clobbering the rest (the axon sitecustomize
    # rides PYTHONPATH — CLAUDE.md TPU-over-tunnel rules)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    a = np.load(tmp_path / "logits_p0.npy")
    b = np.load(tmp_path / "logits_p1.npy")
    # both processes hold the SAME global result
    np.testing.assert_array_equal(a, b)

    # single-process reference on this process's 8-device mesh
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pyramidkv_tpu.config import CompressionSpec, ModelSpec
    from pyramidkv_tpu.models import llama
    from pyramidkv_tpu.parallel import (cache_pspec, data_pspec, make_mesh,
                                        param_shardings)
    from pyramidkv_tpu.policy import make_plan

    mesh = make_mesh((2, 4), ("data", "model"))
    spec = ModelSpec(
        name="dist2p", vocab_size=256, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=4,
        head_dim=16,
    )
    comp = CompressionSpec(method="snapkv", max_capacity_prompt=24,
                           window_size=8)
    plan = make_plan(comp, spec.num_hidden_layers, 64, 4)
    rng = np.random.default_rng(0)
    tokens_np = rng.integers(1, 256, size=(2, 64)).astype(np.int32)
    cache_sh = NamedSharding(mesh, cache_pspec())
    with mesh:
        params = jax.jit(
            lambda: llama.init_params(spec, jax.random.PRNGKey(0),
                                      dtype=jnp.float32),
            out_shardings=param_shardings(spec, mesh))()
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

        l1, l2 = step(params, tok, tl)
        ref = np.stack([np.asarray(l1), np.asarray(l2)])
    np.testing.assert_allclose(a, ref, rtol=2e-5, atol=2e-5)
