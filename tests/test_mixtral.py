"""Mixtral (MoE) support — the reference's unchecked TODO (README.md:45).

HF MixtralForCausalLM is the numerics oracle: our dense-all-experts
formulation (zero-weighted experts contribute exactly 0) must reproduce
its routing + SwiGLU outputs; expert-parallel sharding must not change
the numbers.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.models.loader import load_params_from_hf, spec_from_hf_dir
from pyramidkv_tpu.policy import make_plan

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    model = transformers.MixtralForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("mx") / "mixtral"
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


def test_prefill_logits_match_hf(checkpoint):
    model, d = checkpoint
    spec = spec_from_hf_dir(d)
    assert spec.num_local_experts == 4 and spec.num_experts_per_tok == 2
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    n = 24
    ids = rng.integers(0, 128, size=(1, n))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers,
                     n, 4)
    logits, cache = jl.prefill(
        params, spec, plan, jnp.asarray(ids, jnp.int32),
        jnp.asarray([n], jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits)[0], ref[0, -1], rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("method", ["fullkv", "snapkv"])
def test_greedy_decode_matches_hf(checkpoint, method):
    model, d = checkpoint
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    n, new = 40, 8
    ids = [int(x) for x in rng.integers(0, 128, size=n)]
    with torch.no_grad():
        ref = model.generate(torch.tensor([ids]), max_new_tokens=new,
                             do_sample=False, pad_token_id=0)[0, n:].numpy()
    eng = Engine(
        spec,
        CompressionSpec(method=method, max_capacity_prompt=64, window_size=8),
        EngineSpec(max_new_tokens=new, prefill_buckets=(64,)), params,
    )
    got = eng.generate([ids], eos_token_ids=()).tokens[0]
    # snapkv with cap >= n keeps everything -> identical to fullkv
    assert got == [int(x) for x in ref], method


def test_moe_capacity_dispatch_matches_dense_when_drop_free(checkpoint):
    """capacity_factor >= E/top_k makes the per-chunk capacity reach chunk
    length — no token can drop, so the dispatch path must reproduce the
    dense-all-experts path (incl. a left-padded batch row)."""
    import dataclasses

    _, d = checkpoint
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    n = 32
    ids = jnp.asarray(rng.integers(0, 128, size=(2, n)), jnp.int32)
    tl = jnp.asarray([n, n - 8], jnp.int32)  # row 1 left-padded by 8
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers,
                     n, 4)
    ref_logits, _ = jl.prefill(params, spec, plan, ids, tl)
    spec_c = dataclasses.replace(
        spec, moe_capacity_factor=spec.num_local_experts
        / spec.num_experts_per_tok)
    got_logits, _ = jl.prefill(params, spec_c, plan, ids, tl)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-5, atol=2e-5)


def test_moe_capacity_dispatch_drop_semantics():
    """Against a numpy oracle: tokens ranked past an expert's capacity lose
    exactly that expert's contribution (no weight renormalisation), rank
    order follows token position, and left-pad columns consume no slots."""
    rng = np.random.default_rng(7)
    b, t, dm, inter, e, k = 1, 24, 16, 32, 4, 2
    x = jnp.asarray(rng.normal(size=(b, t, dm)), jnp.float32)
    wts = {
        "router": jnp.asarray(rng.normal(size=(dm, e)), jnp.float32),
        "w_gate": jnp.asarray(rng.normal(size=(e, dm, inter)) * 0.1, jnp.float32),
        "w_up": jnp.asarray(rng.normal(size=(e, dm, inter)) * 0.1, jnp.float32),
        "w_down": jnp.asarray(rng.normal(size=(e, inter, dm)) * 0.1, jnp.float32),
    }
    pad = 5
    valid = jnp.asarray(np.arange(t) >= pad)[None, :]  # left-pad columns
    cf = 0.5  # per-chunk capacity = ceil(24*2*0.5/4)=6 -> rounded to 8
    cap = 8
    got = jl._moe_mlp(x, wts, top_k=k, capacity_factor=cf, valid=valid)

    # numpy oracle
    xf = np.asarray(x)[0]
    logits = xf @ np.asarray(wts["router"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    topk = np.argsort(-probs, axis=-1)[:, :k]
    wnorm = np.take_along_axis(probs, topk, -1)
    wnorm /= wnorm.sum(-1, keepdims=True)
    weight = np.zeros((t, e))
    np.put_along_axis(weight, topk, wnorm, -1)
    def ffn_e(ei):
        g = xf @ np.asarray(wts["w_gate"])[ei]
        u = xf @ np.asarray(wts["w_up"])[ei]
        return (g / (1 + np.exp(-g)) * u) @ np.asarray(wts["w_down"])[ei]
    outs = np.stack([ffn_e(i) for i in range(e)], 1)  # [T,E,D]
    counts = np.zeros(e, dtype=int)
    y = np.zeros((t, dm))
    for ti in range(t):
        if ti < pad:
            continue  # pad tokens consume no capacity slots
        for ei in np.where(weight[ti] > 0)[0]:
            if counts[ei] < cap:
                y[ti] += weight[ti, ei] * outs[ti, ei]
                counts[ei] += 1
    assert counts.max() == cap  # the oracle really did drop something
    np.testing.assert_allclose(np.asarray(got)[0], y, rtol=1e-4, atol=1e-5)


def test_moe_capacity_dispatch_ep_sharding(checkpoint):
    """The dispatch path's einsums all carry the expert axis: EP sharding
    over the model axis must not change the numbers."""
    import dataclasses

    from pyramidkv_tpu.parallel import make_mesh, shard_params

    _, d = checkpoint
    spec = spec_from_hf_dir(d)
    spec = dataclasses.replace(spec, moe_capacity_factor=1.0)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    n = 32
    ids = jnp.asarray(rng.integers(0, 128, size=(1, n)), jnp.int32)
    tl = jnp.asarray([n], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers,
                     n, 4)
    ref_logits, _ = jl.prefill(params, spec, plan, ids, tl)
    mesh = make_mesh((4, 2), ("data", "model"))
    sp = shard_params(params, spec, mesh)
    with mesh:
        got_logits, _ = jax.jit(
            lambda p, i, t_: jl.prefill(p, spec, plan, i, t_)
        )(sp, ids, tl)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=3e-4, atol=3e-4)


def test_expert_parallel_sharding_matches(checkpoint):
    """EP over the model axis (experts sharded, weighted sum = psum):
    sharded logits == single-device logits."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pyramidkv_tpu.parallel import make_mesh, shard_params
    from pyramidkv_tpu.parallel.mesh import validate_divisibility

    _, d = checkpoint
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    n = 32
    ids = jnp.asarray(rng.integers(0, 128, size=(1, n)), jnp.int32)
    tl = jnp.asarray([n], jnp.int32)
    plan = make_plan(CompressionSpec(method="snapkv", max_capacity_prompt=16,
                                     window_size=4),
                     spec.num_hidden_layers, n, 4)
    ref_logits, _ = jl.prefill(params, spec, plan, ids, tl)

    mesh = make_mesh((4, 2), ("data", "model"))
    validate_divisibility(spec, mesh)
    sp = shard_params(params, spec, mesh)
    with mesh:
        got_logits, _ = jax.jit(
            lambda p, i, t: jl.prefill(p, spec, plan, i, t)
        )(sp, ids, tl)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=3e-4, atol=3e-4)
