"""Model numerics parity vs HuggingFace transformers (torch CPU oracle).

The reference IS transformers-with-patches, so HF Llama/Mistral forward
outputs are the ground truth our owned JAX decoder must reproduce
(fullkv = unpatched model)."""

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


def _tiny_hf_llama(tmp_path, mistral=False, seed=0):
    torch.manual_seed(seed)
    if mistral:
        cfg = transformers.MistralConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, sliding_window=16, tie_word_embeddings=False,
        )
        model = transformers.MistralForCausalLM(cfg)
    else:
        cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=512, tie_word_embeddings=False,
        )
        model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path / ("mistral" if mistral else "llama")
    model.save_pretrained(d, safe_serialization=True)
    return model, str(d)


@pytest.mark.parametrize("mistral", [False, True])
def test_prefill_logits_match_hf(tmp_path, mistral):
    model, d = _tiny_hf_llama(tmp_path, mistral=mistral)
    spec = spec_from_hf_dir(d)
    assert spec.num_hidden_layers == 3
    params = load_params_from_hf(d, spec, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    n = 24
    ids = rng.integers(0, 128, size=(1, n))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()  # [1, n, V]

    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers, n, 4)
    logits, cache = jl.prefill(
        params, spec, plan, jnp.asarray(ids, dtype=jnp.int32),
        jnp.asarray([n], dtype=jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits)[0], ref[0, -1], rtol=2e-4, atol=2e-4
    )
    # cache holds exactly n valid slots per layer/head in the prefill region
    assert bool((np.asarray(cache.mask[:, 0, :, :n])).all())
    assert not np.asarray(cache.mask[:, 0, :, n:]).any()


def test_prefill_left_padding_invariance(tmp_path):
    _, d = _tiny_hf_llama(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    n = 20
    ids = rng.integers(0, 128, size=n)

    def run(bucket):
        toks = np.zeros((1, bucket), dtype=np.int32)
        toks[0, bucket - n:] = ids
        plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers, bucket, 4)
        logits, _ = jl.prefill(
            params, spec, plan, jnp.asarray(toks), jnp.asarray([n], jnp.int32)
        )
        return np.asarray(logits)[0]

    np.testing.assert_allclose(run(n), run(32), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mistral", [False, True])
def test_greedy_decode_matches_hf(tmp_path, mistral):
    model, d = _tiny_hf_llama(tmp_path, mistral=mistral)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    n, new = 12, 8
    ids = rng.integers(0, 128, size=(1, n))

    with torch.no_grad():
        ref = model.generate(
            torch.tensor(ids), max_new_tokens=new, do_sample=False,
            pad_token_id=0,
        )[0, n:].numpy()

    eng = Engine(
        spec,
        CompressionSpec(method="fullkv"),
        EngineSpec(max_new_tokens=new, prefill_buckets=(16, 32)),
        params,
    )
    out = eng.generate([list(map(int, ids[0]))], eos_token_ids=())
    assert out.tokens[0] == list(map(int, ref))


def test_compressed_equals_full_when_capacity_suffices(tmp_path):
    """With max_capacity_prompt >= q_len the reference's early exit keeps
    everything (pyramidkv_utils.py:314-315) -> decode must match fullkv."""
    _, d = _tiny_hf_llama(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    n, new = 20, 6
    ids = [int(x) for x in rng.integers(0, 128, size=n)]

    outs = {}
    for method in ("fullkv", "snapkv", "pyramidkv", "h2o", "streamingllm"):
        eng = Engine(
            spec,
            CompressionSpec(method=method, max_capacity_prompt=64, window_size=4),
            EngineSpec(max_new_tokens=new, prefill_buckets=(32,)),
            params,
        )
        outs[method] = eng.generate([ids]).tokens[0]
    for method, toks in outs.items():
        assert toks == outs["fullkv"], method


@pytest.mark.parametrize(
    "method", ["snapkv", "pyramidkv", "h2o", "streamingllm", "l2norm",
               "cam", "adakv", "random", "think"]
)
def test_compressed_decode_runs(tmp_path, method):
    """Every policy end-to-end: prefill -> compressed cache -> decode."""
    _, d = _tiny_hf_llama(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    n, new = 28, 4
    ids = [int(x) for x in rng.integers(0, 128, size=n)]
    eng = Engine(
        spec,
        CompressionSpec(method=method, max_capacity_prompt=16, window_size=4,
                        kernel_size=5, recent_size=8),
        EngineSpec(max_new_tokens=new, prefill_buckets=(32,)),
        params,
    )
    out = eng.generate([ids])
    assert len(out.tokens[0]) == new
    assert all(0 <= t < 128 for t in out.tokens[0])
    # compression actually happened: the static prefill region is smaller
    # than the full buffer (pyramidkv's lower layers may keep up to
    # 2*(cap - w) past tokens, so compare against the bucket, not cap).
    plan = eng.plan_for(32)
    if method not in ("l2norm",):
        assert plan.prefill_slots < 32


def test_headkv_decode_runs(tmp_path):
    _, d = _tiny_hf_llama(tmp_path)
    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    L, H = spec.num_hidden_layers, spec.num_attention_heads
    caps = tuple(tuple(4 + (i + j) % 3 for j in range(H)) for i in range(L))
    eng = Engine(
        spec,
        CompressionSpec(method="headkv", max_capacity_prompt=16, window_size=4,
                        head_capacity=caps),
        EngineSpec(max_new_tokens=4, prefill_buckets=(32,)),
        params,
    )
    ids = [int(x) for x in np.random.default_rng(5).integers(0, 128, size=28)]
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 4


def test_tied_embeddings_checkpoint(tmp_path):
    """Loader + logits path for tie_word_embeddings=True checkpoints."""
    torch.manual_seed(9)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=True,
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path / "tied"
    model.save_pretrained(d, safe_serialization=True)
    spec = spec_from_hf_dir(str(d))
    assert spec.tie_word_embeddings
    params = load_params_from_hf(str(d), spec, dtype=jnp.float32)
    assert "lm_head" not in params
    ids = np.random.default_rng(0).integers(0, 128, size=(1, 16))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.float().numpy()
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers, 16, 4)
    logits, _ = jl.prefill(params, spec, plan, jnp.asarray(ids, jnp.int32),
                           jnp.asarray([16], jnp.int32))
    np.testing.assert_allclose(np.asarray(logits)[0], ref[0, -1],
                               rtol=2e-4, atol=2e-4)


def test_mlp_token_chunking_exact():
    """The long-prefill MLP token chunking (the 128k pyramidkv OOM fix)
    matches the monolithic dense MLP — position-wise op; only matmul
    reduction tiling differs (shape-dependent), so allclose at f32."""
    rng = np.random.default_rng(3)
    dm, ffn = 32, 64
    x = jnp.asarray(rng.standard_normal((1, 128, dm)), jnp.float32)
    wts = {
        "w_gateup": jnp.asarray(rng.standard_normal((dm, 2 * ffn)),
                                jnp.float32),
        "w_down": jnp.asarray(rng.standard_normal((ffn, dm)), jnp.float32),
    }
    want = jl._mlp(x, wts)
    old = jl._MLP_CHUNK_THRESHOLD, jl._MLP_CHUNK_ROWS
    jl._MLP_CHUNK_THRESHOLD, jl._MLP_CHUNK_ROWS = 128, 32
    try:
        got = jl._mlp(x, wts)
    finally:
        jl._MLP_CHUNK_THRESHOLD, jl._MLP_CHUNK_ROWS = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-3)
