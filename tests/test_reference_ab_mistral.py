"""Mistral cross-implementation A/B (prefill-level).

Runs the reference's ACTUAL Mistral eager forwards
(/root/reference/pyramidkv/mistral_model.py) for one prefill pass and
compares (a) the last-position logits and (b) the COMPRESSED cache content
(kept positions + K/V rows per layer/head) against our engine's prefill on
the same tiny sliding-window checkpoint.

Decode-level A/B is not possible through the reference's eager Mistral
path: its own shape check (``attn_weights.size() != (bsz, heads, q_len,
kv_seq_len)``, mistral_model.py) compares against the TRUE position count
while the compressed cache is shorter, so compressed decode raises inside
the reference — those forwards are flash-only in practice.  (The
reference's ``replace_mistral`` also cannot be imported at all:
monkeypatch.py:10 references a nonexistent AdaKV symbol — SURVEY §2.5.)
"""

import sys

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from test_reference_ab_model import (  # noqa: E402
    _install_flash_stub,
    _install_hf_compat,
)

_install_flash_stub()


def _install_mistral_compat():
    import transformers.cache_utils as cu
    import transformers.models.mistral.modeling_mistral as mm

    for name in ("StaticCache", "DynamicCache", "Cache"):
        if not hasattr(mm, name) and hasattr(cu, name):
            setattr(mm, name, getattr(cu, name))


_install_hf_compat()
_install_mistral_compat()
ref_mistral = pytest.importorskip("pyramidkv.mistral_model")

from pyramidkv_tpu.config import CompressionSpec  # noqa: E402
from pyramidkv_tpu.models import llama as jl  # noqa: E402
from pyramidkv_tpu.models.loader import (  # noqa: E402
    load_params_from_hf,
    spec_from_hf_dir,
)
from pyramidkv_tpu.policy import make_plan  # noqa: E402

REF_FWD = {
    "snapkv": ref_mistral.mistral_attn_forward_SnapKV,
    "pyramidkv": ref_mistral.mistral_attn_forward_PyramidKV,
    "streamingllm": ref_mistral.mistral_attn_forward_StreamingLLM,
    "h2o": ref_mistral.mistral_attn_forward_H2O,
    "l2norm": ref_mistral.mistral_attn_forward_L2Norm,
    "cam": ref_mistral.mistral_attn_forward_CAM,
}

N, CAP, W, KS = 96, 32, 8, 7


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, sliding_window=64,
        tie_word_embeddings=False,
    )
    model = transformers.MistralForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("mst") / "mistral"
    model.save_pretrained(d, safe_serialization=True)
    rng = np.random.default_rng(0)
    ids = [int(x) for x in rng.integers(0, 128, size=N)]
    return model, str(d), ids


class _RotarySeqLenShim:
    """Adapter for the reference's 4.44-era L2Norm rotary call
    (``self.rotary_emb(v, seq_len=kv_seq_len)``, mistral_model.py:566):
    4.57's rotary takes position_ids, and 4.57's apply_rotary_pos_emb
    ignores its trailing position_ids arg (cos/sin arrive pre-gathered) —
    so returning position-gathered tables satisfies both call styles."""

    def __init__(self, rotary, attn):
        self._rotary, self._attn = rotary, attn

    def __call__(self, x, position_ids=None, seq_len=None):
        if position_ids is None or (
                hasattr(position_ids, "ndim") and position_ids.ndim == 0):
            position_ids = self._attn._cur_position_ids
        return self._rotary(x, position_ids)


def _patch(model, method):
    cfg = model.config
    cfg.pretraining_tp = getattr(cfg, "pretraining_tp", 1) or 1
    cfg.window_size = CAP - 4 if method == "streamingllm" else W
    cfg.max_capacity_prompt = CAP
    cfg.kernel_size = KS
    cfg.pooling = "avgpool"
    cfg.merge = None
    cfg.skip_layers = [0, 1]  # l2norm (init_l2norm default, :962)
    rotary = model.model.rotary_emb
    for layer in model.model.layers:
        attn = layer.self_attn
        attn.num_heads = cfg.num_attention_heads
        attn.num_key_value_heads = cfg.num_key_value_heads
        attn.hidden_size = cfg.hidden_size
        attn.attention_dropout = getattr(attn, "attention_dropout", 0.0)
        # 4.57 moved rotary to the model level; the shim additionally
        # serves the L2Norm forward's legacy seq_len call style
        attn.rotary_emb = _RotarySeqLenShim(rotary, attn)
        ref_forward = REF_FWD[method]

        def fwd(hidden_states, attention_mask=None, position_ids=None,
                past_key_values=None, use_cache=False, cache_position=None,
                position_embeddings=None, module=attn,
                ref_forward=ref_forward, **kw):
            module._cur_position_ids = position_ids
            out, attn_w, _ = ref_forward(
                module, hidden_states, attention_mask=attention_mask,
                position_ids=position_ids, past_key_value=past_key_values,
                output_attentions=False, use_cache=use_cache,
                cache_position=cache_position,
            )
            return out, attn_w

        attn.forward = fwd


def _rows_to_indices(rows, src):
    eq = (rows[:, None, :] == src[None, :, :]).all(-1)
    assert eq.any(1).all()
    return eq.argmax(1)


@pytest.mark.parametrize("method", ["snapkv", "pyramidkv", "streamingllm"])
def test_mistral_prefill_ab(checkpoint, method):
    from transformers.cache_utils import DynamicCache

    model, d, ids = checkpoint
    model = transformers.MistralForCausalLM.from_pretrained(
        d, attn_implementation="eager", torch_dtype=torch.float32)
    model.eval()
    _patch(model, method)
    cache = DynamicCache()
    if not hasattr(cache, "get_usable_length"):
        cache.get_usable_length = (
            lambda new_len, layer_idx=0: cache.get_seq_length(layer_idx)
        )
    for layer in model.model.layers:
        layer.self_attn.kv_seq_len = 0
    with torch.no_grad():
        out = model(torch.tensor([ids]), past_key_values=cache, use_cache=True)
    ref_logits = out.logits[0, -1].float().numpy()

    spec = spec_from_hf_dir(d)
    assert spec.sliding_window == 64
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    cs = CompressionSpec(method=method, max_capacity_prompt=CAP,
                         window_size=W, kernel_size=KS, pooling="avgpool")
    plan = make_plan(cs, spec.num_hidden_layers, N, 4)
    logits, ckv = jl.prefill(
        params, spec, plan, jnp.asarray([ids], jnp.int32),
        jnp.asarray([N], jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(logits)[0], ref_logits,
                               rtol=3e-4, atol=3e-4)

    # compressed cache content: kept positions + K/V rows per layer/head
    # (the reference stores per-query-head entries after repeat_kv)
    def per_layer(field):
        parts = field if isinstance(field, tuple) else (field,)
        out = []
        for pth in parts:
            arr = np.asarray(pth)
            out.extend(arr[i] for i in range(arr.shape[0]))
        return out

    ks_l, ms_l = per_layer(ckv.k), per_layer(ckv.mask)
    for li, layer in enumerate(model.model.layers):
        k_ref = cache.layers[li].keys[0].numpy() if hasattr(cache, "layers") \
            else cache.key_cache[li][0].numpy()
        v_ref = cache.layers[li].values[0].numpy() if hasattr(cache, "layers") \
            else cache.value_cache[li][0].numpy()
        # reconstruct the reference's post-RoPE repeated K to map rows back
        # to positions: compare against OUR cache rows directly instead
        ours_k = ks_l[li][0]       # [H, S, D]
        ours_m = ms_l[li][0]
        for h in range(k_ref.shape[0]):
            rows = k_ref[h]
            ours_rows = ours_k[h][ours_m[h]]
            assert rows.shape[0] == ours_rows.shape[0], (li, h)
            ref_sorted = rows[np.lexsort(rows.T)]
            got_sorted = ours_rows[np.lexsort(ours_rows.T)]
            np.testing.assert_allclose(got_sorted, ref_sorted,
                                       rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method", ["snapkv", "pyramidkv", "streamingllm",
                                    "h2o", "l2norm", "cam"])
def test_mistral_decode_token_ab(checkpoint, method, monkeypatch):
    """Decode-level token A/B (16 greedy steps against the compressed
    cache).  The reference's eager Mistral decode raises its OWN shape
    check under compression (mistral_model.py:167-170 compares
    attn_weights against the TRUE position count while the cache holds
    the compressed rows).  The wrapper below monkeypatches AROUND that
    bug: before each decode step ``self.kv_seq_len`` is pinned to the
    ACTUAL compressed cache length (so the check and HF's causal mask
    agree with the real key rows) while RoPE positions stay TRUE via
    explicit position_ids — the semantics the reference's flash path
    implements and our engine reproduces.

    h2o / l2norm / cam extend the same harness (VERDICT r3 missing #4):
    the reference has full Mistral eager forwards for them
    (mistral_model.py:94/:513/:932).  CAM's Bernoulli draws can't be
    seed-matched across torch/jax, so both sides are pinned to the SAME
    deterministic rule (merge iff p > 0.5) exactly as the cluster-level
    A/B (test_reference_ab.py::test_ab_cam)."""
    from transformers.cache_utils import DynamicCache

    import jax
    import jax.numpy as _jnp

    if method == "cam":
        monkeypatch.setattr(torch, "bernoulli",
                            lambda t: (t > 0.5).to(t.dtype))
        monkeypatch.setattr(
            jax.random, "uniform",
            lambda key, shape, dtype=_jnp.float32, **kw: _jnp.full(
                shape, 0.5, dtype),
        )
        # Reference accident NOT replicated (PARITY §2.5 family): the CAM
        # merge loop mutates value_states IN PLACE
        # (pyramidkv_utils.py:502-503), so the reference's own PREFILL
        # attention output is computed against partially-merged values.
        # Our prefill attends the raw values (merge affects only the
        # stored cache).  Pin the comparison to the intended semantics by
        # cloning the values at the cluster boundary on the ref side.
        import pyramidkv.pyramidkv_utils as ru

        orig_update = ru.CAMKVCluster.update_kv
        monkeypatch.setattr(
            ru.CAMKVCluster, "update_kv",
            lambda self, k, q, v, am, g: orig_update(self, k, q, v.clone(),
                                                     am, g),
        )

    model, d, ids = checkpoint
    model = transformers.MistralForCausalLM.from_pretrained(
        d, attn_implementation="eager", torch_dtype=torch.float32)
    model.eval()
    _patch(model, method)
    # wrap each attention fwd: pin kv_seq_len to the compressed length on
    # decode-shaped calls (q_len == 1)
    for layer in model.model.layers:
        attn = layer.self_attn
        attn.kv_seq_len = 0
        inner = attn.forward

        def fwd(hidden_states, *a, module=attn, inner=inner,
                past_key_values=None, **kw):
            if hidden_states.shape[1] == 1 and past_key_values is not None:
                module.kv_seq_len = past_key_values.get_seq_length(
                    module.layer_idx)
                # HF sizes ONE causal mask by layer 0's cache rows;
                # pyramidkv keeps per-layer counts, so the mask can never
                # fit every layer.  q_len == 1 over a fully-valid
                # compressed cache needs no mask at all.
                kw["attention_mask"] = None
                a = ()
            return inner(hidden_states, *a,
                         past_key_values=past_key_values, **kw)

        attn.forward = fwd

    cache = DynamicCache()
    if not hasattr(cache, "get_usable_length"):
        cache.get_usable_length = (
            lambda new_len, layer_idx=0: cache.get_seq_length(layer_idx)
        )
    with torch.no_grad():
        out = model(torch.tensor([ids]), past_key_values=cache,
                    use_cache=True)
        tok = int(out.logits[0, -1].argmax())
        ref_tokens = [tok]
        # pyramidkv keeps DIFFERENT row counts per layer; HF builds ONE
        # causal mask sized by layer 0, so the eager forward's mask-size
        # check can never pass on deeper layers.  For q_len == 1 with a
        # fully-valid compressed cache a None mask is semantically exact —
        # neutralise the mask builder for the decode steps.
        model.model._update_causal_mask = lambda *a, **k: None
        for step in range(16):
            comp_len = cache.get_seq_length(0)
            out = model(
                torch.tensor([[tok]]),
                past_key_values=cache,
                position_ids=torch.tensor([[N + step]]),
                cache_position=torch.tensor([comp_len]),
                use_cache=True,
            )
            tok = int(out.logits[0, -1].argmax())
            ref_tokens.append(tok)

    from pyramidkv_tpu.config import EngineSpec
    from pyramidkv_tpu.engine import Engine

    spec = spec_from_hf_dir(d)
    params = load_params_from_hf(d, spec, dtype=jnp.float32)
    eng = Engine(
        spec,
        CompressionSpec(method=method, max_capacity_prompt=CAP,
                        window_size=W, kernel_size=KS, pooling="avgpool"),
        EngineSpec(max_new_tokens=17, prefill_buckets=(N,)),
        params,
    )
    ours = eng.generate([ids]).tokens[0]
    assert ours == ref_tokens, (method, ours, ref_tokens)
