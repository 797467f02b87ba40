"""Token-level A/B: the reference's patched HF forward vs our engine.

Runs the ACTUAL reference attention forwards (/root/reference/pyramidkv/
llama_model.py — eager variants) inside the installed transformers' Llama,
decodes greedily with an explicit cache_position loop (the 4.57 equivalent
of the reference's prepare_inputs_for_generation_llama_new semantics:
positions follow the TRUE token position, not the compressed cache length,
llama_model.py:2598-2673), and asserts the greedy token sequence equals our
engine's at identical (method, capacity, window, kernel) on the same tiny
random-weight HF checkpoint.

Compatibility shims (the reference pins transformers==4.44, the image ships
4.57): a ``flash_attn`` stub module (the eager forwards never call it), an
adapter mapping the 4.57 attention call signature onto the reference's
(past_key_values->past_key_value, 2-tuple return), and the legacy
num_heads/hidden_size attributes restored on each attention module.
"""

import sys
import types

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")


def _install_flash_stub():
    if "flash_attn" in sys.modules:
        return

    def _nope(*a, **k):  # pragma: no cover
        raise RuntimeError("flash_attn stub called — eager path only")

    import importlib.machinery

    fa = types.ModuleType("flash_attn")
    fa.flash_attn_func = _nope
    fa.flash_attn_varlen_func = _nope
    # transformers probes importlib.util.find_spec("flash_attn"): a module
    # with __spec__=None raises ValueError there, so fake a spec too.
    fa.__spec__ = importlib.machinery.ModuleSpec("flash_attn", loader=None)
    bp = types.ModuleType("flash_attn.bert_padding")
    bp.index_first_axis = _nope
    bp.pad_input = _nope
    bp.unpad_input = _nope
    bp.__spec__ = importlib.machinery.ModuleSpec(
        "flash_attn.bert_padding", loader=None)
    fa.bert_padding = bp
    sys.modules["flash_attn"] = fa
    sys.modules["flash_attn.bert_padding"] = bp


def _install_hf_compat():
    """Re-export symbols the reference imports from modeling_llama that
    transformers 4.57 moved (StaticCache lives in cache_utils now)."""
    import transformers.cache_utils as cu
    import transformers.models.llama.modeling_llama as ml

    for name in ("StaticCache", "DynamicCache", "Cache"):
        if not hasattr(ml, name) and hasattr(cu, name):
            setattr(ml, name, getattr(cu, name))


_install_flash_stub()
_install_hf_compat()
ref_llama = pytest.importorskip("pyramidkv.llama_model")

from pyramidkv_tpu.config import CompressionSpec, EngineSpec  # noqa: E402
from pyramidkv_tpu.engine import Engine  # noqa: E402
from pyramidkv_tpu.models.loader import (  # noqa: E402
    load_params_from_hf,
    spec_from_hf_dir,
)

REF_EAGER = {
    "pyramidkv": ref_llama.llama_attn_forward_PyramidKV,
    "snapkv": ref_llama.llama_attn_forward_SnapKV,
    "h2o": ref_llama.llama_attn_forward_H2O,
    "streamingllm": ref_llama.llama_attn_forward_StreamingLLM,
    "l2norm": ref_llama.llama_attn_forward_L2Norm,
}

N_PROMPT, NEW, CAP, W, KS = 96, 16, 32, 8, 7


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    torch.manual_seed(0)
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False,
    )
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("ab") / "llama"
    model.save_pretrained(d, safe_serialization=True)
    rng = np.random.default_rng(0)
    ids = [int(x) for x in rng.integers(0, 128, size=N_PROMPT)]
    return str(d), ids


def _adapt(module, ref_forward):
    """Bind a reference (4.44-era) attention forward onto a 4.57 module."""

    def fwd(hidden_states, attention_mask=None, position_ids=None,
            past_key_values=None, use_cache=False, cache_position=None,
            position_embeddings=None, **kw):
        out, attn_w, _ = ref_forward(
            module, hidden_states, attention_mask=attention_mask,
            position_ids=position_ids, past_key_value=past_key_values,
            output_attentions=False, use_cache=use_cache,
            cache_position=cache_position,
            position_embeddings=position_embeddings,
        )
        return out, attn_w

    module.forward = fwd


def _patch_reference(model, method, *, cap, window, kernel, pooling):
    cfg = model.config
    cfg.pretraining_tp = getattr(cfg, "pretraining_tp", 1) or 1
    cfg.window_size = window
    cfg.max_capacity_prompt = cap
    cfg.kernel_size = kernel
    cfg.pooling = pooling
    cfg.merge = None
    cfg.skip_layers = [0, 1]
    for layer in model.model.layers:
        attn = layer.self_attn
        # legacy attribute names the reference forwards read
        attn.num_heads = cfg.num_attention_heads
        attn.num_key_value_heads = cfg.num_key_value_heads
        attn.hidden_size = cfg.hidden_size
        attn.attention_dropout = getattr(attn, "attention_dropout", 0.0)
        _adapt(attn, REF_EAGER[method])


def _ref_generate(model, ids, steps):
    """Greedy decode with true-position cache_position (the reference's
    kv_seq_len bookkeeping, llama_model.py:2609-2612, :166-172)."""
    from transformers.cache_utils import DynamicCache

    cache = DynamicCache()
    if not hasattr(cache, "get_usable_length"):
        cache.get_usable_length = (
            lambda new_len, layer_idx=0: cache.get_seq_length(layer_idx)
        )
    for layer in model.model.layers:
        layer.self_attn.kv_seq_len = 0
    ids_t = torch.tensor([ids])
    n = ids_t.shape[1]
    toks = []
    with torch.no_grad():
        out = model(ids_t, past_key_values=cache, use_cache=True)
        tok = out.logits[:, -1].argmax(-1)
        for i in range(steps):
            toks.append(int(tok))
            if i == steps - 1:
                break
            out = model(
                tok[:, None], past_key_values=cache, use_cache=True,
                cache_position=torch.tensor([n + i]),
            )
            tok = out.logits[:, -1].argmax(-1)
    return toks


def _ours_generate(ckpt_dir, ids, method, steps, **spec_kw):
    spec = spec_from_hf_dir(ckpt_dir)
    params = load_params_from_hf(ckpt_dir, spec, dtype=jnp.float32)
    cs = CompressionSpec(method=method, max_capacity_prompt=CAP,
                         window_size=W, kernel_size=KS, pooling="avgpool",
                         **spec_kw)
    eng = Engine(spec, cs,
                 EngineSpec(max_new_tokens=steps, prefill_buckets=(N_PROMPT,)),
                 params)
    return eng.generate([ids], eos_token_ids=()).tokens[0]


@pytest.mark.parametrize("method",
                         ["snapkv", "pyramidkv", "h2o", "streamingllm",
                          "l2norm"])
def test_token_ab_vs_reference_forward(checkpoint, method):
    ckpt_dir, ids = checkpoint
    model = transformers.LlamaForCausalLM.from_pretrained(
        ckpt_dir, attn_implementation="eager", torch_dtype=torch.float32)
    model.eval()
    window = CAP - 4 if method == "streamingllm" else W
    _patch_reference(model, method, cap=CAP, window=window, kernel=KS,
                     pooling="avgpool")
    want = _ref_generate(model, ids, NEW)
    got = _ours_generate(ckpt_dir, ids, method, NEW)
    assert got == want, (method, got, want)


def test_token_ab_fullkv_sanity(checkpoint):
    """Unpatched HF generate vs the manual decode loop vs our engine —
    validates the harness itself before trusting the patched runs."""
    ckpt_dir, ids = checkpoint
    model = transformers.LlamaForCausalLM.from_pretrained(
        ckpt_dir, attn_implementation="eager", torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        hf = model.generate(torch.tensor([ids]), max_new_tokens=NEW,
                            do_sample=False, pad_token_id=0)[0, N_PROMPT:]
    manual = _ref_generate(model, ids, NEW)
    assert manual == [int(x) for x in hf]
    got = _ours_generate(ckpt_dir, ids, "fullkv", NEW)
    assert got == manual
