"""The in-container training rig (pyramidkv_tpu.train — VERDICT r4 #1).

Covers: tokenizer encode/decode roundtrip + HF surface, the eval prompt
template pinned equal to evalsuite.needle's, synthetic batch shapes,
train-forward parity with the INFERENCE prefill (trained weights must
drop into the Engine unchanged), a short loss-decrease run, checkpoint
roundtrip, and the RULER-style jsonl generator's schema.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyramidkv_tpu.config import CompressionSpec
from pyramidkv_tpu.models import llama
from pyramidkv_tpu.policy import make_plan
from pyramidkv_tpu.train import (SynthConfig, ToyTokenizer, TrainConfig,
                                 forward_logits, load_checkpoint, loss_fn,
                                 make_batch, save_checkpoint, train,
                                 write_haystack)
from pyramidkv_tpu.train.data import PROMPT_FORMAT, write_ruler_niah
from pyramidkv_tpu.train.loop import tiny_retrieval_spec


@pytest.fixture(scope="module")
def tok():
    return ToyTokenizer()


def test_tokenizer_roundtrip_and_surface(tok):
    txt = ("\nthe secret code of the crimson falcon is alpha tango three "
           "nine zulu .\n")
    ids = tok.encode(txt)
    assert tok.encode(tok.decode(ids)) == ids
    # HF surface the harnesses use
    enc = tok(txt, add_special_tokens=True)
    assert enc.input_ids[0] == tok.bos_token_id
    assert tok.eos_token_id is not None
    assert tok.decode([tok.bos_token_id] + ids,
                      skip_special_tokens=True) == tok.decode(ids)
    # period tokens derivable (needle sentence-boundary insertion)
    assert tok.encode(".")[-1] == tok.encode(" .")[-1]


def test_prompt_template_matches_evalsuite(tok):
    from pyramidkv_tpu.evalsuite import needle as ev

    assert PROMPT_FORMAT == ev.PROMPT_FORMAT
    # the full template tokenizes with zero <unk>
    pr = PROMPT_FORMAT.format(context="the king walked .",
                              question="What is the secret code of the "
                                       "crimson falcon ?")
    ids = tok.encode(pr, add_special_tokens=True)
    assert tok.unk_token_id not in ids


def test_make_batch_shapes_and_weights(tok):
    cfg = SynthConfig(seq_len=256, batch=3)
    toks, w = make_batch(np.random.default_rng(0), tok, cfg)
    assert toks.shape == (3, 256) and w.shape == (3, 256)
    assert toks.dtype == np.int32
    for b in range(3):
        ans = (w[b] == 1.0).sum()
        assert ans >= 8, ans                    # answer span present
        assert (w[b] == 0.0).sum() >= 1         # some padding
        assert (toks[b] < len(tok)).all()


def test_train_forward_matches_inference_prefill(tok):
    spec = dataclasses.replace(tiny_retrieval_spec(len(tok), max_pos=512),
                               num_hidden_layers=2)
    params = llama.init_params(spec, jax.random.PRNGKey(0),
                               dtype=jnp.float32)
    toks, _ = make_batch(np.random.default_rng(1), tok,
                         SynthConfig(seq_len=256, batch=2))
    lg = forward_logits(params, spec, jnp.asarray(toks))
    plan = make_plan(CompressionSpec(method="fullkv"),
                     spec.num_hidden_layers, 256, 4)
    inf, _ = llama.prefill(params, spec, plan, jnp.asarray(toks),
                           jnp.full((2,), 256, jnp.int32))
    np.testing.assert_allclose(np.asarray(lg[:, -1]), np.asarray(inf),
                               rtol=2e-4, atol=2e-4)


def test_short_train_decreases_loss_and_checkpoint_roundtrip(tok, tmp_path):
    spec = dataclasses.replace(tiny_retrieval_spec(len(tok), max_pos=512),
                               num_hidden_layers=2)
    cfg = TrainConfig(steps=40, lr=1e-3, log_every=39,
                      synth=SynthConfig(seq_len=128, batch=4,
                                        distractors=1))
    params, hist = train(spec, cfg, tok=tok, on_log=lambda m: None)
    assert hist[-1][1] < hist[0][1] * 0.9, hist
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, params, spec, dtype=np.float16)
    p2, s2 = load_checkpoint(path)
    assert s2.num_hidden_layers == 2 and s2.vocab_size == spec.vocab_size
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(p2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-3)
    # the checkpoint drives the ENGINE directly
    from pyramidkv_tpu.config import EngineSpec
    from pyramidkv_tpu.engine import Engine

    eng = Engine(s2, CompressionSpec(method="snapkv",
                                     max_capacity_prompt=32, window_size=8),
                 EngineSpec(max_new_tokens=4, prefill_buckets=(128,)), p2)
    out = eng.generate([[int(t) for t in
                         np.random.default_rng(2).integers(
                             5, len(tok), size=100)]])
    assert len(out.tokens[0]) == 4


def test_haystack_and_ruler_generators(tok, tmp_path):
    hay = str(tmp_path / "hay")
    write_haystack(hay, n_files=2, tokens_per_file=500)
    import glob

    files = glob.glob(hay + "/*.txt")
    assert len(files) == 2
    text = open(files[0]).read()
    ids = tok.encode(text)
    assert len(ids) >= 500
    assert tok.unk_token_id not in ids

    path = str(tmp_path / "niah.jsonl")
    write_ruler_niah(path, tok, n_examples=3, context_tokens=300)
    recs = [json.loads(l) for l in open(path)]
    assert len(recs) == 3
    for r in recs:
        assert set(r) >= {"input", "outputs", "length"}
        assert r["outputs"][0].split()  # non-empty answer words
        assert tok.unk_token_id not in tok.encode(r["input"])
