"""CPU-side retrieval probe for a (partial) r5f checkpoint: greedy-decode
the answer for a handful of fresh needle examples and report per-token
code recovery — trend monitoring while the TPU run trains
(reads data/tiny_retrieval.npz.part.npz by default; harmless to the
training process)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pyramidkv_tpu.train import ToyTokenizer, load_checkpoint  # noqa: E402
from pyramidkv_tpu.train.data import SynthConfig, make_batch  # noqa: E402
from pyramidkv_tpu.train.model import forward_logits  # noqa: E402

ckpt = sys.argv[1] if len(sys.argv) > 1 else "data/tiny_retrieval.npz.part.npz"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
params, spec = load_checkpoint(ckpt)
params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)
tok = ToyTokenizer()
cfg = SynthConfig(seq_len=N, batch=1, distractors=3, qa_pairs=1,
                  repeat_frac=0.0, multikey_frac=0.0,
                  context_loss_weight=0.02)

fwd = jax.jit(lambda p, t: forward_logits(p, spec, t))
exact = tot_codes = code_hits = 0
for t in range(8):
    rng = np.random.default_rng(9000 + t)
    ids, w = make_batch(rng, tok, cfg)
    ids, w = list(ids[0]), list(w[0])
    astart = w.index(1.0)
    want = []
    for i in range(astart, len(ids)):
        if w[i] != 1.0:
            break
        want.append(ids[i])
        if tok.vocab[ids[i]] == ".":
            break
    toks = list(ids[:astart])
    for _ in range(len(want)):
        pad = np.zeros((1, N), np.int32)
        pad[0, :len(toks)] = toks
        lg = fwd(params, jnp.asarray(pad))
        toks.append(int(jnp.argmax(lg[0, len(toks) - 1])))
    got = toks[astart:astart + len(want)]
    # code words = the 5 tokens before the final " ."
    wc, gc = want[-6:-1], got[-6:-1]
    code_hits += sum(a == b for a, b in zip(wc, gc))
    tot_codes += len(wc)
    exact += got == want
    if t < 3:
        print(f"  want={tok.decode(want)[:64]!r}")
        print(f"  got ={tok.decode(got)[:64]!r}")
print(f"[probe {ckpt}] exact {exact}/8, code-token recovery "
      f"{code_hits}/{tot_codes} = {code_hits/max(tot_codes,1):.2f}")
