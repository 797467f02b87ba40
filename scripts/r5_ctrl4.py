"""Extended-training control: does content-matching cross its phase
transition within 20k steps? (ctrl8 declined 3.04->2.54 over 3k)."""
import dataclasses, functools, time
import numpy as np
import jax, jax.numpy as jnp
import optax

from pyramidkv_tpu.train import ToyTokenizer
from pyramidkv_tpu.train.data import SynthConfig, make_batch
from pyramidkv_tpu.train.model import loss_fn
from pyramidkv_tpu.train.loop import tiny_retrieval_spec
from pyramidkv_tpu.models.llama import init_params

tok = ToyTokenizer()
N, B, STEPS = 256, 32, 20000
spec = dataclasses.replace(tiny_retrieval_spec(len(tok), max_pos=2*N),
                           num_hidden_layers=2)
cfg = SynthConfig(seq_len=N, batch=B, repeat_frac=0.7, multikey_frac=0.0,
                  qa_pairs=2, distractors=3, context_loss_weight=0.02)
params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
opt = optax.adamw(optax.warmup_cosine_decay_schedule(0, 3e-3, 200, STEPS),
                  weight_decay=0.01)
ost = opt.init(params)

@jax.jit
def multi(params, ost, ts, ws):
    def body(c, xw):
        p, s = c
        l, g = jax.value_and_grad(loss_fn)(p, spec, *xw)
        u, s = opt.update(g, s, p)
        return (optax.apply_updates(p, u), s), l
    (params, ost), ls = jax.lax.scan(body, (params, ost), (ts, ws))
    return params, ost, ls

rng = np.random.default_rng(1)
K = 50
t0 = time.time()
step = 0
while step < STEPS:
    bts = np.zeros((K, B, N), np.int32); bws = np.zeros((K, B, N), np.float32)
    for i in range(K):
        bts[i], bws[i] = make_batch(rng, tok, cfg)
    params, ost, ls = multi(params, ost, jnp.asarray(bts), jnp.asarray(bws))
    step += K
    if step % 1000 == 0:
        print(f"step {step} loss {float(ls[-1]):.4f} ({time.time()-t0:.0f}s)",
              flush=True)

# needle probe
from pyramidkv_tpu.train.model import forward_logits

@jax.jit
def fwd(params, t):
    return forward_logits(params, spec, t)

ok = 0
pc = dataclasses.replace(cfg, batch=1, repeat_frac=0.0)
for t in range(8):
    r2 = np.random.default_rng(7000 + t)
    ids, w = make_batch(r2, tok, pc)
    ids, w = list(ids[0]), list(w[0])
    astart = w.index(1.0)
    want_ids = []
    for i in range(astart, len(ids)):
        if w[i] != 1.0:
            break
        want_ids.append(ids[i])
        if tok.vocab[ids[i]] == ".":
            break
    toks = list(ids[:astart])
    for _ in range(len(want_ids)):
        pad = np.zeros((1, N), np.int32)
        pad[0, :len(toks)] = toks
        lg = fwd(params, jnp.asarray(pad))
        toks.append(int(jnp.argmax(lg[0, len(toks) - 1])))
    got = toks[astart:astart + len(want_ids)]
    ok += got == want_ids
    if t < 3:
        print(f"want={tok.decode(want_ids)[:58]!r} got={tok.decode(got)[:58]!r}",
              flush=True)
print(f"NEEDLE HITS {ok}/8", flush=True)
