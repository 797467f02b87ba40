"""Round-2 micro-controls: does the dense repeated-span task form
induction, and does the needle task then recruit it?"""
import dataclasses, time
import numpy as np
import jax, jax.numpy as jnp
import optax

from pyramidkv_tpu.train import ToyTokenizer
from pyramidkv_tpu.train.data import SynthConfig, make_batch
from pyramidkv_tpu.train.model import loss_fn, forward_logits
from pyramidkv_tpu.train.loop import tiny_retrieval_spec
from pyramidkv_tpu.models.llama import init_params

tok = ToyTokenizer()

def probe_needle(name, params, spec, seq, cfg):
    @jax.jit
    def fwd(params, t):
        return forward_logits(params, spec, t)
    ok = 0
    pc = dataclasses.replace(cfg, batch=1, repeat_frac=0.0, multikey_frac=0.0)
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
            pad = np.zeros((1, seq), np.int32)
            pad[0, :len(toks)] = toks
            lg = fwd(params, jnp.asarray(pad))
            toks.append(int(jnp.argmax(lg[0, len(toks) - 1])))
        got = toks[astart:astart + len(want_ids)]
        hit = got == want_ids
        ok += hit
        if t < 3:
            print(f"[{name}] want={tok.decode(want_ids)[:58]!r} "
                  f"got={tok.decode(got)[:58]!r}", flush=True)
    print(f"[{name}] NEEDLE HITS {ok}/8", flush=True)

def run(name, layers, seq, steps, batch, lr, cfg_kw):
    spec = dataclasses.replace(tiny_retrieval_spec(len(tok), max_pos=2*seq),
                               num_hidden_layers=layers)
    cfg = SynthConfig(seq_len=seq, batch=batch, **cfg_kw)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    opt = optax.adamw(optax.warmup_cosine_decay_schedule(0, lr, 100, steps),
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
    K = 25
    t0 = time.time()
    step = 0
    while step < steps:
        bt = np.zeros((K, batch, seq), np.int32)
        bw = np.zeros((K, batch, seq), np.float32)
        for i in range(K):
            bt[i], bw[i] = make_batch(rng, tok, cfg)
        params, ost, ls = multi(params, ost, jnp.asarray(bt), jnp.asarray(bw))
        step += K
        if step % 500 == 0:
            print(f"[{name}] step {step} loss {float(ls[-1]):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    probe_needle(name, params, spec, seq, cfg)
    return params

base = dict(multikey_frac=0.0, context_loss_weight=0.02, qa_pairs=1,
            distractors=3)
# ctrl4: pure repeat task — loss alone shows induction formation
run("ctrl4:repeat_only", 2, 256, 3000, 32, 3e-3,
    dict(base, repeat_frac=1.0))
# ctrl5: mixture — needle probe is the decider
run("ctrl5:mix0.5", 2, 256, 4000, 32, 3e-3,
    dict(base, repeat_frac=0.5))
# ctrl6: 8-layer mixture at the real geometry
run("ctrl6:8layer_mix", 8, 256, 4000, 32, 2e-3,
    dict(base, repeat_frac=0.5))
print("CTRL2 DONE", flush=True)
