"""Micro-controls for retrieval-circuit formation (TPU, minutes each)."""
import dataclasses, sys, time
import numpy as np
import jax, jax.numpy as jnp
import optax

from pyramidkv_tpu.train import ToyTokenizer
from pyramidkv_tpu.train.data import SynthConfig, make_batch
from pyramidkv_tpu.train.model import loss_fn, forward_logits
from pyramidkv_tpu.train.loop import tiny_retrieval_spec
from pyramidkv_tpu.models.llama import init_params

tok = ToyTokenizer()

def run(name, layers, seq, steps, batch, lr, cfg_kw, probe_n=8):
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
        (params, ost), ls = jax.lax.scan(body, (params, ost), xw := (ts, ws))
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

    @jax.jit
    def fwd(params, t):
        return forward_logits(params, spec, t)

    ok = 0
    for t in range(probe_n):
        r2 = np.random.default_rng(7000 + t)
        ids, w = make_batch(r2, tok, dataclasses.replace(cfg, batch=1))
        ids, w = list(ids[0]), list(w[0])
        astart = w.index(1.0)
        # only the FIRST QA answer (up to the first '.' token after astart)
        want_ids = []
        for i in range(astart, len(ids)):
            if w[i] != 1.0:
                break
            want_ids.append(ids[i])
            if tok.vocab[ids[i]] == ".":
                break
        toks = list(ids[:astart])
        for _ in range(len(want_ids) + 2):
            pad = np.zeros((1, seq), np.int32)
            pad[0, :len(toks)] = toks
            lg = fwd(params, jnp.asarray(pad))
            toks.append(int(jnp.argmax(lg[0, len(toks) - 1])))
        got = toks[astart:astart + len(want_ids)]
        hit = got == want_ids
        ok += hit
        if t < 3:
            print(f"[{name}] want={tok.decode(want_ids)[:60]!r} "
                  f"got={tok.decode(got)[:60]!r}", flush=True)
    print(f"[{name}] HITS {ok}/{probe_n}", flush=True)
    return ok


base = dict(multikey_frac=0.0, context_loss_weight=0.02, qa_pairs=1,
            distractors=0)
run("ctrl1:1needle", 2, 256, 2500, 32, 3e-3, base)
run("ctrl2:3distr+qa2", 2, 256, 2500, 32, 3e-3,
    dict(base, distractors=3, qa_pairs=2))
run("ctrl3:8layer", 8, 256, 2500, 32, 2e-3,
    dict(base, distractors=3, qa_pairs=2))
print("CTRL DONE", flush=True)
