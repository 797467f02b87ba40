"""Round-3 micro-controls: isolate WHY content-based induction never
forms — NoPE vs RoPE, fixed vs random span positions."""
import dataclasses, functools, time
import numpy as np
import jax, jax.numpy as jnp
import optax

from pyramidkv_tpu.train import ToyTokenizer
from pyramidkv_tpu.train.data import SynthConfig, make_batch, code, filler_text
from pyramidkv_tpu.train.model import loss_fn
from pyramidkv_tpu.train.loop import tiny_retrieval_spec
from pyramidkv_tpu.models.llama import init_params

tok = ToyTokenizer()
N, B = 256, 32

def repeat_batch(rng, fixed):
    bt = np.zeros((B, N), np.int32); bw = np.zeros((B, N), np.float32)
    for b in range(B):
        S = 12
        span = tok.encode(" ".join(code(rng, S)))
        fill = tok.encode(filler_text(rng, N - 2*len(span) - 4))[: N - 2*len(span) - 4]
        if fixed:
            a, gap = 20, 100
        else:
            a = int(rng.integers(0, len(fill) - 1))
            gap = int(rng.integers(0, len(fill) - a))
        ids = [tok.bos_token_id] + fill[:a] + span + fill[a:a+gap] + span + fill[a+gap:]
        w = [0.0]*len(ids)
        s2 = 1 + a + len(span) + gap
        for i in range(s2 + 1, s2 + len(span)):
            w[i] = 1.0
        ids = (ids + [tok.pad_token_id]*N)[:N]
        w = (w + [0.0]*N)[:N]
        bt[b] = ids; bw[b] = w
    return bt, bw

def run(name, use_rope, fixed, steps=3000, lr=3e-3, layers=2):
    spec = dataclasses.replace(tiny_retrieval_spec(len(tok), max_pos=2*N),
                               num_hidden_layers=layers)
    params = init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    opt = optax.adamw(optax.warmup_cosine_decay_schedule(0, lr, 100, steps),
                      weight_decay=0.01)
    ost = opt.init(params)
    lf = functools.partial(loss_fn, use_rope=use_rope)

    @jax.jit
    def multi(params, ost, ts, ws):
        def body(c, xw):
            p, s = c
            l, g = jax.value_and_grad(lf)(p, spec, *xw)
            u, s = opt.update(g, s, p)
            return (optax.apply_updates(p, u), s), l
        (params, ost), ls = jax.lax.scan(body, (params, ost), (ts, ws))
        return params, ost, ls

    rng = np.random.default_rng(1)
    K = 25
    t0 = time.time()
    step = 0
    while step < steps:
        bts = np.zeros((K, B, N), np.int32); bws = np.zeros((K, B, N), np.float32)
        for i in range(K):
            bts[i], bws[i] = repeat_batch(rng, fixed)
        params, ost, ls = multi(params, ost, jnp.asarray(bts), jnp.asarray(bws))
        step += K
        if step % 500 == 0:
            print(f"[{name}] step {step} loss {float(ls[-1]):.4f} ({time.time()-t0:.0f}s)", flush=True)
    return params

run("ctrl7:fixedpos_rope", True, True)     # expect: learns (like minimal)
run("ctrl8:randpos_rope", True, False)     # expect: stuck (ctrl4 repro)
run("ctrl9:randpos_nope", False, False)    # the RoPE hypothesis test
print("CTRL3 DONE", flush=True)
