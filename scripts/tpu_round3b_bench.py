"""Round-3b: rerun of the r3a microbench legs (r3a crashed on a tunnel
broken-pipe at the lm_head leg — logs/tpu_r3a.log) plus one extra leg:

  - fullstep_chain : the REAL decode_step + greedy argmax iterated inside
                     one jit (no while_loop / EOS / host sync) — the gap
                     between this and the engine's host-observed 9.55 ms
                     per step (r3a/control_fused 104.7 tok/s) is the
                     per-step loop/host overhead.

Engine-level control and tile variants were already measured in r3a and
are NOT repeated.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/scripts")
from _bench_common import emit, make_logger, random_int4_params, spec_depth, time_loop_ms
from tpu_round3a_bench import CTX, CAP, WIN, MAX_NEW, microbenches, profile_leg

from pyramidkv_tpu.models import llama

log = make_logger("r3b")


def fullstep_leg(eng, spec, params, cache):
    plan = eng.plan_for(CTX)
    ITER = 32

    @jax.jit
    def step_loop(params_, cache0, tok0):
        def body(i, st):
            tok, c = st
            logits, c = llama.decode_step(params_, spec, plan, c, tok)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), c
        tok, c = jax.lax.fori_loop(0, ITER, body, (tok0, cache0))
        return tok, c.step

    tok0 = jnp.zeros((1,), jnp.int32)
    ms = time_loop_ms(step_loop, (params, cache, tok0), ITER,
                      "fullstep(32L)", log)
    emit({"bench": "r3b/fullstep_chain", "step_ms": round(ms, 3)})


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    spec = spec_depth(32)
    params = random_int4_params(spec, jax.random.PRNGKey(0), fused=True)
    eng, cache = microbenches(spec, params)
    fullstep_leg(eng, spec, params, cache)
    profile_leg(eng, spec, params)
    log("ALL DONE")


if __name__ == "__main__":
    main()
