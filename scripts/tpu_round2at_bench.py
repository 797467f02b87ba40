"""Round-2at: speculative CB in the bandwidth-bound row regime.

Verify is free only while lanes*(k+1) rows stay under the MXU/bandwidth
crossover (~32-40 rows at d32 int4): 8 lanes x k=8 = 72 rows measured
1.5x a plain step (r2as).  Tune (lanes, k) under the crossover.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 7200 \
       python scripts/tpu_round2at_bench.py
"""

import jax

from tpu_round2aj_bench import random_int4_params, spec_depth
from tpu_round2as_bench import log, run_cb
from pyramidkv_tpu.models.weights import fuse_packed_matmuls


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))
    run_cb("cb2k_at/plain4", d32, p4, lanes=4, n_req=16, ctx=2048)
    run_cb("cb2k_at/spec4_k8_rand", d32, p4, lanes=4, n_req=16, ctx=2048,
           speculative="ngram")                     # 36 rows
    run_cb("cb2k_at/spec4_k8_rep", d32, p4, lanes=4, n_req=16, ctx=2048,
           speculative="ngram", kind="rep")
    run_cb("cb2k_at/spec8_k3_rand", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram", draft_len=3)        # 32 rows
    run_cb("cb2k_at/spec8_k3_rep", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram", draft_len=3, kind="rep")
    log("ALL DONE")


if __name__ == "__main__":
    main()
