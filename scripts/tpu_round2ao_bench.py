"""Round-2ao: decompose the speculative-CB slowdown (r2an3: spec 105
tok/s vs plain 272 at 8 lanes).  Knobs isolate candidate costs:

- q4 vs q16: host round-trips per quantum (tunnel floor ~29 ms/call)
- k8 vs k4: verify width T (appends/attention/logits scale with T)
- combined-scatter appends (this tree) vs the r2an3 per-t loop

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 7200 \
       python scripts/tpu_round2ao_bench.py
"""

import jax

from tpu_round2aj_bench import random_int4_params, spec_depth
from tpu_round2an_bench import log, run_cb
from pyramidkv_tpu.models.weights import fuse_packed_matmuls


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))
    run_cb("cb2k_d32_int4/spec8_q4_k8_cs", d32, p4, lanes=8, n_req=32,
           ctx=2048, speculative="ngram", quantum=4)
    run_cb("cb2k_d32_int4/spec8_q16_k8_cs", d32, p4, lanes=8, n_req=32,
           ctx=2048, speculative="ngram", quantum=16)
    run_cb("cb2k_d32_int4/spec8_q4_k4_cs", d32, p4, lanes=8, n_req=32,
           ctx=2048, speculative="ngram", quantum=4, draft_len=4)
    run_cb("cb2k_d32_int4/spec16_q16_k8_cs", d32, p4, lanes=16, n_req=48,
           ctx=2048, speculative="ngram", quantum=16)
    log("ALL DONE")


if __name__ == "__main__":
    main()
