"""Round-2ar: speculative CB with bf16-operand verify matmuls (the f32
MXU multi-pass tax was ~2x a plain step per iteration — r2aq).  Re-run
the r2ap grid + 16-lane legs.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 7200 \
       python scripts/tpu_round2ar_bench.py
"""

import jax

from tpu_round2aj_bench import random_int4_params, spec_depth
from tpu_round2ap_bench import log, run_cb
from pyramidkv_tpu.models.weights import fuse_packed_matmuls


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))
    run_cb("cb2k_ar/spec8_zero", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram", zero_draft=True)
    run_cb("cb2k_ar/spec8_rand", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram")
    run_cb("cb2k_ar/spec8_rep", d32, p4, lanes=8, n_req=32, ctx=2048,
           speculative="ngram", kind="rep")
    run_cb("cb2k_ar/spec16_rand", d32, p4, lanes=16, n_req=48, ctx=2048,
           speculative="ngram")
    run_cb("cb2k_ar/spec16_rep", d32, p4, lanes=16, n_req=48, ctx=2048,
           speculative="ngram", kind="rep")
    log("ALL DONE")


if __name__ == "__main__":
    main()
