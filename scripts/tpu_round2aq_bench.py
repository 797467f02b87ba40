"""Round-2aq: ablate the spec-CB verify iteration (zero-draft legs; every
iteration emits 1 token/lane so ms_per_iter is exact).

- control: full iteration (r2ap measured ~46.5 ms incl prefill share)
- no_append: lane-path cache scatters skipped (PKV_SPEC_NO_APPEND)
- no_rollback: rollback_decode skipped (PKV_SPEC_NO_ROLLBACK)
- neither

Wrong-results legs — timing only.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 7200 \
       python scripts/tpu_round2aq_bench.py
"""

import os
import sys

import jax

from tpu_round2aj_bench import random_int4_params, spec_depth
from pyramidkv_tpu.models.weights import fuse_packed_matmuls


def main():
    assert jax.devices()[0].platform == "tpu"
    d32 = spec_depth(32)
    p4 = fuse_packed_matmuls(random_int4_params(d32, jax.random.PRNGKey(0)))

    from pyramidkv_tpu.models import llama
    from tpu_round2ap_bench import log, run_cb

    for tag, noapp, noroll in (
        ("ctrl", False, False),
        ("noappend", True, False),
        ("noroll", False, True),
        ("neither", True, True),
    ):
        llama._SPEC_NO_APPEND[0] = noapp
        os.environ["PKV_SPEC_NO_ROLLBACK"] = "1" if noroll else "0"
        run_cb(f"cb2k_aq/zero_{tag}", d32, p4, lanes=8, n_req=32, ctx=2048,
               speculative="ngram", zero_draft=True)
    llama._SPEC_NO_APPEND[0] = False
    os.environ["PKV_SPEC_NO_ROLLBACK"] = "0"
    log("ALL DONE")


if __name__ == "__main__":
    main()
