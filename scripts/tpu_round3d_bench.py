"""Round-3d: lm_head kernels + int4-kernel tile/sub-chunk ablation.

r3c measured 124.9 tok/s after the planar layout (was 104.7); its profile
showed the int8 lm_head kernel had NOT engaged (_logits bypassed
weights.mm — now wired) and the int4 matmuls still at 60-75% of weight
bytes.  Legs:

  - control        : int8 lm_head kernel now active via _logits
  - lm4            : packed-int4 lm_head (halves the 525 MB read)
  - sub-chunk tiles: block_in 2048/4096 with in-kernel fori sub-chunking
                     (the r3a naive big tiles OOM'd scoped VMEM)
"""

import sys

import jax

sys.path.insert(0, "/root/repo/scripts")
from _bench_common import make_logger, random_int4_params, spec_depth
from tpu_round3a_bench import engine_leg
from tpu_round3c_bench import profile_leg

from pyramidkv_tpu.models import weights as W

log = make_logger("r3d")


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    spec = spec_depth(32)
    params = random_int4_params(spec, jax.random.PRNGKey(0), fused=True)
    params_lm4 = random_int4_params(spec, jax.random.PRNGKey(0), fused=True,
                                    lm_head_nbits=4)

    engine_leg("r3d/control_int8lm_kernel", spec, params)
    engine_leg("r3d/lm_head_int4", spec, params_lm4,
               extra={"lm_head_nbits": 4})

    for blocks, sub in (((2048, 2048), 512), ((4096, 2048), 512),
                        ((4096, 2048), 1024)):
        W._INT4_KERNEL_BLOCKS[0] = blocks
        W._INT4_KERNEL_SUBIN[0] = sub
        try:
            engine_leg(f"r3d/tiles_{blocks[0]}x{blocks[1]}_sub{sub}", spec,
                       params_lm4, extra={"blocks": list(blocks),
                                          "sub_in": sub,
                                          "lm_head_nbits": 4})
        finally:
            W._INT4_KERNEL_BLOCKS[0] = None
            W._INT4_KERNEL_SUBIN[0] = 0

    profile_leg(spec, params_lm4, tdir="/root/repo/logs/r3d_trace", tag="r3d")
    log("ALL DONE")


if __name__ == "__main__":
    main()
