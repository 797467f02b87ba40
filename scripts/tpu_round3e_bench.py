"""Round-3e: int4-kernel tile/sub-chunk ablation, retake of the r3d legs
that failed on Mosaic's missing value-dynamic_slice (now pl.ds ref
slices).  Flagship params: int4 weights + int4 lm_head (r3d: 135.9 tok/s
at default (1024, 2048) tiles)."""

import sys

import jax

sys.path.insert(0, "/root/repo/scripts")
from _bench_common import make_logger, random_int4_params, spec_depth
from tpu_round3a_bench import engine_leg

from pyramidkv_tpu.models import weights as W

log = make_logger("r3e")


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    spec = spec_depth(32)
    params_lm4 = random_int4_params(spec, jax.random.PRNGKey(0), fused=True,
                                    lm_head_nbits=4)

    engine_leg("r3e/control_lm4", spec, params_lm4)

    for blocks, sub in (((2048, 2048), 512), ((4096, 2048), 512),
                        ((4096, 2048), 1024), ((4096, 4096), 512)):
        W._INT4_KERNEL_BLOCKS[0] = blocks
        W._INT4_KERNEL_SUBIN[0] = sub
        try:
            engine_leg(f"r3e/tiles_{blocks[0]}x{blocks[1]}_sub{sub}", spec,
                       params_lm4, extra={"blocks": list(blocks),
                                          "sub_in": sub})
        finally:
            W._INT4_KERNEL_BLOCKS[0] = None
            W._INT4_KERNEL_SUBIN[0] = 0
    log("ALL DONE")


if __name__ == "__main__":
    main()
