"""Round-3f: MXU operand dtype in the int4 kernel.  Roofline arithmetic
says the 8-row f32 dots are the kernel's bottleneck (f32 MXU runs at
~1/8 rate: [8,1024]x[1024,2048] x2 dots ~ 5.4us vs the 2 MB tile's
2.4us DMA) — bf16 operands would flip it DMA-bound.  r2ad measured bf16
slower pre-planar-layout; retake with the layout + sub-chunk wins in."""

import sys

import jax

sys.path.insert(0, "/root/repo/scripts")
from _bench_common import make_logger, random_int4_params, spec_depth
from tpu_round3a_bench import engine_leg

from pyramidkv_tpu.models import weights as W

log = make_logger("r3f")


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    spec = spec_depth(32)
    params = random_int4_params(spec, jax.random.PRNGKey(0), fused=True,
                                lm_head_nbits=4)

    legs = [
        ("r3f/bf16_default_tiles", None, 0, "bf16"),
        ("r3f/bf16_2048x2048_sub512", (2048, 2048), 512, "bf16"),
        ("r3f/bf16_4096x2048_sub512", (4096, 2048), 512, "bf16"),
        ("r3f/f32_4096x2048_sub256", (4096, 2048), 256, None),
        ("r3f/bf16_4096x4096_sub512", (4096, 4096), 512, "bf16"),
    ]
    for tag, blocks, sub, op in legs:
        W._INT4_KERNEL_BLOCKS[0] = blocks
        W._INT4_KERNEL_SUBIN[0] = sub
        W._INT4_KERNEL_OP[0] = op
        try:
            engine_leg(tag, spec, params,
                       extra={"blocks": blocks and list(blocks),
                              "sub_in": sub, "op": op})
        finally:
            W._INT4_KERNEL_BLOCKS[0] = None
            W._INT4_KERNEL_SUBIN[0] = 0
            W._INT4_KERNEL_OP[0] = None
    log("ALL DONE")


if __name__ == "__main__":
    main()
