"""1-D score-vector pooling, matching torch ``F.avg_pool1d`` / ``F.max_pool1d``
with ``stride=1, padding=kernel//2`` as used by every observation-window
policy in the reference (/root/reference/pyramidkv/pyramidkv_utils.py:328-333,
:662-669).

Semantics matched exactly:
- ``avg_pool1d`` divides by the full kernel size including the implicit zero
  padding (``count_include_pad=True`` default).
- ``max_pool1d`` pads with -inf, so edge windows take the max of the real
  elements only.  Our scores are non-negative, so zero-filled neighbours in
  the padded buffer never perturb the max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pool1d(x: jax.Array, kernel_size: int, mode: str) -> jax.Array:
    """Pool the last axis of ``x`` with stride 1 and SAME padding.

    Args:
      x: [..., n] scores (non-negative, float32).
      kernel_size: odd pooling width (the reference always uses 5 or 7).
      mode: "avgpool" | "maxpool".
    """
    if kernel_size == 1:
        return x
    if kernel_size % 2 != 1:
        raise ValueError(f"kernel_size must be odd, got {kernel_size}")
    pad = kernel_size // 2
    window = (1,) * (x.ndim - 1) + (kernel_size,)
    strides = (1,) * x.ndim
    padding = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    if mode == "avgpool":
        summed = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
        return summed / kernel_size
    elif mode == "maxpool":
        return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, padding)
    raise ValueError(f"unknown pooling mode {mode!r}")
