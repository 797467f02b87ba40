"""pyramidkv_tpu — a TPU-native long-context inference engine with a
first-class KV-cache compression stack (SnapKV / PyramidKV / H2O /
StreamingLLM / L2Norm / CAM / AdaKV / HeadKV / ThinK / KIVI / KVQuant),
re-designed from the behavior of Zefan-Cai/PyramidKV for JAX / XLA / Pallas.
"""

__version__ = "0.1.0"

from .config import (
    CompressionSpec,
    EngineSpec,
    ModelSpec,
    METHODS,
    pyramid_layer_budgets,
    headkv_capacity_from_scores,
)
