"""pyramidkv_tpu — a TPU-native long-context inference engine with a
first-class KV-cache compression stack (SnapKV / PyramidKV / H2O /
StreamingLLM / L2Norm / CAM / AdaKV / HeadKV / ThinK / MInference /
KIVI / KVQuant), re-designed from the behavior of Zefan-Cai/PyramidKV
for JAX / XLA / Pallas.
"""

__version__ = "0.1.0"

from .config import (
    CompressionSpec,
    EngineSpec,
    ModelSpec,
    METHODS,
    pyramid_layer_budgets,
    headkv_capacity_from_scores,
    load_headkv_scores,
)
from .cache import KVCache, cache_memory_bytes, used_kv_tokens
from .engine import (Engine, EngineStats, GenerationOutput, PrefixHandle,
                     PrefixRegistry)
from .policy import PolicyPlan, make_plan, compress_layer
from .serving import BatchScheduler, Request


def load_engine(
    model_dir: str,
    method: str = "fullkv",
    max_capacity_prompt: int = 2048,
    max_new_tokens: int = 512,
    dtype=None,
    **compression_kwargs,
) -> Engine:
    """One-call constructor: HF checkpoint dir -> ready Engine."""
    import jax.numpy as jnp

    from .models.loader import load_params_from_hf, spec_from_hf_dir

    spec = spec_from_hf_dir(model_dir)
    params = load_params_from_hf(model_dir, spec, dtype=dtype or jnp.bfloat16)
    comp = CompressionSpec(
        method=method, max_capacity_prompt=max_capacity_prompt,
        **compression_kwargs,
    )
    return Engine(spec, comp, EngineSpec(max_new_tokens=max_new_tokens), params)
