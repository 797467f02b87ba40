from .llama import (
    init_params,
    prefill,
    decode_step,
    rope_inv_freq,
    apply_rope,
    rms_norm,
)
from .loader import load_params_from_hf, spec_from_hf_dir
