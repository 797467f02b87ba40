from .pooling import pool1d
from .scoring import (
    window_scores,
    h2o_scores,
    l2norm_scores,
    position_scores,
    random_scores,
)
from .selection import (
    Selection,
    CompactedKV,
    HeadAllocation,
    uniform_keep_counts,
    pyramid_keep_counts,
    l2norm_keep_counts,
    static_selection_width,
    selection_window,
    adakv_allocate,
    headkv_allocate,
    topk_select,
    selection_from_allocation,
    compact_kv,
)
from .think import think_channel_selection, gather_channels, ChannelPrune
from .quant import (
    quantize,
    dequantize,
    QuantizedTensor,
    QuantizedKVRegion,
    quantize_kv_region,
    dequantize_kv_region,
    quant_region_attention_fused,
)
from .sparse_prefill import (
    VerticalSlashPattern,
    estimate_vertical_slash,
    sparse_prefill_attention,
)
from .merge import pivot_merge
