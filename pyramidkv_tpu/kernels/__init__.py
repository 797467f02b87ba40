from .flash_prefill import (flash_attention_partials,
                            flash_causal_attention)
from .h2o_scores import h2o_scores_pallas
