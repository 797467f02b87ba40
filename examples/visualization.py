"""Attention-observation walkthrough (counterpart of the reference's
examples/visualization.ipynb): capture per-layer attention maps from a
model, ternarise them with the 1/seq_len threshold, and plot the patterns
that motivate PyramidKV (lower layers diffuse, upper layers sparse sinks)
and StreamingLLM (sink + recency mass).

Run: python examples/visualization.py [hf_model_dir]
(no argument -> tiny random model, maps are illustrative only)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # demo-sized; never claim the TPU

import jax.numpy as jnp

from pyramidkv_tpu.config import ModelSpec
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.viztools import attn_mp, capture_attentions, plot_attention_heatmaps


def main():
    if len(sys.argv) > 1:
        from transformers import AutoTokenizer

        from pyramidkv_tpu.models.loader import load_params_from_hf, spec_from_hf_dir

        model_dir = sys.argv[1]
        spec = spec_from_hf_dir(model_dir)
        params = load_params_from_hf(model_dir, spec, dtype=jnp.float32)
        tok = AutoTokenizer.from_pretrained(model_dir)
        ids = tok.encode(
            "The quick brown fox jumps over the lazy dog. "
            "Attention sinks collect probability mass at the start."
        )
    else:
        spec = ModelSpec.tiny()
        params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
        ids = list(range(48))

    maps = capture_attentions(params, spec, ids)
    layer_ids = list(range(min(4, spec.num_hidden_layers)))
    plot_attention_heatmaps(maps, layer_ids=layer_ids, save_dir="obs/raw")
    plot_attention_heatmaps(maps, map_fn=attn_mp, layer_ids=layer_ids,
                            save_dir="obs/thresholded")
    print(f"saved {2 * len(layer_ids)} heatmaps under obs/")


if __name__ == "__main__":
    main()
