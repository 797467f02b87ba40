"""Viztools: attention capture correctness + plotting smoke."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import ModelSpec
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.viztools import (
    attn_mp,
    capture_attentions,
    needle_heatmap,
    plot_attention_heatmaps,
    plot_heatmap,
)


def test_capture_attentions_shapes_and_rowsums():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = list(range(12))
    maps = capture_attentions(params, spec, ids)
    assert len(maps) == spec.num_hidden_layers
    assert maps[0].shape == (spec.num_attention_heads, 12, 12)
    # rows are softmax distributions; upper triangle is masked
    np.testing.assert_allclose(maps[0].sum(-1), 1.0, rtol=1e-5)
    assert np.all(maps[1][:, 0, 1:] == 0)


def test_attn_mp_thresholding():
    s = np.array([[0.0, 0.001, 0.5, 0.2]])
    out = attn_mp(s.copy())
    assert out[0, 0] == 0
    assert out[0, 1] == 50          # > 0, < 1/n (= 0.25)
    assert out[0, 2] == 100         # >= 1/n
    assert out[0, 3] == 50          # 0.2 < 0.25 -> mid


def test_plotting_smoke(tmp_path):
    data = np.random.default_rng(0).random((4, 8, 8))
    plot_heatmap(data[0], save_path=str(tmp_path / "h.jpg"))
    assert (tmp_path / "h.jpg").exists()
    plot_attention_heatmaps([data, data], layer_ids=[0, 1],
                            save_dir=str(tmp_path / "maps"))
    assert (tmp_path / "maps" / "layer0.jpg").exists()
    plot_attention_heatmaps([data], map_fn=attn_mp, layer_ids=[0],
                            head_ids=[1], save_dir=str(tmp_path / "maps2"))
    assert (tmp_path / "maps2" / "layer0_head1.jpg").exists()


def test_needle_heatmap(tmp_path):
    d = tmp_path / "results" / "m"
    os.makedirs(d)
    for i, (L, dep, s) in enumerate([(1000, 0.0, 10.0), (1000, 50.0, 5.0),
                                     (2000, 0.0, 0.0)]):
        with open(d / f"r{i}_results.json", "w") as f:
            json.dump({"context_length": L, "depth_percent": dep, "score": s}, f)
    lengths, depths, grid = needle_heatmap(str(tmp_path), "m",
                                           save_path=str(tmp_path / "n.png"))
    assert lengths == [1000, 2000] and depths == [0.0, 50.0]
    assert grid[0, 0] == 10.0 and np.isnan(grid[1, 1])
    assert (tmp_path / "n.png").exists()


def test_word_overlap_score():
    from pyramidkv_tpu.viztools.plots import word_overlap_score

    assert word_overlap_score(
        "The best thing is to eat a sandwich and sit in dolores park on a sunny day."
    ) == 1.0
    assert word_overlap_score("nothing relevant") == 0.0
    assert 0 < word_overlap_score("eat a sandwich") < 1.0
