"""Heatmap plotting + score normalisation.

Behavioral spec: /root/reference/pyramidkv/viztools/utils.py (``plot_heatmap``
vmax=100; ``attn_mp`` thresholds scores at 1/seq_len) and
scripts/scripts_needle/visualize.py (depth x length pivot heatmap of needle
scores).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Callable, List, Optional, Sequence

import numpy as np


def attn_mp(scores: np.ndarray, high_value: float = 100, mid_value: float = 50) -> np.ndarray:
    """Ternarise attention scores: >= 1/seq_len -> high, (0, high) -> mid
    (viztools/utils.py:63-82; note the reference's second mask compares
    against ``high_value``, reproduced here)."""
    s = np.array(scores, dtype=np.float32)
    n = s.shape[-1]
    s[s >= 1.0 / n] = high_value
    s[(s > 0) & (s < high_value)] = mid_value
    return s


def plot_heatmap(
    data: np.ndarray,
    title: str = "Attention Heatmap",
    fig_size=None,
    x_label: str = "Key Positions",
    y_label: str = "Query Positions",
    cmap: Optional[str] = None,
    save_path: Optional[str] = None,
    vmax: float = 100,
    show: bool = False,
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    plt.figure(figsize=fig_size)
    plt.imshow(np.asarray(data), vmax=vmax, cmap=cmap, aspect="auto")
    plt.xticks([])
    plt.yticks([])
    plt.title(title)
    plt.xlabel(x_label)
    plt.ylabel(y_label)
    if save_path:
        plt.savefig(save_path, dpi=150)
    if show:  # pragma: no cover
        plt.show()
    plt.close()


def plot_attention_heatmaps(
    attentions: List[np.ndarray],
    map_fn: Optional[Callable] = None,
    layer_ids: Optional[Sequence[int]] = None,
    head_ids: Optional[Sequence[int]] = None,
    save_dir: Optional[str] = None,
):
    """Per-layer (optionally per-head) heatmaps; heads averaged when
    ``head_ids`` is None (viztools/visualization.py:9-51)."""
    assert layer_ids is not None, "provide layer_ids to visualize"
    if map_fn:
        attentions = [map_fn(a) for a in attentions]
    for lid in layer_ids:
        a = attentions[lid]
        if not head_ids:
            data = a.mean(axis=0)
            path = os.path.join(save_dir, f"layer{lid}.jpg") if save_dir else None
            plot_heatmap(data, title=f"Average Attention Map: Layer {lid}",
                         save_path=path)
        else:
            for hid in head_ids:
                path = (
                    os.path.join(save_dir, f"layer{lid}_head{hid}.jpg")
                    if save_dir else None
                )
                plot_heatmap(a[hid], title=f"Attention Map: Layer {lid} Head {hid}",
                             save_path=path)


_DEFAULT_EXPECTED = "eat a sandwich and sit in Dolores Park on a sunny day."


def word_overlap_score(model_response: str, expected_answer: str = _DEFAULT_EXPECTED) -> float:
    """|response-words ∩ expected-words| / |expected-words| — the score the
    reference's heatmap script recomputes from saved responses
    (scripts/scripts_needle/visualize.py:42-45)."""
    exp = set(expected_answer.lower().split())
    got = set(model_response.lower().split())
    return len(got & exp) / len(exp)


def needle_heatmap(
    results_dir: str,
    model_version: str,
    save_path: Optional[str] = None,
    score_mode: str = "stored",
    expected_answer: str = _DEFAULT_EXPECTED,
):
    """Depth x context-length pivot heatmap of needle scores
    (scripts/scripts_needle/visualize.py).  ``score_mode``: "stored" uses the
    in-run ROUGE-1x10 score; "overlap" recomputes the word-overlap score
    from each saved model_response like the reference's plot script.
    Returns (lengths, depths, grid)."""
    pat = os.path.join(results_dir, "results", model_version, "*_results.json")
    rows = []
    for path in glob.glob(pat):
        with open(path) as f:
            r = json.load(f)
        if score_mode == "overlap":
            score = word_overlap_score(r.get("model_response", ""), expected_answer)
        else:
            score = r["score"]
        rows.append((r["context_length"], r["depth_percent"], score))
    if not rows:
        raise FileNotFoundError(f"no needle results under {pat}")
    lengths = sorted({r[0] for r in rows})
    depths = sorted({r[1] for r in rows})
    grid = np.full((len(depths), len(lengths)), np.nan)
    for L, d, s in rows:
        grid[depths.index(d), lengths.index(L)] = s
    if save_path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(10, 5))
        vmax = 1.0 if score_mode == "overlap" else 10.0
        plt.imshow(grid, cmap="RdYlGn", vmin=0, vmax=vmax, aspect="auto")
        plt.colorbar(label="score")
        plt.xticks(range(len(lengths)), lengths, rotation=45, fontsize=6)
        plt.yticks(range(len(depths)), [f"{d:.0f}%" for d in depths], fontsize=6)
        plt.xlabel("Context Length")
        plt.ylabel("Needle Depth")
        plt.title(f"Needle in a Haystack: {model_version}")
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        plt.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close()
    return lengths, depths, grid
