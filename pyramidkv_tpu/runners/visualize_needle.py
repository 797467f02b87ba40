"""Needle heatmap CLI (counterpart of scripts/scripts_needle/visualize.py).

  python -m pyramidkv_tpu.runners.visualize_needle \
      --results_dir results_needle --model_version <model_method_cap> \
      --out needle_heatmap.png [--score overlap]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", type=str, default="results_needle")
    p.add_argument("--model_version", type=str, required=True)
    p.add_argument("--out", type=str, default="needle_heatmap.png")
    p.add_argument("--score", type=str, default="stored",
                   choices=["stored", "overlap"],
                   help="'overlap' recomputes word-overlap from responses "
                        "like the reference's plot script (visualize.py:42-45)")
    args = p.parse_args()

    from ..viztools.plots import needle_heatmap

    lengths, depths, grid = needle_heatmap(
        args.results_dir, args.model_version, save_path=args.out,
        score_mode=args.score,
    )
    import numpy as np

    mean = float(np.nanmean(grid))
    print(f"[visualize_needle] {len(lengths)} lengths x {len(depths)} depths, "
          f"mean score {mean:.2f} -> {args.out}")


if __name__ == "__main__":
    main()
