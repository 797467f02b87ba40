"""Torch re-statements of the reference's policy math, used as test oracles.

These implement the *specification* extracted in SURVEY.md §2.1 (from
/root/reference/pyramidkv/pyramidkv_utils.py) so that the JAX implementations
can be checked numerically on unpadded inputs.  They intentionally run on
plain CPU torch with fp32 everywhere.
"""

import math

import torch
import torch.nn.functional as F


def window_scores_oracle(q, k, window, kernel, pooling, aggregation="sum"):
    """SnapKV-style observation-window score (pyramidkv_utils.py:317-333).

    q, k: [B, H, N, D] fp32 torch tensors (no padding).
    Returns pooled scores over the first N - window columns: [B, H, N - W].
    """
    b, h, n, d = q.shape
    w = window
    logits = q[..., -w:, :] @ k.transpose(2, 3) / math.sqrt(d)
    tri = torch.full((w, w), float("-inf"))
    tri = torch.triu(tri, diagonal=1)
    logits[..., -w:] = logits[..., -w:] + tri
    probs = torch.softmax(logits.float(), dim=-1)
    if aggregation == "sum":
        s = probs[..., : n - w].sum(dim=2)
    else:
        s = probs[..., : n - w].mean(dim=2)
    if pooling == "avgpool":
        s = F.avg_pool1d(s.flatten(0, 1), kernel_size=kernel, padding=kernel // 2, stride=1)
    else:
        s = F.max_pool1d(s.flatten(0, 1), kernel_size=kernel, padding=kernel // 2, stride=1)
    return s.reshape(b, h, n - w)


def h2o_scores_oracle(q, k, window):
    """H2O column sums (pyramidkv_utils.py:544-561): full QK^T, causal mask
    only inside the trailing W x W block, softmax fp32, column sums over the
    non-window columns."""
    b, h, n, d = q.shape
    w = window
    logits = q @ k.transpose(2, 3) / math.sqrt(d)
    tri = torch.full((w, w), float("-inf"))
    tri = torch.triu(tri, diagonal=1)
    logits[..., -w:, -w:] = logits[..., -w:, -w:] + tri
    probs = torch.softmax(logits.float(), dim=-1)
    return probs[..., : n - w].sum(dim=2)


def snapkv_kept_positions(q, k, window, kernel, pooling, capacity):
    """Positions kept by SnapKV at prefill: top (cap - w) past + window."""
    b, h, n, d = q.shape
    s = window_scores_oracle(q, k, window, kernel, pooling)
    idx = s.topk(capacity - window, dim=-1).indices
    keep = torch.cat(
        [idx, torch.arange(n - window, n).expand(b, h, window)], dim=-1
    )
    return keep  # [B, H, capacity]


def pyramid_budget_oracle(cap, w, beta, num_layers, q_len):
    """pyramidkv_utils.py:205-215 exactly (python ints)."""
    min_num = (cap - w) // beta
    max_num = (cap - w) * 2 - min_num
    if max_num >= q_len - w:
        max_num = q_len - w
        min_num = (cap - w) * 2 - max_num
    steps = (max_num - min_num) // (num_layers - 1)
    return [max_num - l * steps for l in range(num_layers)]


def adakv_counts_oracle(scores, base_capacity, floor_ratio, normalize):
    """AdaKV head-budget allocation (pyramidkv_utils.py:706-719).

    scores: [B, H, C] fp32 pooled window-mean scores.
    Returns [B, H] int per-head counts (before window add)."""
    b, h, c = scores.shape
    sorted_scores, _ = scores.sort(dim=-1, descending=True)
    adaptive = sorted_scores
    if normalize:
        ratio = sorted_scores[..., :base_capacity].sum(-1, keepdim=True) / sorted_scores.sum(
            -1, keepdim=True
        )
        adaptive = adaptive * ratio
    flat = adaptive.reshape(b, c * h if False else h * c)
    idx = torch.topk(flat, k=h * base_capacity, dim=-1).indices
    head_of = idx // c
    counts = torch.zeros((b, h), dtype=torch.long)
    counts.scatter_add_(-1, head_of, torch.ones_like(head_of))
    floor_cap = int(base_capacity * floor_ratio)
    counts = torch.round(counts * (1 - floor_ratio) + floor_cap).int()
    return counts


def think_kept_channels_oracle(k, q, ratio):
    """key_pruner_query_driven channel choice (pyramidkv_utils.py:13-26):
    drop the int(D * ratio) lowest (mean q^2[-32:]) * (mean k^2) channels."""
    d = k.shape[-1]
    drop = int(d * ratio)
    qn = q[..., -32:, :].pow(2).mean(dim=2)
    kn = k.pow(2).mean(dim=2)
    score = qn * kn
    dropped = torch.topk(score, drop, dim=-1, largest=False).indices
    mask = torch.zeros_like(score, dtype=torch.bool).scatter_(-1, dropped, True)
    return ~mask  # True at kept channels
