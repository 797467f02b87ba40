"""HeadKV prior loading + capacity math vs an oracle re-statement of
run_longbench.py:225-234, exercised on the real heads_score asset when the
reference snapshot is mounted."""

import json
import os

import numpy as np
import pytest

from pyramidkv_tpu.config import headkv_capacity_from_scores, load_headkv_scores

ASSET = (
    "/root/reference/data/heads_score/"
    "Meta-Llama-3-8B-Instruct_retrieval_reasoning_heads.json"
)


@pytest.mark.skipif(not os.path.exists(ASSET), reason="reference asset absent")
def test_capacity_math_matches_reference_on_real_asset():
    scores = load_headkv_scores(ASSET)
    assert len(scores) == 32 * 32
    got = np.array(headkv_capacity_from_scores(scores, 32, 32, 128, head_beta=1.005))

    with open(ASSET) as f:
        head_list = json.loads(f.readline())
    hs = np.array([np.mean(l[1]) for l in head_list.items()])
    hs = hs / hs.sum()
    pool = (128 // 1.005) * 32 * 32
    min_num = 128 - 128 // 1.005
    want = np.round(hs.reshape(32, 32) * pool + min_num).astype(int)
    assert (got == want).all()


def test_capacity_math_synthetic():
    scores = [1.0] * (4 * 2)  # uniform priors -> uniform capacities
    caps = np.array(headkv_capacity_from_scores(scores, 4, 2, 64, head_beta=1.0))
    assert caps.shape == (4, 2)
    assert (caps == caps[0, 0]).all()
    # pool = 64*4*2, each head gets pool/8 + min_num(=0) = 64
    assert caps[0, 0] == 64
