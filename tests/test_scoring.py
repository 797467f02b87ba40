"""Numerical parity of the JAX scorers against torch oracles of the
reference math, on both unpadded and left-padded buffers."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from pyramidkv_tpu.ops import (
    window_scores,
    h2o_scores,
    l2norm_scores,
    position_scores,
    pool1d,
)
from reference_oracle import window_scores_oracle, h2o_scores_oracle

B, H, D = 2, 3, 16


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(B, H, n, D)).astype(np.float32)
    k = rng.normal(size=(B, H, n, D)).astype(np.float32)
    return q, k


@pytest.mark.parametrize("pooling", ["avgpool", "maxpool"])
@pytest.mark.parametrize("kernel", [5, 7])
def test_pool1d_matches_torch(pooling, kernel):
    x = np.abs(np.random.default_rng(1).normal(size=(B, H, 40))).astype(np.float32)
    got = np.asarray(pool1d(jnp.asarray(x), kernel, pooling))
    t = torch.from_numpy(x).flatten(0, 1)
    if pooling == "avgpool":
        want = torch.nn.functional.avg_pool1d(t, kernel, padding=kernel // 2, stride=1)
    else:
        want = torch.nn.functional.max_pool1d(t, kernel, padding=kernel // 2, stride=1)
    np.testing.assert_allclose(got, want.reshape(B, H, -1).numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("agg", ["sum", "mean"])
@pytest.mark.parametrize("pooling", ["avgpool", "maxpool"])
def test_window_scores_unpadded(agg, pooling):
    n, w, kern = 64, 8, 7
    q, k = _rand(n)
    got = np.asarray(
        window_scores(
            jnp.asarray(q), jnp.asarray(k), window_size=w,
            true_len=jnp.full((B,), n, jnp.int32),
            kernel_size=kern, pooling=pooling, aggregation=agg,
        )
    )
    want = window_scores_oracle(
        torch.from_numpy(q), torch.from_numpy(k), w, kern, pooling, agg
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-5)


@pytest.mark.parametrize("true_len", [40, 57])
def test_window_scores_left_padded_matches_unpadded(true_len):
    """Scores of a left-padded buffer must equal the unpadded scores shifted
    by the pad amount; padding columns must be -inf."""
    n, w, kern = 64, 8, 7
    q, k = _rand(true_len, seed=3)
    pad = n - true_len
    qp = np.concatenate([np.zeros((B, H, pad, D), np.float32), q], axis=2)
    kp = np.concatenate([np.zeros((B, H, pad, D), np.float32), k], axis=2)
    got = np.asarray(
        window_scores(
            jnp.asarray(qp), jnp.asarray(kp), window_size=w,
            true_len=jnp.full((B,), true_len, jnp.int32),
            kernel_size=kern, pooling="maxpool",
        )
    )
    want = window_scores_oracle(
        torch.from_numpy(q), torch.from_numpy(k), w, kern, "maxpool"
    ).numpy()
    assert got.shape == (B, H, n - w)
    assert np.all(np.isneginf(got[..., :pad]))
    np.testing.assert_allclose(got[..., pad:], want, rtol=1e-2, atol=1e-5)


def test_h2o_scores_unpadded_and_padded():
    n, w = 64, 8
    q, k = _rand(n, seed=5)
    want = h2o_scores_oracle(torch.from_numpy(q), torch.from_numpy(k), w).numpy()
    got = np.asarray(
        h2o_scores(
            jnp.asarray(q), jnp.asarray(k), window_size=w,
            true_len=jnp.full((B,), n, jnp.int32), block=16,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-4)

    # left-padded: same result shifted
    true_len = 48
    pad = n - true_len
    q2, k2 = q[:, :, :true_len], k[:, :, :true_len]
    qp = np.concatenate([np.zeros((B, H, pad, D), np.float32), q2], axis=2)
    kp = np.concatenate([np.zeros((B, H, pad, D), np.float32), k2], axis=2)
    got_p = np.asarray(
        h2o_scores(
            jnp.asarray(qp), jnp.asarray(kp), window_size=w,
            true_len=jnp.full((B,), true_len, jnp.int32), block=16,
        )
    )
    want_p = h2o_scores_oracle(
        torch.from_numpy(q2).contiguous(), torch.from_numpy(k2).contiguous(), w
    ).numpy()
    assert np.all(np.isneginf(got_p[..., :pad]))
    np.testing.assert_allclose(got_p[..., pad:], want_p, rtol=1e-2, atol=1e-4)


def test_l2norm_scores_orders_by_ascending_norm():
    n = 32
    _, k = _rand(n, seed=7)
    s = np.asarray(
        l2norm_scores(jnp.asarray(k), true_len=jnp.full((B,), n, jnp.int32))
    )
    norms = np.linalg.norm(k, axis=-1)
    # top-k of s == smallest norms
    np.testing.assert_allclose(-s, norms, rtol=1e-5)


def test_position_scores_pick_sinks():
    n, w = 32, 20
    q, k = _rand(n, seed=9)
    tl = jnp.asarray([32, 25], jnp.int32)
    s = np.asarray(position_scores(jnp.asarray(k), window_size=w, true_len=tl))
    # batch 0: no padding; earliest = col 0
    order = np.argsort(-s[0, 0])
    assert list(order[:4]) == [0, 1, 2, 3]
    # batch 1: pad = 7; earliest real = col 7
    assert np.all(np.isneginf(s[1, 0, :7]))
    order1 = np.argsort(-s[1, 0])
    assert list(order1[:4]) == [7, 8, 9, 10]
