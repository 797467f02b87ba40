"""LOOK-M pivot merge behavior (ops/merge.py; reference merge_kv,
pyramidkv_utils.py:119-170)."""

import numpy as np
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.ops import Selection, pivot_merge


def _mk(n=16, d=8, seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.normal(size=(1, 1, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1, n, d)), jnp.float32)
    return k, v


def test_no_eviction_leaves_kept_rows_unchanged():
    n, d, w = 16, 8, 4
    k, v = _mk(n, d)
    # select ALL past columns -> nothing evicted -> include_self mean is a no-op
    idx = jnp.arange(n - w, dtype=jnp.int32)[None, None, :]
    sel = Selection(indices=idx, valid=jnp.ones_like(idx, bool))
    km, vm = pivot_merge(k, v, sel, window_size=w, true_len=jnp.asarray([n], jnp.int32))
    np.testing.assert_allclose(np.asarray(km), np.asarray(k), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vm), np.asarray(v), rtol=1e-5, atol=1e-6)


def test_evicted_rows_pull_their_nearest_kept_row():
    n, d, w = 8, 4, 2
    # construct keys where evicted row 1 is nearly identical to kept row 0
    k = np.ones((1, 1, n, d), np.float32) * 0.01
    k[0, 0, 0] = [1, 0, 0, 0]
    k[0, 0, 1] = [0.9, 0.1, 0, 0]   # evicted, nearest kept = row 0
    k[0, 0, 2] = [0, 0, 1, 0]       # kept, far away
    v = np.zeros((1, 1, n, d), np.float32)
    v[0, 0, 0] = 10.0
    v[0, 0, 1] = 20.0
    kj, vj = jnp.asarray(k), jnp.asarray(v)
    sel = Selection(
        indices=jnp.asarray([[[0, 2]]], jnp.int32),
        valid=jnp.ones((1, 1, 2), bool),
    )
    km, vm = pivot_merge(kj, vj, sel, window_size=w,
                         true_len=jnp.asarray([n], jnp.int32))
    # kept row 0's value moved toward the evicted row's (10 -> avg with
    # pairwise mean (10+20)/2: (10 + 15)/2 = 12.5 with one merge assigned)
    v0 = float(vm[0, 0, 0, 0])
    assert v0 > 10.0, v0
    # far-away kept row 2 moved less in value norm than row 0
    assert abs(float(vm[0, 0, 2, 0])) < v0


def test_engine_merge_pivot_end_to_end():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    ids = [int(x) for x in np.random.default_rng(1).integers(0, 256, size=40)]
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16, window_size=4,
                        merge="pivot"),
        EngineSpec(max_new_tokens=4, prefill_buckets=(64,)),
        params,
    )
    out = eng.generate([ids])
    assert len(out.tokens[0]) == 4


def test_cam_recurrence_matches_sequential_loop(monkeypatch):
    """The blocked triangular-solve formulation of CAM's value merge must
    reproduce the step-by-step sequential loop exactly (same Bernoulli
    draws, injected via a fixed uniform table)."""
    import jax
    import numpy as np
    from pyramidkv_tpu.policy import _cam_merge_values

    b, h, w, n, d, r = 1, 2, 4, 40, 8, 4
    rng = np.random.default_rng(21)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    probs = jnp.asarray(rng.random((b, h, w, n)).astype(np.float32))
    unif = rng.random((b, h, n)).astype(np.float32)
    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape, **kw: jnp.asarray(unif))
    tl = jnp.asarray([34], jnp.int32)
    start_budget = jnp.asarray([4], jnp.int32)
    got = np.asarray(_cam_merge_values(
        v, probs, rng=jax.random.PRNGKey(0), start_budget=start_budget,
        recent_budget=r, true_len=tl,
    ))

    # direct numpy transcription of the reference loop semantics
    colmean = np.asarray(probs).mean(axis=2)
    pad = n - 34
    start_buf = pad + 4
    vout = np.asarray(v, np.float64).copy()
    for t in range(r, n):
        src = t - r
        pool = np.zeros(n, bool)
        pool[pad:start_buf] = True
        pool[max(src, 0):t] = True
        mean_attn = np.where(pool[None, None, :], colmean, -np.inf).max(-1)
        p = colmean[:, :, src] / mean_attn
        p = np.nan_to_num(p, nan=0.0, posinf=1.0, neginf=0.0).clip(0, 1)
        active = (t >= start_buf + r) and (src >= pad)
        draw = (unif[:, :, src] < p) & active
        add = vout[:, :, src, :] * draw[..., None] / r
        vout[:, :, src + 1:src + r + 1, :] += add[:, :, None, :]
    np.testing.assert_allclose(got, vout.astype(np.float32), rtol=2e-5,
                               atol=2e-5)
