"""int8 weight quantization: exact factorized dequant + engine behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyramidkv_tpu.config import CompressionSpec, EngineSpec, ModelSpec
from pyramidkv_tpu.engine import Engine
from pyramidkv_tpu.models import llama as jl
from pyramidkv_tpu.models.weights import (
    QuantW,
    _quantize_leaf,
    mm,
    quantize_weights,
)


def test_factorized_dequant_is_exact():
    """(x @ codes) * scale == x @ (codes * scale) bit-for-bit in f32."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    qw = _quantize_leaf(w)
    direct = x @ (qw.codes.astype(jnp.float32) * qw.scale[None, :])
    np.testing.assert_allclose(np.asarray(mm(x, qw)), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)
    # quantization error bounded by scale/2 per weight
    err = np.abs(np.asarray(qw.codes, np.float32) * np.asarray(qw.scale)[None]
                 - np.asarray(w))
    assert err.max() <= np.asarray(qw.scale).max() * 0.5 + 1e-6


@pytest.mark.parametrize("moe", [False, True])
def test_engine_runs_with_int8_weights(moe):
    spec = ModelSpec.tiny(**(dict(num_local_experts=4) if moe else {}))
    params = jl.init_params(spec, jax.random.PRNGKey(0), dtype=jnp.float32)
    qparams = quantize_weights(params)
    assert isinstance(qparams["layers"]["wq"], QuantW)
    ids = [int(x) for x in np.random.default_rng(1).integers(0, 256, size=60)]
    outs = {}
    for tag, p in (("bf16", params), ("int8", qparams)):
        eng = Engine(
            spec,
            CompressionSpec(method="snapkv", max_capacity_prompt=32,
                            window_size=8),
            EngineSpec(max_new_tokens=8, prefill_buckets=(128,)), p,
        )
        outs[tag] = eng.generate([ids], eos_token_ids=())
    assert len(outs["int8"].tokens[0]) == 8
    # int8 weights shrink the param bytes ~2x (f32 baseline here -> ~4x)
    # and logits stay close enough that early greedy tokens agree
    assert outs["int8"].tokens[0][:2] == outs["bf16"].tokens[0][:2]


def test_int8_logits_close_to_full_precision():
    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(2), dtype=jnp.float32)
    qparams = quantize_weights(params)
    from pyramidkv_tpu.policy import make_plan

    ids = jnp.asarray([[int(x) for x in
                        np.random.default_rng(3).integers(0, 256, size=32)]],
                      jnp.int32)
    tl = jnp.asarray([32], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers,
                     32, 4)
    ref, _ = jl.prefill(params, spec, plan, ids, tl)
    got, _ = jl.prefill(qparams, spec, plan, ids, tl)
    # relative error dominated by int8 weight rounding (~1e-2)
    denom = np.maximum(np.abs(np.asarray(ref)), 1.0)
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
    assert rel.max() < 0.15 and np.median(rel) < 0.02


def test_int8_weights_shard_over_mesh():
    """int8 weights compose with TP (and EP for MoE): sharded logits ==
    single-device logits."""
    from jax.sharding import PartitionSpec  # noqa: F401

    from pyramidkv_tpu.parallel import make_mesh, shard_params
    from pyramidkv_tpu.policy import make_plan

    for moe in (False, True):
        spec = ModelSpec.tiny(**(dict(num_local_experts=4) if moe else {}))
        params = quantize_weights(
            jl.init_params(spec, jax.random.PRNGKey(4), dtype=jnp.float32))
        ids = jnp.asarray(
            [[int(x) for x in
              np.random.default_rng(5).integers(0, 256, size=48)]], jnp.int32)
        tl = jnp.asarray([48], jnp.int32)
        plan = make_plan(
            CompressionSpec(method="snapkv", max_capacity_prompt=16,
                            window_size=4),
            spec.num_hidden_layers, 48, 4)
        ref, _ = jl.prefill(params, spec, plan, ids, tl)
        mesh = make_mesh((4, 2), ("data", "model"))
        sp = shard_params(params, spec, mesh)
        with mesh:
            got, _ = jax.jit(lambda p, i, t: jl.prefill(p, spec, plan, i, t))(
                sp, ids, tl)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)


def test_int8_moe_capacity_dispatch_matches_dense():
    """The dispatch path's factored-scale einsums (QuantW experts) must
    reproduce the dense QuantW path when drop-free."""
    import dataclasses

    from pyramidkv_tpu.policy import make_plan

    spec = ModelSpec.tiny(num_local_experts=4)
    params = quantize_weights(
        jl.init_params(spec, jax.random.PRNGKey(6), dtype=jnp.float32))
    ids = jnp.asarray(
        [[int(x) for x in
          np.random.default_rng(7).integers(0, 256, size=48)]], jnp.int32)
    tl = jnp.asarray([48], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers,
                     48, 4)
    ref, _ = jl.prefill(params, spec, plan, ids, tl)
    spec_c = dataclasses.replace(
        spec, moe_capacity_factor=spec.num_local_experts
        / spec.num_experts_per_tok)
    got, _ = jl.prefill(params, spec_c, plan, ids, tl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pack4_roundtrip():
    """pack4/unpack4 are inverse on signed nibble values, any lead shape."""
    from pyramidkv_tpu.models.weights import pack4, unpack4

    rng = np.random.default_rng(9)
    c = jnp.asarray(rng.integers(-8, 8, size=(3, 5, 16)).astype(np.int8))
    packed = pack4(c)
    assert packed.dtype == jnp.int8 and packed.shape == (3, 5, 8)
    np.testing.assert_array_equal(np.asarray(unpack4(packed)),
                                  np.asarray(c))


def test_int4_quantize_and_mm_exact_factoring():
    """int4 per-channel: (x @ codes) * scale == x @ dequant(w).  Codes are
    two signed nibbles packed per int8 byte along the OUT axis (NOT the
    jnp.int4 dtype — S4 arrays cannot cross the TPU tunnel as jit args)."""
    from pyramidkv_tpu.models.weights import dq_codes, is_packed4

    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    qw = _quantize_leaf(w, nbits=4)
    assert qw.codes.dtype == jnp.int8 and qw.codes.shape == (64, 24)
    assert is_packed4(qw)
    c = np.asarray(dq_codes(qw, jnp.float32))
    assert c.max() <= 7 and c.min() >= -7
    direct = x @ (c * np.asarray(qw.scale)[None, :])
    np.testing.assert_allclose(np.asarray(mm(x, qw)), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)
    # rounding error bounded by scale/2 per weight
    err = np.abs(c * np.asarray(qw.scale)[None] - np.asarray(w))
    assert err.max() <= np.asarray(qw.scale).max() * 0.5 + 1e-6


def test_grouped_scales_beat_per_channel_error():
    """Group-wise scales strictly reduce int4 rounding error on weights
    with per-group magnitude variation, and mm stays consistent with the
    explicit per-group dequant on BOTH mm paths (einsum and fori_loop)."""
    from pyramidkv_tpu.models.weights import dq_codes

    rng = np.random.default_rng(11)
    # rows alternate magnitude so per-channel amax over-scales most groups
    mags = np.repeat(rng.uniform(0.1, 4.0, size=8), 16)[:, None]
    w = jnp.asarray((rng.normal(size=(128, 48)) * mags).astype(np.float32))
    qc = _quantize_leaf(w, nbits=4)
    qg = _quantize_leaf(w, nbits=4, group_size=16)
    assert qg.scale.shape == (8, 48) and qg.codes.shape == (128, 24)
    cg = np.asarray(dq_codes(qg, jnp.float32))
    deq_g = (cg.reshape(8, 16, 48)
             * np.asarray(qg.scale)[:, None, :]).reshape(128, 48)
    deq_c = np.asarray(dq_codes(qc, jnp.float32)) * np.asarray(qc.scale)[None]
    err_g = np.abs(deq_g - np.asarray(w)).mean()
    err_c = np.abs(deq_c - np.asarray(w)).mean()
    assert err_g < err_c * 0.7
    for rows in (4, 300):  # einsum path and one-shot dequant-matmul path
        x = jnp.asarray(rng.normal(size=(rows, 128)).astype(np.float32))
        got = mm(x, qg)
        ref = np.asarray(x) @ deq_g
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4,
                                   atol=2e-4)


@pytest.mark.parametrize("moe", [False, True])
def test_engine_runs_with_int4_grouped_weights(moe):
    spec = ModelSpec.tiny(**(dict(num_local_experts=4) if moe else {}))
    params = jl.init_params(spec, jax.random.PRNGKey(12), dtype=jnp.float32)
    qparams = quantize_weights(params, nbits=4, group_size=16)
    wq = qparams["layers"]["wq"]
    assert wq.codes.dtype == jnp.int8
    # dense stacked leaves: packed out axis + grouped scales; embed int8
    assert wq.codes.shape[-1] * 2 == wq.scale.shape[-1]
    assert wq.scale.ndim == wq.codes.ndim
    assert qparams["embed"].codes.dtype == jnp.int8
    if moe:
        # router stays int8 per-channel; expert leaves packed per-channel
        router = qparams["layers"]["router"]
        assert router.codes.shape[-1] == router.scale.shape[-1]
        wg = qparams["layers"]["w_gate"]
        assert wg.codes.shape[-1] * 2 == wg.scale.shape[-1]
    ids = [int(x) for x in np.random.default_rng(13).integers(0, 256,
                                                              size=60)]
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=32,
                        window_size=8),
        EngineSpec(max_new_tokens=8, prefill_buckets=(128,)), qparams,
    )
    out = eng.generate([ids], eos_token_ids=())
    assert len(out.tokens[0]) == 8


def test_int4_weights_shard_over_mesh():
    from pyramidkv_tpu.parallel import make_mesh, shard_params
    from pyramidkv_tpu.policy import make_plan

    spec = ModelSpec.tiny()
    params = quantize_weights(
        jl.init_params(spec, jax.random.PRNGKey(14), dtype=jnp.float32),
        nbits=4, group_size=16)
    ids = jnp.asarray(
        [[int(x) for x in
          np.random.default_rng(15).integers(0, 256, size=48)]], jnp.int32)
    tl = jnp.asarray([48], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"),
                     spec.num_hidden_layers, 48, 4)
    ref, _ = jl.prefill(params, spec, plan, ids, tl)
    mesh = make_mesh((4, 2), ("data", "model"))
    sp = shard_params(params, spec, mesh)
    with mesh:
        got, _ = jax.jit(lambda p, i, t: jl.prefill(p, spec, plan, i, t))(
            sp, ids, tl)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_int4_matmul_kernel_per_channel():
    """Fused packed-int4 kernel (interpret mode) == explicit dequant
    matmul, including the odd-rows pad path and non-default tiles."""
    from pyramidkv_tpu.kernels.int4_matmul import int4_matmul
    from pyramidkv_tpu.models.weights import dq_codes

    rng = np.random.default_rng(16)
    for rows, in_dim, out in ((1, 128, 64), (5, 256, 128), (32, 512, 96)):
        w = jnp.asarray(rng.normal(size=(in_dim, out)).astype(np.float32))
        qw = _quantize_leaf(w, nbits=4)
        x = jnp.asarray(rng.normal(size=(rows, in_dim)).astype(np.float32))
        ref = np.asarray(x) @ (np.asarray(dq_codes(qw, jnp.float32))
                               * np.asarray(qw.scale)[None, :])
        got = int4_matmul(x, qw.codes, qw.scale, interpret=True)
        assert got.shape == (rows, out) and got.dtype == x.dtype
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-4)
        # multi-block in both grid axes
        got2 = int4_matmul(x, qw.codes, qw.scale, block_in=64,
                           block_out2=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got2), ref, rtol=1e-4,
                                   atol=1e-4)


def test_int4_matmul_kernel_grouped():
    """Grouped-scale kernel: per-group partials scaled in-kernel before
    cross-group accumulation; matches the explicit per-group dequant."""
    from pyramidkv_tpu.kernels.int4_matmul import int4_matmul
    from pyramidkv_tpu.models.weights import dq_codes

    rng = np.random.default_rng(17)
    in_dim, out, gs = 128, 64, 16
    mags = np.repeat(rng.uniform(0.1, 4.0, size=in_dim // gs), gs)[:, None]
    w = jnp.asarray((rng.normal(size=(in_dim, out)) * mags)
                    .astype(np.float32))
    qw = _quantize_leaf(w, nbits=4, group_size=gs)
    deq = (np.asarray(dq_codes(qw, jnp.float32)).reshape(-1, gs, out)
           * np.asarray(qw.scale)[:, None, :]).reshape(in_dim, out)
    for rows in (1, 7):
        x = jnp.asarray(rng.normal(size=(rows, in_dim)).astype(np.float32))
        ref = np.asarray(x) @ deq
        got = int4_matmul(x, qw.codes, qw.scale, group_size=gs,
                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4,
                                   atol=1e-4)
        # in-blocks spanning a strict subset of the groups
        got2 = int4_matmul(x, qw.codes, qw.scale, group_size=gs,
                           block_in=32, interpret=True)
        np.testing.assert_allclose(np.asarray(got2), ref, rtol=1e-4,
                                   atol=1e-4)


def test_mm_routes_decode_rows_through_int4_kernel():
    """mm() with _FORCE_INT4_KERNEL uses the fused kernel for decode-sized
    x and matches the XLA dequant path (per-channel AND grouped); rows
    above the threshold keep the XLA path."""
    from pyramidkv_tpu.models import weights as W

    rng = np.random.default_rng(18)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    for gs in (None, 16):
        qw = _quantize_leaf(w, nbits=4, group_size=gs)
        for lead in ((1,), (3,), (2, 4)):
            x = jnp.asarray(rng.normal(size=(*lead, 128)).astype(np.float32))
            ref = np.asarray(mm(x, qw))
            W._FORCE_INT4_KERNEL[0] = True
            try:
                got = np.asarray(mm(x, qw))
            finally:
                W._FORCE_INT4_KERNEL[0] = False
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        # prefill-sized x must NOT hit the kernel (falls back to XLA)
        big = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
        assert W._int4_kernel_mm(big, qw) is None


def test_int4_matmul_kernel_bf16_inputs():
    """Decode x is bf16: kernel pads to the bf16 sublane tile and matches
    the XLA dequant path at bf16 precision."""
    from pyramidkv_tpu.kernels.int4_matmul import int4_matmul
    from pyramidkv_tpu.models.weights import dq_codes

    rng = np.random.default_rng(19)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    qw = _quantize_leaf(w, nbits=4)
    x = jnp.asarray(rng.normal(size=(3, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = (x.astype(jnp.float32)
           @ (dq_codes(qw, jnp.float32) * qw.scale[None, :]))
    got = int4_matmul(x, qw.codes, qw.scale, interpret=True)
    assert got.dtype == jnp.bfloat16 and got.shape == (3, 64)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_int4_matmul_kernel_stacked_layer():
    """Stacked [L, in, out//2] codes + scalar-prefetched layer index ==
    per-layer slice through the 2D kernel (per-channel AND grouped)."""
    from pyramidkv_tpu.kernels.int4_matmul import int4_matmul
    from pyramidkv_tpu.models.weights import QuantW, dq_codes

    rng = np.random.default_rng(20)
    L, in_dim, out = 3, 128, 64
    for gs in (None, 16):
        stack = jnp.asarray(rng.normal(size=(L, in_dim, out))
                            .astype(np.float32))
        qw = _quantize_leaf(stack, nbits=4, group_size=gs)
        x = jnp.asarray(rng.normal(size=(5, in_dim)).astype(np.float32))
        for li in range(L):
            ref = int4_matmul(x, qw.codes[li], qw.scale[li],
                              group_size=gs or 0, interpret=True)
            got = int4_matmul(x, qw.codes, qw.scale[li],
                              layer=jnp.int32(li), group_size=gs or 0,
                              interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)
            # and against the explicit dequant
            deq = np.asarray(dq_codes(QuantW(qw.codes[li], qw.scale[li]),
                                      jnp.float32))
            if gs:
                deq = (deq.reshape(-1, gs, out)
                       * np.asarray(qw.scale[li])[:, None, :]
                       ).reshape(in_dim, out)
            else:
                deq = deq * np.asarray(qw.scale[li])[None, :]
            np.testing.assert_allclose(np.asarray(got), np.asarray(x) @ deq,
                                       rtol=1e-4, atol=1e-4)


def test_layer_view_scan_matches_eager_slices():
    """A lax.scan over layer_view with the kernel forced matches eager
    per-layer tree_map slicing through the XLA path — the decode-loop
    integration (packed int4 via LayerView, int8 sliced, bf16 indexed)."""
    from pyramidkv_tpu.models import weights as W

    rng = np.random.default_rng(21)
    L, in_dim, out = 3, 128, 64
    layers = {
        "w4": _quantize_leaf(jnp.asarray(
            rng.normal(size=(L, in_dim, out)).astype(np.float32)), nbits=4),
        "w4g": _quantize_leaf(jnp.asarray(
            rng.normal(size=(L, in_dim, out)).astype(np.float32)),
            nbits=4, group_size=16),
        "w8": _quantize_leaf(jnp.asarray(
            rng.normal(size=(L, in_dim, out)).astype(np.float32)), nbits=8),
        "norm": jnp.asarray(rng.normal(size=(L, in_dim))
                            .astype(np.float32)),
    }
    x = jnp.asarray(rng.normal(size=(2, in_dim)).astype(np.float32))

    def step(h, i, view):
        wts = (W.layer_view(layers, i) if view else
               jax.tree_util.tree_map(lambda a: a[i], layers))
        h = h * wts["norm"][None, :]
        y = mm(h, wts["w4"]) + mm(h, wts["w4g"]) + mm(h, wts["w8"])
        return y[:, :in_dim // 2].repeat(2, axis=1) * 0.1, None

    def run(view):
        f = lambda h, i: step(h, i, view)
        out_h, _ = jax.lax.scan(f, x, jnp.arange(L))
        return np.asarray(out_h)

    ref = run(view=False)
    W._FORCE_INT4_KERNEL[0] = True
    try:
        got = run(view=True)
    finally:
        W._FORCE_INT4_KERNEL[0] = False
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # the view really defers: EVERY stacked codes leaf stays stacked
    # (int8 included since round 3 — the eager per-layer slice copy in
    # front of the streaming kernel was the same cost int4 paid, r2w)
    wv = W.layer_view(layers, jnp.int32(1))
    assert isinstance(wv["w4"].codes, W.LayerView)
    assert isinstance(wv["w4g"].codes, W.LayerView)
    assert wv["w4"].codes.shape == (in_dim, out // 2)
    assert isinstance(wv["w8"].codes, W.LayerView)
    assert wv["w8"].codes.shape == (in_dim, out)


def test_fuse_packed_matmuls_bit_identical():
    """wqkv / w_gateup fusion: identical greedy tokens to the unfused
    tree on the XLA path AND the forced fused kernel; int8 / MoE-expert /
    sharded-ineligible trees are left untouched."""
    from pyramidkv_tpu.models import weights as W

    # intermediate 512: w_gate/w_up pack at span 128 (out % 256 == 0) so
    # their fusion is span-consistent; the default tiny intermediate (128)
    # now correctly DECLINES gateup fusion (span-1 halves can't concat
    # into a span-128 width) — asserted below
    spec = ModelSpec.tiny(intermediate_size=512)
    base = jl.init_params(spec, jax.random.PRNGKey(3), dtype=jnp.float32)
    p4 = W.quantize_weights(base, nbits=4)
    fused = W.fuse_packed_matmuls(p4)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    assert "w_gateup" in fused["layers"] and "w_up" not in fused["layers"]
    tiny4 = W.quantize_weights(
        jl.init_params(ModelSpec.tiny(), jax.random.PRNGKey(3),
                       dtype=jnp.float32), nbits=4)
    assert "w_gateup" not in W.fuse_packed_matmuls(tiny4)["layers"]
    # int8 tree: no packed leaves -> no-op (same object)
    p8 = W.quantize_weights(base, nbits=8)
    assert W.fuse_packed_matmuls(p8) is p8

    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    es = EngineSpec(max_new_tokens=8, prefill_buckets=(32,))
    ids = [int(x) for x in np.random.default_rng(2).integers(0, 256,
                                                             size=28)]
    want = Engine(spec, cs, es, p4).generate([ids]).tokens[0]
    got = Engine(spec, cs, es, fused).generate([ids]).tokens[0]
    assert got == want
    W._FORCE_INT4_KERNEL[0] = True
    try:
        got_k = Engine(spec, cs, es, fused).generate([ids]).tokens[0]
    finally:
        W._FORCE_INT4_KERNEL[0] = False
    assert got_k == want


def test_fuse_packed_matmuls_grouped_and_moe():
    """Grouped scales fuse along out; MoE expert leaves (4D codes) keep
    gate/up unfused while QKV still fuses."""
    from pyramidkv_tpu.models import weights as W

    spec = ModelSpec.tiny()
    base = jl.init_params(spec, jax.random.PRNGKey(4), dtype=jnp.float32)
    p4g = W.fuse_packed_matmuls(
        W.quantize_weights(base, nbits=4, group_size=16))
    assert "wqkv" in p4g["layers"]
    assert p4g["layers"]["wqkv"].scale.ndim == 3

    mspec = ModelSpec.tiny(num_local_experts=4)
    mbase = jl.init_params(mspec, jax.random.PRNGKey(5), dtype=jnp.float32)
    m4 = W.fuse_packed_matmuls(W.quantize_weights(mbase, nbits=4))
    assert "wqkv" in m4["layers"]
    assert "w_gate" in m4["layers"] and "w_gateup" not in m4["layers"]
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    es = EngineSpec(max_new_tokens=6, prefill_buckets=(32,))
    ids = [int(x) for x in np.random.default_rng(6).integers(0, 256,
                                                             size=20)]
    want = Engine(mspec, cs, es,
                  W.quantize_weights(mbase, nbits=4)).generate([ids]).tokens[0]
    assert Engine(mspec, cs, es, m4).generate([ids]).tokens[0] == want


def test_int4_lm_head_opt_in():
    """quantize_weights(lm_head_nbits=4) packs the vocab projection; the
    _logits path dequantises it correctly on both the XLA fallback and the
    fused kernel (decode-shaped rows), and the engine still generates.

    Halving the fixed per-step lm_head read (~0.6 ms of the d32 1.6 ms
    fixed cost) is the perf motivation — BASELINE.md r2ag decomposition."""
    from pyramidkv_tpu.models import weights as W
    from pyramidkv_tpu.policy import make_plan

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(7), dtype=jnp.float32)
    q8 = W.quantize_weights(params, nbits=4)                 # lm_head int8
    q4 = W.quantize_weights(params, nbits=4, lm_head_nbits=4)
    assert W.is_packed4(q4["lm_head"]) and not W.is_packed4(q8["lm_head"])
    assert (q4["lm_head"].codes.shape[-1] * 2 == spec.vocab_size
            and not W.is_packed4(q4["embed"]))               # embed stays int8

    # prefill logits (XLA dequant of the packed head) track the int8 head
    ids = jnp.asarray([[int(x) for x in
                        np.random.default_rng(8).integers(0, 256, size=24)]],
                      jnp.int32)
    tl = jnp.asarray([24], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers,
                     24, 4)
    ref, _ = jl.prefill(q8, spec, plan, ids, tl)
    got, _ = jl.prefill(q4, spec, plan, ids, tl)
    denom = np.maximum(np.abs(np.asarray(ref)), 1.0)
    rel = np.abs(np.asarray(got) - np.asarray(ref)) / denom
    assert np.median(rel) < 0.05 and rel.max() < 0.5   # int4 head rounding

    # decode-shaped rows: fused kernel (interpret) == XLA dequant fallback
    h = jnp.asarray(np.random.default_rng(9).normal(
        size=(2, spec.hidden_size)).astype(np.float32))
    xla = jl._logits(h, q4, spec)
    W._FORCE_INT4_KERNEL[0] = True
    try:
        ker = jl._logits(h, q4, spec)
    finally:
        W._FORCE_INT4_KERNEL[0] = False
    np.testing.assert_allclose(np.asarray(ker), np.asarray(xla),
                               rtol=2e-3, atol=2e-3)

    # engine end-to-end (greedy through the packed head)
    eng = Engine(
        spec,
        CompressionSpec(method="snapkv", max_capacity_prompt=16,
                        window_size=4),
        EngineSpec(max_new_tokens=6, prefill_buckets=(32,)), q4,
    )
    out = eng.generate([[int(x) for x in
                         np.random.default_rng(10).integers(0, 256, size=20)]],
                       eos_token_ids=())
    assert len(out.tokens[0]) == 6


def test_lm_head_pad_to_bit_identical():
    """quantize_weights(lm_head_pad_to=N) zero-pads the vocab axis so the
    streaming lm_head kernels get power-of-two tiles (Llama-3's 128256 =
    128*3*167 caps tiles at 384 packed bytes; 129024 = 63*2048 does not —
    ROADMAP round-4 #2).  Pad channels are all-zero and _logits slices
    back to spec.vocab_size, so logits over the REAL vocab are
    bit-identical and greedy tokens unchanged."""
    from pyramidkv_tpu.models import weights as W
    from pyramidkv_tpu.policy import make_plan

    spec = ModelSpec.tiny()
    params = jl.init_params(spec, jax.random.PRNGKey(7), dtype=jnp.float32)
    q = W.quantize_weights(params, nbits=4, lm_head_nbits=4)
    qp = W.quantize_weights(params, nbits=4, lm_head_nbits=4,
                            lm_head_pad_to=96)
    # 256 -> 288: codes widened, scales widened, real columns untouched
    assert qp["lm_head"].codes.shape[-1] * 2 == 288
    assert qp["lm_head"].scale.shape[-1] == 288

    ids = jnp.asarray([[int(x) for x in
                        np.random.default_rng(8).integers(0, 256, size=24)]],
                      jnp.int32)
    tl = jnp.asarray([24], jnp.int32)
    plan = make_plan(CompressionSpec(method="fullkv"), spec.num_hidden_layers,
                     24, 4)
    ref, _ = jl.prefill(q, spec, plan, ids, tl)
    got, _ = jl.prefill(qp, spec, plan, ids, tl)
    assert got.shape == ref.shape  # sliced back to the true vocab
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # decode-shaped rows through the fused kernel (interpret) also slice
    h = jnp.asarray(np.random.default_rng(9).normal(
        size=(2, spec.hidden_size)).astype(np.float32))
    xla = jl._logits(h, qp, spec)
    assert xla.shape[-1] == spec.vocab_size
    W._FORCE_INT4_KERNEL[0] = True
    try:
        ker = jl._logits(h, qp, spec)
    finally:
        W._FORCE_INT4_KERNEL[0] = False
    assert ker.shape[-1] == spec.vocab_size
    np.testing.assert_allclose(np.asarray(ker), np.asarray(xla),
                               rtol=2e-3, atol=2e-3)

    # greedy tokens identical padded vs unpadded
    prompt = [int(x) for x in
              np.random.default_rng(10).integers(0, 256, size=20)]
    cs = CompressionSpec(method="snapkv", max_capacity_prompt=16,
                         window_size=4)
    es = EngineSpec(max_new_tokens=6, prefill_buckets=(32,))
    t0 = Engine(spec, cs, es, q).generate([prompt], eos_token_ids=()).tokens[0]
    t1 = Engine(spec, cs, es, qp).generate([prompt],
                                           eos_token_ids=()).tokens[0]
    assert t0 == t1


def test_int4_kernel_verify_sized_rows():
    """Speculative verify forwards are lanes*(draft+1) rows (e.g. 288);
    the fused kernel must take them (the XLA dequant fallback cost CB
    speculation 2.7x — logs/tpu_r2an)."""
    from pyramidkv_tpu.kernels.int4_matmul import int4_matmul
    from pyramidkv_tpu.models import weights as W

    rng = np.random.default_rng(30)
    in_dim, out = 128, 256
    wf = jnp.asarray(rng.normal(size=(in_dim, out)).astype(np.float32))
    qw = W._quantize_leaf(wf, nbits=4)
    for rows in (40, 288):
        x = jnp.asarray(rng.normal(size=(rows, in_dim)).astype(np.float32))
        want = (x @ W.dq_codes(qw, jnp.float32)) * qw.scale[None, :]
        got = int4_matmul(x, qw.codes, qw.scale, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        # the mm() router accepts these rows now
        y = None
        W._FORCE_INT4_KERNEL[0] = True
        try:
            y = W._int4_kernel_mm(x, qw)
        finally:
            W._FORCE_INT4_KERNEL[0] = False
        assert y is not None
        np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
    # beyond the cap still declines (VMEM)
    x = jnp.zeros((512, in_dim), jnp.float32)
    W._FORCE_INT4_KERNEL[0] = True
    try:
        assert W._int4_kernel_mm(x, qw) is None
    finally:
        W._FORCE_INT4_KERNEL[0] = False


def test_pack4_planar_span_roundtrip():
    """Span-planar widths (out % 256 == 0): pack4/unpack4 inverse, and
    dq_codes restores NATURAL column order (the kernel's assembled output
    order — see kernels/int4_matmul.py::_assemble_planar)."""
    from pyramidkv_tpu.models.weights import (QuantW, dq_codes, pack4,
                                              pack_span, unpack4)

    rng = np.random.default_rng(11)
    for out in (256, 512, 1536):
        assert pack_span(out // 2) == 128
        c = rng.integers(-8, 8, size=(4, out)).astype(np.int8)
        packed = pack4(jnp.asarray(c))
        np.testing.assert_array_equal(np.asarray(unpack4(packed)), c)
        w = QuantW(codes=packed, scale=jnp.ones((out,), jnp.float32))
        np.testing.assert_array_equal(
            np.asarray(dq_codes(w, jnp.float32)), c.astype(np.float32))


def test_int4_matmul_kernel_planar_width():
    """The planar single-output kernel path (out % 256 == 0) matches the
    XLA dequant reference, per-channel and grouped."""
    from pyramidkv_tpu.kernels.int4_matmul import int4_matmul
    from pyramidkv_tpu.models.weights import _quantize_leaf, dq_codes

    rng = np.random.default_rng(12)
    w = rng.normal(size=(256, 512)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32))
    for gs in (None, 64):
        qw = _quantize_leaf(jnp.asarray(w), nbits=4, group_size=gs)
        dq = np.asarray(dq_codes(qw, jnp.float32))
        if gs:
            sc = np.asarray(qw.scale)
            ref = np.einsum("rGg,Ggo,Go->ro",
                            np.asarray(x).reshape(3, 256 // gs, gs),
                            dq.reshape(256 // gs, gs, 512), sc)
        else:
            ref = (np.asarray(x) @ dq) * np.asarray(qw.scale)[None, :]
        got = np.asarray(int4_matmul(x, qw.codes, qw.scale,
                                     group_size=gs or 0, interpret=True,
                                     block_in=128, block_out2=128))
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_int8_matmul_kernel_matches_xla():
    """The streaming int8 kernel (lm_head path) matches the XLA dequant
    matmul exactly for bf16-exact inputs (decode hidden states are bf16)."""
    from pyramidkv_tpu.models import weights as W
    from pyramidkv_tpu.models.weights import QuantW, mm

    rng = np.random.default_rng(13)
    codes = jnp.asarray(rng.integers(-127, 128, size=(512, 1536)), jnp.int8)
    scale = jnp.asarray(rng.uniform(0.001, 0.02, size=(1536,)), jnp.float32)
    w = QuantW(codes=codes, scale=scale)
    x = jnp.asarray(rng.normal(size=(1, 512)).astype(np.float32)
                    ).astype(jnp.bfloat16).astype(jnp.float32)
    ref = np.asarray(mm(x, w))        # XLA path (kernel declines off-TPU)
    W._FORCE_INT8_KERNEL[0] = True
    try:
        got = np.asarray(mm(x, w))
    finally:
        W._FORCE_INT8_KERNEL[0] = False
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    # rows > 8 / odd dims decline
    from pyramidkv_tpu.kernels.int4_matmul import int8_tiles
    assert int8_tiles(512, 1536)[0] > 0
    assert int8_tiles(500, 1536) == (0, 0)


def test_int4_matmul_dma_matches_grid_kernel():
    """Manual-DMA variant (double-buffered in-dim window copies inside the
    kernel; kernels/int4_matmul.py::int4_matmul_dma) computes the same
    product as the grid-pipelined kernel — 2-D and stacked+layer codes."""
    from pyramidkv_tpu.kernels.int4_matmul import int4_matmul, int4_matmul_dma

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(2, 512)).astype(np.float32))
    codes = jnp.asarray(rng.integers(-128, 128, size=(512, 512)), jnp.int8)
    scale = jnp.asarray(rng.random(1024).astype(np.float32) * 0.1)
    a = int4_matmul(x, codes, scale, interpret=True)
    b = int4_matmul_dma(x, codes, scale, interpret=True, win=128)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)

    codes3 = jnp.asarray(rng.integers(-128, 128, size=(3, 512, 512)),
                         jnp.int8)
    for l in (0, 2):
        a = int4_matmul(x, codes3, scale, layer=jnp.int32(l), interpret=True)
        b = int4_matmul_dma(x, codes3, scale, layer=jnp.int32(l),
                            interpret=True, win=256)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
