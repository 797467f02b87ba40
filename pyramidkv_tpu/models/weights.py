"""Weight quantization (int8 / packed int4, optional group-wise scales)
for single-chip large-depth serving.

Decode is HBM-bandwidth-bound: reading int8 weights halves the dominant
traffic term and int4 halves it again, and — unlike cache quantization —
the dequant never needs a custom kernel: with PER-OUTPUT-CHANNEL
symmetric scales the dequant factors out of the matmul exactly,

    x @ (codes * scale_col)  ==  (x @ codes) * scale_col,

so the only approximation is the integer rounding of the weights
themselves.  This is what makes the full 32-layer Llama-3-8B geometry
fit one 16 GB v5e (bf16 weights ~16 GB; int8 ~8 GB; int4 ~4 GB + int8
embeddings).

int4 STORAGE is two signed nibbles PACKED per int8 byte along the OUT
axis (codes ``[..., in, out//2]``): S4 jax arrays cannot cross this
image's TPU tunnel as jit arguments (device_put recurses), so the
pytree leaves stay int8.  The COMPUTE path reinterprets the bytes as
native ``jnp.int4`` inside the jitted forward via a zero-copy
``bitcast_convert_type`` (s4 is stored two-per-byte anyway), so the
s4->bf16 convert fuses into the matmul operand stream like the int8
path and decode reads 0.5 byte/param — see :func:`_logical_codes`.
Packing is SPAN-PLANAR along the out axis (:func:`pack_span`): the fused
decode kernel emits natural-order output from full-lane block writes
(no element interleave), the prefill bitcast path restores column order
with one 128-block de-interleave per matmul, and out-axis
(column-parallel) sharding works as long as shards hold whole spans
(width a multiple of 256 columns — the 2-KV-head minimum shard).

int4 per-channel rounding is coarse, so ``group_size`` (AWQ/GPTQ-style,
e.g. 128) additionally splits the CONTRACTION dimension into groups with
one scale per (group, out_channel).  Grouped dequant no longer factors
out of the whole matmul, but it factors out of each group's partial
product:

    y = sum_G (x_G @ codes_G) * scale[G]

which `mm` computes either as one batched einsum with exact f32 group
partials (decode-sized x; ``[..., G, out]`` f32 transient) or — for
prefill-sized x — as a ONE-SHOT dequant matmul with an ``[in, out]``
compute-dtype transient (per-group accumulator sweeps cost ~15 GB of
f32 accumulator traffic per 4k-row MLP matmul; measured 3.6x prefill,
logs/tpu_r2y).  On TPU, decode-shaped x instead routes packed leaves
through the fused Pallas kernel (`kernels/int4_matmul.py`), which scales
each group's partial product in-kernel at f32.

The embedding table quantizes per ROW (token vector): lookup dequantizes
the selected rows; tied/untied logits reuse the same per-row scales as
per-output-channel scales of the vocab projection.  Embedding and
lm_head stay int8 even under ``nbits=4`` — they are the quality-critical
ends of the network and the embed lookup is a row gather where group
scales have no meaning.

Reference counterpart: the reference quantizes the KV cache only
(quantcache.py); weight quantization is the piece that makes its 8B
flagship servable on one 16 GB TPU chip at all.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuantW(NamedTuple):
    """Quantized weight (a pytree; scan-sliceable along a leading stack
    axis).

    - int8:        ``codes`` int8 at the original shape ``[..., in, out]``.
    - packed int4: ``codes`` int8 at ``[..., in, out//2]`` — two signed
      nibbles per byte along the out axis, span-planar order
      (:func:`pack_span`).  Detected by ``codes.shape[-1] * 2 ==
      <logical out>``; see :func:`is_packed4`.
    - per-channel scales: ``[..., out]`` (the embedding's per-row variant
      is ``[vocab]``).
    - group-wise scales: ``[..., G, out]`` with ``G = in_dim //
      group_size``.
    """

    codes: jax.Array
    scale: jax.Array


def pack_span(out2: int) -> int:
    """Bytes per planar span of the pack4 layout (shape-derived, so the
    layout needs no side-channel tag).

    span=128 (every real weight: out % 256 == 0): byte ``s*128 + p`` holds
    columns ``s*256 + p`` (low nibble) and ``s*256 + 128 + p`` (high) — the
    fused kernel then assembles its natural-order output from the two
    per-nibble dots with full-lane-width 128-column block writes, instead
    of the element interleave that cost ~1.0 ms/step of pure relayout
    copies at d32 (logs/r3a_trace: copy.81/84/86-88 at int4_matmul
    stack+reshape).  TP shards must hold whole spans: out-shard width a
    multiple of 256 columns (the 2-KV-head shard is exactly 256).

    span=1 (odd widths — tiny test models): byte ``j`` holds columns
    ``2j`` / ``2j+1``, the historical adjacent layout; the kernel keeps
    the two-output + caller-interleave path there (interpret-mode only).
    """
    return 128 if out2 % 128 == 0 else 1


def pack4(c: jax.Array) -> jax.Array:
    """Signed int values in [-8, 7], last axis even -> int8 bytes, planar
    within :func:`pack_span`-byte spans (see there for the layout)."""
    out2 = c.shape[-1] // 2
    s = pack_span(out2)
    v = (c.astype(jnp.int32) & 0xF).astype(jnp.uint8)
    v = v.reshape(*c.shape[:-1], out2 // s, 2, s)
    return (v[..., 0, :] | (v[..., 1, :] << 4)).astype(jnp.int8).reshape(
        *c.shape[:-1], out2)


def unpack4(p: jax.Array) -> jax.Array:
    """int8 bytes -> signed int8 nibble values at twice the last-axis
    length (inverse of :func:`pack4`)."""
    out2 = p.shape[-1]
    s = pack_span(out2)
    u = p.astype(jnp.uint8).reshape(*p.shape[:-1], out2 // s, 1, s)
    nib = jnp.concatenate([u & 0xF, u >> 4], axis=-2).astype(jnp.int8)
    nib = jnp.where(nib > 7, nib - 16, nib)
    return nib.reshape(*p.shape[:-1], out2 * 2)


def is_packed4(w: QuantW) -> bool:
    """True when ``w.codes`` holds packed int4 nibbles (out axis halved
    relative to the scale's out axis)."""
    return w.codes.shape[-1] * 2 == w.scale.shape[-1]


@jax.tree_util.register_pytree_node_class
class LayerView:
    """Lazy per-layer view of a stacked ``[L, in, out//2]`` codes array.

    A decode layer-scan that slices packed-int4 codes per layer
    (``tree_map(lambda x: x[i])``) forces XLA to MATERIALISE the slice in
    front of the opaque ``pallas_call`` — a copy whose HBM traffic equals
    the kernel's own reads (measured d32 int4: 64 tok/s vs int8's 83,
    logs/tpu_r2w).  The view defers the indexing to the kernel's
    scalar-prefetch index map (`kernels/int4_matmul.py`), which DMAs only
    the layer's tiles straight out of the stacked buffer.  Non-kernel
    consumers call :meth:`materialize` (identical XLA to the eager
    slice).
    """

    def __init__(self, stack: jax.Array, idx):
        self.stack = stack
        self.idx = idx

    def tree_flatten(self):
        return (self.stack, self.idx), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def ndim(self) -> int:
        return self.stack.ndim - 1

    @property
    def shape(self):
        return self.stack.shape[1:]

    def materialize(self) -> jax.Array:
        return jax.lax.dynamic_index_in_dim(self.stack, self.idx, 0,
                                            keepdims=False)


def layer_view(layers: dict, i) -> dict:
    """Per-layer weight slice for a scan body: every leaf is indexed at
    ``i``, except stacked matmul CODES (packed-int4 and int8 alike),
    which become a :class:`LayerView` so the fused decode kernels can
    index the stack in-kernel — an eager ``codes[i]`` in front of the
    opaque pallas_call costs a full per-layer byte-slice copy (scales are
    small and slice eagerly).  Consumers that stay on the XLA path call
    :meth:`LayerView.materialize`, which lowers to the same eager slice."""
    def f(x):
        if isinstance(x, QuantW):
            if x.codes.ndim == 3:
                return QuantW(codes=LayerView(x.codes, i), scale=x.scale[i])
            return QuantW(codes=x.codes[i], scale=x.scale[i])
        return x[i]
    return jax.tree_util.tree_map(
        f, layers, is_leaf=lambda x: isinstance(x, QuantW))


def _logical_codes(w: QuantW) -> jax.Array:
    """Codes at their LOGICAL ``[..., in, out]`` shape, still integer.

    Packed int4 leaves are reinterpreted as native ``jnp.int4`` via
    ``bitcast_convert_type`` — XLA stores s4 packed two-per-byte, so the
    bitcast is a zero-copy metadata change (byte layout identical to
    :func:`pack4`: element 0 of each byte = low nibble = even column).
    The s4->bf16 convert then fuses into the consuming matmul's operand
    stream exactly like the int8 path, keeping decode HBM traffic at
    0.5 byte/param.  The arithmetic unpack (:func:`unpack4`) is NOT used
    on the compute path: its mask/shift/stack chain cannot fuse into a
    dot operand, so XLA rematerialised full-width weight transients every
    decode step (measured d32 Llama-3-8B: 8.6 tok/s vs int8's 79.7)."""
    if is_packed4(w):
        out2 = w.codes.shape[-1]
        nib = jax.lax.bitcast_convert_type(w.codes, jnp.int4)
        s = pack_span(out2)
        if s == 1:
            return nib.reshape(*w.codes.shape[:-1], out2 * 2)
        # span-planar: bitcast yields (lo, hi) ADJACENT per byte; natural
        # column order needs the per-span de-interleave [.., ns, S, 2] ->
        # [.., ns, 2, S].  This runs on the PREFILL path only (one
        # relayout per matmul, amortised over the whole prompt); decode
        # reads the packed bytes in-kernel.
        lead = w.codes.shape[:-1]
        nib = nib.reshape(*lead, out2 // s, s, 2)
        nib = jnp.swapaxes(nib, -1, -2)
        return nib.reshape(*lead, out2 * 2)
    return w.codes


def dq_codes(w: QuantW, dtype) -> jax.Array:
    """The integer codes at their LOGICAL shape, cast to the compute
    dtype (int4 nibbles become a fusable s4->dtype convert; see
    :func:`_logical_codes`)."""
    return _logical_codes(w).astype(dtype)


def _quantize_leaf(w: jax.Array, nbits: int = 8,
                   group_size: Optional[int] = None) -> QuantW:
    if nbits not in (8, 4):
        raise ValueError(f"weight nbits must be 4 or 8, got {nbits}")
    qmax = 127.0 if nbits == 8 else 7.0
    wf = w.astype(jnp.float32)
    in_dim = wf.shape[-2]
    if group_size and in_dim % group_size == 0 and in_dim > group_size:
        g = group_size
        lead = wf.shape[:-2]
        wg = wf.reshape(*lead, in_dim // g, g, wf.shape[-1])
        amax = jnp.max(jnp.abs(wg), axis=-2)          # [..., G, out]
        scale = jnp.maximum(amax, 1e-8) / qmax
        codes = jnp.clip(jnp.round(wg / scale[..., None, :]), -qmax, qmax)
        codes = codes.reshape(wf.shape).astype(jnp.int8)
    else:
        amax = jnp.max(jnp.abs(wf), axis=-2)          # [..., out]
        scale = jnp.maximum(amax, 1e-8) / qmax
        codes = jnp.clip(jnp.round(wf / scale[..., None, :]),
                         -qmax, qmax).astype(jnp.int8)
    if nbits == 4:
        codes = pack4(codes)
    return QuantW(codes=codes, scale=scale)


#: weight leaves that flow through matmuls (norm vectors stay bf16)
_MATMUL_LEAVES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
                  "router")


def quantize_weights(params: dict, nbits: int = 8,
                     group_size: Optional[int] = None,
                     lm_head_nbits: Optional[int] = None,
                     lm_head_pad_to: Optional[int] = None) -> dict:
    """bf16/f32 param pytree -> quantized pytree (same structure, matmul
    leaves replaced by :class:`QuantW`).

    ``group_size`` applies to DENSE stacked layer leaves ([L, in, out]);
    expert-stacked MoE leaves ([L, E, in, out]) always use per-channel
    scales (the expert einsums contract the whole in-dim at once).
    Embedding and lm_head default to int8 (see module docstring);
    ``lm_head_nbits=4`` opts the vocab projection into packed int4 — at
    d32 the fixed per-step cost is ~1.6 ms of which the int8 lm_head read
    is ~0.6 ms, so halving it buys ~3% decode at int4-weight speeds
    (quality-sensitive: the projection feeds the argmax directly).

    ``lm_head_pad_to`` zero-pads the (untied) lm_head's vocab axis up to
    the next multiple before quantizing: Llama-3's 128256 columns factor
    as 128*3*167, capping the streaming-kernel tiles at 384 packed bytes;
    2048 rounds to 129024 = 63*2048 and 4096 to 131072 = 32*4096, both
    power-of-two-tileable.  Pad channels have all-zero codes and the model
    slices logits back to ``spec.vocab_size`` (bit-identical argmax).
    """
    if nbits not in (8, 4):
        raise ValueError(f"weight nbits must be 4 or 8, got {nbits}")
    out = dict(params)
    out["layers"] = {
        k: (_quantize_leaf(
                # router: [L, Dm, E] is tiny and decides expert routing —
                # always int8, never grouped
                v, 8 if k == "router" else nbits,
                group_size if k != "router" and isinstance(v, jax.Array)
                and v.ndim == 3 else None)
            if k in _MATMUL_LEAVES else v)
        for k, v in params["layers"].items()
    }
    # embed: per-row scales serve both the lookup and the (tied) logits
    emb = params["embed"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(emb), axis=-1)
    esc = jnp.maximum(amax, 1e-8) / 127.0
    out["embed"] = QuantW(
        codes=jnp.clip(jnp.round(emb / esc[:, None]), -127, 127).astype(jnp.int8),
        scale=esc,
    )
    if "lm_head" in params:
        lm = params["lm_head"]
        if lm_head_pad_to and lm.shape[-1] % lm_head_pad_to:
            pad = lm_head_pad_to - lm.shape[-1] % lm_head_pad_to
            lm = jnp.pad(lm, ((0, 0), (0, pad)))
        out["lm_head"] = _quantize_leaf(lm, lm_head_nbits or 8)
    return out


#: above this many x rows the grouped path switches from the batched
#: einsum (transient [rows, G, out] f32; exact f32 group partials) to a
#: one-shot dequant matmul (transient [in, out] in the compute dtype);
#: 256 rows x 32 groups x 14336 out x 4 B = 470 MB is the worst case the
#: einsum path will allocate.
_GROUP_EINSUM_MAX_ROWS = 256


def _mm_grouped(x: jax.Array, w: QuantW) -> jax.Array:
    """x @ dequant(w) for group-wise scales; logical codes [in, out],
    scale [G, out]."""
    codes = _logical_codes(w)
    in_dim, out_dim = codes.shape
    n_groups = w.scale.shape[0]
    g = in_dim // n_groups
    xr = x.reshape(*x.shape[:-1], n_groups, g)
    rows = math.prod(x.shape[:-1]) if x.ndim > 1 else 1
    codes_g = codes.reshape(n_groups, g, out_dim)
    # Partials stay in the operand dtype (the CPU backend rejects
    # preferred_element_type=f32 on batched bf16 dots; TPU bf16 dots
    # accumulate in f32 inside the MXU regardless) — only the
    # scale-weighted cross-group reduction is explicit f32.
    if rows <= _GROUP_EINSUM_MAX_ROWS:
        p = jnp.einsum("...Gg,Ggo->...Go", xr, codes_g.astype(x.dtype))
        y = jnp.sum(p.astype(jnp.float32) * w.scale.astype(jnp.float32),
                    axis=-2)
        return y.astype(x.dtype)

    # Prefill-sized x: dequantize ONCE into the compute dtype and do one
    # big matmul.  A fori_loop of per-group accumulations instead sweeps a
    # [rows, out] f32 accumulator per group (read+write) — at 4k rows x
    # 14336 out x 32 groups that is ~15 GB of accumulator traffic per MLP
    # matmul, measured 3.6x on d32 prefill (logs/tpu_r2x: 2006 ms vs
    # per-channel's 556).  The [in, out] dequant transient lives inside
    # the layer scan body (sliced codes), so XLA cannot hoist a
    # persistent copy; in f32 x (CPU tests) the dequant is exact.
    deq = (codes_g.astype(x.dtype)
           * w.scale[:, None, :].astype(x.dtype)).reshape(in_dim, out_dim)
    y = jax.lax.dot_general(
        x.reshape(rows, in_dim), deq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y.astype(x.dtype).reshape(*x.shape[:-1], out_dim)


def expert_mm(z: jax.Array, w, sub: str) -> jax.Array:
    """Expert-stacked einsum with QuantW support: ``einsum(sub, z, w)``
    where ``w`` is ``[E, in, out]`` (or QuantW codes of it with per-
    (expert, out-channel) scales).  The scale broadcast is derived from
    the output subscript — 'e' marks the expert axis, the LAST output
    letter is the out-channel axis."""
    if not isinstance(w, QuantW):
        return jnp.einsum(sub, z, w)
    y = jnp.einsum(sub, z, dq_codes(w, z.dtype))
    out = sub.split("->")[1]
    shape = [1] * len(out)
    shape[out.index("e")] = w.scale.shape[0]
    shape[-1] = w.scale.shape[1]
    return y * w.scale.reshape(shape).astype(y.dtype)


#: Test hook: force the fused int4 matmul kernel (interpret mode) off-TPU.
_FORCE_INT4_KERNEL = [False]

#: Decode-shaped row threshold for the fused kernel; prefill-sized x is
#: compute-bound and stays on the XLA path (one dequant transient
#: amortised over the whole prompt).
#: Row cap for the fused packed-int4 kernel.  Plain decode is 1 row per
#: lane (<= 32); speculative VERIFY forwards are ``lanes * (draft+1)``
#: rows (32 lanes x 9 = 288) and MUST stay on the kernel — the XLA
#: dequant fallback rematerialises full-width weights and measured CB
#: speculative decoding at 156 tok/s vs 418 plain (logs/tpu_r2an).  The
#: kernel is row-generic; beyond 32 rows the out-tile is halved to keep
#: ye/yo f32 output blocks within VMEM (288 x 1024 x 4 B x 2 ~ 2.4 MB).
_INT4_KERNEL_MAX_ROWS = 384

#: (block_in, block_out2) for the fused kernel — module-level so benches
#: can tune; None = kernel defaults (512, 1024).
_INT4_KERNEL_BLOCKS = [None]

#: in-kernel dequant sub-chunk (planar per-channel path only): lets a
#: large block_in keep its nibble temporaries within scoped VMEM.
#: 0 = whole in-block at once.
_INT4_KERNEL_SUBIN = [0]

#: MXU operand dtype override for the fused kernel ("bf16"/"f32"/None =
#: row-count heuristic).  Read at ENGINE trace time and passed as a
#: static kernel arg, so the jit cache keys on it.
_INT4_KERNEL_OP = [None]

#: Manual-DMA variant (kernels/int4_matmul.py::int4_matmul_dma): the
#: in-dim loop double-buffers explicit [win, bo] window copies inside the
#: kernel instead of Pallas's whole-block pipeline.  [flag, win].  Trace-
#: time, like the other knobs.  Per-channel single-device path only.
_INT4_KERNEL_DMA = [False, 512]


#: Test hook: route multi-device traces through the custom_partitioning
#: kernel wrapper even off-TPU (CPU-mesh TP tests set this together with
#: ``_FORCE_INT4_KERNEL``).
_FORCE_INT4_KERNEL_SHARDED = [False]


def _int4_kernel_mm(x: jax.Array, w: QuantW):
    """Fused packed-int4 matmul for decode-shaped x, or None to fall back.

    XLA cannot stream sub-byte operands into the MXU (both arithmetic
    unpack and a jnp.int4 bitcast materialise full-width transients per
    step — BASELINE.md round-2v), so bandwidth-bound decode routes packed
    leaves through ``kernels/int4_matmul`` (0.5 byte/param HBM traffic).
    Inside a decode layer-scan the codes arrive as a :class:`LayerView`
    over the stacked ``[L, in, out//2]`` buffer and the layer index rides
    the kernel's scalar prefetch (no per-layer slice copy).

    pallas_call is opaque to GSPMD, so multi-device traces go through the
    ``custom_partitioning`` wrapper (`kernels/int4_matmul.py::
    int4_matmul_sharded`) which runs the kernel per shard on the megatron
    column/row layouts — stacked (LayerView) codes only; 2-D packed
    leaves in a multi-device process keep the XLA bitcast path.
    """
    codes, layer = w.codes, None
    if isinstance(codes, LayerView):
        if codes.stack.ndim != 3:
            return None
        codes, layer = codes.stack, codes.idx
    elif codes.ndim != 2:
        return None
    rows = math.prod(x.shape[:-1]) if x.ndim > 1 else 1
    if rows > _INT4_KERNEL_MAX_ROWS:
        return None
    interpret = _FORCE_INT4_KERNEL[0]
    if not interpret and jax.default_backend() != "tpu":
        return None
    multi = _FORCE_INT4_KERNEL_SHARDED[0] or (
        not interpret and len(jax.devices()) != 1)
    if multi and layer is None:
        return None
    from ..kernels.int4_matmul import (
        DEFAULT_BLOCK_IN,
        int4_matmul,
        int4_matmul_sharded,
    )

    kw = {}
    if _INT4_KERNEL_BLOCKS[0] is not None:
        kw = dict(zip(("block_in", "block_out2"), _INT4_KERNEL_BLOCKS[0]))
    if _INT4_KERNEL_SUBIN[0]:
        kw["sub_in"] = _INT4_KERNEL_SUBIN[0]
    if _INT4_KERNEL_OP[0]:
        kw["op"] = _INT4_KERNEL_OP[0]
    if rows > 32:
        # verify-sized row blocks: halve the out tile so the two f32
        # output accumulators stay comfortably inside VMEM
        from ..kernels.int4_matmul import DEFAULT_BLOCK_OUT2

        kw["block_out2"] = min(kw.get("block_out2", DEFAULT_BLOCK_OUT2),
                               1024)
    bin_eff = kw.get("block_in", DEFAULT_BLOCK_IN)
    in_dim = x.shape[-1]
    gs = 0
    if w.scale.ndim == 2:                         # grouped [G, out]
        gs = in_dim // w.scale.shape[0]
        if gs <= 0 or in_dim % gs or (min(bin_eff, in_dim) % gs):
            return None
    if multi:
        y = int4_matmul_sharded(x.reshape(rows, in_dim), codes, w.scale,
                                layer=layer, group_size=gs,
                                interpret=interpret,
                                **{k: v for k, v in kw.items()
                                   if k not in ("sub_in", "op")})
    elif gs:
        y = int4_matmul(x.reshape(rows, in_dim), codes, w.scale,
                        layer=layer, group_size=gs, interpret=interpret,
                        **kw)
    elif _INT4_KERNEL_DMA[0] and codes.shape[-1] % 128 == 0:
        from ..kernels.int4_matmul import int4_matmul_dma

        y = int4_matmul_dma(
            x.reshape(rows, in_dim), codes, w.scale, layer=layer,
            win=_INT4_KERNEL_DMA[1], interpret=interpret,
            **{k: v for k, v in kw.items()
               if k in ("block_out2", "op")})
    else:
        y = int4_matmul(x.reshape(rows, in_dim), codes, w.scale,
                        layer=layer, interpret=interpret, **kw)
    return y.reshape(*x.shape[:-1], y.shape[-1])


#: Test hook: force the int8 streaming matmul kernel (interpret) off-TPU.
_FORCE_INT8_KERNEL = [False]

#: Opt-out: PKV_INT8_MM_KERNEL=0 reverts the lm_head to the XLA path.
import os as _os

_USE_INT8_KERNEL = [_os.environ.get("PKV_INT8_MM_KERNEL", "1") == "1"]


def _int8_kernel_mm(x: jax.Array, w: QuantW):
    """Streaming int8 matmul for decode-shaped x (the lm_head read), or
    None to fall back to XLA.

    XLA lowers the 1-row s8 [4096, 128256] lm_head product to a VPU
    multiply-reduce at ~56% of HBM bandwidth (1.149 ms/step measured,
    logs/r3a_trace) — ~12% of the whole d32 int4 decode step.  The Pallas
    grid (`kernels/int4_matmul.py::int8_matmul`) streams the byte tiles
    like the int4 kernel.  2-D per-channel leaves only (the lm_head /
    tied-embed case); stacked per-layer int8 weights keep the XLA
    operand-fusion path."""
    if not _USE_INT8_KERNEL[0]:
        return None
    codes, layer = w.codes, None
    if isinstance(codes, LayerView):
        if codes.stack.ndim != 3 or is_packed4(w):
            return None
        codes, layer = codes.stack, codes.idx
    elif not isinstance(codes, jax.Array) or codes.ndim != 2 \
            or is_packed4(w):
        return None
    if w.scale.ndim != 1:
        return None
    rows = math.prod(x.shape[:-1]) if x.ndim > 1 else 1
    if rows > 8:
        return None
    interpret = _FORCE_INT8_KERNEL[0]
    if not interpret and (jax.default_backend() != "tpu"
                          or len(jax.devices()) != 1):
        return None
    from ..kernels.int4_matmul import int8_matmul, int8_tiles

    in_dim = x.shape[-1]
    bi, bo = int8_tiles(in_dim, codes.shape[-1])
    if not bi:
        return None
    y = int8_matmul(x.reshape(rows, in_dim), codes, w.scale, layer=layer,
                    interpret=interpret)
    return y.reshape(*x.shape[:-1], y.shape[-1])


def _fusable(*ws) -> bool:
    """True when every leaf is a stacked packed-int4 QuantW with matching
    stack/in dims and scale layout, and none is partitioned over >1
    device (concatenating sharded leaves would gather across the mesh)."""
    if not all(isinstance(w, QuantW) and is_packed4(w)
               and w.codes.ndim == 3 for w in ws):
        return False
    w0 = ws[0]
    if not all(w.codes.shape[:2] == w0.codes.shape[:2]
               and w.scale.ndim == w0.scale.ndim for w in ws):
        return False
    if w0.scale.ndim == 3 and not all(
            w.scale.shape[1] == w0.scale.shape[1] for w in ws):
        return False
    for w in ws:
        for a in (w.codes, w.scale):
            sh = getattr(a, "sharding", None)
            if sh is not None and not sh.is_fully_replicated:
                return False
    return True


def fuse_packed_matmuls(params: dict) -> dict:
    """Concatenate ``wq/wk/wv -> wqkv`` and ``w_gate/w_up -> w_gateup``
    along the OUT axis for stacked packed-int4 leaves.

    The fused decode kernel launches one pallas_call per matmul; at d32
    that is 7 x 32 = 224 launches per decode step, and launch overhead is
    a large slice of the step (91 tok/s measured vs ~140 at int8's
    effective HBM bandwidth — logs/tpu_r2x).  QKV share the same input x,
    as do gate/up, so fusing them cuts launches to 4/layer with
    bit-identical math (pack4 is out-axis-major: packed bytes and scales
    concatenate cleanly; every leaf has even out).  `models/llama.py`
    consumes the fused names when present and splits the outputs
    statically.

    EXPLICIT opt-in (the CLI runners apply it after ``--quant_weights
    int4``): fusing inside Engine would duplicate the weight HBM while
    the caller still holds the unfused tree.  No-op unless a fusion
    group is eligible (see :func:`_fusable`); MoE expert leaves
    (4-D codes) and sharded trees are left alone — `parallel/mesh.py`
    sharding specs target the UNFUSED names.
    """
    lay = params.get("layers")
    if not isinstance(lay, dict):
        return params

    def spans_ok(names):
        # concat preserves the span-planar layout only when every
        # constituent uses the SAME span as the fused width will derive
        # (all real weights: 128; odd tiny widths decline fusion)
        ws = [lay[n] for n in names]
        fused_out2 = sum(w.codes.shape[-1] for w in ws)
        return all(pack_span(w.codes.shape[-1]) == pack_span(fused_out2)
                   for w in ws)

    def cat(names):
        ws = [lay[n] for n in names]
        return QuantW(
            codes=jnp.concatenate([w.codes for w in ws], axis=-1),
            scale=jnp.concatenate([w.scale for w in ws], axis=-1),
        )

    lay = dict(lay)
    changed = False
    if all(n in lay for n in ("wq", "wk", "wv")) and _fusable(
            lay["wq"], lay["wk"], lay["wv"]) and spans_ok(
            ("wq", "wk", "wv")):
        lay["wqkv"] = cat(("wq", "wk", "wv"))
        del lay["wq"], lay["wk"], lay["wv"]
        changed = True
    if all(n in lay for n in ("w_gate", "w_up")) and _fusable(
            lay["w_gate"], lay["w_up"]) and spans_ok(("w_gate", "w_up")):
        lay["w_gateup"] = cat(("w_gate", "w_up"))
        del lay["w_gate"], lay["w_up"]
        changed = True
    if not changed:
        return params
    out = dict(params)
    out["layers"] = lay
    return out


def mm(x: jax.Array, w) -> jax.Array:
    """x @ w for plain or quantized weights (dequant factored out)."""
    if isinstance(w, QuantW):
        if is_packed4(w):
            y = _int4_kernel_mm(x, w)
            if y is not None:
                return y
        else:
            y = _int8_kernel_mm(x, w)
            if y is not None:
                return y
        if isinstance(w.codes, LayerView):        # kernel declined: slice
            w = QuantW(codes=w.codes.materialize(), scale=w.scale)
        if w.scale.ndim == w.codes.ndim:          # group-wise scales
            return _mm_grouped(x, w)
        y = x @ dq_codes(w, x.dtype)
        return y * w.scale[..., None, :].astype(y.dtype) if w.scale.ndim > 1 \
            else y * w.scale.astype(y.dtype)
    return x @ w


def embed_lookup(embed, tokens: jax.Array, dtype) -> jax.Array:
    if isinstance(embed, QuantW):
        rows = jnp.take(embed.codes, tokens, axis=0).astype(dtype)
        sc = jnp.take(embed.scale, tokens, axis=0).astype(dtype)
        return rows * sc[..., None]
    return jnp.take(embed, tokens, axis=0)


def weight_dtype(params: dict):
    """The activation dtype to use (embed codes are int8 when quantized)."""
    emb = params["embed"]
    if isinstance(emb, QuantW):
        return jnp.bfloat16
    return emb.dtype
