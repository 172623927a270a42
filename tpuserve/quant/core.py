"""Weight-only quantization: symmetric INT8 and packed INT4 with group-wise
scales.

No reference counterpart — the reference serves FP32 ONNX graphs. This is
the north-star quantization tier (BASELINE.md): INT8/INT4 weights with
per-(group, out-channel) scales, dequantized inside the matmul.

Representation (TPU-first):
- INT8: values stored as int8 [K, N]; scales bf16-safe f32 [K/gs, N].
- INT4: two nibbles packed per uint8 along K -> [K//2, N]; halves HBM
  traffic, which is the decode-bound resource. Nibble layout is
  **split-half per group** (kernel-friendly): within each scale group of
  gs rows, packed row r holds element r in the low nibble and element
  r + gs/2 in the high nibble (offset-8 encoding, values in [-8, 7]).
  This lets the Pallas kernel unpack a block into two contiguous
  [gs/2, N] sub-blocks and run two MXU matmuls against the matching
  halves of x — no sublane interleave needed.

`qmatmul` routes to the fused dequant+matmul Pallas kernel on TPU
(tpuserve.ops.quant_matmul) and to an XLA fallback elsewhere; both share
this module's packing convention.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A quantized 2-D weight [K, N] (contraction dim first).

    `act_bits` = 8 requests dynamic per-token INT8 activation quantization
    at matmul time (W8A8 on the native int8 MXU); 0 = bf16 activations.
    """

    q: jax.Array  # int8 [K, N] or uint8 [K//2, N] (packed int4)
    scale: jax.Array  # f32 [num_groups, N]
    bits: int
    group_size: int  # along K; 0 means one group (per-channel only)
    orig_shape: Tuple[int, int]
    act_bits: int = 0
    # FP8 (e4m3) activation rounding at matmul time. v5e has no fp8 MXU, so
    # this is a precision contract, not a speed path: activations round
    # through float8_e4m3fn and the matmul runs in bf16 — composable with
    # INT4 grouped weights (unlike act_bits=8, which demands per-channel
    # scales). BASELINE.md north star names fp8 activations explicitly.
    act_fp8: bool = False

    def tree_flatten(self):
        return (self.q, self.scale), (
            self.bits, self.group_size, self.orig_shape, self.act_bits, self.act_fp8
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        bits, group_size, orig_shape, act_bits, act_fp8 = aux
        return cls(q=q, scale=scale, bits=bits, group_size=group_size,
                   orig_shape=orig_shape, act_bits=act_bits, act_fp8=act_fp8)

    @property
    def nbytes(self) -> int:
        return self.q.size * self.q.dtype.itemsize + self.scale.size * self.scale.dtype.itemsize


def _group_count(k: int, group_size: int) -> int:
    if group_size <= 0 or group_size >= k:
        return 1
    if k % group_size != 0:
        raise ValueError(f"contraction dim {k} not divisible by group_size {group_size}")
    return k // group_size


def quantize(w, bits: int = 8, group_size: int = 128,
             clip_search: Optional[bool] = None) -> QTensor:
    """Symmetric weight quantization of a [K, N] matrix with per-(group,
    column) scales.

    clip_search (default: on for int4, off for int8): absmax scaling is
    MSE-suboptimal for bell-shaped weight groups — one outlier stretches
    the step size for the whole group. Grid-search a per-(group, column)
    clip ratio minimizing weight reconstruction MSE (AWQ-style clipping
    without activation calibration). Measured on random-init llama_1b:
    int4-g128 KL(fp32||quant) improves ~25% vs plain RTN; int8 gains are
    negligible (quantization noise already tiny), so it defaults off there
    to keep load time minimal.
    """
    w = jnp.asarray(w, jnp.float32)
    if w.ndim != 2:
        raise ValueError(f"quantize expects a 2-D weight, got shape {w.shape}")
    k, n = w.shape
    groups = _group_count(k, group_size)
    gs = k // groups
    wg = w.reshape(groups, gs, n)
    qmax = {8: 127.0, 4: 7.0}[bits]
    absmax = jnp.max(jnp.abs(wg), axis=1, keepdims=True)  # [groups, 1, n]
    if clip_search is None:
        clip_search = bits <= 4
    if clip_search:
        cands = (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7)
        errs = []
        for a in cands:
            s = jnp.maximum(absmax * a / qmax, 1e-8)
            qv = jnp.clip(jnp.round(wg / s), -qmax - 1, qmax)
            errs.append(jnp.sum((qv * s - wg) ** 2, axis=1, keepdims=True))
        best = jnp.argmin(jnp.stack(errs), axis=0)          # [groups, 1, n]
        alpha = jnp.asarray(cands, jnp.float32)[best]
        scale = jnp.maximum(absmax * alpha / qmax, 1e-8)
    else:
        scale = jnp.maximum(absmax / qmax, 1e-8)
    q = jnp.clip(jnp.round(wg / scale), -qmax - 1, qmax).astype(jnp.int8)
    q = q.reshape(k, n)
    scale = scale.reshape(groups, n)
    if bits == 4:
        q = pack_int4(q, gs)
    return QTensor(q=q, scale=scale, bits=bits, group_size=gs if groups > 1 else 0, orig_shape=(k, n))


def pack_int4(q: jax.Array, gs: int) -> jax.Array:
    """int8 codes [K, N] in [-8, 7] -> packed uint8 [K//2, N], split-half
    per group (inverse of `unpack_int4`). `gs` is the unpacked group size
    along K (or K itself for one group)."""
    k, n = q.shape
    if gs % 2 != 0:
        raise ValueError("INT4 packing requires an even group size")
    groups = k // gs
    un = (jnp.asarray(q).astype(jnp.int32) + 8).astype(jnp.uint8)  # offset-8 -> [0, 15]
    ug = un.reshape(groups, gs, n)
    lo = ug[:, : gs // 2, :]
    hi = ug[:, gs // 2 :, :]
    return (lo | (hi << 4)).reshape(k // 2, n).astype(jnp.uint8)  # [K//2, N]


def unpack_int4(packed: jax.Array, group_size: int = 0) -> jax.Array:
    """uint8 [K//2, N] -> int8 [K, N] (inverse of the split-half-per-group
    pack in `quantize`). `group_size` is rows of the *unpacked* group; 0
    means a single group spanning all of K."""
    k2, n = packed.shape
    k = 2 * k2
    gs = group_size if group_size > 0 else k
    groups = k // gs
    lo = (packed & 0x0F).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    lo = lo.reshape(groups, gs // 2, n)
    hi = hi.reshape(groups, gs // 2, n)
    return jnp.concatenate([lo, hi], axis=1).reshape(k, n)


def dequantize(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    k, n = qt.orig_shape
    q = unpack_int4(qt.q, qt.group_size) if qt.bits == 4 else qt.q
    groups = qt.scale.shape[0]
    gs = k // groups
    deq = q.reshape(groups, gs, n).astype(jnp.float32) * qt.scale[:, None, :]
    return deq.reshape(k, n).astype(dtype)


def quantize_activation(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Dynamic per-token symmetric INT8: x [.., K] -> (int8 values,
    f32 scales [.., 1])."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _w8a8_matmul(x: jax.Array, qt: QTensor) -> jax.Array:
    """Dynamic-INT8 activations x INT8 weights on the native int8 MXU
    (int32 accumulation), scales applied on the f32 output. Requires
    per-channel weight scales (group_size 0) so the scale factorizes as
    sx[token] * sw[col]."""
    if qt.bits != 8 or qt.group_size != 0:
        raise ValueError(
            "int8 activations require int8 weights with per-channel scales (group_size=0)"
        )
    xq, sx = quantize_activation(x)
    acc = jax.lax.dot_general(
        xq, qt.q, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )  # [.., N] int32
    out = acc.astype(jnp.float32) * sx * qt.scale[0][None, :].astype(jnp.float32)
    return out.astype(x.dtype)


def _w4a8_matmul_ref(x: jax.Array, qt: QTensor) -> jax.Array:
    """XLA reference for INT4 weights x dynamic-INT8 activations (the
    fused kernel's W4A8 path, ops/quant_matmul.py): per-group int32
    contraction so the (group, column) weight scales apply exactly."""
    k, n = qt.orig_shape
    lead = x.shape[:-1]
    xq, sx = quantize_activation(x.reshape(-1, k))
    w = unpack_int4(qt.q, qt.group_size)            # int8 codes [K, N]
    groups = qt.scale.shape[0]
    gs = k // groups
    xg = xq.reshape(-1, groups, gs).astype(jnp.int32)
    wg = w.reshape(groups, gs, n).astype(jnp.int32)
    acc = jnp.einsum("tgk,gkn->tgn", xg, wg)        # int32
    out = jnp.sum(acc.astype(jnp.float32) * qt.scale[None, :, :], axis=1)
    out = out * sx
    return out.astype(x.dtype).reshape(*lead, n)


def fp8_round(x: jax.Array) -> jax.Array:
    """Round activations through float8 e4m3 (dynamic per-token scale into
    the e4m3 range, round, rescale). Precision emulation on v5e (no fp8
    MXU) — the returned array is bf16 carrying fp8-resolution values."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 448.0  # e4m3 max normal
    x8 = (x.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return (x8.astype(jnp.float32) * scale).astype(jnp.bfloat16)


def qmatmul(x: jax.Array, qt: QTensor, *, use_pallas: Optional[bool] = None) -> jax.Array:
    """x [.., K] @ dequant(qt) [K, N] -> [.., N].

    act_bits == 8 takes the W8A8 path (dynamic per-token activation
    quantization, int8 MXU); act_fp8 rounds activations through e4m3
    first (precision contract; bf16 compute). Otherwise weight-only: on
    TPU the fused dequant+matmul Pallas kernel (tpuserve/ops/
    quant_matmul.py); elsewhere (CPU tests) dequantize through XLA, which
    fuses the scale multiply into the matmul epilogue.
    """
    if use_pallas is None:
        import os

        use_pallas = (
            jax.devices()[0].platform == "tpu"
            and os.environ.get("TPUSERVE_QMATMUL", "pallas").lower() != "xla"
        )
    if qt.act_bits == 8:
        if qt.bits == 8:
            return _w8a8_matmul(x, qt)
        # W4A8: int8 MXU dots against the biased nibbles inside the fused
        # kernel (r5); XLA reference elsewhere (CPU tests)
        if use_pallas:
            from tpuserve.ops.quant_matmul import quant_matmul

            return quant_matmul(x, qt)
        return _w4a8_matmul_ref(x, qt)
    if qt.act_fp8:
        x = fp8_round(x)
    if use_pallas:
        from tpuserve.ops.quant_matmul import quant_matmul

        return quant_matmul(x, qt)
    w = dequantize(qt, dtype=jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)


# ------------------------------------------------------------------ experts
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QExperts:
    """A stack of E quantized expert weights [E, K, N] (MoE layers).

    Stored stacked so the expert (E) dim is a real array dim — expert
    parallelism shards it over a mesh axis with NamedSharding/shard_map
    (per-expert dict leaves could not be placed on disjoint devices by the
    single-controller partitioner). `expert(e)` slices one expert out as an
    ordinary QTensor (an XLA slice — free inside jit), so every 2-D path
    (fused Pallas kernel, W8A8, fp8 rounding) applies per expert unchanged.
    """

    q: jax.Array        # int8 [E, K, N] or uint8 [E, K//2, N] (packed int4)
    scale: jax.Array    # f32 [E, groups, N]
    bits: int
    group_size: int
    orig_shape: Tuple[int, int, int]  # (E, K, N)
    act_bits: int = 0
    act_fp8: bool = False

    def tree_flatten(self):
        return (self.q, self.scale), (
            self.bits, self.group_size, self.orig_shape, self.act_bits, self.act_fp8
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        bits, group_size, orig_shape, act_bits, act_fp8 = aux
        return cls(q=q, scale=scale, bits=bits, group_size=group_size,
                   orig_shape=orig_shape, act_bits=act_bits, act_fp8=act_fp8)

    @property
    def n_experts(self) -> int:
        return self.orig_shape[0]

    @property
    def nbytes(self) -> int:
        return self.q.size * self.q.dtype.itemsize + self.scale.size * self.scale.dtype.itemsize

    def expert(self, e: int) -> QTensor:
        return QTensor(q=self.q[e], scale=self.scale[e], bits=self.bits,
                       group_size=self.group_size,
                       orig_shape=self.orig_shape[1:],
                       act_bits=self.act_bits, act_fp8=self.act_fp8)


def quantize_experts(w, bits: int = 8, group_size: int = 128,
                     clip_search: Optional[bool] = None) -> QExperts:
    """Quantize a stacked expert weight [E, K, N]: each expert independently
    (own clip search / scales), results restacked."""
    w = jnp.asarray(w)
    if w.ndim != 3:
        raise ValueError(f"quantize_experts expects [E, K, N], got {w.shape}")
    qts = [quantize(w[e], bits=bits, group_size=group_size,
                    clip_search=clip_search) for e in range(w.shape[0])]
    return QExperts(
        q=jnp.stack([t.q for t in qts]),
        scale=jnp.stack([t.scale for t in qts]),
        bits=bits, group_size=qts[0].group_size,
        orig_shape=(w.shape[0], w.shape[1], w.shape[2]),
    )


# ----------------------------------------------------------------------
def quantize_param_tree(
    params: Dict[str, jax.Array],
    bits: int,
    group_size: int = 128,
    predicate=None,
    act_bits: int = 0,
    act_fp8: bool = False,
) -> Dict[str, object]:
    """Quantize every eligible 2-D weight in a flat param dict.

    `predicate(name, array) -> bool` selects weights; default: 2-D arrays
    whose name ends with 'kernel' or contains a projection-style name, and
    whose dims are quantization-friendly. `act_bits=8` marks every QTensor
    for dynamic INT8 activation quantization (forces per-channel scales);
    `act_fp8` marks e4m3 activation rounding (composes with any weight
    format, including grouped INT4)."""
    if act_bits == 8:
        if bits not in (4, 8):
            raise ValueError("int8 activations require int8 or int4 weights")
        if act_fp8:
            raise ValueError("choose one of int8 or fp8 activations")
        if bits == 8:
            group_size = 0  # W8A8: scale must factorize per column
        # W4A8 keeps grouped weight scales: the fused kernel contracts per
        # group, so (group, column) scales apply exactly (r5)

    def default_pred(name: str, arr) -> bool:
        if arr.ndim == 3:  # stacked MoE experts [E, K, N]
            k = arr.shape[1]
            if group_size > 0 and k % group_size != 0 and k > group_size:
                return False
            if bits == 4 and k % 2 != 0:
                return False
            lname = name.lower()
            return "moe" in lname or "expert" in lname
        if arr.ndim != 2:
            return False
        k = arr.shape[0]
        if group_size > 0 and k % group_size != 0 and k > group_size:
            return False
        if bits == 4 and k % 2 != 0:
            return False
        lname = name.lower()
        return any(t in lname for t in ("kernel", "weight", "w_", "proj", "embed_out"))

    pred = predicate or default_pred
    out: Dict[str, object] = {}
    for name, arr in params.items():
        if arr.ndim == 3 and pred(name, arr):
            # stacked MoE expert weights [E, K, N]
            k = arr.shape[1]
            gs = group_size if (group_size > 0 and k % group_size == 0 and k > group_size) else 0
            qt = quantize_experts(arr, bits=bits, group_size=gs)
            if act_bits or act_fp8:
                qt = dataclasses.replace(qt, act_bits=act_bits, act_fp8=act_fp8)
            out[name] = qt
        elif pred(name, arr):
            gs = group_size if (group_size > 0 and arr.shape[0] % group_size == 0 and arr.shape[0] > group_size) else 0
            qt = quantize(arr, bits=bits, group_size=gs)
            if act_bits or act_fp8:
                qt = dataclasses.replace(qt, act_bits=act_bits, act_fp8=act_fp8)
            out[name] = qt
        else:
            out[name] = jnp.asarray(arr)
    return out
