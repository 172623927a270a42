"""Fused dequant+matmul Pallas TPU kernel — the hot op of the quantized
serving path (BASELINE.md: "every dequant+matmul kernel at speed-of-light
per chip").

Computes x[B, K] @ dequant(W)[K, N] where W is INT8 [K, N] or packed INT4
[K//2, N] with group-wise scales [G, N] (tpuserve.quant.core conventions).

Design for the v5e memory system (numbers measured on chip):
- Decode (small B) is HBM-bandwidth bound on W. Raw pallas streaming runs
  at ~736 GB/s; the pipeline double-buffers W blocks HBM->VMEM while the
  VPU converts int->bf16 and the MXU accumulates into an f32 VMEM scratch
  that stays resident across each output block's K walk.
- Grid is (N/bn, K/bk) with K minor; output written once at the last step.
- Scales are passed as [G, 1, N] so each K step's rows arrive via a legal
  BlockSpec `(gpb, 1, bn)` and the kernel indexes them STATICALLY.
  (Slicing a full VMEM scale array at a runtime offset measured 16 GB/s —
  ~30x slower — dynamic sublane slices lower to scalar copies.)
- One wide MXU dot per scale group (two for the int4 halves): many narrow
  dots per step proved MXU-issue-bound; a [bk, 4096]-wide dot does not.
- INT4 uses the split-half-per-group packing (quant.core): each group's
  packed block unpacks into two contiguous halves matmul'd against the
  matching halves of x. The nibble offset is applied via int32->bf16
  (uint8->bf16 casts and int8 vector subs do not legalize in Mosaic).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuserve.quant.core import QTensor


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, bits, gs, gpb, block_n,
            out_dtype, act_int8=False):
    """One (n-tile, k-block) step.

    x_ref [B, bk]; w_ref int8 [bk, bn] or packed uint8 [bk/2, bn];
    s_ref [max(gpb,1), 1, bn] — this K block's scale rows.
    gpb = whole scale groups per K block, or 0 when a big group is split
    across blocks (int8 only; the single scale row is shared).

    act_int8 (int4 weights only): x_ref carries per-row-quantized int8
    activations; the nibble halves stay int8 and the dots run on the
    native int8 MXU with int32 accumulation — no bf16 materialization of
    the weight operand (the r5 element-throughput wall, kernel_rates.py).
    The caller multiplies the per-row activation scale into the output.
    """
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if gpb == 0:
        w = w_ref[:].astype(jnp.bfloat16)
        partial = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
        acc_ref[:] += partial * s_ref[0, 0, :].astype(jnp.float32)[None, :]
    elif act_int8:
        for g in range(gpb):  # static unroll
            scale = s_ref[g, 0, :].astype(jnp.float32)[None, :]
            half = gs // 2
            packed = w_ref[g * half : (g + 1) * half, :].astype(jnp.int32)
            lo = (packed & 0x0F).astype(jnp.int8)   # biased [0, 15]
            hi = (packed >> 4).astype(jnp.int8)
            x0 = x_ref[:, g * gs : g * gs + half]
            x1 = x_ref[:, g * gs + half : (g + 1) * gs]
            acc32 = jax.lax.dot_general(
                x0, lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc32 += jax.lax.dot_general(
                x1, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            rsum = jnp.sum(
                x_ref[:, g * gs : (g + 1) * gs].astype(jnp.int32),
                axis=1, keepdims=True)
            acc_ref[:] += (acc32 - 8 * rsum).astype(jnp.float32) * scale
    else:
        for g in range(gpb):  # static unroll (gpb == 1 for gs >= 128)
            scale = s_ref[g, 0, :].astype(jnp.float32)[None, :]
            if bits == 8:
                w = w_ref[g * gs : (g + 1) * gs, :].astype(jnp.bfloat16)
                partial = jnp.dot(
                    x_ref[:, g * gs : (g + 1) * gs], w, preferred_element_type=jnp.float32
                )
            else:
                # biased-nibble unpack: keep the raw [0, 15] codes and fold
                # the -8 offset algebraically — sum_k x_k (c_k - 8) =
                # x.c - 8*rowsum(x). Two fewer VPU passes per byte over the
                # whole weight stream than subtracting on the [half, bn]
                # tiles (r5: the int4 path is VPU-dequant-bound at ~0.6e12
                # elem/s while int8 streams at ~645 GB/s — kernel_rates.py)
                half = gs // 2
                packed = w_ref[g * half : (g + 1) * half, :].astype(jnp.int32)
                lo = (packed & 0x0F).astype(jnp.bfloat16)
                hi = (packed >> 4).astype(jnp.bfloat16)
                x0 = x_ref[:, g * gs : g * gs + half]
                x1 = x_ref[:, g * gs + half : (g + 1) * gs]
                partial = jnp.dot(x0, lo, preferred_element_type=jnp.float32)
                partial += jnp.dot(x1, hi, preferred_element_type=jnp.float32)
                partial -= 8.0 * jnp.sum(
                    x_ref[:, g * gs : (g + 1) * gs].astype(jnp.float32),
                    axis=1, keepdims=True)
            acc_ref[:] += partial * scale

    @pl.when(kj == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "k", "n", "block_n", "block_k",
                     "interpret", "out_dtype_name", "act_int8"),
)
def _quant_matmul_impl(
    x, q, scale, *, bits, group_size, k, n, block_n, block_k, interpret,
    out_dtype_name, act_int8=False
):
    out_dtype = jnp.dtype(out_dtype_name)
    b = x.shape[0]
    gs = group_size if group_size > 0 else k
    if block_k >= gs:
        gpb, spg = block_k // gs, 1
    else:
        gpb, spg = 0, gs // block_k  # big group split across K steps (int8)
    grid = (n // block_n, k // block_k)
    w_rows = block_k // 2 if bits == 4 else block_k
    scale3 = scale[:, None, :]  # [G, 1, N] -> legal (?, 1, bn) blocks

    s_rows = max(gpb, 1)
    if gpb == 0:
        s_index = lambda i, j, spg=spg: (j // spg, 0, i)
    else:
        s_index = lambda i, j: (j, 0, i)

    return pl.pallas_call(
        functools.partial(
            _kernel, bits=bits, gs=gs, gpb=gpb, block_n=block_n,
            out_dtype=out_dtype, act_int8=act_int8
        ),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, block_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rows, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_rows, 1, block_n), s_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        # NOTE: no cost_estimate — measured 511 GB/s with one vs 841 GB/s
        # without (v5e, 4k x 4k int8); the estimate pessimizes scheduling.
        interpret=interpret,
    )(x, q, scale3)


def _pick_blocks(k: int, n: int, gs: int, bits: int, b: int) -> tuple:
    """Choose (block_n, block_k).

    Measured on v5e: bk=512, bn=4096 streams int8 weights at ~470 GB/s
    (vs 736 GB/s raw streaming); narrow n-tiles or many narrow dots per
    step collapse to latency-bound. So: one (or few) wide dots per step,
    W block ~1-2 MB, everything double-buffered within ~6 MB of VMEM.
    """
    if gs >= 128:
        block_k = gs
        if bits == 8:
            while block_k > 512 and block_k % 2 == 0 and k % block_k == 0:
                block_k //= 2  # split big groups so blocks stay ~VMEM-sized
            if block_k != gs and gs % block_k != 0:
                block_k = gs
        else:
            # int4: several whole groups per K block (static gpb unroll).
            # [gs/2, bn] packed blocks are sub-MB; 4 groups per block
            # measured +13% on the r5 slope instrument (kernel_rates.py:
            # 274->312 GB/s bf16-dot path, 317->358 W4A8)
            while block_k < 4 * gs and k % (block_k * 2) == 0 \
                    and (block_k * 2) % gs == 0:
                block_k *= 2
    else:
        block_k = gs
        while block_k < 128 and (block_k * 2) <= k and k % (block_k * 2) == 0:
            block_k *= 2
    if k % block_k != 0:
        block_k = gs

    # widest n-block that keeps double-buffered w + acc comfortably in VMEM
    w_rows = block_k // 2 if bits == 4 else block_k
    block_n = 128
    while (
        block_n < 8192
        and block_n < n
        and (2 * block_n) * w_rows * 2 + b * (2 * block_n) * 4 < 6 * 1024 * 1024
    ):
        block_n *= 2
    # large-batch (whole-sequence eval/prefill) f32 paths: the scoped-vmem
    # stack holds the acc scratch plus double-buffered out blocks, all
    # b x bn x 4 bytes — cap bn so that stays ~12 MB of the 16 MB limit
    # (b=256 f32 measured 17.4 MB > 16 MB at bn=4096). Serving decode
    # (b<=128) is unaffected.
    while block_n > 128 and 3 * b * block_n * 4 >= 10 * 1024 * 1024:
        block_n //= 2
    return block_n, block_k


def quant_matmul(
    x: jax.Array,
    qt: QTensor,
    *,
    block_n: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
    out_dtype=None,
) -> jax.Array:
    """x [.., K] @ dequant(qt) [K, N] via the fused kernel.

    Pads the batch dim to the dtype's sublane tile and N to block_n, then
    slices back; leading dims are flattened into the batch.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    k, n = qt.orig_shape
    lead = x.shape[:-1]
    if x.shape[-1] != k:
        raise ValueError(f"x last dim {x.shape[-1]} != K {k}")
    x2 = x.reshape(-1, k)
    b = x2.shape[0]
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else x.dtype
    gs = qt.group_size if qt.group_size > 0 else k
    if qt.bits == 4 and gs % 2 != 0:
        raise ValueError("int4 requires even group size")

    # W4A8: quantize activations per row and keep BOTH dot operands int8
    # (native int8 MXU, no bf16 weight materialization — the r5 element
    # wall); the row scale factorizes out of the whole K contraction and
    # multiplies the output below.
    act_int8 = qt.bits == 4 and qt.act_bits == 8
    sx = None
    if act_int8:
        from tpuserve.quant.core import quantize_activation

        x2, sx = quantize_activation(x2)

    # batch tile: int8 x wants 32 sublanes, bf16 16, f32 8
    min_b = 32 if act_int8 else (16 if x.dtype == jnp.bfloat16 else 8)
    b_pad = _round_up(max(b, min_b), min_b)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))

    auto_bn, auto_bk = _pick_blocks(k, n, gs, qt.bits, b_pad)
    bn = block_n or auto_bn
    bn = min(bn, _round_up(n, 128))
    bk = block_k or auto_bk
    sub_group_ok = qt.bits == 8 and gs % bk == 0  # big group split across steps
    if k % bk != 0 or not (bk % gs == 0 or sub_group_ok):
        raise ValueError(f"cannot block K={k} with block_k={bk}, group_size={gs}")

    n_pad = _round_up(n, bn)
    q = qt.q
    scale = qt.scale
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n)))
        scale = jnp.pad(scale, ((0, 0), (0, n_pad - n)))

    out = _quant_matmul_impl(
        x2,
        q,
        scale,
        bits=qt.bits,
        group_size=qt.group_size,
        k=k,
        n=n_pad,
        block_n=bn,
        block_k=bk,
        interpret=bool(interpret),
        out_dtype_name="float32" if act_int8 else str(out_dtype),
        act_int8=act_int8,
    )
    out = out[:b, :n]
    if act_int8:
        out = (out * sx).astype(out_dtype)
    return out.reshape(*lead, n)
