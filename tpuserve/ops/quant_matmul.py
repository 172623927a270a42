"""Fused dequant+matmul Pallas TPU kernel — the hot op of the quantized
serving path (BASELINE.md: "every dequant+matmul kernel at speed-of-light
per chip").

Computes x[B, K] @ dequant(W)[K, N] where W is INT8 [K, N] or packed INT4
[K//2, N] with group-wise scales [G, N] (tpuserve.quant.core conventions).

Design for the v5e memory system:
- Decode (small B) is HBM-bandwidth bound on W. Blocks are sized so each
  grid step DMAs ~1-2 MB of weights (small blocks leave the pipeline
  latency-bound: measured 15 GB/s with 64 KB steps vs. full bandwidth with
  MB-scale steps). The pallas pipeline double-buffers HBM->VMEM
  automatically; the VPU converts int->bf16 and the MXU accumulates into an
  f32 VMEM scratch that lives across the K walk of each output block.
- Grid is (N/bn, K/bk) with K minor, so each output block stays resident
  and is written exactly once.
- A K block spans several scale groups; the kernel statically unrolls over
  them, scaling each group's partial sum — dequant therefore costs one VPU
  convert per weight element (int8), the minimum for a bf16 MXU.
- INT4 uses the split-half-per-group packing (quant.core): each group's
  packed rows unpack into two contiguous halves that matmul against the
  matching halves of the x block. Nibble offset (-8) is applied in bf16
  (int8 vector sub does not legalize in Mosaic).
- Scales ride along as a full (unblocked) VMEM array — they are ~0.1% of
  W's bytes — and are sliced per group inside the kernel, which keeps
  every BlockSpec tile-legal for any group count.
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


def _kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, bits, gs, gpb, block_n, out_dtype):
    """One (n-tile, k-block) step. w_ref: int8 [bk, bn] or packed uint8
    [bk/2, bn]; s_ref: full scale array [G, N] in VMEM."""
    i = pl.program_id(0)
    kj = pl.program_id(1)

    @pl.when(kj == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for g in range(gpb):  # static unroll over scale groups in this K block
        scale = s_ref[pl.ds(kj * gpb + g, 1), pl.ds(i * block_n, block_n)]  # [1, bn]
        if bits == 8:
            w = w_ref[g * gs : (g + 1) * gs, :].astype(jnp.bfloat16)
            partial = jnp.dot(
                x_ref[:, g * gs : (g + 1) * gs], w, preferred_element_type=jnp.float32
            )
        else:
            half = gs // 2
            packed = w_ref[g * half : (g + 1) * half, :]
            lo = (packed & 0x0F).astype(jnp.bfloat16) - 8.0
            hi = (packed >> 4).astype(jnp.bfloat16) - 8.0
            x0 = x_ref[:, g * gs : g * gs + half]
            x1 = x_ref[:, g * gs + half : (g + 1) * gs]
            partial = jnp.dot(x0, lo, preferred_element_type=jnp.float32)
            partial += jnp.dot(x1, hi, preferred_element_type=jnp.float32)
        acc_ref[:] += partial * scale.astype(jnp.float32)

    @pl.when(kj == pl.num_programs(1) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "k", "n", "block_n", "block_k", "interpret", "out_dtype_name"),
)
def _quant_matmul_impl(
    x, q, scale, *, bits, group_size, k, n, block_n, block_k, interpret, out_dtype_name
):
    out_dtype = jnp.dtype(out_dtype_name)
    b = x.shape[0]
    gs = group_size if group_size > 0 else k
    gpb = block_k // gs
    grid = (n // block_n, k // block_k)
    w_rows = block_k // 2 if bits == 4 else block_k

    return pl.pallas_call(
        functools.partial(
            _kernel, bits=bits, gs=gs, gpb=gpb, block_n=block_n, out_dtype=out_dtype
        ),
        out_shape=jax.ShapeDtypeStruct((b, n), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, block_k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((w_rows, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full scale array [G, N]
        ],
        out_specs=pl.BlockSpec((b, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * k * n,
            bytes_accessed=q.size * q.dtype.itemsize
            + b * k * x.dtype.itemsize
            + b * n * out_dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, q, scale)


def _pick_blocks(k: int, n: int, gs: int, bits: int, b: int) -> tuple:
    """Choose (block_n, block_k) so one weight block is ~1-2 MB (pipeline
    efficiency) while respecting group and VMEM limits."""
    block_n = 512 if n % 512 == 0 else (256 if n % 256 == 0 else 128)
    while block_n > 128 and n % block_n != 0:
        block_n //= 2
    bytes_per_row = block_n * (0.5 if bits == 4 else 1)
    target_rows = int((1.5 * 1024 * 1024) / bytes_per_row)
    block_k = gs
    while (
        block_k * 2 <= k
        and k % (block_k * 2) == 0
        and block_k * 2 <= target_rows
        and block_k * 2 <= 4096
    ):
        block_k *= 2
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
    if bool(qt.bits == 4) and gs % 2 != 0:
        raise ValueError("int4 requires even group size")

    # batch tile: bf16 x wants 16 sublanes, f32 8
    min_b = 16 if x.dtype == jnp.bfloat16 else 8
    b_pad = _round_up(max(b, min_b), min_b)
    if b_pad != b:
        x2 = jnp.pad(x2, ((0, b_pad - b), (0, 0)))

    auto_bn, auto_bk = _pick_blocks(k, n, gs, qt.bits, b_pad)
    bn = block_n or auto_bn
    bn = min(bn, _round_up(n, 128))
    bk = block_k or auto_bk
    if k % bk != 0 or bk % gs != 0:
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
        out_dtype_name=str(out_dtype),
    )
    return out[:b, :n].reshape(*lead, n)
