"""Fused GQA/MHA decode attention over the (optionally INT8) KV cache.

No reference counterpart (the reference serves opaque ONNX graphs and has
no attention machinery — SURVEY.md §5); this is north-star perf work
(BASELINE.md config 3: INT4 Llama + INT8 KV continuous batching).

Why a kernel: XLA lowers decode attention to S*Hkv batched [rep, hd]x[hd, L]
gemms and measured 129 GB/s effective on the KV read (scripts/
bench_attention.py) against an 819 GB/s chip. Two failure modes dominate:
minimum-tile MXU issue overhead, and full int8->bf16 conversion of the KV
stream on the VPU.

Design (v2 — measured evolution of the r1 attempt):

- The cache slice per (slot, kv-head-group) is viewed as K_flat [R, hd],
  R = block_l * G rows (position-major over the group's G heads — a pure
  BlockSpec slice of the [S, L, Hkv, hd] cache, no layout change). ONE
  dot scores the group's M = G*rep query heads against every row:

      S_all = Q [M, hd] x K_flat^T -> [M, R]

  Rows whose kv-head does not serve a query head get -inf via a
  PRECOMPUTED additive mask (a kernel input, resident in VMEM — no
  per-step iota/compare chains), so after online softmax they contribute
  exactly 0 and the V side is again one dot: O = P [M, R] x V [R, hd].

- INT8 KV never converts on the K side: q is quantized per head outside
  the kernel (SageAttention-style) and the score dot runs on the int8
  MXU at 2x rate; dequant (q_scale[M,1] * k_scale[1,R]) folds into the
  int32->f32 epilogue at O(M*R). V converts to bf16 (P is a probability
  matrix; bf16 is the accumulating dtype anyway).

- The head-group grid dimension keeps the score tile [M, R] small: VPU
  work per step scales with G, not Hkv, which is what throttled v1 on
  MHA models (Hkv=32 meant 32x the mathematically required exp/mask
  work).

- Per-slot DMA skip: K/V index maps clamp the L-block index to the
  slot's live length, so blocks past `positions[s]` re-reference the
  previous buffer and Mosaic skips the copy.

Grid: (S, Hkv/G, L/block_l), L minor; online-softmax state [M, 1] in VMEM
scratch, reset at each L-walk start.

Inputs (cache layouts, flattened/transposed here — all cheap):
  q          [S, H, hd]   bf16/f32, already scaled by 1/sqrt(hd)
  k, v       [S, L, Hkv, hd] int8 (quantized) or bf16/f32
  k_scale, v_scale [S, L, Hkv] f32 (None if unquantized)
  positions  [S] int32 — last valid cache index per slot; -1 = inactive
Returns [S, H, hd] f32.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(pos_ref, q_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref, hmask_ref,
            o_ref, m_ref, l_ref, acc_ref, *, g_kv, block_l, quantized, kv_int8):
    i = pl.program_id(0)
    j = pl.program_id(2)
    pos = pos_ref[i]
    m_dim, hd = q_ref.shape[2], q_ref.shape[3]
    block_r = block_l * g_kv

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Skip compute for L-blocks wholly past the slot's live length (their
    # DMAs were already skipped by the clamped index maps); also covers
    # inactive slots (pos < 0).
    @pl.when(j * block_l <= pos)
    def _compute():
        k = k_ref[0].reshape(block_r, hd)  # merge (block_l, G): sublane-major, free
        if kv_int8:
            qh = q_ref[0, 0]                   # [M, hd] int8
            s = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.float32)              # int8 MXU, no K conversion
            s = s * ks_ref[0, 0] * qs_ref[0, 0]  # [1,R] col x [M,1] row scales
        else:
            qh = q_ref[0, 0]
            s = jax.lax.dot_general(
                qh, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if quantized:
                s = s * ks_ref[0, 0]

        # additive masks: head-match (resident input, 0/-inf) + causal
        # validity for this L block (one compare on a [1, R] row)
        lpos = jax.lax.broadcasted_iota(jnp.int32, (1, block_r), 1) // g_kv
        s = s + hmask_ref[:] + jnp.where(lpos + j * block_l <= pos, 0.0, _NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.maximum(m_new, _NEG_INF / 2)  # fully-masked rows stay finite
        p = jnp.exp(s - m_safe)
        corr = jnp.exp(m_prev - m_safe)
        l_ref[:, 0:1] = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new

        if quantized:
            p = p * vs_ref[0, 0]               # V dequant folded at O(R)
        v = v_ref[0].reshape(block_r, hd)
        if v.dtype != jnp.float32:
            v = v.astype(jnp.int32).astype(jnp.bfloat16) if kv_int8 else v.astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [M, hd]
        acc_ref[:] = acc_ref[:] * corr + part

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        l_all = l_ref[:, 0:1]
        o_ref[0, 0] = jnp.where(l_all > 0, acc_ref[:] / jnp.maximum(l_all, 1e-20), 0.0)


def _quantize_q(q: jax.Array):
    """Per-(slot, head) symmetric int8: [S, H, hd] -> int8 + scale [S, H, 1]."""
    absmax = jnp.max(jnp.abs(q.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-10)
    qi = jnp.clip(jnp.round(q.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return qi, scale.astype(jnp.float32)


def decode_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_scale: Optional[jax.Array],
    v_scale: Optional[jax.Array],
    positions: jax.Array,
    *,
    block_l: int = 256,
    g_kv: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """See module docstring. Accepts the CACHE layouts directly."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    s_dim, n_heads, hd = q.shape
    _, l_max, n_kv, _ = k.shape
    rep = n_heads // n_kv
    quantized = k_scale is not None
    kv_int8 = bool(quantized) and k.dtype == jnp.int8

    if g_kv is None:
        g_kv = int(os.environ.get("TPUSERVE_ATTN_GKV", "0")) or max(1, 16 // rep)
    g_kv = min(g_kv, n_kv)
    while n_kv % g_kv != 0:
        g_kv -= 1
    n_groups = n_kv // g_kv
    m_dim = g_kv * rep

    block_l = min(block_l, l_max)
    while l_max % block_l != 0:  # bucket lengths are powers of two; fallback
        block_l //= 2
    block_r = block_l * g_kv
    n_blocks = l_max // block_l

    # q regrouped [S, Hg, M, hd]: q head h serves kv head h//rep, and heads
    # are kv-major, so groups are contiguous
    qg = q.reshape(s_dim, n_groups, m_dim, hd)
    if kv_int8:
        qq, qs = _quantize_q(qg)
        qs = qs  # [S, Hg, M, 1]
    else:
        qq = qg if qg.dtype == jnp.float32 else qg.astype(jnp.bfloat16)
        qs = jnp.zeros((s_dim, n_groups, m_dim, 1), jnp.float32)

    if quantized:
        # [S, L, Hkv] -> [S, Hg, 1, L*G] rows matching K's (l, g) order
        ksf = k_scale.reshape(s_dim, l_max, n_groups, g_kv).transpose(0, 2, 1, 3) \
            .reshape(s_dim, n_groups, 1, l_max * g_kv)
        vsf = v_scale.reshape(s_dim, l_max, n_groups, g_kv).transpose(0, 2, 1, 3) \
            .reshape(s_dim, n_groups, 1, l_max * g_kv)
    else:
        ksf = jnp.zeros((s_dim, 1, 1, 1), jnp.float32)
        vsf = ksf

    # additive head-match mask [M, R]: row h (query) reads kv head h//rep;
    # column r is kv head r%G of the group — 0 where matched, -inf otherwise
    row_kv = jax.lax.broadcasted_iota(jnp.int32, (m_dim, block_r), 0) // rep
    col_kv = jax.lax.broadcasted_iota(jnp.int32, (m_dim, block_r), 1) % g_kv
    hmask = jnp.where(row_kv == col_kv, 0.0, _NEG_INF).astype(jnp.float32)

    # Dynamic (positions-dependent) index maps would skip dead-tail DMAs
    # for short slots, but a scalar-prefetch-dependent index map defeats
    # Mosaic's pipelining: v2 measured ~140 GB/s with them vs the same
    # kernel's compute at full stream. Static maps keep the double-buffered
    # pipeline; global short-context savings come from the caller's
    # `window` bucketing instead. TPUSERVE_ATTN_DYNSKIP=1 re-enables the
    # per-slot skip for experiments.
    dyn_skip = os.environ.get("TPUSERVE_ATTN_DYNSKIP", "0") == "1"

    if dyn_skip:
        def kv_index(i, g, j, pos_ref):
            live = jnp.maximum(pos_ref[i], 0) // block_l
            return (i, jnp.minimum(j, live), g, 0)

        def sc_index(i, g, j, pos_ref):
            if not quantized:
                return (i, 0, 0, 0)
            live = jnp.maximum(pos_ref[i], 0) // block_l
            return (i, g, 0, jnp.minimum(j, live))
    else:
        def kv_index(i, g, j, pos_ref):
            return (i, j, g, 0)

        def sc_index(i, g, j, pos_ref):
            if not quantized:
                return (i, 0, 0, 0)
            return (i, g, 0, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # positions [S] land in SMEM before the body
        grid=(s_dim, n_groups, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, m_dim, hd), lambda i, g, j, *_: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_dim, 1), lambda i, g, j, *_: (i, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, g_kv, hd), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, g_kv, hd), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_r if quantized else 1), sc_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, block_r if quantized else 1), sc_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_dim, block_r), lambda i, g, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),  # resident head mask
        ],
        out_specs=pl.BlockSpec((1, 1, m_dim, hd), lambda i, g, j, *_: (i, g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m_dim, 1), jnp.float32),   # running max
            pltpu.VMEM((m_dim, 1), jnp.float32),   # running sum
            pltpu.VMEM((m_dim, hd), jnp.float32),  # output accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, g_kv=g_kv, block_l=block_l, quantized=quantized,
            kv_int8=kv_int8,
        ),
        out_shape=jax.ShapeDtypeStruct((s_dim, n_groups, m_dim, hd), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(positions.astype(jnp.int32), qq, qs, k, v, ksf, vsf, hmask)
    return out.reshape(s_dim, n_heads, hd)
