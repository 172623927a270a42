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
  k_scale, v_scale [S, Hkv, L] f32 head-major (None if unquantized)
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


# --------------------------------------------------------------- v3 ("wide")
# Lane-major decode attention. Design rationale (v3, after measuring v2):
#
# v2 viewed the cache as [block_l*G, hd] tiles — 128-byte minor rows — and
# never exceeded ~140 GB/s on the KV stream, while the weight kernel
# (ops/quant_matmul.py) streams [bk, 4096]-shaped int8 blocks at 470-841
# GB/s on the same chip. v3 therefore adopts the weight kernel's exact
# access shape: K and V are read as [block_l, W] blocks of the *flat* cache
# view [S*L, W], W = Hkv*hd (4096 for Llama-2-7B) — fully contiguous,
# 4-KB minor rows, 1-MB blocks, 2D BlockSpecs, static index maps.
#
# To score against a [block_l, W] tile with ONE wide dot, q is packed as
# Q_wide [M, W] int8 (M = all query heads): row m holds query head m's
# int8 vector at lane slice [h_m*hd, (h_m+1)*hd) (h_m = m // rep) and
# zeros elsewhere, so
#
#     scores[m, l] = Q_wide[m, :] . K_flat[l, :]        (ABᵀ, int8 MXU)
#
# is exactly the per-head score — no head mask, no [M, R] waste: softmax
# state is [M, block_l] (32x smaller than v2's). The V side is the
# MXU-native A@B form O += P[M, bl] @ V[bl, W], accumulated in an
# [M, W] f32 scratch; each row's live hd-slice is extracted once at the
# end of the L walk by a static unrolled lane-slice sum (Hkv slices of
# [M, hd]); every other lane of acc is mathematically garbage that one
# select zeroes out.
#
# INT8 KV path: K never converts (int8 x int8 -> int32 MXU at 2x rate);
# per-(l,h) K/V scales arrive pre-transposed as [S*M, L] rows so they
# multiply scores/probs elementwise in [M, bl] orientation with no
# in-kernel transpose. V also never converts: P (with V scales folded) is
# re-quantized per row to int8 in-kernel, so P@V runs on the int8 MXU too
# — the earlier bf16-V variant spent ~1M VPU convert elements per block
# (comparable to the block's DMA time) and measured ~190 GB/s effective.
#
# The full cache is read IN PLACE: decode_attention_wide_cache takes the
# flat [n_layers, S, L, W] KVCache layout (see models/llama.py KVCache)
# and offsets its index maps by a scalar-prefetched layer id, so there is
# no per-layer slice/reshape and one Mosaic compile serves every layer.


def _pad8(m: int) -> int:
    """Mosaic requires block sublane dims divisible by 8 (or equal to the
    full array dim). Per-slot scale tiles partition the [S*M, L] scale rows
    with sublane blocks of M, so models with M % 8 != 0 (e.g. 4-head
    fixtures) must pad each slot's rows to the next multiple of 8; kernels
    slice the live [:M] rows back out (a static slice). Gated so M % 8 == 0
    models trace the exact same graph as before (compile-cache stable)."""
    return -(-m // 8) * 8


def _subtile(tile, j, block_l, sc_block):
    """Select the [M, block_l] lane subtile of a [M, sc_block] scale tile
    for L-block j. Mosaic requires block lane widths divisible by 128 (or
    full-array), so when block_l < 128 the scale BlockSpec fetches a
    128-wide tile covering r = sc_block//block_l consecutive L-blocks and
    the kernel picks its slice with static slices + selects (no dynamic
    VMEM offsets)."""
    r = sc_block // block_l
    if r <= 1:
        return tile
    sub = j % r
    out = tile[:, 0:block_l]
    for t in range(1, r):
        out = jnp.where(sub == t, tile[:, t * block_l:(t + 1) * block_l], out)
    return out


def _unpack_nibbles(packed, biased=False):
    """uint8 [bl, W/2] -> (lo, hi) int8 codes (offset-8 encoded; int casts
    route through int32 per the Mosaic rules). Global split-half along the
    last dim: byte lane d holds W-positions d (lo) and W/2 + d (hi) — see
    pack_kv_codes in models/llama.py.

    biased=True returns the RAW unsigned nibbles in [0, 15] (two fewer
    VPU ops per byte over the full KV stream); callers fold the -8 into
    the dot algebraically: q.(n - 8) = q.n - 8*rowsum(q).

    TPUSERVE_INT4_UNPACK=noop is a TIMING-ONLY diagnostic (VERDICT r4 #2):
    it feeds the raw bytes to both dot halves (numerically wrong) so an
    in-situ A/B vs "cur" isolates the VPU nibble-unpack tax at real decode
    shapes — the standalone microbench (scripts/unpack_microbench.py) was
    per-block-overhead-bound and could not resolve it."""
    mode = os.environ.get("TPUSERVE_INT4_UNPACK", "cur")
    if mode == "noop":
        b = jax.lax.bitcast_convert_type(packed, jnp.int8)
        return b, b
    p32 = packed.astype(jnp.int32)
    lo, hi = p32 & 15, p32 >> 4
    if not biased:
        lo, hi = lo - 8, hi - 8
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def _wide_kernel(pos_ref, qw_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref,
                 o_ref, m_ref, l_ref, acc_ref, qw_scr_ref=None, *, block_l,
                 n_kv, rep, hd, kv_int8, quantized, pos_base=0, sc_block=None,
                 inline_qw=False, kv_bits=8, paged_sc=False):
    i = pl.program_id(0)
    j = pl.program_id(1)
    pos = pos_ref[pos_base + i]
    m_dim = qw_ref.shape[-2]
    if sc_block is None:
        sc_block = block_l

    def _paged_sc_rows(ref):
        # scale PAGE read in place: [1, pad8(Hkv), ps] head-major block
        # fetched through the same page-indexed channel as K/V (no
        # per-layer gather+transpose pass — the measured ~6.7% "paged
        # gap" at 7B). Expand Hkv rows to the M query rows (row m reads
        # head m // rep); rep == 1 is a free slice.
        t = ref[0]  # [HP, ps]
        if rep == 1:
            return t[:m_dim].astype(jnp.float32)
        row_h = jax.lax.broadcasted_iota(
            jnp.int32, (m_dim, t.shape[-1]), 0) // rep
        out = jnp.zeros((m_dim, t.shape[-1]), jnp.float32)
        for hh in range(n_kv):
            out = jnp.where(row_h == hh, t[hh][None, :].astype(jnp.float32),
                            out)
        return out

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if inline_qw:
            # build Q_wide in VMEM from the compact [M, hd] q block: row m
            # occupies kv-head (m // rep)'s lane slice, zeros elsewhere —
            # n_kv static [M, hd] selects, once per slot, instead of an
            # 8-MB/layer HBM round-trip through a prebuilt Q_wide
            qv = qw_ref[0]                    # [M, hd]
            row_h = jax.lax.broadcasted_iota(jnp.int32, (m_dim, hd), 0) // rep
            zero = jnp.zeros((m_dim, hd), qv.dtype)
            for h in range(n_kv):
                qw_scr_ref[:, h * hd:(h + 1) * hd] = jnp.where(row_h == h, qv, zero)

    def _sc_tile(ref):
        # scale tiles may carry _pad8 padding rows; slice the live [:M]
        t = ref[...]
        return t if t.shape[0] == m_dim else t[:m_dim]

    # skip L blocks wholly past this slot's live length (covers inactive
    # slots too: pos < 0 masks everything)
    @pl.when(j * block_l <= pos)
    def _compute():
        qw = qw_scr_ref[...] if inline_qw else qw_ref[...]  # [M, W]
        kb = k_ref[...]                       # [bl, W] int8 (or bf16/f32)
        if kv_bits == 4:
            # packed int4 KV: two int8 MXU dots against the unpacked nibble
            # halves. Q_wide rows are zero outside their head, so the
            # half-dots sum to the exact per-head q.k regardless of where
            # W/2 falls relative to head boundaries. Nibbles stay BIASED
            # (raw [0, 15] — two fewer VPU ops per byte across the whole
            # KV stream); q.(n-8) = q.n - 8*rowsum(q), one [M,1] reduce.
            w2 = qw.shape[-1] // 2
            k_lo, k_hi = _unpack_nibbles(kb, biased=True)  # [bl, W/2] u4-in-i8
            qsum = jnp.sum(qw.astype(jnp.int32), axis=1, keepdims=True)
            s = (jax.lax.dot_general(
                     qw[:, :w2], k_lo, (((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.int32)
                 + jax.lax.dot_general(
                     qw[:, w2:], k_hi, (((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.int32)
                 - 8 * qsum
                 ).astype(jnp.float32)        # [M, bl]
            ks_rows = _paged_sc_rows(ks_ref) if paged_sc else _subtile(
                _sc_tile(ks_ref), j, block_l, sc_block)
            s = s * qs_ref[0] * ks_rows
        elif kv_int8:
            s = jax.lax.dot_general(
                qw, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)             # [M, bl] via int8 MXU
            ks_rows = _paged_sc_rows(ks_ref) if paged_sc else _subtile(
                _sc_tile(ks_ref), j, block_l, sc_block)
            s = s * qs_ref[0] * ks_rows
        else:
            s = jax.lax.dot_general(
                qw.astype(jnp.float32), kb.astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            if quantized:
                s = s * _subtile(_sc_tile(ks_ref), j, block_l, sc_block)

        # causal/liveness mask over lanes (positions)
        lpos = jax.lax.broadcasted_iota(jnp.int32, (1, block_l), 1) + j * block_l
        s = s + jnp.where(lpos <= pos, 0.0, _NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.maximum(m_new, _NEG_INF / 2)
        p = jnp.exp(s - m_safe)               # [M, bl]
        corr = jnp.exp(m_prev - m_safe)       # [M, 1]
        l_ref[:, 0:1] = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new

        if quantized:
            # V dequant folded at O(M*bl)
            p = p * (_paged_sc_rows(vs_ref) if paged_sc else _subtile(
                _sc_tile(vs_ref), j, block_l, sc_block))
        vb = v_ref[...]
        if kv_bits == 4:
            pmax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
            pscale = jnp.maximum(pmax / 127.0, 1e-20)     # [M, 1]
            pq = jnp.clip(jnp.round(p / pscale), -127, 127).astype(jnp.int8)
            v_lo, v_hi = _unpack_nibbles(vb, biased=True)
            psum = 8 * jnp.sum(pq.astype(jnp.int32), axis=1, keepdims=True)
            part = jnp.concatenate([
                (jax.lax.dot_general(
                    pq, v_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) - psum).astype(jnp.float32),
                (jax.lax.dot_general(
                    pq, v_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) - psum).astype(jnp.float32),
            ], axis=1) * pscale               # [M, W], original W order
        elif kv_int8:
            # quantize P rows to int8 (SageAttention2-style) so P@V runs on
            # the int8 MXU: the alternative — converting the [bl, W] int8 V
            # block to bf16 — is ~1M VPU elements per block at 7B shapes,
            # comparable to the block's DMA time, and was measured to hold
            # the kernel at ~190 GB/s. Quantizing the [M, bl] P tile is
            # 32x less VPU work; per-row scales keep 7 bits of the row max
            # (error ~ sqrt(bl)/254 of the row max — below the int8-KV
            # noise floor).
            pmax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
            pscale = jnp.maximum(pmax / 127.0, 1e-20)     # [M, 1]
            pq = jnp.clip(jnp.round(p / pscale), -127, 127).astype(jnp.int8)
            part = jax.lax.dot_general(
                pq, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * pscale    # [M, W] = P @ V (int8 MXU)
        else:
            if vb.dtype != jnp.float32:
                vb = vb.astype(jnp.bfloat16)
                p = p.astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                p, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                 # [M, W] = P @ V
        acc_ref[:] = acc_ref[:] * corr + part

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        # extract each query head's live hd-slice: static unrolled lane
        # slices (all tile-aligned for hd % 128 == 0)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (m_dim, hd), 0) // rep
        out = jnp.zeros((m_dim, hd), jnp.float32)
        for h in range(n_kv):
            sel = (row_h == h).astype(jnp.float32)
            out = out + acc_ref[:, h * hd:(h + 1) * hd] * sel
        l_all = l_ref[:, 0:1]
        res = jnp.where(l_all > 0, out / jnp.maximum(l_all, 1e-20), 0.0)
        m_out = o_ref.shape[-2]  # < m_dim when Q_wide rows were _pad8-padded
        o_ref[0] = res if m_out == m_dim else res[:m_out]


def _prep_q_compact(q, k_dtype, kv_int8):
    """q [S, M, hd] -> kernel-dtype q (int8-quantized when the KV cache is
    int8) + per-head scales [S, M, 1]."""
    s_dim, n_heads, _ = q.shape
    if kv_int8:
        return _quantize_q(q)                 # int8 [S, M, hd], f32 [S, M, 1]
    qf = q.astype(jnp.bfloat16 if k_dtype != jnp.float32 else jnp.float32)
    return qf, jnp.zeros((s_dim, n_heads, 1), jnp.float32)


def _prep_scales(k_scale, v_scale, *, s_dim, m_dim, rep, quantized, l_win):
    """K/V scale rows [S*M, l_win] matching the kernel's [M, bl] score
    orientation. Scales arrive HEAD-MAJOR [S, Hkv, l_win] — the cache's
    stored layout — so at rep == 1 (MHA-class) this is a free major-dim
    reshape; GQA repeats on a major dim (no transpose either way). The old
    [S, L, Hkv] layout cost a materialized repeat+transpose per layer per
    step (~3-4%% of decode bytes at 7B)."""
    m_pad = _pad8(m_dim)
    if quantized:
        if rep > 1:
            k_scale = jnp.repeat(k_scale, rep, axis=1)
            v_scale = jnp.repeat(v_scale, rep, axis=1)
        if m_pad != m_dim:  # sublane legality for M % 8 != 0 (see _pad8)
            pad = ((0, 0), (0, m_pad - m_dim), (0, 0))
            k_scale = jnp.pad(k_scale, pad)
            v_scale = jnp.pad(v_scale, pad)
        ksr = k_scale.reshape(s_dim * m_pad, l_win)
        vsr = v_scale.reshape(s_dim * m_pad, l_win)
    else:
        ksr = jnp.zeros((s_dim * m_pad, 1), jnp.float32)
        vsr = ksr
    return ksr, vsr


def _prep_wide(q, k_dtype, k_scale, v_scale, *, rep, n_kv, kv_int8,
               quantized, l_win):
    """Host-side prep for the standalone wide kernels: prebuilt Q_wide
    [S*M, W] (one one-hot multiply), q scales, and K/V scale rows. The
    cache kernel builds Q_wide in VMEM instead (inline_qw) to skip the
    8-MB/layer HBM round-trip."""
    s_dim, n_heads, hd = q.shape
    w = n_kv * hd
    m_dim = n_heads
    onehot = (jnp.arange(n_heads)[:, None] // rep
              == jnp.arange(n_kv)[None, :]).astype(jnp.float32)
    qc, qs = _prep_q_compact(q, k_dtype, kv_int8)
    if kv_int8:
        qwide = (qc.astype(jnp.int32)[:, :, None, :]
                 * onehot.astype(jnp.int32)[None, :, :, None]).astype(jnp.int8)
    else:
        qwide = (qc.astype(jnp.float32)[:, :, None, :]
                 * onehot[None, :, :, None]).astype(qc.dtype)
    m_pad = _pad8(m_dim)
    if m_pad != m_dim:
        # the prebuilt-Q_wide kernel partitions [S*M, W] rows with sublane
        # blocks of M: pad each slot's rows (zero rows score ~uniform
        # garbage the caller's o_ref slice drops — see _wide_kernel m_out)
        pad = ((0, 0), (0, m_pad - m_dim), (0, 0))
        qwide = jnp.pad(qwide.reshape(s_dim, n_heads, w), pad)
        qs = jnp.pad(qs, pad)
    qwide = qwide.reshape(s_dim * m_pad, w)
    ksr, vsr = _prep_scales(k_scale, v_scale, s_dim=s_dim, m_dim=m_dim,
                            rep=rep, quantized=quantized, l_win=l_win)
    return qwide, qs, ksr, vsr


def _scale_block(block_l: int, win: int, quantized: bool) -> int:
    """Lane width of the K/V-scale BlockSpec tiles: Mosaic requires block
    lane dims divisible by 128 (or the full array width), so grow the scale
    tile to cover several L-blocks when block_l < 128; the kernel selects
    the live subtile (_subtile)."""
    if not quantized:
        return block_l
    sc = block_l
    while sc < 128 and sc * 2 <= win and win % (sc * 2) == 0:
        sc *= 2
    return sc


def decode_attention_wide(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_scale: Optional[jax.Array],
    v_scale: Optional[jax.Array],
    positions: jax.Array,
    *,
    block_l: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """v3 lane-major fused decode attention (see design note above).

    Same contract as decode_attention: q [S, H, hd] (already scaled by
    1/sqrt(hd)), k/v [S, L, Hkv, hd] int8/bf16/f32, scales [S, Hkv, L] f32
    or None, positions [S] int32 (-1 = inactive). Returns [S, H, hd] f32.
    Requires hd % 128 == 0 on TPU (lane-tile-aligned extraction).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    s_dim, n_heads, hd = q.shape
    _, l_max, n_kv, _ = k.shape
    rep = n_heads // n_kv
    w = n_kv * hd
    quantized = k_scale is not None
    kv_int8 = bool(quantized) and k.dtype == jnp.int8
    m_dim = n_heads

    block_l = min(block_l, l_max)
    while l_max % block_l != 0:
        block_l //= 2
    n_blocks = l_max // block_l
    sc_block = _scale_block(block_l, l_max, quantized)
    scr = sc_block // block_l

    qwide, qs, ksr, vsr = _prep_wide(
        q, k.dtype, k_scale, v_scale, rep=rep, n_kv=n_kv, kv_int8=kv_int8,
        quantized=quantized, l_win=l_max)
    m_pad = _pad8(m_dim)  # Q_wide/scale rows are per-slot padded (see _pad8)

    kf = k.reshape(s_dim * l_max, w)
    vf = v.reshape(s_dim * l_max, w)

    lpb = l_max // block_l  # L blocks per slot

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_dim, n_blocks),
        in_specs=[
            pl.BlockSpec((m_pad, w), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),           # Q_wide rows
            pl.BlockSpec((1, m_pad, 1), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # q scales
            pl.BlockSpec((block_l, w), lambda i, j, *_: (i * lpb + j, 0),
                         memory_space=pltpu.VMEM),           # K flat
            pl.BlockSpec((block_l, w), lambda i, j, *_: (i * lpb + j, 0),
                         memory_space=pltpu.VMEM),           # V flat
            pl.BlockSpec((m_pad, sc_block if quantized else 1),
                         (lambda i, j, *_: (i, j // scr)) if quantized
                         else (lambda i, j, *_: (i, 0)),
                         memory_space=pltpu.VMEM),           # K scales [M, sc]
            pl.BlockSpec((m_pad, sc_block if quantized else 1),
                         (lambda i, j, *_: (i, j // scr)) if quantized
                         else (lambda i, j, *_: (i, 0)),
                         memory_space=pltpu.VMEM),           # V scales
        ],
        out_specs=pl.BlockSpec((1, m_dim, hd), lambda i, j, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m_pad, 1), jnp.float32),   # running max
            pltpu.VMEM((m_pad, 1), jnp.float32),   # running sum
            pltpu.VMEM((m_pad, w), jnp.float32),   # O_wide accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _wide_kernel, block_l=block_l, n_kv=n_kv, rep=rep, hd=hd,
            kv_int8=kv_int8, quantized=quantized, sc_block=sc_block,
        ),
        out_shape=jax.ShapeDtypeStruct((s_dim, m_dim, hd), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # both "arbitrary": v5e has one TensorCore, so "parallel" buys
            # nothing, and a single sequential grid keeps one continuous
            # double-buffered DMA pipeline across slots
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(positions.astype(jnp.int32), qwide, qs, kf, vf, ksr, vsr)
    return out


def _packed_kernel(pos_ref, qc_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref,
                   o_ref, qw_scr, *, sb, l_max, n_kv, rep, hd, kv_int8,
                   quantized):
    """Multi-slot variant: one [sb*L, W] KV block serves sb adjacent slots
    (sub-MB per-slot windows make single-slot DMA blocks too small to hide
    per-block overhead — measured 7% loss on GQA at L=256). Single L-block
    per program, so plain softmax (no online state)."""
    g = pl.program_id(0)
    m_dim = qc_ref.shape[1]          # heads per slot
    sm = sb * m_dim
    rows = sb * l_max
    w = k_ref.shape[1]

    # in-VMEM Q_wide for the sb packed slots: rows [t*M, (t+1)*M) hold slot
    # t's heads at their kv-head lane slices
    row_h = jax.lax.broadcasted_iota(jnp.int32, (m_dim, hd), 0) // rep
    for t in range(sb):
        qv = qc_ref[t]               # [M, hd]
        zero = jnp.zeros((m_dim, hd), qv.dtype)
        for h in range(n_kv):
            qw_scr[t * m_dim:(t + 1) * m_dim, h * hd:(h + 1) * hd] = \
                jnp.where(row_h == h, qv, zero)

    kb = k_ref[...]                  # [sb*L, W]
    # slot-local scale rows tiled across the sb column blocks: cross-slot
    # entries get the wrong slot's scale, but those scores are masked below
    if quantized:
        kt, vt = ks_ref[...], vs_ref[...]
        m_pad = kt.shape[0] // sb    # per-slot rows may carry _pad8 padding
        if m_pad != m_dim:
            kt = jnp.concatenate(
                [kt[t * m_pad:t * m_pad + m_dim] for t in range(sb)], axis=0)
            vt = jnp.concatenate(
                [vt[t * m_pad:t * m_pad + m_dim] for t in range(sb)], axis=0)
        ks = jnp.concatenate([kt] * sb, axis=1)            # [sm, sb*L]
        vs = jnp.concatenate([vt] * sb, axis=1)
    if kv_int8:
        s = jax.lax.dot_general(
            qw_scr[...], kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)        # [sb*M, sb*L]
        s = s * qs_ref[...].reshape(sm, 1)
        if quantized:
            s = s * ks
    else:
        s = jax.lax.dot_general(
            qw_scr[...].astype(jnp.float32), kb.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        if quantized:
            s = s * ks

    # mask: same-slot AND causal. Static slot-block-diagonal pattern plus
    # per-slot positions from SMEM (sb scalar reads, statically unrolled).
    row_slot = jax.lax.broadcasted_iota(jnp.int32, (sm, rows), 0) // m_dim
    col_slot = jax.lax.broadcasted_iota(jnp.int32, (sm, rows), 1) // l_max
    col_within = jax.lax.broadcasted_iota(jnp.int32, (sm, rows), 1) % l_max
    ok = row_slot == col_slot
    pos_row = jnp.zeros((sm, 1), jnp.int32)
    rm = jax.lax.broadcasted_iota(jnp.int32, (sm, 1), 0) // m_dim
    for t in range(sb):
        pos_row = jnp.where(rm == t, pos_ref[1 + g * sb + t], pos_row)
    ok = jnp.logical_and(ok, col_within <= pos_row)
    s = jnp.where(ok, s, _NEG_INF)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - jnp.maximum(m, _NEG_INF / 2))
    lsum = jnp.sum(p, axis=1, keepdims=True)

    if quantized:
        p = p * vs
    vb = v_ref[...]
    if kv_int8:
        pmax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
        pscale = jnp.maximum(pmax / 127.0, 1e-20)
        pq = jnp.clip(jnp.round(p / pscale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            pq, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * pscale
    else:
        if vb.dtype != jnp.float32:
            vb = vb.astype(jnp.bfloat16)
            p = p.astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [sb*M, W]

    rh = jax.lax.broadcasted_iota(jnp.int32, (sm, hd), 0) % m_dim // rep
    out = jnp.zeros((sm, hd), jnp.float32)
    for h in range(n_kv):
        sel = (rh == h).astype(jnp.float32)
        out = out + acc[:, h * hd:(h + 1) * hd] * sel
    out = jnp.where(lsum > 0, out / jnp.maximum(lsum, 1e-20), 0.0)
    o_ref[...] = out.reshape(sb, m_dim, hd)


def decode_attention_wide_cache(
    q: jax.Array,
    k_full: jax.Array,
    v_full: jax.Array,
    k_scale_l: Optional[jax.Array],
    v_scale_l: Optional[jax.Array],
    positions: jax.Array,
    layer,
    *,
    window: Optional[int] = None,
    block_l: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """v3 wide kernel reading the FULL multi-layer cache in place.

    The decode step updates the whole [n_layers, S, L, Hkv, hd] cache
    functionally; slicing one layer out for a pallas_call would materialize
    an S*L*W copy per layer — a second full KV pass that erases the
    kernel's win. Instead the kernel takes the flat [n_layers*S*L, W] view
    (a free reshape) and offsets its K/V index maps by a scalar-prefetched
    `layer` index, so (a) zero copies by construction and (b) all layers
    share ONE Mosaic compilation (the kernel body and index maps are
    layer-independent; XLA dedupes the identical custom calls).

    q            [S, H, hd], already scaled by 1/sqrt(hd)
    k_full/v_full [n_layers, S, L, W] (flat KVCache layout — preferred: the
                 2D kernel view is then a bitcast) or [n_layers, S, L, Hkv,
                 hd] (the 5D view reshapes across TPU tiles = full-cache
                 copy; only acceptable in CPU/interpret tests)
    k_scale_l    this layer's scales [S, Hkv, L] f32 (head-major), or None
    positions    [S] int32, -1 = inactive
    layer        int or traced int32 scalar
    window       static read limit (<= L); callers guarantee
                 max(positions)+1 <= window
    Returns [S, H, hd] f32.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    s_dim, n_heads, hd = q.shape
    kv_bits = 4 if k_full.dtype == jnp.uint8 else 8  # uint8 = packed int4
    wdiv = 2 if kv_bits == 4 else 1
    if k_full.ndim == 4:  # flat [n_layers, S, L, W] (W/2 bytes when int4)
        n_layers, _, l_max, w_store = k_full.shape
        w = w_store * wdiv
        n_kv = w // hd
    else:
        n_layers, _, l_max, n_kv, _ = k_full.shape
        w = n_kv * hd
        w_store = w // wdiv
    rep = n_heads // n_kv
    quantized = k_scale_l is not None
    kv_int8 = bool(quantized) and k_full.dtype in (jnp.int8, jnp.uint8)
    if kv_bits == 4:
        if not quantized:
            raise ValueError("packed int4 KV requires scales")
        if k_full.ndim != 4:
            raise ValueError("packed int4 KV requires the flat cache layout")
        if (w // 2) % 128 != 0:
            raise ValueError(
                f"packed int4 KV needs (n_kv_heads*head_dim)/2 % 128 == 0, "
                f"got W={w}")
    m_dim = n_heads

    win = l_max if window is None else min(int(window), l_max)
    if block_l is None:
        # smaller blocks = finer-grained per-slot DMA skip (a slot reads
        # ceil((pos+1)/block_l) blocks); 128 is the interleaved-A/B sweet
        # spot (512-KB blocks at 7B): bl=64 paid more per-block overhead
        # than its extra skip won, bl=256 skips too coarsely
        block_l = int(os.environ.get("TPUSERVE_ATTN_BLOCK_L", "128"))
    block_l = min(block_l, win)
    while win % block_l != 0:
        block_l //= 2
    assert l_max % block_l == 0, (l_max, block_l)
    n_blocks = win // block_l
    lpbf = l_max // block_l  # L blocks per slot in the FULL flat view
    sc_block = _scale_block(block_l, win, quantized)
    scr = sc_block // block_l

    if quantized:
        k_scale_l = k_scale_l[:, :, :win]
        v_scale_l = v_scale_l[:, :, :win]
    qc, qs = _prep_q_compact(q, k_full.dtype, kv_int8)
    ksr, vsr = _prep_scales(k_scale_l, v_scale_l, s_dim=s_dim, m_dim=m_dim,
                            rep=rep, quantized=quantized, l_win=win)
    m_pad = _pad8(m_dim)  # scale rows are per-slot padded (see _pad8)

    kf = k_full.reshape(n_layers * s_dim * l_max, w_store)
    vf = v_full.reshape(n_layers * s_dim * l_max, w_store)
    scalars = jnp.concatenate([
        jnp.asarray([layer], jnp.int32).reshape(1),
        positions.astype(jnp.int32),
    ])

    # Multi-slot packing for sub-MB windows (GQA-class shapes): single-slot
    # DMA blocks below ~1 MB measured 7% slower than XLA (per-block
    # overhead); packing sb adjacent slots into one [sb*L, W] block
    # restores MB-scale DMAs. Only possible at the full window (slot rows
    # are contiguous in the flat view iff win == l_max). The packed-int4
    # variant of _packed_kernel is not implemented — int4 caches stay on
    # the L-blocked path (their windows are half the bytes anyway).
    sb = 1
    if win == l_max and kv_bits == 8:
        while (sb * 2) <= s_dim and s_dim % (sb * 2) == 0 \
                and win * w * sb < (1 << 20):
            sb *= 2
    if sb > 1:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(s_dim // sb,),
            in_specs=[
                pl.BlockSpec((sb, m_dim, hd), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),   # q compact
                pl.BlockSpec((sb, m_dim, 1), lambda g, *_: (g, 0, 0),
                             memory_space=pltpu.VMEM),   # q scales
                pl.BlockSpec((sb * l_max, w),
                             lambda g, sref: (sref[0] * (s_dim // sb) + g, 0),
                             memory_space=pltpu.VMEM),   # K packed slots
                pl.BlockSpec((sb * l_max, w),
                             lambda g, sref: (sref[0] * (s_dim // sb) + g, 0),
                             memory_space=pltpu.VMEM),   # V packed slots
                pl.BlockSpec((sb * m_pad, win if quantized else 1),
                             lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((sb * m_pad, win if quantized else 1),
                             lambda g, *_: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((sb, m_dim, hd), lambda g, *_: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((sb * m_dim, w), qc.dtype)],
        )
        out = pl.pallas_call(
            functools.partial(
                _packed_kernel, sb=sb, l_max=l_max, n_kv=n_kv, rep=rep,
                hd=hd, kv_int8=kv_int8, quantized=quantized),
            out_shape=jax.ShapeDtypeStruct((s_dim, m_dim, hd), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=bool(interpret),
        )(scalars, qc, qs, kf, vf, ksr, vsr)
        return out

    # Per-slot DMA skip: the chip's measured achievable HBM stream is
    # ~295 GB/s (scripts/peak_bw) and the whole decode step already runs at
    # ~97% of it, so the remaining lever is BYTES, not rate. Clamping the
    # L-block index to the slot's live length makes every dead-tail grid
    # step re-reference the previous block, which Mosaic elides — KV
    # traffic tracks actual context lengths instead of the bucket size.
    # (XLA's einsum path must read the full static window; this skip is
    # the kernel's structural advantage.) TPUSERVE_ATTN_DYNSKIP=0 disables
    # for A/B.
    dyn_skip = os.environ.get("TPUSERVE_ATTN_DYNSKIP", "1") == "1"

    def kv_index(i, j, sref):
        base = sref[0] * (s_dim * lpbf) + i * lpbf
        if dyn_skip:
            live = jnp.maximum(sref[1 + i], 0) // block_l
            return (base + jnp.minimum(j, live), 0)
        return (base + j, 0)

    def sc_index(i, j, sref):
        if not quantized:
            return (i, 0)
        if dyn_skip:
            live = jnp.maximum(sref[1 + i], 0) // block_l
            return (i, jnp.minimum(j, live) // scr)
        return (i, j // scr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_dim, n_blocks),
        in_specs=[
            pl.BlockSpec((1, m_dim, hd), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # q compact
            pl.BlockSpec((1, m_dim, 1), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # q scales
            pl.BlockSpec((block_l, w_store), kv_index,
                         memory_space=pltpu.VMEM),           # K flat (layer off)
            pl.BlockSpec((block_l, w_store), kv_index,
                         memory_space=pltpu.VMEM),           # V flat
            pl.BlockSpec((m_pad, sc_block if quantized else 1), sc_index,
                         memory_space=pltpu.VMEM),           # K scales [M, sc]
            pl.BlockSpec((m_pad, sc_block if quantized else 1), sc_index,
                         memory_space=pltpu.VMEM),           # V scales
        ],
        out_specs=pl.BlockSpec((1, m_dim, hd), lambda i, j, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m_dim, 1), jnp.float32),   # running max
            pltpu.VMEM((m_dim, 1), jnp.float32),   # running sum
            pltpu.VMEM((m_dim, w), jnp.float32),   # O_wide accumulator
            pltpu.VMEM((m_dim, w), qc.dtype),      # in-VMEM Q_wide
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _wide_kernel, block_l=block_l, n_kv=n_kv, rep=rep, hd=hd,
            kv_int8=kv_int8, quantized=quantized, pos_base=1,
            sc_block=sc_block, inline_qw=True, kv_bits=kv_bits,
        ),
        out_shape=jax.ShapeDtypeStruct((s_dim, m_dim, hd), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # both "arbitrary": v5e has one TensorCore, so "parallel" buys
            # nothing, and a single sequential grid keeps one continuous
            # double-buffered DMA pipeline across slots
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(scalars, qc, qs, kf, vf, ksr, vsr)
    return out


def _wide_multi_kernel(pos_ref, qw_ref, qs_ref, k_ref, v_ref, ks_ref, vs_ref,
                       o_ref, m_ref, l_ref, acc_ref, qw_scr_ref, *, block_l,
                       n_kv, rep, hd, cands, kv_int8, quantized, kv_bits=8,
                       sc_block=None):
    """Multi-candidate variant of _wide_kernel for speculative verification:
    C candidate tokens per slot score against the SAME cache stream in one
    L walk. Q rows are candidate-major ([c*M + m]); row r's causal horizon
    is pos + r//M (candidate c attends to everything up to and including
    its own just-written position). KV bytes are read ONCE for all C
    candidates — the whole point: the XLA verify path on the flat cache
    pays a per-layer window relayout instead."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    pos = pos_ref[1 + i]
    m_base = qw_ref.shape[-2] // cands  # M = heads per candidate
    cm = m_base * cands
    if sc_block is None:
        sc_block = block_l

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        qv = qw_ref[0]                        # [CM, hd] compact
        row_h = (jax.lax.broadcasted_iota(jnp.int32, (cm, hd), 0)
                 % m_base) // rep
        zero = jnp.zeros((cm, hd), qv.dtype)
        for h in range(n_kv):
            qw_scr_ref[:, h * hd:(h + 1) * hd] = jnp.where(row_h == h, qv, zero)

    # skip blocks wholly past the LAST candidate's position
    @pl.when(j * block_l <= pos + (cands - 1))
    def _compute():
        qw = qw_scr_ref[...]                  # [CM, W]
        kb = k_ref[...]                       # [bl, W]

        def tile_c(tile):
            # expand a per-head [M, x] scale tile to candidate-major [CM, x]
            if tile.shape[0] != m_base:  # drop _pad8 padding rows first
                tile = tile[:m_base]
            return jnp.concatenate([tile] * cands, axis=0) if cands > 1 else tile

        if kv_bits == 4:
            # packed int4: two biased-nibble int8 dots (see _wide_kernel)
            w2 = qw.shape[-1] // 2
            k_lo, k_hi = _unpack_nibbles(kb, biased=True)
            qsum = jnp.sum(qw.astype(jnp.int32), axis=1, keepdims=True)
            s = (jax.lax.dot_general(
                     qw[:, :w2], k_lo, (((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.int32)
                 + jax.lax.dot_general(
                     qw[:, w2:], k_hi, (((1,), (1,)), ((), ())),
                     preferred_element_type=jnp.int32)
                 - 8 * qsum
                 ).astype(jnp.float32)
            s = s * qs_ref[0] * tile_c(_subtile(ks_ref[...], j, block_l, sc_block))
        elif kv_int8:
            s = jax.lax.dot_general(
                qw, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = s * qs_ref[0] * tile_c(_subtile(ks_ref[...], j, block_l, sc_block))
        else:
            s = jax.lax.dot_general(
                qw.astype(jnp.float32), kb.astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            )
            if quantized:
                s = s * tile_c(_subtile(ks_ref[...], j, block_l, sc_block))

        # per-row causal horizon: row r (candidate r // M) sees lanes
        # <= pos + r//M
        lpos = jax.lax.broadcasted_iota(jnp.int32, (cm, block_l), 1) + j * block_l
        row_pos = pos + jax.lax.broadcasted_iota(jnp.int32, (cm, block_l), 0) // m_base
        s = s + jnp.where(lpos <= row_pos, 0.0, _NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        m_safe = jnp.maximum(m_new, _NEG_INF / 2)
        p = jnp.exp(s - m_safe)
        corr = jnp.exp(m_prev - m_safe)
        l_ref[:, 0:1] = l_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new

        if quantized:
            p = p * tile_c(_subtile(vs_ref[...], j, block_l, sc_block))
        vb = v_ref[...]
        if kv_bits == 4:
            pmax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
            pscale = jnp.maximum(pmax / 127.0, 1e-20)
            pq = jnp.clip(jnp.round(p / pscale), -127, 127).astype(jnp.int8)
            v_lo, v_hi = _unpack_nibbles(vb, biased=True)
            psum = 8 * jnp.sum(pq.astype(jnp.int32), axis=1, keepdims=True)
            part = jnp.concatenate([
                (jax.lax.dot_general(
                    pq, v_lo, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) - psum).astype(jnp.float32),
                (jax.lax.dot_general(
                    pq, v_hi, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) - psum).astype(jnp.float32),
            ], axis=1) * pscale
        elif kv_int8:
            pmax = jnp.max(jnp.abs(p), axis=1, keepdims=True)
            pscale = jnp.maximum(pmax / 127.0, 1e-20)
            pq = jnp.clip(jnp.round(p / pscale), -127, 127).astype(jnp.int8)
            part = jax.lax.dot_general(
                pq, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * pscale
        else:
            if vb.dtype != jnp.float32:
                vb = vb.astype(jnp.bfloat16)
                p = p.astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                p, vb, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[:] = acc_ref[:] * corr + part

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        row_h = (jax.lax.broadcasted_iota(jnp.int32, (cm, hd), 0)
                 % m_base) // rep
        out = jnp.zeros((cm, hd), jnp.float32)
        for h in range(n_kv):
            sel = (row_h == h).astype(jnp.float32)
            out = out + acc_ref[:, h * hd:(h + 1) * hd] * sel
        l_all = l_ref[:, 0:1]
        o_ref[0] = jnp.where(l_all > 0, out / jnp.maximum(l_all, 1e-20), 0.0)


def decode_attention_wide_cache_multi(
    q: jax.Array,
    k_full: jax.Array,
    v_full: jax.Array,
    k_scale_l,
    v_scale_l,
    positions: jax.Array,
    layer,
    *,
    window: Optional[int] = None,
    block_l: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Speculative-verification attention over the full flat cache IN PLACE:
    q [S, C, H, hd] (C candidates per slot, pre-scaled by 1/sqrt(hd), RoPE'd
    at their own positions; their K/V already written at positions
    pos..pos+C-1), positions [S] = candidate 0's position (-1 = inactive).
    Everything else as decode_attention_wide_cache. Returns [S, C, H, hd]
    f32 (rows past a slot's draft length are garbage for the caller to
    mask). Callers guarantee max(positions) + C <= window."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    s_dim, cands, n_heads, hd = q.shape
    kv_bits = 4 if k_full.dtype == jnp.uint8 else 8  # uint8 = packed int4
    wdiv = 2 if kv_bits == 4 else 1
    if k_full.ndim == 4:
        n_layers, _, l_max, w_store = k_full.shape
        w = w_store * wdiv
        n_kv = w // hd
    else:
        n_layers, _, l_max, n_kv, _ = k_full.shape
        w = n_kv * hd
        w_store = w // wdiv
    rep = n_heads // n_kv
    m_base = n_heads
    cm = cands * m_base
    quantized = k_scale_l is not None
    kv_int8 = bool(quantized) and k_full.dtype in (jnp.int8, jnp.uint8)
    if kv_bits == 4:
        if not quantized or k_full.ndim != 4:
            raise ValueError("packed int4 KV requires scaled flat caches")
        if (w // 2) % 128 != 0:
            raise ValueError(
                f"packed int4 KV needs (n_kv_heads*head_dim)/2 % 128 == 0, "
                f"got W={w}")

    win = l_max if window is None else min(int(window), l_max)
    if block_l is None:
        block_l = int(os.environ.get("TPUSERVE_ATTN_BLOCK_L", "128"))
    block_l = min(block_l, win)
    while win % block_l != 0:
        block_l //= 2
    assert l_max % block_l == 0, (l_max, block_l)
    n_blocks = win // block_l
    lpbf = l_max // block_l
    sc_block = _scale_block(block_l, win, quantized)
    scr = sc_block // block_l

    if quantized:
        k_scale_l = k_scale_l[:, :, :win]
        v_scale_l = v_scale_l[:, :, :win]
    qc, qs = _prep_q_compact(q.reshape(s_dim, cm, hd), k_full.dtype, kv_int8)
    ksr, vsr = _prep_scales(k_scale_l, v_scale_l, s_dim=s_dim, m_dim=m_base,
                            rep=rep, quantized=quantized, l_win=win)
    m_pad = _pad8(m_base)  # scale rows are per-slot padded (see _pad8)

    kf = k_full.reshape(n_layers * s_dim * l_max, w_store)
    vf = v_full.reshape(n_layers * s_dim * l_max, w_store)
    scalars = jnp.concatenate([
        jnp.asarray([layer], jnp.int32).reshape(1),
        positions.astype(jnp.int32),
    ])

    dyn_skip = os.environ.get("TPUSERVE_ATTN_DYNSKIP", "1") == "1"

    def kv_index(i, j, sref):
        base = sref[0] * (s_dim * lpbf) + i * lpbf
        if dyn_skip:
            live = (jnp.maximum(sref[1 + i], 0) + cands - 1) // block_l
            return (base + jnp.minimum(j, live), 0)
        return (base + j, 0)

    def sc_index(i, j, sref):
        if not quantized:
            return (i, 0)
        if dyn_skip:
            live = (jnp.maximum(sref[1 + i], 0) + cands - 1) // block_l
            return (i, jnp.minimum(j, live) // scr)
        return (i, j // scr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_dim, n_blocks),
        in_specs=[
            pl.BlockSpec((1, cm, hd), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # q compact
            pl.BlockSpec((1, cm, 1), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # q scales
            pl.BlockSpec((block_l, w_store), kv_index,
                         memory_space=pltpu.VMEM),           # K flat
            pl.BlockSpec((block_l, w_store), kv_index,
                         memory_space=pltpu.VMEM),           # V flat
            pl.BlockSpec((m_pad, sc_block if quantized else 1), sc_index,
                         memory_space=pltpu.VMEM),           # K scales [M, sc]
            pl.BlockSpec((m_pad, sc_block if quantized else 1), sc_index,
                         memory_space=pltpu.VMEM),           # V scales
        ],
        out_specs=pl.BlockSpec((1, cm, hd), lambda i, j, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cm, 1), jnp.float32),
            pltpu.VMEM((cm, 1), jnp.float32),
            pltpu.VMEM((cm, w), jnp.float32),
            pltpu.VMEM((cm, w), qc.dtype),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _wide_multi_kernel, block_l=block_l, n_kv=n_kv, rep=rep, hd=hd,
            cands=cands, kv_int8=kv_int8, quantized=quantized,
            kv_bits=kv_bits, sc_block=sc_block,
        ),
        out_shape=jax.ShapeDtypeStruct((s_dim, cm, hd), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(scalars, qc, qs, kf, vf, ksr, vsr)
    return out.reshape(s_dim, cands, n_heads, hd)


def _paged_sc_index(s_dim, ps, sc_block, quantized):
    """Scale-row index map for the paged kernel: follows the same live-page
    clamp as the KV blocks so dead-tail scale DMAs are elided too."""
    if not quantized:
        return lambda i, j, *_: (i, 0)
    scr = sc_block // ps

    def sc_index(i, j, sref):
        live = jnp.maximum(sref[1 + i], 0) // ps
        return (i, jnp.minimum(j, live) // scr)

    return sc_index


def decode_attention_wide_paged(
    q: jax.Array,
    k_pool: jax.Array,
    v_pool: jax.Array,
    k_scale_l: Optional[jax.Array],
    v_scale_l: Optional[jax.Array],
    page_table: jax.Array,
    positions: jax.Array,
    layer,
    *,
    window: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """v3 wide kernel over a PAGED KV pool — pages read in place.

    The XLA paged path gathers the logical [S, P*ps, Hkv, hd] view per
    layer (`k_pool[layer][page_table]`), costing a full extra HBM pass over
    the window (serving/paged_kv.py's documented tradeoff). Here the page
    indirection moves into the BlockSpec index map instead: the page table
    rides the scalar-prefetch channel (SMEM), each L-block IS one page, and
    its pool row is looked up at grid-step time — so the DMA engine streams
    pages directly, zero gather, same access shape as the contiguous
    kernel ([ps, W] 2D blocks of the flat pool view).

    q           [S, H, hd], already scaled by 1/sqrt(hd)
    k_pool/v_pool [n_layers, n_pages, ps, W] (flat PagedKVCache layout) or
                [n_layers, n_pages, ps, Hkv, hd] (5D; copies on TPU — test
                use only)
    k_scale_l   EITHER this layer's gathered scales [S, Hkv, win] f32
                head-major, OR (preferred) the SCALE POOL
                [n_layers, n_pages, pad8(Hkv), ps] — detected by ndim.
                Pool scales ride the same page-indexed BlockSpec channel
                as K/V and are read in place; the gathered form forces a
                per-layer gather+transpose pass that measured ~6.7% of
                7B step bytes (the round-3 "paged gap").
    page_table  [S, P] int32, entries are pool page ids (0 = zero page)
    positions   [S] int32, -1 = inactive
    window      static read limit, multiple of page_size
    Returns [S, H, hd] f32. Requires page_size % 8 == 0 on TPU.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    s_dim, n_heads, hd = q.shape
    kv_bits = 4 if k_pool.dtype == jnp.uint8 else 8  # uint8 = packed int4
    wdiv = 2 if kv_bits == 4 else 1
    if k_pool.ndim == 4:  # flat [n_layers, n_pages, ps, W] (W/2 when int4)
        n_layers, n_pages, ps, w_store = k_pool.shape
        w = w_store * wdiv
        n_kv = w // hd
    else:
        n_layers, n_pages, ps, n_kv, _ = k_pool.shape
        w = n_kv * hd
        w_store = w // wdiv
    rep = n_heads // n_kv
    m_dim = n_heads
    max_pages = page_table.shape[1]
    l_virt = max_pages * ps
    win = l_virt if window is None else min(int(window), l_virt)
    assert win % ps == 0, (win, ps)
    n_blocks = win // ps
    quantized = k_scale_l is not None
    paged_sc = bool(quantized) and k_scale_l.ndim == 4  # scale POOL form
    kv_int8 = bool(quantized) and k_pool.dtype in (jnp.int8, jnp.uint8)
    if kv_bits == 4:
        if not quantized or k_pool.ndim != 4:
            raise ValueError("packed int4 KV requires scaled flat pools")
        if (w // 2) % 128 != 0:
            raise ValueError(
                f"packed int4 KV needs (n_kv_heads*head_dim)/2 % 128 == 0, "
                f"got W={w}")
    sc_block = _scale_block(ps, win, quantized)

    qc, qs = _prep_q_compact(q, k_pool.dtype, kv_int8)
    if paged_sc:
        hp = k_scale_l.shape[2]
        ksr = k_scale_l.reshape(n_layers * n_pages, hp, ps)
        vsr = v_scale_l.reshape(n_layers * n_pages, hp, ps)
    else:
        ksr, vsr = _prep_scales(
            k_scale_l[:, :, :win] if quantized else None,
            v_scale_l[:, :, :win] if quantized else None,
            s_dim=s_dim, m_dim=m_dim, rep=rep, quantized=quantized,
            l_win=win)
    m_pad = _pad8(m_dim)  # scale rows are per-slot padded (see _pad8)

    kf = k_pool.reshape(n_layers * n_pages * ps, w_store)
    vf = v_pool.reshape(n_layers * n_pages * ps, w_store)
    scalars = jnp.concatenate([
        jnp.asarray([layer], jnp.int32).reshape(1),
        positions.astype(jnp.int32),
        page_table.astype(jnp.int32).reshape(-1),
    ])

    def kv_index(i, j, sref):
        # clamp to the slot's live page so dead-tail grid steps re-reference
        # the last live page (DMA elided) instead of re-fetching page 0
        live = jnp.maximum(sref[1 + i], 0) // ps
        page = sref[1 + s_dim + i * max_pages + jnp.minimum(j, live)]
        return (sref[0] * n_pages + page, 0)

    def sc_pool_index(i, j, sref):
        live = jnp.maximum(sref[1 + i], 0) // ps
        page = sref[1 + s_dim + i * max_pages + jnp.minimum(j, live)]
        return (sref[0] * n_pages + page, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_dim, n_blocks),
        in_specs=[
            pl.BlockSpec((1, m_dim, hd), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # q compact
            pl.BlockSpec((1, m_dim, 1), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),           # q scales
            pl.BlockSpec((ps, w_store), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((ps, w_store), kv_index, memory_space=pltpu.VMEM),
            (pl.BlockSpec((1, hp, ps), sc_pool_index,
                          memory_space=pltpu.VMEM) if paged_sc else
             pl.BlockSpec((m_pad, sc_block if quantized else 1),
                          _paged_sc_index(s_dim, ps, sc_block, quantized),
                          memory_space=pltpu.VMEM)),         # K scales
            (pl.BlockSpec((1, hp, ps), sc_pool_index,
                          memory_space=pltpu.VMEM) if paged_sc else
             pl.BlockSpec((m_pad, sc_block if quantized else 1),
                          _paged_sc_index(s_dim, ps, sc_block, quantized),
                          memory_space=pltpu.VMEM)),         # V scales
        ],
        out_specs=pl.BlockSpec((1, m_dim, hd), lambda i, j, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m_dim, 1), jnp.float32),
            pltpu.VMEM((m_dim, 1), jnp.float32),
            pltpu.VMEM((m_dim, w), jnp.float32),
            pltpu.VMEM((m_dim, w), qc.dtype),      # in-VMEM Q_wide
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _wide_kernel, block_l=ps, n_kv=n_kv, rep=rep, hd=hd,
            kv_int8=kv_int8, quantized=quantized, pos_base=1,
            sc_block=sc_block, inline_qw=True, kv_bits=kv_bits,
            paged_sc=paged_sc,
        ),
        out_shape=jax.ShapeDtypeStruct((s_dim, m_dim, hd), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            # both "arbitrary": v5e has one TensorCore, so "parallel" buys
            # nothing, and a single sequential grid keeps one continuous
            # double-buffered DMA pipeline across slots
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=bool(interpret),
    )(scalars, qc, qs, kf, vf, ksr, vsr)
    return out


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
