"""Fused GQA decode attention over the (optionally INT8) KV cache.

XLA lowers the decode-attention einsums to S*Hkv batched [rep,hd]x[hd,L]
gemms — hundreds of minimum-tile MXU ops per layer, which measured as the
dominant cost of a decode step. This kernel does the whole thing in one
pallas_call per layer:

  grid (S, L/block_l), L minor. Each step DMAs one slot's K/V block
  (int8 or bf16) into VMEM, runs one MXU dot per kv-head, applies the
  dequant scales to the logits/probabilities (O(L) — scales are per
  (pos, head)), and maintains flash-attention online-softmax state
  (running max / sum / weighted accumulator) in VMEM scratch across the
  L walk. Inactive slots (position < 0) produce zeros.

Inputs (tpuserve/models/llama.py cache layout):
  q        [S, H, hd]      bf16/f32, already scaled by 1/sqrt(hd)
  k, v     [S, L, Hkv, hd] int8 (quantized) or bf16
  k_scale, v_scale [S, Hkv, L] f32 (transposed from cache layout; None if
                                    unquantized)
  positions [S] int32 — last valid cache index per slot; -1 = inactive
Returns [S, H, hd] f32.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref,
            m_ref, l_ref, acc_ref, *, n_kv, rep, hd, block_l, quantized):
    i = pl.program_id(0)
    j = pl.program_id(1)
    lb0 = j * block_l
    pos = pos_ref[i]  # scalar-prefetched positions [S]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # lane index along this L block; valid up to the slot's position
    lidx = lb0 + jax.lax.broadcasted_iota(jnp.int32, (1, block_l), 1)
    valid = lidx <= pos  # [1, block_l]; all-false for pos < 0

    for h in range(n_kv):
        qh = q_ref[0, h * rep : (h + 1) * rep, :].astype(jnp.bfloat16)  # [rep, hd]
        kh = k_ref[0, :, h, :].astype(jnp.bfloat16)  # [block_l, hd]
        vh = v_ref[0, :, h, :].astype(jnp.bfloat16)

        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [rep, block_l]
        if quantized:
            s = s * ks_ref[0, h, :][None, :]
        s = jnp.where(valid, s, _NEG_INF)

        m_old = m_ref[h * rep : (h + 1) * rep, 0:1]  # [rep, 1]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        # guard fully-masked rows: keep exp argument finite
        m_safe = jnp.maximum(m_new, _NEG_INF / 2)
        p = jnp.exp(s - m_safe)  # [rep, block_l]; 0 where masked
        p = jnp.where(valid, p, 0.0)
        corr = jnp.exp(m_old - m_safe)  # [rep, 1]

        l_old = l_ref[h * rep : (h + 1) * rep, 0:1]
        l_ref[h * rep : (h + 1) * rep, 0:1] = l_old * corr + jnp.sum(p, axis=1, keepdims=True)
        m_ref[h * rep : (h + 1) * rep, 0:1] = m_new

        pv = p * vs_ref[0, h, :][None, :] if quantized else p
        part = jax.lax.dot_general(
            pv.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rep, hd]
        acc_old = acc_ref[h * rep : (h + 1) * rep, :]
        acc_ref[h * rep : (h + 1) * rep, :] = acc_old * corr + part

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        l_all = l_ref[:, 0:1]
        o_ref[0, :, :] = jnp.where(l_all > 0, acc_ref[:] / jnp.maximum(l_all, 1e-20), 0.0)


@functools.partial(jax.jit, static_argnames=("block_l", "interpret"))
def _decode_attention_impl(q, k, v, k_scale, v_scale, positions, *, block_l, interpret):
    s_dim, n_heads, hd = q.shape
    _, l_max, n_kv, _ = k.shape
    rep = n_heads // n_kv
    quantized = k_scale is not None
    grid = (s_dim, l_max // block_l)

    if not quantized:  # feed dummies so the kernel signature is stable
        k_scale = jnp.zeros((s_dim, n_kv, l_max), jnp.float32)
        v_scale = k_scale

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # positions [S] land in SMEM before the body
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_heads, hd), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n_kv, hd), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n_kv, hd), lambda i, j, *_: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, block_l), lambda i, j, *_: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_kv, block_l), lambda i, j, *_: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_heads, hd), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_heads, 1), jnp.float32),  # running max
            pltpu.VMEM((n_heads, 1), jnp.float32),  # running sum
            pltpu.VMEM((n_heads, hd), jnp.float32),  # output accumulator
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, n_kv=n_kv, rep=rep, hd=hd, block_l=block_l, quantized=quantized
        ),
        out_shape=jax.ShapeDtypeStruct((s_dim, n_heads, hd), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(positions.astype(jnp.int32), q, k, v, k_scale, v_scale)


def decode_attention(
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
    """See module docstring. k_scale/v_scale use the CACHE layout
    [S, L, Hkv]; they are transposed to [S, Hkv, L] here (tiny)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    l_max = k.shape[1]
    block_l = min(block_l, l_max)
    if l_max % block_l != 0:
        raise ValueError(f"L={l_max} not divisible by block_l={block_l}")
    ks = None if k_scale is None else jnp.transpose(k_scale, (0, 2, 1))
    vs = None if v_scale is None else jnp.transpose(v_scale, (0, 2, 1))
    return _decode_attention_impl(
        q, k, v, ks, vs, positions, block_l=block_l, interpret=bool(interpret)
    )
