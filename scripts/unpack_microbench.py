#!/usr/bin/env python3
"""Isolate the int4 nibble-unpack VPU tax (VERDICT r4 #2).

The int4-KV decode kernel runs at ~73% of the measured byte roofline while
int8 sits at ~100%; the working theory is that the per-byte VPU work
(widen-to-i32, &15, >>4, two narrowing casts) makes the half-size int4
stream COMPUTE-bound. This microbench streams an identical packed uint8
array through Pallas kernels that differ ONLY in per-block compute:

  stream_raw      widen + reduce-sum                  (DMA floor, ~1 op/byte)
  dot_raw         one int8 MXU dot vs the raw bytes   (MXU floor, 0 VPU ops)
  unpack_cur      the production sequence: i32 widen, &15, >>4, 2 narrows,
                  2 MXU dots + rowsum bias fold       (what decode pays)
  unpack_hi       candidate: signed-hi packing makes the raw byte directly
                  dottable (b_s = 16*h + l exactly); only h = b_s >>a 4 is
                  materialized (widen, sar, narrow) and the lo-dot is
                  recovered algebraically with a 3rd dot — 3 VPU passes
                  instead of 5
  unpack_i8       candidate: &15 / >>4 issued at int8 width (no i32
                  detour) — 4x lane throughput IF Mosaic accepts it

Rates are GB/s of packed bytes streamed; (unpack_cur - stream_raw) is the
tax, and the candidates bound what a kernel rewrite could recover. Timing
per CLAUDE.md: chained seeds through a scalar-prefetch operand, np.asarray
fence, best-of-N.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

M = 32          # query rows per dot (matches Q_wide row count at 7B bs-slot)
W2 = 2048       # packed lane width = 7B W/2
BLR = 256       # rows per block: [256, 2048] uint8 = 512 KB blocks
N_ROWS = 262144 # 0.537 GB packed stream (~ the per-step KV int4 bytes/4)


def _k_stream_raw(seed_ref, q_ref, x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    b = x_ref[...].astype(jnp.int32)
    o_ref[0, 0] += jnp.sum(b).astype(jnp.float32) + seed_ref[0].astype(jnp.float32)


def _k_dot_raw(seed_ref, q_ref, x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    b = x_ref[...]
    q = q_ref[...]
    s = jax.lax.dot_general(q, b, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)  # [M, BLR]
    o_ref[...] += s[:, :128].astype(jnp.float32) + seed_ref[0].astype(jnp.float32)


def _k_unpack_cur(seed_ref, q_ref, x_ref, o_ref):
    # the production _unpack_nibbles(biased=True) sequence + bias fold
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    p32 = x_ref[...].astype(jnp.int32)
    lo = (p32 & 15).astype(jnp.int8)
    hi = (p32 >> 4).astype(jnp.int8)
    q = q_ref[...]
    qsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)
    s = (jax.lax.dot_general(q, lo, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
         + jax.lax.dot_general(q, hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
         - 8 * qsum)
    o_ref[...] += s[:, :128].astype(jnp.float32) + seed_ref[0].astype(jnp.float32)


def _k_unpack_hi(seed_ref, q_ref, x_ref, o_ref):
    # signed-hi packing: byte = 16*h + l with h in [-8,7], l in [0,15], so
    # the int8 bitcast IS 16h+l and is directly MXU-dottable. Materialize
    # only h (widen, arithmetic >>4, narrow); recover the lo dot:
    #   q_lo.(l-8) + q_hi.h = q_lo.b_s - 16*(q_lo.h) + q_hi.h - 8*sum(q_lo)
    # => dots: q_lo.b_s, q_lo.h, q_hi.h  (3 dots, 3 VPU passes)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    bs = x_ref[...]  # int8 view: the free bitcast under signed-hi packing
    h = (bs.astype(jnp.int32) >> 4).astype(jnp.int8)
    q = q_ref[...]
    qsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)
    d_b = jax.lax.dot_general(q, bs, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    d_h = jax.lax.dot_general(q, h, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    # q doubles as both q_lo and q_hi here (rate microbench, not accuracy)
    s = d_b - 16 * d_h + d_h - 8 * qsum
    o_ref[...] += s[:, :128].astype(jnp.float32) + seed_ref[0].astype(jnp.float32)


def _k_unpack_i8(seed_ref, q_ref, x_ref, o_ref):
    # nibble ops issued at 8-bit width — no i32 detour (may not compile)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    b = x_ref[...]
    lo = b & jnp.int8(15)
    hi = b >> jnp.int8(4)
    q = q_ref[...]
    qsum = jnp.sum(q.astype(jnp.int32), axis=1, keepdims=True)
    s = (jax.lax.dot_general(q, lo, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
         + jax.lax.dot_general(q, hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.int32)
         - 8 * qsum)
    o_ref[...] += s[:, :128].astype(jnp.float32) + seed_ref[0].astype(jnp.float32)


KERNELS = {
    "stream_raw": _k_stream_raw,
    "dot_raw": _k_dot_raw,
    "unpack_cur": _k_unpack_cur,
    "unpack_hi": _k_unpack_hi,
    "unpack_i8": _k_unpack_i8,
}


def build(name):
    kern = KERNELS[name]
    grid = (N_ROWS // BLR,)

    def call(x, q, seed):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((M, W2), lambda i, *_: (0, 0)),
                    pl.BlockSpec((BLR, W2), lambda i, *_: (i, 0)),
                ],
                out_specs=pl.BlockSpec((M, 128), lambda i, *_: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((M, 128), jnp.float32),
        )(seed, q, x)

    def loop(x, q, s0, n=4):
        def body(s, _):
            out = call(x, q, s)
            return (out[0:1, 0].astype(jnp.int32) % 3), out
        s, outs = jax.lax.scan(body, s0, None, length=n)
        return s, outs

    return jax.jit(loop)


def main():
    rng = np.random.default_rng(0)
    # int8 stream (bitcast-equivalent of the packed uint8 cache; identical
    # instruction mix for every variant — values only feed the chain seed)
    x = jnp.asarray(rng.integers(-128, 128, (N_ROWS, W2), dtype=np.int8))
    q = jnp.asarray(rng.integers(-8, 8, (M, W2), dtype=np.int8))
    nbytes = x.size
    names = os.environ.get("TPUSERVE_UNPACK_MODES",
                           ",".join(KERNELS)).split(",")
    n_chain = 4
    results = {}
    for name in names:
        try:
            j = build(name)
            t0 = time.perf_counter()
            s, _ = j(x, q, jnp.zeros((1,), jnp.int32))
            np.asarray(s)
            compile_s = time.perf_counter() - t0
        except Exception as e:  # Mosaic rejection is a result, not a crash
            print(f"{name:12s} COMPILE-FAIL: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            results[name] = None
            continue
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            s, _ = j(x, q, s % 2)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        per = best / n_chain
        rate = nbytes / per / 1e9
        results[name] = rate
        print(f"{name:12s} {per*1e3:8.2f} ms/pass {rate:7.1f} GB/s packed-bytes"
              f" (compile {compile_s:.0f}s)", flush=True)
    if results.get("stream_raw") and results.get("unpack_cur"):
        r0, rc = results["stream_raw"], results["unpack_cur"]
        print(f"# unpack tax: {r0:.0f} -> {rc:.0f} GB/s "
              f"({100*(1-rc/r0):.0f}% of stream rate lost)", flush=True)


if __name__ == "__main__":
    main()
