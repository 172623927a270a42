#!/usr/bin/env python3
"""Measure the fused dequant+matmul kernel's delivered rate the way decode
actually runs it: a CHAIN of matmuls feeding each other (32 iterations of
x = qmm(x, W) on [64, 4096] x [4096, 4096], like a layer stack), so
per-call overheads pipeline exactly as in the decode graph.

Round-5 context: the decode step floor (~27 ms at 7B bs64) is the weights
phase (.r5_ab_seq128.log — step time nearly independent of KV bytes), and
a first scalar-chained sweep measured ~3 ms per matmul call REGARDLESS of
shape (8 MB and 45 MB both ~3 ms) — fixed per-call cost dominated that
harness. This one chains through real outputs.

Modes: int4/int8 kernel at several (block_k, block_n), plus an XLA
control (x @ dequant(W) via plain jnp ops — what GSPMD would do).

Usage: python scripts/qmatmul_sweep.py
Env: TPUSERVE_QMM_B (64), TPUSERVE_QMM_ROUNDS (5), TPUSERVE_QMM_DEPTH (32)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpuserve.ops.quant_matmul import quant_matmul
from tpuserve.quant.core import QTensor, quantize

GS = 128
K = N = 4096


def main():
    b = int(os.environ.get("TPUSERVE_QMM_B", "64"))
    rounds = int(os.environ.get("TPUSERVE_QMM_ROUNDS", "5"))
    depth = int(os.environ.get("TPUSERVE_QMM_DEPTH", "32"))

    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N), np.float32).astype(np.float32) * 0.02
    qt4 = jax.tree_util.tree_map(jax.device_put,
                                 quantize(jnp.asarray(w), bits=4, group_size=GS))
    qt8 = jax.tree_util.tree_map(jax.device_put,
                                 quantize(jnp.asarray(w), bits=8, group_size=GS))
    x0 = jnp.asarray(rng.standard_normal((b, K)).astype(np.float32) * 0.1,
                     jnp.bfloat16)
    by4 = qt4.q.size * qt4.q.dtype.itemsize
    by8 = qt8.q.size * qt8.q.dtype.itemsize
    print(f"# b={b} {K}x{N} gs={GS} depth={depth}: int4 {by4/1e6:.1f} MB, "
          f"int8 {by8/1e6:.1f} MB per matmul", flush=True)

    modes = {}

    def add_kernel_mode(name, qt, bk, bn):
        def chain(x, qt):
            def body(x, _):
                y = quant_matmul(x, qt, block_k=bk, block_n=bn,
                                 out_dtype=jnp.bfloat16)
                # normalize so 32 chained matmuls don't overflow bf16
                y = y * jax.lax.rsqrt(jnp.mean(y.astype(jnp.float32) ** 2,
                                               axis=-1, keepdims=True)
                                      + 1e-6).astype(jnp.bfloat16)
                return y, ()
            y, _ = jax.lax.scan(body, x, None, length=depth)
            return y
        modes[name] = (jax.jit(chain), qt)

    add_kernel_mode("int4/auto", qt4, None, None)
    add_kernel_mode("int4/bk256", qt4, 256, 4096)
    add_kernel_mode("int4/bk512", qt4, 512, 4096)
    add_kernel_mode("int4/bk1024", qt4, 1024, 4096)
    add_kernel_mode("int8/auto", qt8, None, None)
    add_kernel_mode("int8/bk512", qt8, 512, 4096)

    def xla_chain_4(x, qt):
        # XLA control: dequant + bf16 dot, per int4 split-half convention
        def body(x, _):
            half = qt.q.astype(jnp.int32)
            lo = ((half & 15) - 8).astype(jnp.bfloat16)
            hi = ((half >> 4) - 8).astype(jnp.bfloat16)
            wd = jnp.concatenate(
                [lo.reshape(K // GS, GS // 2, N), hi.reshape(K // GS, GS // 2, N)],
                axis=1).reshape(K, N)
            wd = wd * qt.scale.astype(jnp.bfloat16).repeat(GS, axis=0)
            y = jnp.dot(x, wd, preferred_element_type=jnp.float32)
            y = (y * jax.lax.rsqrt(jnp.mean(y ** 2, -1, keepdims=True) + 1e-6)
                 ).astype(jnp.bfloat16)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=depth)
        return y

    modes["int4/xla"] = (jax.jit(xla_chain_4), qt4)

    states = {}
    for name, (j, qt) in modes.items():
        try:
            t0 = time.perf_counter()
            y = j(x0, qt)
            np.asarray(y)
            print(f"# compiled {name} in {time.perf_counter()-t0:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"{name:14s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        states[name] = [j, qt, y, []]

    for r in range(rounds):
        for name, st in states.items():
            j, qt, y, times = st
            t0 = time.perf_counter()
            y = j(y, qt)  # chain across calls too
            np.asarray(y)
            times.append((time.perf_counter() - t0) / depth)
            st[2] = y

    print(f"\n# per-matmul best of {rounds} (packed-W GB/s)", flush=True)
    for name, (j, qt, y, times) in states.items():
        best = min(times)
        wb = qt.q.size * qt.q.dtype.itemsize
        print(f"{name:14s} {best*1e6:8.1f} us  {wb/best/1e9:6.1f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
