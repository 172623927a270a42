#!/usr/bin/env python3
"""Isolate per-iteration overhead of lax.scan vs an unrolled op chain on
this relay (round-5: a 32-deep chained qmatmul scan measured ~1.22 ms per
iteration REGARDLESS of implementation or byte count — int4, int8 at 2x
bytes, and an XLA dequant control all identical — while the chip's raw
stream probed 373 GB/s in the same hour; .r5_qmm_chain.log)."""

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
from tpuserve.quant.core import quantize

K = N = 4096
DEPTH = 32


def body(x, qt):
    y = quant_matmul(x, qt, out_dtype=jnp.bfloat16)
    return y * jax.lax.rsqrt(
        jnp.mean(y.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-6
    ).astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((K, N), np.float32) * 0.02
    qt = jax.tree_util.tree_map(
        jax.device_put, quantize(jnp.asarray(w, jnp.float32), bits=4,
                                 group_size=128))
    x0 = jnp.asarray(rng.standard_normal((64, K)) * 0.1, jnp.bfloat16)

    def chain_scan(x, qt):
        def f(x, _):
            return body(x, qt), ()
        y, _ = jax.lax.scan(f, x, None, length=DEPTH)
        return y

    def chain_unroll(x, qt):
        for _ in range(DEPTH):
            x = body(x, qt)
        return x

    # bare elementwise scan: zero weight bytes — pure per-iteration floor
    def ew_scan(x, qt):
        def f(x, _):
            return x + jnp.float32(1).astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(f, x, None, length=DEPTH)
        return y

    # the round-5 harness bug this script previously had: np.asarray(y) of
    # the full [64, 4096] output every timed call — the RELAY'S DOWNLOAD
    # path is ~100x slower than device HBM, so every mode measured the
    # fetch (~2 ms), not the compute. The fence must fetch a SCALAR (the
    # jitted fn reduces the output itself).
    for name, fn in [("qmm_scan", chain_scan), ("qmm_unroll", chain_unroll),
                     ("elementwise_scan", ew_scan)]:
        def wrapped(x, qt, fn=fn):
            y = fn(x, qt)
            return y, jnp.sum(y.astype(jnp.float32))

        j = jax.jit(wrapped)
        t0 = time.perf_counter()
        y, s = j(x0, qt)
        np.asarray(s)
        print(f"# compiled {name} in {time.perf_counter()-t0:.0f}s",
              flush=True)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            y, s = j(y, qt)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        per = best / DEPTH
        print(f"{name:18s} {per*1e6:8.1f} us/iter "
              f"({qt.q.size/per/1e9:6.1f} GB/s weight-equiv)", flush=True)


if __name__ == "__main__":
    main()
