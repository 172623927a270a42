"""Measure the chip's true achievable HBM streaming bandwidth with
data-dependency-chained, host-fenced timing (per CLAUDE.md methodology)."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np

N_ROWS, W = 524288, 4096           # 2.147 GB int8
x = jnp.ones((N_ROWS, W), jnp.int8)
ones = jnp.ones((128, W), jnp.int8)

def rowsum_dot(x, seed):
    # [128, W] x [W, N_ROWS] int8 MXU dot streams x once
    r = jax.lax.dot_general(ones, x + seed.astype(jnp.int8), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return r[:, ::4096].sum().astype(jnp.int32)

def reduce_sum(x, seed):
    return (x + seed.astype(jnp.int8)).astype(jnp.int32).sum()

def reduce_max(x, seed):
    return (x + seed.astype(jnp.int8)).max().astype(jnp.int32)

for name, fn, bytes_per in [("dot_rowsum", rowsum_dot, x.size),
                            ("reduce_max", reduce_max, x.size),
                            ("reduce_sum", reduce_sum, x.size)]:
    def loop(x, s0, n=8):
        def body(s, _):
            return s + fn(x, s % 2), ()
        s, _ = jax.lax.scan(body, s0, None, length=n)
        return s
    j = jax.jit(loop)
    t0 = time.perf_counter()
    out = j(x, jnp.int32(0)); np.asarray(out)
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = j(x, out % 3)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    per = best / 8
    print(f"{name:12s} {per*1e3:8.2f} ms/pass {bytes_per/per/1e9:7.1f} GB/s (compile {compile_s:.0f}s)", flush=True)

# Measured 2026-08-17 on the relayed v5e chip (best of 4, 8-pass chains):
#   dot_rowsum   8.67 ms/pass  247.6 GB/s
#   reduce_max   7.24 ms/pass  296.8 GB/s
#   reduce_sum   7.39 ms/pass  290.5 GB/s
# The v5e spec (819 GB/s) is not reachable by ANY code on this chip/relay;
# bench.py therefore uses its own in-process measurement as the roofline
# denominator and reports the spec-based number alongside.
