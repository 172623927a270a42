#!/usr/bin/env python3
"""TRUE per-kernel HBM rates with the relay's dispatch latency removed.

Round-5 discovery (.r5 logs + scripts/scan_overhead.py): every jitted
dispatch on this relay costs ~25 ms of pure round-trip latency, and
fetching more than a scalar pays a ~100x-slower download path. Every
previous "measured peak" (297 GB/s) and per-step number carried that tax:
a latency-corrected long-chain probe streams at ~750 GB/s — near the
819 GB/s v5e spec. This script is the canonical instrument going forward:

  * every mode is a DEEP on-device chain (lax.scan, output feeds input)
    so per-iteration device time dominates the fixed dispatch cost;
  * the fence fetches ONE scalar;
  * an empty-ish jit measures the round trip in the same session and is
    subtracted; rates are reported both naive and corrected;
  * modes interleave across rounds (same-weather ratios).

Modes: qmatmul int4/int8 (block variants), decode-attention wide kernel
kv8/kv4 (one layer, full window), XLA-attention control.

Usage: python scripts/kernel_rates.py
Env: TPUSERVE_KR_MODES, TPUSERVE_KR_ROUNDS (4), TPUSERVE_KR_DEPTH_MM (256),
     TPUSERVE_KR_DEPTH_ATTN (48)
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

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.ops import decode_attention as da
from tpuserve.ops.quant_matmul import quant_matmul
from tpuserve.quant.core import quantize

S, L, DIM = 64, 256, 4096
P7B = LlamaParams.llama2_7b()


def measure_rt(reps: int = 6) -> float:
    """Round-trip latency of a near-empty dispatch + scalar fetch."""
    x = jnp.zeros((8, 128), jnp.float32)
    j = jax.jit(lambda x: jnp.sum(x) + 1.0)
    s = j(x)
    np.asarray(s)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        s = j(x + s)
        np.asarray(s)
        best = min(best, time.perf_counter() - t0)
    return best


def build_qmm(bits, bk, bn, depth, act8=False):
    import dataclasses

    rng = np.random.default_rng(0)
    w = rng.standard_normal((DIM, DIM), np.float32) * 0.02
    qt = jax.tree_util.tree_map(
        jax.device_put, quantize(jnp.asarray(w, jnp.float32), bits=bits,
                                 group_size=128))
    if act8:
        qt = dataclasses.replace(qt, act_bits=8)
    x0 = jnp.asarray(rng.standard_normal((S, DIM)) * 0.1, jnp.bfloat16)

    def chain(x, qt):
        def body(x, _):
            y = quant_matmul(x, qt, block_k=bk, block_n=bn,
                             out_dtype=jnp.bfloat16)
            y = y * jax.lax.rsqrt(
                jnp.mean(y.astype(jnp.float32) ** 2, -1, keepdims=True)
                + 1e-6).astype(jnp.bfloat16)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=depth)
        return y, jnp.sum(y.astype(jnp.float32))

    return jax.jit(chain), (x0, qt), qt.q.size * qt.q.dtype.itemsize, depth


def build_attn(kv_bits, depth, path="pallas"):
    """One 7B layer's decode attention over a full [S, L] window; q chains
    from the previous output."""
    p = P7B
    rng = np.random.default_rng(1)
    flat = True
    cache = KVCache.create(p, S, L, quantized=True, flat=flat,
                           scale_dtype=jnp.bfloat16, kv_bits=kv_bits)
    # fill with noise so scales are non-degenerate
    if cache.k.dtype == jnp.uint8:
        k_noise = rng.integers(0, 255, cache.k.shape, dtype=np.uint8)
    else:
        k_noise = rng.integers(-127, 127, cache.k.shape).astype(
            np.dtype(cache.k.dtype))
    cache = KVCache(
        k=jnp.asarray(k_noise), v=cache.v,
        k_scale=cache.k_scale + 0.01, v_scale=cache.v_scale + 0.01,
        flat=cache.flat, pack_chunks=cache.pack_chunks)
    positions = jnp.asarray(np.full((S,), L - 2, np.int32))
    q0 = jnp.asarray(rng.standard_normal((S, p.n_heads, p.head_dim)) * 0.1,
                     jnp.float32)
    kb = cache.k.size * cache.k.dtype.itemsize // p.n_layers

    def chain(q, cache, positions):
        def body(q, _):
            out = da.decode_attention_wide_cache(
                q, cache.k, cache.v,
                cache.k_scale[0], cache.v_scale[0], positions, 0,
                window=L, interpret=False)
            q = (out * jax.lax.rsqrt(
                jnp.mean(out ** 2, axis=(1, 2), keepdims=True) + 1e-6))
            return q, ()
        q, _ = jax.lax.scan(body, q, None, length=depth)
        return q, jnp.sum(q)

    return jax.jit(chain), (q0, cache, positions), 2 * kb, depth


def main():
    rounds = int(os.environ.get("TPUSERVE_KR_ROUNDS", "4"))
    dmm = int(os.environ.get("TPUSERVE_KR_DEPTH_MM", "1024"))
    datt = int(os.environ.get("TPUSERVE_KR_DEPTH_ATTN", "96"))
    # TWO depths per mode; the reported rate is the SLOPE
    # bytes*(d2-d1)/(t2-t1), which cancels the dispatch round trip exactly
    # (the RT wanders 25-48 ms minute to minute — subtracting a separately
    # measured RT went unstable the moment weather shifted)
    builders = {
        "qmm_int4_auto": lambda d: build_qmm(4, None, None, d),
        "qmm_int4_bk512": lambda d: build_qmm(4, 512, 4096, d),
        "qmm_int4_a8": lambda d: build_qmm(4, None, None, d, act8=True),
        "qmm_int4_a8_bk512": lambda d: build_qmm(4, 512, 4096, d, act8=True),
        "qmm_int8_auto": lambda d: build_qmm(8, None, None, d),
        "attn_kv8": lambda d: build_attn(8, d),
        "attn_kv4": lambda d: build_attn(4, d),
    }
    names = os.environ.get("TPUSERVE_KR_MODES", ",".join(builders)).split(",")

    rt = measure_rt()
    print(f"# dispatch+fetch round trip: {rt*1e3:.2f} ms", flush=True)

    states = {}
    for name in names:
        depths = (datt // 4, datt) if name.startswith("attn") else \
            (dmm // 4, dmm)
        legs = []
        try:
            for d in depths:
                j, args, bytes_per, _ = builders[name](d)
                t0 = time.perf_counter()
                out, s = j(*args)
                np.asarray(s)
                print(f"# compiled {name}@d{d} in {time.perf_counter()-t0:.0f}s",
                      flush=True)
                legs.append([j, args, out, d, []])
        except Exception as e:
            print(f"{name:16s} FAIL {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
            continue
        states[name] = (bytes_per, legs)

    for r in range(rounds):
        for name, (bytes_per, legs) in states.items():
            for leg in legs:
                j, args, out, d, times = leg
                t0 = time.perf_counter()
                out2, s = j(out, *args[1:])
                np.asarray(s)
                times.append(time.perf_counter() - t0)
                leg[2] = out2

    rt2 = measure_rt()
    print(f"# round trip (post): {rt2*1e3:.2f} ms\n", flush=True)
    for name, (bytes_per, legs) in states.items():
        (j1, a1, o1, d1, t1), (j2, a2, o2, d2, t2) = legs
        b1, b2 = min(t1), min(t2)
        dt = b2 - b1
        rate = bytes_per * (d2 - d1) / max(dt, 1e-9) / 1e9
        per_iter = dt / (d2 - d1)
        print(f"{name:16s} d{d1}:{b1*1e3:8.2f} ms  d{d2}:{b2*1e3:8.2f} ms  "
              f"{bytes_per/1e6:6.1f} MB/iter  {per_iter*1e6:7.1f} us/iter  "
              f"slope {rate:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
