"""One-process sweep of decode-attention kernel variants on the TPU.

The remote compile relay has minutes-scale queueing variance, so every
variant compiles+measures inside ONE process, and a pure-DMA pallas
"copy" kernel bounds the achievable bandwidth for this access pattern.

  python scripts/sweep_attention.py            # default sweep
  TPUSERVE_SWEEP=dma,g16,g32 ...               # pick variants
"""

import functools
import math
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

S, L, HKV, REP, HD = 64, 256, 32, 1, 128
ITERS = 30


def setup():
    rng = np.random.default_rng(0)
    h = HKV * REP
    q = jnp.asarray(rng.normal(size=(S, h, HD)).astype(np.float32) / math.sqrt(HD),
                    jnp.bfloat16)
    k = jnp.asarray(rng.integers(-127, 127, size=(S, L, HKV, HD)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 127, size=(S, L, HKV, HD)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, size=(S, L, HKV)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, size=(S, L, HKV)), jnp.float32)
    positions = jnp.asarray(np.full((S,), L - 1, np.int32))
    return q, k, v, ks, vs, positions


def timed(name, loop_fn, nbytes):
    try:
        t0 = time.perf_counter()
        out = loop_fn()
        np.asarray(out)
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop_fn()
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        per = best / ITERS
        print(f"{name:24s} {per*1e6:9.1f} us/it {nbytes/per/1e9:7.1f} GB/s "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception as e:
        print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


def dma_bound(k, v):
    """Pure-stream ceiling: flat contiguous blocks, trivial compute."""
    kf = k.reshape(S, L * HKV, HD)
    vf = v.reshape(S, L * HKV, HD)
    bl = 256

    def kern(k_ref, v_ref, o_ref):
        o_ref[0, :] = (k_ref[0, 0, :].astype(jnp.int32)
                       + v_ref[0, 0, :].astype(jnp.int32))

    def call(kf, vf):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, HD), jnp.int32),
            grid=(S, L // bl),
            in_specs=[
                pl.BlockSpec((1, bl * HKV, HD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bl * HKV, HD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, HD), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(kf, vf)

    @jax.jit
    def loop(kf, vf):
        def body(c, _):
            out = call(kf, vf)
            return c + out[0, 0], ()
        out, _ = jax.lax.scan(body, jnp.int32(0), None, length=ITERS)
        return out

    return lambda: loop(kf, vf)


def attn_variant(q, k, v, ks, vs, positions, *, g_kv, block_l, dynskip):
    from tpuserve.ops import decode_attention as da

    os.environ["TPUSERVE_ATTN_DYNSKIP"] = "1" if dynskip else "0"

    def call(q, k, v, ks, vs, positions):
        return da.decode_attention(q, k, v, ks, vs, positions,
                                   block_l=block_l, g_kv=g_kv)

    @jax.jit
    def loop(q, k, v, ks, vs, positions):
        def body(carry, _):
            out = call(carry, k, v, ks, vs, positions)
            nxt = (carry + 1e-6 * out.astype(carry.dtype)).astype(carry.dtype)
            return nxt, ()
        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return out

    return lambda: loop(q, k, v, ks, vs, positions)


def main():
    q, k, v, ks, vs, positions = setup()
    nbytes = (k.nbytes + v.nbytes + ks.nbytes + vs.nbytes) * ITERS
    which = os.environ.get(
        "TPUSERVE_SWEEP", "dma,g16s,g32s,g16d,g16s_bl128,g32s_bl128").split(",")
    print(f"# KV {2*k.nbytes/1e6:.0f} MB + scales, iters={ITERS}", flush=True)
    if "dma" in which:
        timed("dma_ceiling", dma_bound(k, v), (k.nbytes + v.nbytes) * ITERS)
    variants = {
        "g16s": dict(g_kv=16, block_l=256, dynskip=False),
        "g32s": dict(g_kv=32, block_l=256, dynskip=False),
        "g8s": dict(g_kv=8, block_l=256, dynskip=False),
        "g16d": dict(g_kv=16, block_l=256, dynskip=True),
        "g32d": dict(g_kv=32, block_l=256, dynskip=True),
        "g16s_bl128": dict(g_kv=16, block_l=128, dynskip=False),
        "g32s_bl128": dict(g_kv=32, block_l=128, dynskip=False),
        "g16s_bl64": dict(g_kv=16, block_l=64, dynskip=False),
    }
    for name in which:
        if name in ("dma",) or name not in variants:
            continue
        cfg = variants[name]
        timed(name, attn_variant(q, k, v, ks, vs, positions, **cfg), nbytes)


if __name__ == "__main__":
    main()
