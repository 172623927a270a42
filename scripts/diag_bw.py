"""HBM bandwidth diagnostics for the decode-attention access pattern.

Modes (pick with --mode, comma-separated):
  xsum     — XLA jnp.sum over the int8 KV arrays (raw streaming ceiling)
  pcopy    — pallas DMA-only reduction with CONTIGUOUS [1, R, hd] blocks
  pcopy4d  — same but 4-D strided blocks (1, block_l, G, hd), like the
             attention kernel's per-head-group slices
  pdyn     — pcopy with the scalar-prefetch clamped index map (DMA-skip)

Each prints us/iter and effective GB/s. Timing: scan-chained, np.asarray
fence (CLAUDE.md methodology).
"""

import argparse
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


def timed(name, loop, nbytes, iters):
    t0 = time.perf_counter()
    out = loop()
    np.asarray(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    print(f"{name:10s} {per*1e6:9.1f} us/iter  {nbytes/per/1e9:7.1f} GB/s  "
          f"(compile {compile_s:.1f}s)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="xsum,pcopy,pcopy4d,pdyn")
    ap.add_argument("--s", type=int, default=64)
    ap.add_argument("--l", type=int, default=256)
    ap.add_argument("--n-kv", type=int, default=32)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--g", type=int, default=16)
    ap.add_argument("--block-l", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    s, l, n_kv, hd, g = args.s, args.l, args.n_kv, args.hd, args.g
    iters = args.iters

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-127, 127, size=(s, l, n_kv, hd)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 127, size=(s, l, n_kv, hd)), jnp.int8)
    nbytes = k.nbytes + v.nbytes
    positions = jnp.full((s,), l - 1, jnp.int32)
    print(f"# arrays 2x{k.nbytes/1e6:.0f} MB", flush=True)
    modes = args.mode.split(",")

    if "xsum" in modes:
        @jax.jit
        def xsum_loop(k, v):
            def body(carry, _):
                acc = jnp.sum(k.astype(jnp.int32)) + jnp.sum(v.astype(jnp.int32))
                return carry + acc, ()
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return out
        timed("xsum", lambda: xsum_loop(k, v), nbytes * iters, iters)

    def copy_kernel(k_ref, v_ref, o_ref):
        # touch every byte, minimal compute: one row-sum into the output
        o_ref[0, :] = (jnp.sum(k_ref[...].reshape(-1, hd).astype(jnp.int32), axis=0)
                       + jnp.sum(v_ref[...].reshape(-1, hd).astype(jnp.int32), axis=0))

    def make_pallas(block_spec_fn, grid, pos_arg):
        def call(k, v, positions):
            if pos_arg:
                gs = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=grid,
                    in_specs=block_spec_fn(),
                    out_specs=pl.BlockSpec((1, hd), lambda *a: (0, 0),
                                           memory_space=pltpu.VMEM),
                )
                return pl.pallas_call(
                    copy_kernel,
                    out_shape=jax.ShapeDtypeStruct((1, hd), jnp.int32),
                    grid_spec=gs,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",) * len(grid)),
                )(positions, k, v)
            return pl.pallas_call(
                copy_kernel,
                out_shape=jax.ShapeDtypeStruct((1, hd), jnp.int32),
                grid=grid,
                in_specs=block_spec_fn(),
                out_specs=pl.BlockSpec((1, hd), lambda *a: (0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",) * len(grid)),
            )(k, v)

        @jax.jit
        def loop(k, v, positions):
            def body(carry, _):
                out = call(k, v, positions)
                return carry + out[0, 0], ()
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return out
        return lambda: loop(k, v, positions)

    bl = args.block_l
    if "pcopy" in modes:
        # contiguous: flat [S, L*Hkv, hd], block (1, bl*n_kv, hd)
        kf = k.reshape(s, l * n_kv, hd)
        vf = v.reshape(s, l * n_kv, hd)

        def specs():
            return [
                pl.BlockSpec((1, bl * n_kv, hd), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bl * n_kv, hd), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ]

        def call_flat():
            @jax.jit
            def loop(kf, vf):
                def body(carry, _):
                    out = pl.pallas_call(
                        copy_kernel,
                        out_shape=jax.ShapeDtypeStruct((1, hd), jnp.int32),
                        grid=(s, l // bl),
                        in_specs=specs(),
                        out_specs=pl.BlockSpec((1, hd), lambda *a: (0, 0),
                                               memory_space=pltpu.VMEM),
                        compiler_params=pltpu.CompilerParams(
                            dimension_semantics=("arbitrary", "arbitrary")),
                    )(kf, vf)
                    return carry + out[0, 0], ()
                out, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
                return out
            return lambda: loop(kf, vf)
        timed("pcopy", call_flat(), nbytes * iters, iters)

    if "pcopy4d" in modes:
        def specs4d():
            return [
                pl.BlockSpec((1, bl, g, hd), lambda i, gi, j: (i, j, gi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bl, g, hd), lambda i, gi, j: (i, j, gi, 0),
                             memory_space=pltpu.VMEM),
            ]

        @jax.jit
        def loop4d(k, v):
            def body(carry, _):
                out = pl.pallas_call(
                    copy_kernel,
                    out_shape=jax.ShapeDtypeStruct((1, hd), jnp.int32),
                    grid=(s, n_kv // g, l // bl),
                    in_specs=specs4d(),
                    out_specs=pl.BlockSpec((1, hd), lambda *a: (0, 0),
                                           memory_space=pltpu.VMEM),
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",) * 3),
                )(k, v)
                return carry + out[0, 0], ()
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return out
        timed("pcopy4d", lambda: loop4d(k, v), nbytes * iters, iters)

    if "pdyn" in modes:
        def specs_dyn():
            def kv_index(i, j, pos_ref):
                live = jnp.maximum(pos_ref[i], 0) // bl
                return (i, jnp.minimum(j, live), 0)
            return [
                pl.BlockSpec((1, bl * n_kv, hd), kv_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bl * n_kv, hd), kv_index, memory_space=pltpu.VMEM),
            ]
        kf = k.reshape(s, l * n_kv, hd)
        vf = v.reshape(s, l * n_kv, hd)

        @jax.jit
        def loop_dyn(kf, vf, positions):
            def body(carry, _):
                gs = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1, grid=(s, l // bl),
                    in_specs=specs_dyn(),
                    out_specs=pl.BlockSpec((1, hd), lambda *a: (0, 0),
                                           memory_space=pltpu.VMEM),
                )
                out = pl.pallas_call(
                    copy_kernel,
                    out_shape=jax.ShapeDtypeStruct((1, hd), jnp.int32),
                    grid_spec=gs,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary", "arbitrary")),
                )(positions, kf, vf)
                return carry + out[0, 0], ()
            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=iters)
            return out
        timed("pdyn", lambda: loop_dyn(kf, vf, positions), nbytes * iters, iters)


if __name__ == "__main__":
    main()
