"""One-process sweep of decode-attention variants on the TPU.

The remote compile relay has minutes-scale queueing variance, so every
variant compiles+measures inside ONE process. Diagnostic ladder:

  dma     pure-stream ceiling: contiguous KV blocks, trivial compute
  dot32   DMA + one full-width int8 dot per block (no softmax) — isolates
          whether masking/softmax VPU work is what throttles the kernel
  g32s    library kernel, g_kv = Hkv (fully CONTIGUOUS blocks)
  g16s    library kernel, g_kv = 16 (STRIDED blocks — the r1 default that
          measured 58-140 GB/s)
  xla     the llama.py einsum fallback (current production default)

  python scripts/sweep_attention.py                # default sweep
  TPUSERVE_SWEEP=dma,g32s ... python scripts/sweep_attention.py
"""

import functools
import math
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = int(os.environ.get("TPUSERVE_SWEEP_S", "64"))
L = int(os.environ.get("TPUSERVE_SWEEP_L", "256"))
HKV = int(os.environ.get("TPUSERVE_SWEEP_HKV", "32"))
REP = int(os.environ.get("TPUSERVE_SWEEP_REP", "1"))
HD = 128
ITERS = int(os.environ.get("TPUSERVE_SWEEP_ITERS", "30"))


def setup():
    rng = np.random.default_rng(0)
    h = HKV * REP
    q = jnp.asarray(rng.normal(size=(S, h, HD)).astype(np.float32) / math.sqrt(HD),
                    jnp.bfloat16)
    k = jnp.asarray(rng.integers(-127, 127, size=(S, L, HKV, HD)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 127, size=(S, L, HKV, HD)), jnp.int8)
    # head-major [S, Hkv, L] (wide-kernel / xla_attention contract);
    # legacy v1 kernel variants transpose at their call sites
    ks = jnp.asarray(rng.uniform(0.001, 0.02, size=(S, HKV, L)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, size=(S, HKV, L)), jnp.float32)
    positions = jnp.asarray(np.full((S,), L - 1, np.int32))
    return q, k, v, ks, vs, positions


def timed(name, make_loop_fn, nbytes):
    try:
        loop_fn = make_loop_fn()
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
        print(f"{name:16s} {per*1e6:9.1f} us/it {nbytes/ITERS/per/1e9:7.1f} GB/s "
              f"(compile {compile_s:.0f}s)", flush=True)
    except Exception:
        tb = traceback.format_exc(limit=40)
        print(f"{name:16s} FAILED:\n{tb[-1800:]}", flush=True)


def chain_loop(call, q, *rest):
    """Data-dependency-chained timing loop per CLAUDE.md methodology."""

    @jax.jit
    def loop(q, *rest):
        def body(carry, _):
            out = call(carry, *rest)
            nxt = (carry + 1e-6 * out.astype(carry.dtype)).astype(carry.dtype)
            return nxt, ()
        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return out

    return lambda: loop(q, *rest)


def dma_bound(q, k, v):
    """Pure-stream ceiling: contiguous (1, bl*HKV, HD) blocks, trivial compute."""
    kf = k.reshape(S, L * HKV, HD)
    vf = v.reshape(S, L * HKV, HD)
    bl = 64 * HKV  # 64 positions x all heads = 512 KB per operand block

    def kern(k_ref, v_ref, o_ref):
        o_ref[...] = (k_ref[0, 0:1, :].astype(jnp.int32)
                      + v_ref[0, 0:1, :].astype(jnp.int32))

    def call(qc, kf, vf):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, HD), jnp.int32),
            grid=(S, L * HKV // bl),
            in_specs=[
                pl.BlockSpec((1, bl, HD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bl, HD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, HD), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(kf, vf)
        return qc + out.astype(jnp.bfloat16) * 1e-9

    return chain_loop(call, q[:1, 0, :].reshape(1, HD), kf, vf)


def dma_wide(q, k, v, three_d=False):
    """Stream ceiling with WIDE minor rows: K/V viewed [S*L, Hkv*HD] so each
    row is Hkv*HD = 4096 int8 bytes (vs 128 in the hd-minor layouts). Tests
    whether minor-row width is what throttles dma_ceiling to 160 GB/s."""
    w = HKV * HD
    kf = k.reshape(S * L, w)
    vf = v.reshape(S * L, w)
    bl = 256  # rows per block: 256 x 4096 = 1 MB per operand block

    if three_d:
        kf = kf.reshape(S, L, w)
        vf = vf.reshape(S, L, w)

        def kern(k_ref, v_ref, o_ref):
            o_ref[...] = (k_ref[0, 0:1, :HD].astype(jnp.int32)
                          + v_ref[0, 0:1, :HD].astype(jnp.int32))

        def call(qc, kf, vf):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, HD), jnp.int32),
                grid=(S, L // bl) if L >= bl else (S, 1),
                in_specs=[
                    pl.BlockSpec((1, min(bl, L), w), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, min(bl, L), w), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, HD), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary")),
            )(kf, vf)
            return qc + out.astype(jnp.bfloat16) * 1e-9
    else:
        def kern(k_ref, v_ref, o_ref):
            o_ref[...] = (k_ref[0:1, :HD].astype(jnp.int32)
                          + v_ref[0:1, :HD].astype(jnp.int32))

        def call(qc, kf, vf):
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((1, HD), jnp.int32),
                grid=(S * L // bl,),
                in_specs=[
                    pl.BlockSpec((bl, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bl, w), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, HD), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(kf, vf)
            return qc + out.astype(jnp.bfloat16) * 1e-9

    return chain_loop(call, q[:1, 0, :].reshape(1, HD), kf, vf)


def dot_only(q, k, v):
    """DMA + full-width int8 score dot + f32 V dot per block; no softmax.
    Upper bound for any kernel using the wide-dot design on this layout."""
    kf = k.reshape(S, L * HKV, HD)
    vf = v.reshape(S, L * HKV, HD)
    bl_pos = 64
    r = bl_pos * HKV  # rows per block
    m = HKV * REP

    def kern(q_ref, k_ref, v_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        qh = q_ref[0]                      # [M, hd] int8
        kb = k_ref[0]                      # [r, hd] int8
        s = jax.lax.dot_general(
            qh, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32)              # [M, r]
        p = (s * 1e-6).astype(jnp.bfloat16)
        vb = v_ref[0].astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] + part

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            o_ref[0] = acc_ref[:]

    qi = jnp.clip(jnp.round(q * 64), -127, 127).astype(jnp.int8)

    def call(qi, kf, vf):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((S, m, HD), jnp.float32),
            grid=(S, L * HKV // r),
            in_specs=[
                pl.BlockSpec((1, m, HD), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, HD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, r, HD), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, m, HD), lambda i, j: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, HD), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(qi, kf, vf)
        return out.astype(jnp.int8)

    def chained(qi, kf, vf):
        out = call(qi, kf, vf)
        return (qi + out[:, :, :1] * 0).astype(jnp.int8)

    @jax.jit
    def loop(qi, kf, vf):
        def body(carry, _):
            return chained(carry, kf, vf), ()
        out, _ = jax.lax.scan(body, qi, None, length=ITERS)
        return out

    return lambda: loop(qi, kf, vf)


def xla_ref(q, k, v, ks, vs, positions):
    from scripts.bench_attention import xla_attention

    def call(q, k, v, ks, vs, positions):
        return xla_attention(q, k, v, ks, vs, positions, HKV, REP, HD)

    return chain_loop(call, q, k, v, ks, vs, positions)


def wide_variant(q, k, v, ks, vs, positions, block_l=256):
    from tpuserve.ops import decode_attention as da

    def call(q, k, v, ks, vs, positions):
        return da.decode_attention_wide(q, k, v, ks, vs, positions,
                                        block_l=block_l)

    return chain_loop(call, q, k, v, ks, vs, positions)


def attn_variant(q, k, v, ks, vs, positions, *, g_kv, block_l, dynskip):
    from tpuserve.ops import decode_attention as da

    os.environ["TPUSERVE_ATTN_DYNSKIP"] = "1" if dynskip else "0"

    def call(q, k, v, ks, vs, positions):
        # legacy v1 kernel keeps the [S, L, Hkv] scale contract
        return da.decode_attention(q, k, v, ks.transpose(0, 2, 1),
                                   vs.transpose(0, 2, 1), positions,
                                   block_l=block_l, g_kv=g_kv)

    return chain_loop(call, q, k, v, ks, vs, positions)


def main():
    q, k, v, ks, vs, positions = setup()
    nbytes = (k.nbytes + v.nbytes + ks.nbytes + vs.nbytes) * ITERS
    which = os.environ.get(
        "TPUSERVE_SWEEP", "dma,dot32,g32s,g32s_bl64,xla,g16s").split(",")
    print(f"# S={S} L={L} Hkv={HKV} rep={REP} KV {2*k.nbytes/1e6:.0f} MB "
          f"+ scales {2*ks.nbytes/1e6:.0f} MB, iters={ITERS}", flush=True)
    print(f"# device {jax.devices()[0]}", flush=True)
    for name in which:
        if name == "dma":
            timed("dma_ceiling", lambda: dma_bound(q, k, v),
                  (k.nbytes + v.nbytes) * ITERS)
        elif name == "dma_wide":
            timed("dma_wide_2d", lambda: dma_wide(q, k, v, three_d=False),
                  (k.nbytes + v.nbytes) * ITERS)
        elif name == "dma_wide3d":
            timed("dma_wide_3d", lambda: dma_wide(q, k, v, three_d=True),
                  (k.nbytes + v.nbytes) * ITERS)
        elif name == "dot32":
            timed("dot_only_g32", lambda: dot_only(q, k, v),
                  (k.nbytes + v.nbytes) * ITERS)
        elif name == "wide":
            timed("wide_v3", functools.partial(
                wide_variant, q, k, v, ks, vs, positions), nbytes)
        elif name == "wide_bl128":
            timed("wide_v3_bl128", functools.partial(
                wide_variant, q, k, v, ks, vs, positions, 128), nbytes)
        elif name == "xla":
            timed("xla_einsum", lambda: xla_ref(q, k, v, ks, vs, positions),
                  nbytes)
        else:
            variants = {
                "g32s": dict(g_kv=32, block_l=256, dynskip=False),
                "g32s_bl64": dict(g_kv=32, block_l=64, dynskip=False),
                "g32s_bl128": dict(g_kv=32, block_l=128, dynskip=False),
                "g16s": dict(g_kv=16, block_l=256, dynskip=False),
                "g16d": dict(g_kv=16, block_l=256, dynskip=True),
                "g32d": dict(g_kv=32, block_l=256, dynskip=True),
                "g8s": dict(g_kv=8, block_l=256, dynskip=False),
            }
            if name not in variants:
                continue
            timed(name,
                  functools.partial(attn_variant, q, k, v, ks, vs, positions,
                                    **variants[name]),
                  nbytes)


if __name__ == "__main__":
    main()
