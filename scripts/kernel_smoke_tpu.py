#!/usr/bin/env python3
"""TPU compile-smoke sweep over the Pallas decode-attention kernel grid.

Interpret-mode tests (tests/test_decode_attention.py) validate numerics but
CANNOT catch Mosaic tiling/lowering violations — exactly the class of bug
that shipped in r2 (scale BlockSpec sublane m_base=4 not divisible by 8,
spec_tpu.log). This script LOWERS AND COMPILES (no execution beyond one
tiny run per combo) every supported kernel x shape combination on the real
chip, so lowering violations are caught before serving:

  kernels : wide_cache (contiguous), wide_cache_multi (speculative C=4),
            wide_paged, wide (standalone)
  Hkv     : {1, 2, 4, 8, 32}          (sublane-hostile 1/2/4 included)
  rep     : {1, 4}                     (MHA and GQA)
  hd      : {128, 256}
  KV      : int8 (f32 + bf16 scales) and bf16 (unquantized)

Usage: timeout 3600 python scripts/kernel_smoke_tpu.py [--quick]
Writes a PASS/FAIL line per combo and exits non-zero on any failure.
First run compiles each combo (~10-60 s each via the remote compiler);
reruns hit the persistent compile cache and finish in seconds.
"""

import argparse
import itertools
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpuserve.ops import decode_attention as da


def combo_args(kernel, n_kv, rep, hd, kv_int8, *, s_dim=4, l_max=256,
               cands=4, ps=64, scale_dtype=jnp.float32, kv_bits=8):
    """Build tiny-but-shaped-right inputs for one kernel combo."""
    n_heads = n_kv * rep
    w = n_kv * hd
    wdiv = 2 if kv_bits == 4 else 1
    key = jax.random.PRNGKey(0)
    kdt = (jnp.uint8 if kv_bits == 4 else jnp.int8) if kv_int8 \
        else jnp.bfloat16
    positions = jnp.asarray([l_max - 2, 5, 0, -1][:s_dim], jnp.int32)
    if kernel == "wide":
        q = jax.random.normal(key, (s_dim, n_heads, hd), jnp.float32)
        k = jnp.ones((s_dim, l_max, n_kv, hd), kdt)
        v = jnp.ones((s_dim, l_max, n_kv, hd), kdt)
        sc = (jnp.ones((s_dim, n_kv, l_max), scale_dtype) * 0.01
              if kv_int8 else None)
        return (q, k, v, sc, sc, positions), {}
    if kernel in ("wide_cache", "wide_cache_multi"):
        n_layers = 2
        kf = jnp.ones((n_layers, s_dim, l_max, w // wdiv), kdt)
        sc = (jnp.ones((s_dim, n_kv, l_max), scale_dtype) * 0.01
              if kv_int8 else None)
        if kernel == "wide_cache":
            q = jax.random.normal(key, (s_dim, n_heads, hd), jnp.float32)
        else:
            q = jax.random.normal(key, (s_dim, cands, n_heads, hd), jnp.float32)
            positions = jnp.asarray([l_max - cands - 1, 5, 0, -1][:s_dim],
                                    jnp.int32)
        return (q, kf, kf, sc, sc, positions, 1), {"window": l_max}
    if kernel in ("wide_paged", "wide_paged_poolsc"):
        n_layers, max_pages = 2, l_max // ps
        n_pages = s_dim * max_pages + 1
        kp = jnp.ones((n_layers, n_pages, ps, w // wdiv), kdt)
        table = jnp.arange(s_dim * max_pages, dtype=jnp.int32).reshape(
            s_dim, max_pages) + 1
        if kernel == "wide_paged_poolsc":
            # round-4 in-place scale pools [layers, pages, pad8(Hkv), ps]
            hp = (n_kv + 7) // 8 * 8
            sc = (jnp.ones((n_layers, n_pages, hp, ps), jnp.float32) * 0.01
                  if kv_int8 else None)
        else:
            sc = (jnp.ones((s_dim, n_kv, l_max), scale_dtype) * 0.01
                  if kv_int8 else None)
        q = jax.random.normal(key, (s_dim, n_heads, hd), jnp.float32)
        return (q, kp, kp, sc, sc, table, positions, 1), {"window": l_max}
    raise ValueError(kernel)


KERNELS = {
    "wide": da.decode_attention_wide,
    "wide_cache": da.decode_attention_wide_cache,
    "wide_cache_multi": da.decode_attention_wide_cache_multi,
    "wide_paged": da.decode_attention_wide_paged,
    "wide_paged_poolsc": da.decode_attention_wide_paged,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="only the r2-regression shapes (Hkv in {2,4}, hd=128)")
    args = ap.parse_args()
    assert jax.devices()[0].platform == "tpu", jax.devices()

    hkvs = (2, 4) if args.quick else (1, 2, 4, 8, 32)
    reps = (1,) if args.quick else (1, 4)
    hds = (128,) if args.quick else (128, 256)
    # (kv_int8, scale_dtype, kv_bits): int8 f32/bf16 scales, bf16, and
    # packed int4 (round-4: contiguous, multi-candidate AND paged)
    kvs = ((True, jnp.float32, 8), (True, jnp.bfloat16, 4)) if args.quick \
        else ((True, jnp.float32, 8), (True, jnp.bfloat16, 8),
              (False, None, 8), (True, jnp.bfloat16, 4),
              (True, jnp.float32, 4))

    failures = []
    n_run = 0
    for kernel, n_kv, rep, hd, (kv_int8, sdt, kv_bits) in itertools.product(
            KERNELS, hkvs, reps, hds, kvs):
        n_heads = n_kv * rep
        # VMEM guard: the wide kernels hold [M(~CM), W] f32 scratch; skip
        # combos whose scratch would be degenerate-huge at smoke scale
        if n_heads * n_kv * hd * hd > 64 * 4096 * 128:
            continue
        if kv_bits == 4:
            # packed int4: flat kernels only, (W/2) % 128 == 0
            if kernel == "wide" or (n_kv * hd // 2) % 128 != 0:
                continue
        if kernel == "wide_paged_poolsc" and not kv_int8:
            continue  # pool scales exist only for quantized pools
        tag = (f"{kernel}/Hkv{n_kv}/rep{rep}/hd{hd}/"
               f"{('int' + str(kv_bits) + '-' + ('f32' if sdt == jnp.float32 else 'bf16')) if kv_int8 else 'bf16kv'}")
        t0 = time.time()
        try:
            a, kw = combo_args(kernel, n_kv, rep, hd, kv_int8,
                               scale_dtype=sdt or jnp.float32,
                               kv_bits=kv_bits)
            fn = KERNELS[kernel]
            out = jax.jit(lambda *xs: fn(*xs, **kw, interpret=False))(*a)
            arr = np.asarray(out)
            assert np.isfinite(arr[np.abs(arr) < 1e20]).all()
            n_run += 1
            print(f"PASS {tag} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as e:
            failures.append(tag)
            msg = str(e).splitlines()[0][:200]
            print(f"FAIL {tag}: {msg}", flush=True)
            if os.environ.get("TPUSERVE_SMOKE_VERBOSE"):
                traceback.print_exc()
    print(f"# {n_run} combos passed, {len(failures)} failed", flush=True)
    if failures:
        print("KERNEL_SMOKE FAILED:", ", ".join(failures))
        sys.exit(1)
    print("KERNEL_SMOKE PASSED", flush=True)


if __name__ == "__main__":
    main()
