#!/usr/bin/env python3
"""Interleaved in-process A/B of decode-attention implementations.

The relay chip's deliverable bandwidth drifts 136-300 GB/s across minutes
(see scripts/peak_bw.py), so separate bench processes cannot resolve a
few-percent kernel difference. This harness compiles every mode ONCE in a
single process (each with its preferred cache layout) and then interleaves
timed multi-step dispatches round-robin — every round samples all modes
under the same weather, and per-round ratios are drift-free.

Usage:
  python scripts/ab_decode.py                 # default: xla, pallas128, pallas256
  TPUSERVE_AB_MODES=xla,pallas64 TPUSERVE_AB_ROUNDS=6 python scripts/ab_decode.py
  # bf16 vs f32 KV-scale stream (kernel path):
  TPUSERVE_AB_MODES=pallas128,pallas128sb python scripts/ab_decode.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.models.llama_bench import init_quantized_params

MODELS = {
    "llama2_7b": LlamaParams.llama2_7b(),
    "llama3_8b": LlamaParams(vocab_size=128256, dim=4096, n_layers=32,
                             n_heads=32, n_kv_heads=8, head_dim=128,
                             ffn_dim=14336, rope_theta=500000.0),
}


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = MODELS[os.environ.get("TPUSERVE_AB_MODEL", "llama2_7b")]
    n_slots = int(os.environ.get("TPUSERVE_AB_SLOTS", "64"))
    max_len = int(os.environ.get("TPUSERVE_AB_SEQ", "256"))
    inner = int(os.environ.get("TPUSERVE_AB_INNER", "8"))
    rounds = int(os.environ.get("TPUSERVE_AB_ROUNDS", "6"))
    mode_names = os.environ.get("TPUSERVE_AB_MODES", "xla,pallas128,pallas256").split(",")

    params = init_quantized_params(jax.random.PRNGKey(0), p, bits=4, group_size=128)
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    print(f"# weights up", file=sys.stderr, flush=True)

    def multistep(params, tokens, cache, positions):
        def body(carry, _):
            toks, cache, pos = carry
            logits, cache = llama.decode_step(params, p, toks, cache, pos)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (toks, cache, pos + 1), toks

        (tokens, cache, positions), out = jax.lax.scan(
            body, (tokens, cache, positions), None, length=inner)
        return tokens, cache, positions, out

    rng = np.random.default_rng(0)
    # positions start in [lo, hi) and advance inner*(rounds+1) during the
    # run (warm + timed); small windows pull lo below the usual 64
    hi = max_len - inner * (rounds + 2) - 2
    lo = 64 if hi > 72 else max(2, hi - 8)
    if hi <= lo:
        raise SystemExit(f"TPUSERVE_AB_SEQ={max_len} too small for "
                         f"inner={inner} x rounds={rounds}")
    pos0 = rng.integers(lo, hi, n_slots).astype(np.int32)

    states = {}
    for name in mode_names:
        if name.startswith("paged"):
            # "paged<ps>": paged pool at page size ps, kernel path, capacity
            # parity with the contiguous cache, chains pre-grown to the full
            # window (steady-state decode, like bench.py --paged)
            from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager

            ps_spec = name[5:] or "128"
            kv_bits = 8
            if ps_spec.endswith("i4"):  # "paged128i4" = packed int4 pool
                ps_spec, kv_bits = ps_spec[:-2], 4
            ps = int(ps_spec or 128)
            max_pages = -(-max_len // ps)
            n_pages = n_slots * max_pages + 1
            env = {"TPUSERVE_DECODE_ATTN": "pallas"}
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                cache = PagedKVCache.create(
                    p, n_pages, ps, quantized=True,
                    flat=llama.preferred_cache_flat(p, max_len),
                    kv_bits=kv_bits)
                ptm = PageTableManager(n_pages, ps, n_slots, max_len)
                for s_i in range(n_slots):
                    ptm.ensure(s_i, max_len)
                table = ptm.device_table()

                def multistep_paged(params, tokens, cache, positions,
                                    table=table):
                    def body(carry, _):
                        toks, cache, pos = carry
                        logits, cache = llama.decode_step_paged(
                            params, p, toks, cache, table, pos)
                        toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                        return (toks, cache, pos + 1), toks

                    (tokens, cache, positions), out = jax.lax.scan(
                        body, (tokens, cache, positions), None, length=inner)
                    return tokens, cache, positions, out

                tokens = jnp.zeros((n_slots,), jnp.int32)
                positions = jnp.asarray(pos0)
                fn = jax.jit(multistep_paged, donate_argnums=(2,))
                t0 = time.time()
                tokens, cache, positions, _ = fn(params, tokens, cache, positions)
                np.asarray(tokens)
                print(f"# {name}: compiled+warm in {time.time()-t0:.0f}s",
                      file=sys.stderr, flush=True)
                states[name] = [fn, tokens, cache, positions, [], params]
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
            continue
        act8 = False
        if name == "xla":
            env = {"TPUSERVE_DECODE_ATTN": "xla"}
            flat = False
        else:
            spec = name.replace("pallas", "")
            skip = "1"
            scale_dt = jnp.float32
            kv_bits = 8
            unpack = "cur"
            if spec.endswith("w8"):  # "pallas128i4w8" = W4A8 weights path
                # (int8 acts x int4 weights on the int8 MXU; QTensor
                # act_bits is aux data, so both modes share the SAME device
                # weight buffers — zero extra HBM)
                spec, act8 = spec[:-2], True
            if spec.endswith("ns"):  # "pallas128ns" = no dyn skip
                spec, skip = spec[:-2], "0"
            if spec.endswith("i4nu"):  # int4 + NOOP unpack (timing-only
                # diagnostic: raw bytes into both dot halves — isolates the
                # VPU nibble-unpack tax in situ, VERDICT r4 #2)
                spec, kv_bits, scale_dt, unpack = spec[:-4], 4, jnp.bfloat16, "noop"
            if spec.endswith("i4"):  # "pallas128i4" = packed int4 KV (+bf16 scales)
                spec, kv_bits, scale_dt = spec[:-2], 4, jnp.bfloat16
            if spec.endswith("sb"):  # "pallas128sb" = bf16 KV scales
                spec, scale_dt = spec[:-2], jnp.bfloat16
            env = {"TPUSERVE_DECODE_ATTN": "pallas",
                   "TPUSERVE_ATTN_BLOCK_L": spec or "64",
                   "TPUSERVE_ATTN_DYNSKIP": skip,
                   "TPUSERVE_INT4_UNPACK": unpack}
            flat = True
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            cache = KVCache.create(
                p, n_slots, max_len, quantized=True, flat=flat,
                scale_dtype=scale_dt if name != "xla" else jnp.float32,
                kv_bits=kv_bits if name != "xla" else 8)
            tokens = jnp.zeros((n_slots,), jnp.int32)
            positions = jnp.asarray(pos0)
            p_mode = params
            if act8:
                import dataclasses

                from tpuserve.quant.core import QTensor as _QT

                p_mode = {k: (dataclasses.replace(v, act_bits=8)
                              if isinstance(v, _QT) else v)
                          for k, v in params.items()}
            fn = jax.jit(multistep, donate_argnums=(2,))
            t0 = time.time()
            tokens, cache, positions, _ = fn(p_mode, tokens, cache, positions)
            np.asarray(tokens)
            print(f"# {name}: compiled+warm in {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
            states[name] = [fn, tokens, cache, positions, [], p_mode]
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for r in range(rounds):
        line = [f"round {r}:"]
        for name in mode_names:
            fn, tokens, cache, positions, times, p_mode = states[name]
            t0 = time.perf_counter()
            tokens, cache, positions, _ = fn(p_mode, tokens, cache, positions)
            np.asarray(tokens)
            dt = (time.perf_counter() - t0) / inner
            times.append(dt)
            states[name][1:4] = [tokens, cache, positions]
            line.append(f"{name} {dt*1e3:6.2f}ms")
        print(" ".join(line), flush=True)

    print("\n# summary (best / median ms per step; ratio vs first mode)")
    base = None
    for name in mode_names:
        times = sorted(states[name][4])
        best, med = times[0], times[len(times) // 2]
        if base is None:
            base = best
        print(f"{name:10s} best {best*1e3:6.2f}  med {med*1e3:6.2f}  "
              f"ratio {best/base:5.3f}", flush=True)


if __name__ == "__main__":
    main()
