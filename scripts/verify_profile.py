#!/usr/bin/env python3
"""Decompose the 7B multi-candidate verify step's on-chip cost.

Round-3 finding (.r3_verify_decomp.log): verify(C=9) costs ~4.5x a decode
step while the multi-candidate attention kernel alone is FLAT across C
(.r3_multi_kernel_ab.log) and removing attention or the cache writes
barely moves it. So the cost hides in what every variant kept: the
quantized matmul stack at B=S*C, or the [S, C, H, hd] elementwise ops
(rope, KV quantization) that strip-mine on TPU (CLAUDE.md gotcha).

This harness compiles, then interleaves (same weather):
  dec     decode_step S=8                      (baseline)
  blk8    matmul stack only, B=8  (identity attn, all layers + lm_head)
  blk72   matmul stack only, B=72
  ver     full verify_step S=8 C=9
  ver_nr  verify with apply_rope patched to identity
  ver_nq  verify with KV quantization patched to a cheap cast
  ver_nrq both patches

Usage: timeout 1800 python -u scripts/verify_profile.py
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

S = int(os.environ.get("TPUSERVE_VP_SLOTS", "8"))
C = int(os.environ.get("TPUSERVE_VP_C", "9"))
L = int(os.environ.get("TPUSERVE_VP_SEQ", "512"))
ROUNDS = int(os.environ.get("TPUSERVE_VP_ROUNDS", "6"))


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = LlamaParams.llama2_7b()
    params = init_quantized_params(jax.random.PRNGKey(0), p, bits=4, group_size=128)
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    print("# weights up", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    pos0 = jnp.asarray(rng.integers(64, L - C - 2, S).astype(np.int32))
    lengths = jnp.full((S,), C, jnp.int32)

    states = {}

    def add(name, fn, *args):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"# {name}: compiled+warm in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        states[name] = [jfn, list(args), []]

    # --- decode baseline
    cache_d = KVCache.create(p, S, L, quantized=True, flat=True)

    def dec(params, tokens, cache, positions):
        logits, cache = llama.decode_step(params, p, tokens, cache, positions)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

    add("dec", dec, params, jnp.zeros((S,), jnp.int32), cache_d, pos0)

    # --- matmul stack only (identity attention), B = S and B = S*C
    def blocks_only(params, x):
        for layer in range(p.n_layers):
            x = llama._forward_block(params, f"layers.{layer}", x, p,
                                     lambda q, k, v: q)
        logits = llama._logits(params, x, p)
        return x + 1e-6 * logits[:, : p.dim].astype(x.dtype)

    add("blk8", blocks_only, params, jnp.ones((S, p.dim), jnp.bfloat16))
    add("blk72", blocks_only, params, jnp.ones((S * C, p.dim), jnp.bfloat16))

    # --- verify variants (patch module globals during trace only)
    orig_rope = llama.apply_rope
    orig_q = llama._quantize_kv_cache

    def id_rope(x, cos, sin):
        return x

    def cheap_q(cache, x):
        codes = jnp.clip(x.astype(jnp.float32), -127, 127).astype(jnp.int8)
        return codes, jnp.ones(x.shape[:-1], jnp.float32)

    def make_ver(tag, patch_rope, patch_q):
        def ver(params, tokens, cache, positions):
            logits, cache = llama.verify_step(params, p, tokens, cache,
                                              positions, lengths)
            nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
            return jnp.broadcast_to(nxt[:, None], (S, C)), cache

        llama.apply_rope = id_rope if patch_rope else orig_rope
        llama._quantize_kv_cache = cheap_q if patch_q else orig_q
        try:
            cache_v = KVCache.create(p, S, L, quantized=True, flat=True)
            add(tag, ver, params, jnp.zeros((S, C), jnp.int32), cache_v, pos0)
        finally:
            llama.apply_rope = orig_rope
            llama._quantize_kv_cache = orig_q

    make_ver("ver", False, False)
    make_ver("ver_nr", True, False)
    make_ver("ver_nq", False, True)
    make_ver("ver_nrq", True, True)

    for r in range(ROUNDS):
        line = [f"round {r}:"]
        for name, st in states.items():
            jfn, args, times = st
            t0 = time.perf_counter()
            out = jfn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = time.perf_counter() - t0
            times.append(dt)
            if name == "dec":
                args[1], args[2] = out
            elif name.startswith("ver"):
                args[1], args[2] = out
            line.append(f"{name} {dt*1e3:6.1f}")
        print(" ".join(line), flush=True)

    print("\n# best ms per dispatch", flush=True)
    for name, st in states.items():
        print(f"{name:8s} {min(st[2])*1e3:7.1f}", flush=True)


if __name__ == "__main__":
    main()
