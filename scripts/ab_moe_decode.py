#!/usr/bin/env python3
"""On-chip A/B: MoE decode-FFN dense all-experts loop vs static-capacity
top-k dispatch (VERDICT r3 #8).

The engine runs the dense loop at DECODE (every expert over all tokens,
zero combine weights for unrouted pairs) on the argument that decode is
weight-read bound — each hit expert's weights stream from HBM once either
way, so the extra MXU flops are ~free, while the dispatch adds
gather/scatter work. The r3 judge asked for the measurement, not the
argument. Interleaved in-process rounds (the only drift-free instrument
on this relay, scripts/ab_decode.py methodology); best-round times.

Shapes: Mixtral-8x7B-class FFN (dim 4096, per-expert ffn 14336, E=8,
top-2) at int4 — one layer's FFN isolated; decode batch sizes 8 and 64.
Env: TPUSERVE_AB_MOE_{DIM,FFN,E,K,ROUNDS}.
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

from tpuserve.models import llama
from tpuserve.models.llama import LlamaParams, moe_combine_weights
from tpuserve.quant.core import quantize_experts


def main():
    dim = int(os.environ.get("TPUSERVE_AB_MOE_DIM", "4096"))
    ffn = int(os.environ.get("TPUSERVE_AB_MOE_FFN", "14336"))
    e_n = int(os.environ.get("TPUSERVE_AB_MOE_E", "8"))
    k = int(os.environ.get("TPUSERVE_AB_MOE_K", "2"))
    rounds = int(os.environ.get("TPUSERVE_AB_MOE_ROUNDS", "6"))
    p = LlamaParams(vocab_size=32000, dim=dim, n_layers=1, n_heads=32,
                    n_kv_heads=32, head_dim=dim // 32, ffn_dim=ffn,
                    n_experts=e_n, n_experts_per_tok=k)

    rng = np.random.default_rng(0)
    t0 = time.time()
    gu = quantize_experts(jnp.asarray(
        rng.normal(0, 0.02, (e_n, dim, 2 * ffn)).astype(np.float32)),
        bits=4, group_size=128)
    dn = quantize_experts(jnp.asarray(
        rng.normal(0, 0.02, (ffn, dim)).astype(np.float32)
        [None].repeat(e_n, 0)), bits=4, group_size=128)
    jax.block_until_ready((gu.q, dn.q))
    print(f"# expert weights up: {(gu.nbytes + dn.nbytes)/1e9:.2f} GB "
          f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    def dense(h, w2):
        out = jnp.zeros_like(h)
        for e in range(e_n):
            y = llama.expert_forward(h, gu.expert(e), dn.expert(e), ffn)
            out = out + y * w2[:, e:e + 1]
        return out

    def dispatch(h, w2):
        cap = max(8, int(2.0 * h.shape[0] * k / e_n))
        return llama._moe_dispatch(h, w2, gu, dn, p, cap)

    # r5 methodology (scripts/kernel_rates.py): every dispatch pays a fixed
    # ~25-48 ms relay round trip, so per-call timing of a 1-4 ms FFN is
    # pure latency. Each mode runs as an on-device lax.scan CHAIN at two
    # depths; the reported per-iter time is the SLOPE (d2-d1)/(t2-t1),
    # which cancels the round trip exactly. The fence fetches one scalar.
    d1, d2 = (int(x) for x in os.environ.get(
        "TPUSERVE_AB_MOE_DEPTHS", "8,32").split(","))

    def chain(fn, depth):
        def run(h, w2):
            def body(h, _):
                return fn(h, w2) * 1e-3 + h, ()
            h, _ = jax.lax.scan(body, h, None, length=depth)
            return h, jnp.sum(h)
        return jax.jit(run)

    for bs in (8, 64):
        h0 = jnp.asarray(rng.normal(0, 1, (bs, dim)).astype(np.float32))
        router = jnp.asarray(rng.normal(0, 1, (bs, e_n)).astype(np.float32))
        w2 = moe_combine_weights(router, e_n, k)
        # correctness once (uncompiled chains share the underlying fns)
        o1 = jax.jit(dense)(h0, w2)
        o2 = jax.jit(dispatch)(h0, w2)
        err = float(jnp.abs(o1 - o2).max())
        del o1, o2
        legs = {}
        for name, fn in (("dense", dense), ("dispatch", dispatch)):
            for d in (d1, d2):
                j = chain(fn, d)
                t0 = time.perf_counter()
                h, s = j(h0, w2)
                np.asarray(s)
                print(f"# bs{bs} {name}@d{d} compiled in "
                      f"{time.perf_counter()-t0:.0f}s", file=sys.stderr,
                      flush=True)
                legs[(name, d)] = [j, h, []]
        for r in range(rounds):
            for (name, d), st in legs.items():
                j, h, times = st
                t0 = time.perf_counter()
                h, s = j(h, w2)
                np.asarray(s)
                times.append(time.perf_counter() - t0)
                st[1] = h
        per = {}
        for name in ("dense", "dispatch"):
            t_1 = min(legs[(name, d1)][2])
            t_2 = min(legs[(name, d2)][2])
            per[name] = (t_2 - t_1) / (d2 - d1) * 1e3
        ratio = per["dispatch"] / per["dense"]
        print(f"bs={bs}: dense {per['dense']:.3f} ms, dispatch "
              f"{per['dispatch']:.3f} ms per FFN (slope), dispatch/dense "
              f"{ratio:.3f} (max abs diff {err:.2e})", flush=True)


if __name__ == "__main__":
    main()
