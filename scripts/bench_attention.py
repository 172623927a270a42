"""Microbench: decode-attention kernel vs the XLA einsum path on the TPU.

One layer's decode attention at serving shapes. Timing methodology per
CLAUDE.md: iterations are chained through the carry of a lax.scan (q
depends on the previous output) so the device cannot overlap or elide
steps, and the window ends with np.asarray() of the result.

  python scripts/bench_attention.py [--s 64] [--l 256] [--n-kv 32] [--rep 1]
                                    [--iters 50] [--path pallas|xla|both]
"""

import argparse
import math
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def xla_attention(q, k, v, ks, vs, positions, n_kv, rep, hd):
    """The llama.py decode_step XLA fallback, verbatim semantics."""
    s = q.shape[0]
    l = k.shape[1]
    pos = jnp.maximum(positions, 0)
    read_mask = jnp.arange(l, dtype=jnp.int32)[None, :] <= pos[:, None]
    qg = q.reshape(s, n_kv, rep, hd)
    scores = jnp.einsum("shrd,slhd->shrl", qg.astype(jnp.bfloat16),
                        k.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    if ks is not None:
        scores = scores * ks[:, :, None, :]  # head-major [S, Hkv, L]
    scores = jnp.where(read_mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    if vs is not None:
        probs = probs * vs[:, :, None, :]
    out = jnp.einsum("shrl,slhd->shrd", probs.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    active = positions >= 0
    return jnp.where(active[:, None, None], out.reshape(s, n_kv * rep, hd), 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=64)
    ap.add_argument("--l", type=int, default=256)
    ap.add_argument("--n-kv", type=int, default=32)
    ap.add_argument("--rep", type=int, default=1)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--block-l", type=int, default=256)
    ap.add_argument("--path", default="both", choices=["pallas", "xla", "both"])
    ap.add_argument("--bf16-kv", action="store_true", help="unquantized bf16 KV")
    args = ap.parse_args()

    s, l, n_kv, rep, hd = args.s, args.l, args.n_kv, args.rep, args.hd
    h = n_kv * rep
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(s, h, hd)).astype(np.float32) / math.sqrt(hd),
                     jnp.bfloat16)
    if args.bf16_kv:
        k = jnp.asarray(rng.normal(size=(s, l, n_kv, hd)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(s, l, n_kv, hd)), jnp.bfloat16)
        ks = vs = None
        kv_bytes = 2 * s * l * n_kv * hd * 2
    else:
        k = jnp.asarray(rng.integers(-127, 127, size=(s, l, n_kv, hd)), jnp.int8)
        v = jnp.asarray(rng.integers(-127, 127, size=(s, l, n_kv, hd)), jnp.int8)
        # head-major [S, Hkv, L] (wide-kernel / cache layout)
        ks = jnp.asarray(rng.uniform(0.001, 0.02, size=(s, n_kv, l)), jnp.float32)
        vs = jnp.asarray(rng.uniform(0.001, 0.02, size=(s, n_kv, l)), jnp.float32)
        kv_bytes = 2 * s * l * n_kv * hd + 2 * 4 * s * l * n_kv
    positions = jnp.asarray(
        np.full((s,), l - 1, np.int32))  # all slots at full length (worst case)

    print(f"# S={s} L={l} Hkv={n_kv} rep={rep} hd={hd} "
          f"KV={kv_bytes/1e6:.0f} MB/layer iters={args.iters}", flush=True)

    def run(name, attn_fn):
        def step(carry, _):
            out = attn_fn(carry)
            # chain: next q depends on this output (cannot be elided)
            nxt = (carry + 1e-6 * out.astype(carry.dtype)).astype(carry.dtype)
            return nxt, out[0, 0, 0]

        @jax.jit
        def loop(q):
            final, outs = jax.lax.scan(step, q, None, length=args.iters)
            return final, outs

        t0 = time.perf_counter()
        f, _ = loop(q0)
        np.asarray(f)
        t_compile = time.perf_counter() - t0
        # timed run (second call = cached executable); vary input slightly
        best = float("inf")
        for rep_i in range(3):
            qi = q0 + jnp.bfloat16(1e-6 * (rep_i + 1))
            t0 = time.perf_counter()
            f, _ = loop(qi)
            np.asarray(f)
            dt = time.perf_counter() - t0
            best = min(best, dt)
        per = best / args.iters
        print(f"{name:8s} {per*1e6:9.1f} us/step   {kv_bytes/per/1e9:7.1f} GB/s eff   "
              f"(compile {t_compile:.1f}s)", flush=True)
        return per

    results = {}
    if args.path in ("xla", "both"):
        results["xla"] = run("xla", lambda q: xla_attention(
            q, k, v, ks, vs, positions, n_kv, rep, hd))
    if args.path in ("pallas", "both"):
        from tpuserve.ops.decode_attention import decode_attention

        results["pallas"] = run("pallas", lambda q: decode_attention(
            q, k, v,
            None if ks is None else ks.transpose(0, 2, 1),
            None if vs is None else vs.transpose(0, 2, 1),
            positions, block_l=args.block_l).astype(jnp.float32))
    if len(results) == 2:
        print(f"# speedup pallas vs xla: {results['xla']/results['pallas']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
