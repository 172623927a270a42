#!/usr/bin/env python3
"""Per-dispatch trace of the 7B speculation engine run (.r3_spec_bench
measured spec ON at 0.48x of spec OFF — this finds where the time goes).

Builds the same engine as scripts/spec_bench.py (spec_k=8), wraps the
engine's jitted dispatches with host-sync timers (np.asarray on the token
leaf — block_until_ready lies on this relay), runs one warm wave + one
measured wave and prints a per-dispatch histogram: kind(window,horizon)
-> count, total ms, best ms. Compile-time first calls show up as outliers.

Usage: timeout 3600 python -u scripts/spec_trace.py
"""

import collections
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from spec_bench import build  # same 7B config

EVENTS = []


def wrap(eng, name):
    fn = getattr(eng, name)
    if fn is None:
        return

    def timed(*args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        EVENTS.append((name, kw.get("window"), kw.get("horizon"),
                       time.perf_counter() - t0))
        return out

    setattr(eng, name, timed)


def drive(eng, measure: bool):
    import concurrent.futures as cf

    rng = np.random.default_rng(0)
    period = rng.integers(100, 32000, 12).tolist()
    prompt = (period * 10)[:96]
    new_tokens = int(os.environ.get("TPUSERVE_SPEC_BENCH_NEW", "192"))
    slots = eng.n_slots
    if measure:
        EVENTS.clear()
    t0 = time.time()
    with cf.ThreadPoolExecutor(max_workers=slots) as ex:
        futs = [ex.submit(eng.generate, prompt, max_new_tokens=new_tokens)
                for _ in range(slots)]
        outs = [f.result() for f in futs]
    dt = time.time() - t0
    produced = sum(o["num_generated"] for o in outs)
    return produced / dt, dt, produced


def main():
    with tempfile.TemporaryDirectory() as root:
        eng = build(root, "spec7b", int(os.environ.get("TPUSERVE_SPEC_BENCH_K", "8")))
        for name in ("_verify_jit", "_decode_jit", "_decode_multi_jit",
                     "_prefill_jit", "_prefill_chunk_jit"):
            wrap(eng, name)
        tps_w, dt_w, _ = drive(eng, measure=False)
        print(f"# warm wave: {tps_w:.0f} tok/s", file=sys.stderr, flush=True)
        tps, dt, produced = drive(eng, measure=True)
        stats = eng.serving_stats()
        eng.stop()

    agg = collections.defaultdict(lambda: [0, 0.0, 1e9])
    for name, window, horizon, t in EVENTS:
        k = f"{name}(w={window},h={horizon})"
        a = agg[k]
        a[0] += 1
        a[1] += t
        a[2] = min(a[2], t)
    total_traced = sum(t for *_, t in EVENTS)
    print(f"\n# measured wave: {tps:.0f} tok/s, {produced} tokens in {dt:.1f}s "
          f"(traced dispatch time {total_traced:.1f}s)", flush=True)
    print(f"# spec stats: drafted={stats.get('spec_drafted')} "
          f"accepted={stats.get('spec_accepted')}", flush=True)
    for k in sorted(agg, key=lambda k: -agg[k][1]):
        n, tot, best = agg[k]
        print(f"{k:42s} n={n:4d} total {tot*1e3:8.0f}ms  best {best*1e3:7.1f}ms",
              flush=True)
    print(json.dumps({"metric": "spec_trace", "tokens_per_s": round(tps, 1),
                      "traced_s": round(total_traced, 2),
                      "wall_s": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
