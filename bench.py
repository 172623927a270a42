#!/usr/bin/env python3
"""Headline benchmark: INT4 Llama-2-7B continuous-batching decode throughput
on one chip (BASELINE.md configs[3]; the reference publishes no numbers —
BASELINE.json "published": {} — so the baseline is the chip's roofline).

Prints JSON lines to stdout (one per refinement); the LAST line is the final
result. Every line is a complete, valid measurement:
  {"metric": ..., "value": tokens/s/chip, "unit": "tokens/s/chip",
   "vs_baseline": value / roofline_tokens_per_s, ...}

Robustness (round-4 hardening — BENCH_r03 came back rc=124/parsed=null):
  * a stderr heartbeat thread reports the current phase every 20 s, so a
    relay hang is diagnosable from the log tail;
  * a wall-clock budget (TPUSERVE_BENCH_BUDGET_S, default 1500 s) trims the
    chunk count and skips the closing bandwidth probe when short on time;
  * a JSON line is emitted after the FIRST timed chunk and refined as later
    chunks land — a timeout kill after that point still leaves a parseable
    partial result (partial > null).

Roofline model: a decode step must stream every live byte once over HBM —
quantized weights + embed table + the active KV window — at the chip's HBM
bandwidth; tokens/s_roofline = batch_slots / step_time_roofline. Overridable
via env: TPUSERVE_BENCH_{MODEL,BITS,SLOTS,SEQ,STEPS}.
"""

import json
import os
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.models.llama_bench import init_quantized_params, param_bytes

# v5e paper spec: 819 GB/s HBM, 394 bf16 TFLOP/s. The SPEC number is NOT
# achievable on this environment's relayed chip: the measured ceiling for a
# bare XLA streaming reduce is ~295 GB/s (see measure_peak_gbps), so the
# roofline denominator uses the MEASURED achievable peak — the standard
# roofline practice (STREAM-style peak, not paper bandwidth). Both numbers
# are reported in the JSON.
HBM_SPEC_GBPS = float(os.environ.get("TPUSERVE_BENCH_HBM_GBPS", "819"))

# Historical best probe on this relay (297 GB/s, CLAUDE.md). Used as the
# roofline denominator floor whenever the in-run probe is skipped (budget)
# or hasn't run yet (early emissions) — a LOW probe would flatter
# vs_baseline, so the fallback is the best this chip has ever measured.
FALLBACK_PEAK_GBPS = float(os.environ.get("TPUSERVE_BENCH_FALLBACK_GBPS", "297"))

_T_START = time.time()
BUDGET_S = float(os.environ.get("TPUSERVE_BENCH_BUDGET_S", "1500"))
_PHASE = ["startup"]


def _phase(name: str) -> None:
    _PHASE[0] = name
    print(f"# [{time.time()-_T_START:6.1f}s] phase: {name}", file=sys.stderr, flush=True)


def _remaining() -> float:
    return BUDGET_S - (time.time() - _T_START)


def _heartbeat() -> None:
    while True:
        time.sleep(20)
        print(f"# [{time.time()-_T_START:6.1f}s] heartbeat: in phase "
              f"'{_PHASE[0]}' (budget {_remaining():.0f}s left)",
              file=sys.stderr, flush=True)


threading.Thread(target=_heartbeat, daemon=True).start()


def measure_peak_gbps() -> float:
    """Best-of-4 chained streaming reduce over a 1 GB int8 buffer — the
    chip's achievable HBM read bandwidth for well-formed XLA code
    (block_until_ready lies on this relay; np.asarray is the fence)."""
    n_rows, w = 262144, 4096
    x = jnp.ones((n_rows, w), jnp.int8)

    def loop(x, s0):
        def body(s, _):
            return s + (x + (s % 2).astype(jnp.int8)).max().astype(jnp.int32), ()
        s, _ = jax.lax.scan(body, s0, None, length=8)
        return s

    j = jax.jit(loop)
    out = j(x, jnp.int32(0))
    np.asarray(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = j(x, out % 3)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    del x
    return (n_rows * w) / (best / 8) / 1e9

MODELS = {
    "llama2_7b": LlamaParams.llama2_7b(),
    "llama3_8b": LlamaParams(vocab_size=128256, dim=4096, n_layers=32, n_heads=32,
                              n_kv_heads=8, head_dim=128, ffn_dim=14336,
                              rope_theta=500000.0),
    "llama_1b": LlamaParams(vocab_size=32000, dim=2048, n_layers=16, n_heads=16,
                             n_kv_heads=16, head_dim=128, ffn_dim=5504),
    # MoE (Mixtral-style) at a single-chip-benchable scale: 8 experts top-2,
    # ~1.1B active / ~3.6B total params at int4
    "moe_small": LlamaParams(vocab_size=32000, dim=1024, n_layers=12,
                              n_heads=16, n_kv_heads=4, head_dim=64,
                              ffn_dim=3584, n_experts=8, n_experts_per_tok=2),
    "tiny": LlamaParams.tiny(),
}


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    model_name = os.environ.get("TPUSERVE_BENCH_MODEL", "llama2_7b")
    bits = int(os.environ.get("TPUSERVE_BENCH_BITS", "4"))
    n_slots = int(os.environ.get("TPUSERVE_BENCH_SLOTS", "64"))
    max_len = int(os.environ.get("TPUSERVE_BENCH_SEQ", "256"))
    inner_steps = int(os.environ.get("TPUSERVE_BENCH_INNER", "8"))
    outer_steps = int(os.environ.get("TPUSERVE_BENCH_STEPS", "32")) // inner_steps
    p = MODELS[model_name]

    paged = os.environ.get("TPUSERVE_BENCH_PAGED", "0") == "1"
    # int4 KV is the accuracy-gated headline config (+8.3% over int8 KV,
    # .r3_ab4 / .r3_bench_kv4.log); paged pools stay int8.
    kv_bits = int(os.environ.get("TPUSERVE_BENCH_KV_BITS", "8" if paged else "4"))

    # The bandwidth probe runs AFTER the timed chunks (r3's driver bench
    # died rc=124 hung in a pre-run probe before any JSON had been emitted).
    # The denominator floors at the historical-best 297 GB/s anyway (probes
    # measure 179-297 — max(probe, floor) is almost always the floor), so
    # deferring the probe costs nothing and removes a whole failure phase
    # before the first emission.
    peak_gbps = FALLBACK_PEAK_GBPS

    _phase("weight init + upload")
    t0 = time.time()
    params = init_quantized_params(jax.random.PRNGKey(0), p, bits=bits, group_size=128)
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    wbytes = param_bytes(params)
    print(f"# weights materialized: {wbytes/1e9:.2f} GB ({time.time()-t0:.1f}s)",
          file=sys.stderr, flush=True)

    page_size = int(os.environ.get("TPUSERVE_BENCH_PAGE_SIZE", "128"))  # ps=64 measured 1.24x contiguous (.r3_ab7); 128 = engine default, 1.07x
    page_table = None
    _phase("kv cache alloc")
    if paged:
        # paged pool with capacity parity to the contiguous cache; every
        # slot's chain pre-grown to the full window (the engine grows
        # incrementally; the bench measures steady-state decode)
        from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager

        max_pages = -(-max_len // page_size)
        n_pages = n_slots * max_pages + 1
        cache = PagedKVCache.create(p, n_pages, page_size, quantized=True,
                                    flat=llama.preferred_cache_flat(p, max_len))
        ptm = PageTableManager(n_pages, page_size, n_slots, max_len)
        for s in range(n_slots):
            ptm.ensure(s, max_len)
        page_table = ptm.device_table()
    else:
        scale_dt = jnp.float32 if os.environ.get(
            "TPUSERVE_BENCH_KV_SCALE_DTYPE", "bf16").lower() in ("f32", "float32") \
            else jnp.bfloat16  # bf16 default: accuracy-free (ACCURACY.json)
        flat = llama.preferred_cache_flat(p, max_len)
        if kv_bits == 4 and not flat and "TPUSERVE_BENCH_KV_BITS" not in os.environ:
            # packed int4 needs the flat layout; where the layout chooser
            # rules flat out (e.g. CPU platform), the default degrades to int8
            print("# int4 KV needs a flat cache; this config prefers 5D — "
                  "falling back to kv_bits=8", file=sys.stderr, flush=True)
            kv_bits = 8
        cache = KVCache.create(p, n_slots, max_len, quantized=True,
                               flat=flat, scale_dtype=scale_dt, kv_bits=kv_bits)
    kv_bytes = cache.nbytes
    print(f"# kv cache: {kv_bytes/1e9:.2f} GB", file=sys.stderr, flush=True)

    def multistep(params, tokens, cache, positions):
        """inner_steps decode iterations per dispatch: greedy token fed back
        on-device via lax.scan (host dispatch costs ~4 ms on this relay;
        the serving engine amortizes the same way)."""

        def body(carry, _):
            toks, cache, pos = carry
            if paged:
                logits, cache = llama.decode_step_paged(
                    params, p, toks, cache, page_table, pos)
            else:
                logits, cache = llama.decode_step(params, p, toks, cache, pos)
            toks = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (toks, cache, pos + 1), toks

        (tokens, cache, positions), out = jax.lax.scan(
            body, (tokens, cache, positions), None, length=inner_steps
        )
        return tokens, cache, positions, out

    step_jit = jax.jit(multistep, donate_argnums=(2,))

    tokens = jnp.zeros((n_slots,), jnp.int32)
    positions = jnp.asarray(
        np.random.default_rng(0).integers(
            64, max_len - inner_steps * (outer_steps + 1) - 2, n_slots
        ),
        jnp.int32,
    )

    _phase("decode-graph compile (cold: up to ~20 min; warm cache: seconds)")
    t0 = time.time()
    tokens, cache, positions, _ = step_jit(params, tokens, cache, positions)
    np.asarray(tokens)
    print(f"# decode step compiled in {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)

    # roofline methodology (honest by construction): a decode step must
    # stream weights + the active KV window once. achieved_gbps charges the
    # step its FULL static window byte count (the kernel's per-slot DMA
    # skip means the true bytes moved are fewer — so achieved_gbps is an
    # upper-bound estimator and can exceed the probe, as r2's BENCH showed:
    # 125% "of roofline" was the probe under-measuring the step's weather
    # window plus skipped bytes being charged). The roofline denominator is
    # therefore clamped to max(probe, achieved): vs_baseline <= 1.0 always,
    # and a step that beats the probe raises the roofline rather than
    # "exceeding" it. The spec-bandwidth roofline (819 GB/s) is reported
    # too; it is unreachable on this relay (bare XLA reduce ~295 GB/s).
    step_bytes = wbytes + kv_bytes

    def emit(chunk_dts, elapsed_total, n_chunks_done, probe_gbps, final):
        dt = min(chunk_dts)
        dt_mean = elapsed_total / (n_chunks_done * inner_steps)
        tokens_per_s = n_slots / dt
        achieved_gbps = step_bytes / dt / 1e9
        peak = max(probe_gbps, achieved_gbps)
        roofline_tokens = peak * 1e9 / step_bytes * n_slots
        roofline_spec_tokens = HBM_SPEC_GBPS * 1e9 / step_bytes * n_slots
        flops_per_tok = 2.0 * llama.active_param_count(p) if hasattr(
            llama, "active_param_count") else 0.0
        out = {
            "metric": f"decode_tokens_per_s_per_chip_int{bits}_{model_name}_bs{n_slots}"
                      + ("_paged" if paged else "")
                      + (f"_kv{kv_bits}" if (not paged and kv_bits != 8) else ""),
            "kv_bits": kv_bits,
            "value": round(tokens_per_s, 1),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tokens_per_s / roofline_tokens, 4),
            "roofline_tokens_per_s_measured_peak": round(roofline_tokens, 1),
            "roofline_tokens_per_s_spec": round(roofline_spec_tokens, 1),
            "achieved_gbps_full_window_equiv": round(achieved_gbps, 1),
            "probe_peak_gbps": round(probe_gbps, 1),
            "measured_peak_gbps": round(peak, 1),
            "bw_util_vs_spec": round(achieved_gbps / HBM_SPEC_GBPS, 4),
            "spec_gbps": HBM_SPEC_GBPS,
            "step_ms_best": round(dt * 1e3, 3),
            "step_ms_mean": round(dt_mean * 1e3, 3),
            "chunks_timed": n_chunks_done,
            "partial": not final,
        }
        if flops_per_tok:
            out["mfu_vs_spec_394tf"] = round(
                (flops_per_tok * tokens_per_s) / 394e12, 5)
        print(json.dumps(out), flush=True)
        return out

    # timed run: steps chain through tokens + donated cache. The final
    # np.asarray is the fence — on this environment's remote device path,
    # block_until_ready alone can report before the work is actually done
    # (measured 27x optimistic); fetching bytes to host cannot lie.
    # time in per-dispatch chunks and use the BEST chunk: the relay's
    # throughput wanders across seconds, and best-window is the honest
    # pairing with the best-window peak probe (mean also reported).
    # A complete JSON line lands on stdout after EVERY chunk — a driver
    # timeout mid-run still captures a valid (flagged-partial) result.
    _phase("timed decode chunks")
    chunk_dts = []
    t_all = time.time()
    for i in range(outer_steps):
        t0 = time.time()
        tokens, cache, positions, _ = step_jit(params, tokens, cache, positions)
        np.asarray(tokens)
        chunk_dts.append((time.time() - t0) / inner_steps)
        emit(chunk_dts, time.time() - t_all, i + 1, peak_gbps, final=False)
        if _remaining() < 60 and i + 1 < outer_steps:
            print(f"# budget nearly exhausted — stopping after chunk {i+1}/"
                  f"{outer_steps}", file=sys.stderr, flush=True)
            break
    elapsed_total = time.time() - t_all

    probe_gbps = peak_gbps
    if _remaining() > 45:
        _phase("peak-probe (post)")
        probe_gbps = max(peak_gbps, measure_peak_gbps())
    else:
        print("# skipping post-run peak probe (budget)", file=sys.stderr,
              flush=True)
    probe_gbps = max(probe_gbps, FALLBACK_PEAK_GBPS)

    _phase("final emit")
    out = emit(chunk_dts, elapsed_total, len(chunk_dts), probe_gbps, final=True)
    print(
        f"# step best {out['step_ms_best']:.2f} / mean {out['step_ms_mean']:.2f} ms"
        f" | {out['value']:.0f} tok/s"
        f" | achieved {out['achieved_gbps_full_window_equiv']:.0f} GB/s"
        f" (probe {out['probe_peak_gbps']:.0f})"
        f" | roofline {out['roofline_tokens_per_s_measured_peak']:.0f} tok/s"
        f" (measured-peak) / {out['roofline_tokens_per_s_spec']:.0f} (spec)",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
