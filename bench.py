#!/usr/bin/env python3
"""Headline benchmark: INT4 Llama-2-7B continuous-batching decode throughput
on one chip (BASELINE.md configs[3]; the reference publishes no numbers —
BASELINE.json "published": {} — so the baseline is the chip's roofline).

Prints JSON lines to stdout (one per refinement); the LAST line is the final
result. Every line is a complete, valid measurement and self-describes its
baseline definition:
  {"metric": ..., "value": tokens/s/chip, "unit": "tokens/s/chip",
   "vs_baseline": value / roofline_tokens_per_s_measured_peak,
   "vs_baseline_def": <the formula, frozen — r1-r4 drifted>, ...}

Round-5 changes (VERDICT r4 #8 — stabilize the bench record):
  * BOTH kv_bits=8 and kv_bits=4 rows are measured in ONE session (weights
    uploaded once, caches swapped) so the two are same-weather comparable;
    the final line is the higher-tokens/s config and embeds the other row
    under "alt_config".
  * `vs_baseline` is NO LONGER clamped: it divides by the probe-derived
    roofline (probe floored at the historical-best 297 GB/s, never raised
    to `achieved`), so a regression cannot hide behind the clamp and a
    step whose full-window byte estimate beats the probe reads >1.0
    honestly (the kernel's per-slot DMA skip means charged bytes are an
    upper bound on true bytes).
  * `pct_of_measured_roofline` is explicit in every row.

Robustness (round-4 hardening — BENCH_r03 came back rc=124/parsed=null):
  * a stderr heartbeat thread reports the current phase every 20 s;
  * a wall-clock budget (TPUSERVE_BENCH_BUDGET_S, default 1500 s) trims the
    chunk count, skips the closing bandwidth probe, and can skip the
    secondary kv-bits row when short on time;
  * a JSON line is emitted after the FIRST timed chunk and refined as later
    chunks land — a timeout kill after that point still leaves a parseable
    partial result (partial > null).

Roofline model: a decode step must stream every live byte once over HBM —
quantized weights + embed table + the active KV window — at the chip's HBM
bandwidth; tokens/s_roofline = batch_slots / step_time_roofline. Overridable
via env: TPUSERVE_BENCH_{MODEL,BITS,SLOTS,SEQ,STEPS,KV_BITS,KV_BITS_ALT}.
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

# Round-5 discovery (CLAUDE.md, scripts/scan_overhead.py): every dispatch
# on this relay carries a ~25-48 ms round-trip, and the r1-r4 "297 GB/s
# measured peak" was an 8-pass scan paying that tax. A latency-cancelling
# SLOPE probe (time(128 passes) - time(16 passes)) streams ~750 GB/s —
# near the 819 spec. The roofline denominator floor is the slope-probed
# historical best; vs_baseline_legacy297 keeps the old record comparable.
FALLBACK_PEAK_GBPS = float(os.environ.get("TPUSERVE_BENCH_FALLBACK_GBPS", "750"))
LEGACY_PEAK_GBPS = 297.0

VS_BASELINE_DEF = (
    "tokens_per_s / roofline_tokens_per_s_measured_peak, where the roofline "
    "streams step_bytes (int-quantized weights + full static KV window) once "
    "at max(slope_probe_gbps, 750 historical-best floor); the probe is "
    "latency-cancelling (rate = bytes*(n2-n1)/(t2-t1), r5 — earlier rounds' "
    "297 GB/s floor was dispatch-latency-polluted, see vs_baseline_legacy297); "
    "NOT clamped by achieved (frozen r5)"
)

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
    """Latency-cancelling SLOPE probe of the chip's achievable HBM read
    bandwidth: time a 16-pass and a 128-pass chained streaming reduce over
    a 1 GB int8 buffer and take bytes*(128-16)/(t128-t16). The fixed
    ~25-48 ms dispatch round trip (r5 discovery) cancels in the
    subtraction; the r1-r4 8-pass best-of probe included it and reported
    ~297 GB/s for a ~750 GB/s chip."""
    n_rows, w = 262144, 4096
    x = jnp.ones((n_rows, w), jnp.int8)

    def make(length):
        def loop(x, s0):
            def body(s, _):
                return s + (x + (s % 2).astype(jnp.int8)).max().astype(jnp.int32), ()
            s, _ = jax.lax.scan(body, s0, None, length=length)
            return s
        return jax.jit(loop)

    bests = {}
    outs = jnp.int32(0)
    for length in (16, 128):
        j = make(length)
        out = j(x, outs)
        np.asarray(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = j(x, out % 3)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        bests[length] = best
        outs = out % 3
    del x
    dt = max(bests[128] - bests[16], 1e-9)
    return (n_rows * w) * (128 - 16) / dt / 1e9

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


def run_config(p, model_name, params, wbytes, bits, kv_bits, n_slots, max_len,
               inner_steps, outer_steps, paged, peak_gbps, emit_stdout=True):
    """Allocate a KV cache at kv_bits, compile + time the decode scan, and
    return the result row (emitting refinement JSON lines as chunks land
    when emit_stdout). Weights are shared across calls."""
    page_table = None
    _phase(f"kv{kv_bits} cache alloc")
    if paged:
        from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager

        page_size = int(os.environ.get("TPUSERVE_BENCH_PAGE_SIZE", "128"))
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
        if kv_bits == 4 and not flat:
            # packed int4 needs the flat layout; where the layout chooser
            # rules flat out (e.g. CPU platform), degrade to int8
            print("# int4 KV needs a flat cache; this config prefers 5D — "
                  "falling back to kv_bits=8", file=sys.stderr, flush=True)
            kv_bits = 8
        cache = KVCache.create(p, n_slots, max_len, quantized=True,
                               flat=flat, scale_dtype=scale_dt, kv_bits=kv_bits)
    kv_bytes = cache.nbytes
    print(f"# kv cache (kv{kv_bits}): {kv_bytes/1e9:.2f} GB", file=sys.stderr,
          flush=True)

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

    _phase(f"decode-graph compile kv{kv_bits} (cold: up to ~20 min; warm: seconds)")
    t0 = time.time()
    tokens, cache, positions, _ = step_jit(params, tokens, cache, positions)
    np.asarray(tokens)
    print(f"# decode step (kv{kv_bits}) compiled in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # roofline methodology: a decode step must stream weights + the active
    # KV window once. achieved_gbps charges the step its FULL static window
    # byte count (the kernel's per-slot DMA skip means true bytes moved are
    # fewer — achieved is an upper-bound estimator and may exceed the
    # probe). vs_baseline divides by the PROBE-derived roofline, unclamped
    # (VS_BASELINE_DEF); the spec-bandwidth roofline (819 GB/s) is also
    # reported and is unreachable on this relay (bare XLA reduce ~295 GB/s).
    step_bytes = wbytes + kv_bytes

    def emit(chunk_dts, elapsed_total, n_chunks_done, probe_gbps, final):
        dt = min(chunk_dts)
        dt_mean = elapsed_total / (n_chunks_done * inner_steps)
        tokens_per_s = n_slots / dt
        achieved_gbps = step_bytes / dt / 1e9
        denom_gbps = max(probe_gbps, FALLBACK_PEAK_GBPS)
        roofline_tokens = denom_gbps * 1e9 / step_bytes * n_slots
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
            "vs_baseline_def": VS_BASELINE_DEF,
            "vs_baseline_legacy297": round(
                tokens_per_s / (LEGACY_PEAK_GBPS * 1e9 / step_bytes * n_slots), 4),
            "pct_of_measured_roofline": round(100.0 * tokens_per_s / roofline_tokens, 1),
            "roofline_tokens_per_s_measured_peak": round(roofline_tokens, 1),
            "roofline_tokens_per_s_spec": round(roofline_spec_tokens, 1),
            "achieved_gbps_full_window_equiv": round(achieved_gbps, 1),
            "probe_peak_gbps": round(probe_gbps, 1),
            "roofline_denominator_gbps": round(denom_gbps, 1),
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
        if emit_stdout:
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
    _phase(f"timed decode chunks kv{kv_bits}")
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

    row = emit(chunk_dts, elapsed_total, len(chunk_dts), peak_gbps, final=True)
    # free the cache's device memory before the caller allocates the next
    # config (donation consumed the original; drop the live result buffers)
    del cache, tokens, positions, step_jit
    return row, chunk_dts, elapsed_total


def main():
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    model_name = os.environ.get("TPUSERVE_BENCH_MODEL", "llama2_7b")
    bits = int(os.environ.get("TPUSERVE_BENCH_BITS", "4"))
    n_slots = int(os.environ.get("TPUSERVE_BENCH_SLOTS", "64"))
    max_len = int(os.environ.get("TPUSERVE_BENCH_SEQ", "256"))
    # inner=32 (was 8 through r4): the relay's fixed ~25 ms dispatch round
    # trip (r5 discovery) inflated every reported step by RT/inner — ~3 ms
    # at inner=8. 32 on-device steps per dispatch cut the artifact to
    # <1 ms/step while remaining a real 32-step greedy decode.
    inner_steps = int(os.environ.get("TPUSERVE_BENCH_INNER", "32"))
    outer_steps = int(os.environ.get("TPUSERVE_BENCH_STEPS", "128")) // inner_steps
    p = MODELS[model_name]

    paged = os.environ.get("TPUSERVE_BENCH_PAGED", "0") == "1"
    # int4 KV is the accuracy-gated headline config (+8.3% over int8 KV,
    # .r3_ab4 / .r3_bench_kv4.log); paged pools stay int8. The secondary
    # row (VERDICT r4 #8: emit BOTH) defaults to int8.
    kv_bits = int(os.environ.get("TPUSERVE_BENCH_KV_BITS", "8" if paged else "4"))
    kv_bits_alt = int(os.environ.get("TPUSERVE_BENCH_KV_BITS_ALT",
                                     "0" if paged else ("8" if kv_bits == 4 else "4")))

    # The bandwidth probe runs AFTER the timed chunks (r3's driver bench
    # died rc=124 hung in a pre-run probe before any JSON had been emitted).
    # The denominator floors at the historical-best 297 GB/s anyway (probes
    # measure 179-297), so deferring the probe costs nothing and removes a
    # whole failure phase before the first emission.
    peak_gbps = FALLBACK_PEAK_GBPS

    _phase("weight init + upload")
    t0 = time.time()
    params = init_quantized_params(jax.random.PRNGKey(0), p, bits=bits, group_size=128)
    params = jax.device_put(params)
    jax.block_until_ready(jax.tree_util.tree_leaves(params))
    wbytes = param_bytes(params)
    print(f"# weights materialized: {wbytes/1e9:.2f} GB ({time.time()-t0:.1f}s)",
          file=sys.stderr, flush=True)

    row, chunk_dts, elapsed = run_config(
        p, model_name, params, wbytes, bits, kv_bits, n_slots, max_len,
        inner_steps, outer_steps, paged, peak_gbps)

    # secondary kv-bits row, same session/weather (skipped when the budget
    # is short — the headline row is the un-losable artifact)
    alt_row = None
    if kv_bits_alt and kv_bits_alt != kv_bits and _remaining() > 240:
        alt_row, _, _ = run_config(
            p, model_name, params, wbytes, bits, kv_bits_alt, n_slots, max_len,
            inner_steps, outer_steps, paged, peak_gbps)
    elif kv_bits_alt and kv_bits_alt != kv_bits:
        print("# skipping secondary kv-bits row (budget)", file=sys.stderr,
              flush=True)

    probe_gbps = peak_gbps
    if _remaining() > 45:
        _phase("peak-probe (post)")
        probe_gbps = max(peak_gbps, measure_peak_gbps())
    else:
        print("# skipping post-run peak probe (budget)", file=sys.stderr,
              flush=True)

    _phase("final emit")

    def _refresh(r):
        # recompute vs_baseline fields against the final probe (denominator
        # floors at FALLBACK so this can only tighten, never flatter)
        denom = max(probe_gbps, FALLBACK_PEAK_GBPS)
        scale = denom / r["roofline_denominator_gbps"]
        r["probe_peak_gbps"] = round(probe_gbps, 1)
        r["roofline_denominator_gbps"] = round(denom, 1)
        r["roofline_tokens_per_s_measured_peak"] = round(
            r["roofline_tokens_per_s_measured_peak"] * scale, 1)
        r["vs_baseline"] = round(r["value"] / r["roofline_tokens_per_s_measured_peak"], 4)
        r["pct_of_measured_roofline"] = round(100.0 * r["vs_baseline"], 1)
        r["partial"] = False
        return r

    row = _refresh(row)
    if alt_row is not None:
        alt_row = _refresh(alt_row)
        print(json.dumps(alt_row), flush=True)
        # headline = higher absolute tokens/s (same weather by construction)
        if alt_row["value"] > row["value"]:
            row, alt_row = alt_row, row
        row = dict(row)
        row["alt_config"] = {k: alt_row[k] for k in (
            "metric", "kv_bits", "value", "vs_baseline",
            "pct_of_measured_roofline", "step_ms_best", "step_ms_mean")}
    print(json.dumps(row), flush=True)
    print(
        f"# step best {row['step_ms_best']:.2f} / mean {row['step_ms_mean']:.2f} ms"
        f" | {row['value']:.0f} tok/s ({row['pct_of_measured_roofline']:.0f}% of"
        f" measured roofline)"
        f" | achieved {row['achieved_gbps_full_window_equiv']:.0f} GB/s"
        f" (probe {row['probe_peak_gbps']:.0f})"
        f" | roofline {row['roofline_tokens_per_s_measured_peak']:.0f} tok/s"
        f" (measured-peak) / {row['roofline_tokens_per_s_spec']:.0f} (spec)",
        file=sys.stderr, flush=True,
    )


if __name__ == "__main__":
    main()
