"""Anisotropic synthetic checkpoint generator.

No pretrained checkpoint is obtainable in this environment (zero egress),
and an ISOTROPIC random-init model is the worst case for low-bit
quantization: gaussian weights are maximally entropy-dense, every direction
of weight error reaches the output, and all quantizers — data-free or
calibrated — measurably tie at a KL floor (~0.16 nat at int4-g128 on
llama_1b; ACCURACY.json round-2/3 findings). Trained checkpoints are NOT
like that: their activations concentrate in a low-dimensional residual
subspace with a handful of massive channels, and their weight matrices
carry heavy-tailed input-channel scales (the LLM.int8() / AWQ /
massive-activations observations). That structure is exactly what lets
int4 serve trained 7B models within tight accuracy budgets, and what gives
calibration (GPTQ's Hessian-weighted rounding) its signal.

This module synthesizes that structure explicitly so the int4 accuracy
gate can be evaluated somewhere it can be PASSED — and failed. The
default knobs are CALIBRATED against published reality, not tuned until
the gate passes: plain round-to-nearest int4-g128 degrades Llama-2-7B by
~0.25-0.5 ppl (≈0.05-0.09 nat KL at ppl≈5.5 — GPTQ/AWQ papers' RTN
baselines), and on the default synthetic RTN lands at 0.085 nat (400m
scale). Against that anchored difficulty the quantizer ladder separates:
RTN 0.085 / clip-search 0.054 (both fail the 0.02-nat ≙ ≤0.1-ppl
BASELINE gate) vs GPTQ 0.0097 / GPTQ+LoRC-32 0.0067 (both pass) —
scripts/eval_accuracy.py --anisotropic-eval; ACCURACY.json round-4 rows.

Construction (all fp32, serving-path compatible flat param dict):
  * a shared r-dimensional residual subspace, r = rank_frac * dim: token
    embeddings are Z @ B + noise, with B an orthonormal-ish basis — the
    residual stream is effectively r-dimensional;
  * projections WRITING to the residual stream (wo, down, moe_down) are
    projected onto that subspace (plus an epsilon of full-rank leakage),
    so depth does not wash the anisotropy out;
  * a massive_frac fraction of embedding channels is boosted massive_scale
    x — the "massive activations" structure, making every per-layer input
    Hessian anisotropic;
  * a row_tail_frac fraction of every 2-D kernel's input rows is scaled by
    lognormal factors (median row_tail_log_median) — heavy-tailed
    input-channel weight magnitudes, the structure that crushes absmax
    group scales under RTN. The defaults (0.5%% of rows, median 3x) are
    the calibration point where RTN's damage matches its published
    real-7B damage (see module docstring).

Reference parity note: the reference repo has no quantization accuracy
machinery at all (SURVEY §5); this is north-star territory (BASELINE.md
configs[3]: INT4 within <=0.1 ppl).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpuserve.models.llama import LlamaParams


def _orthonormal_rows(key: jax.Array, r: int, dim: int) -> jax.Array:
    """[r, dim] with orthonormal rows (QR of a gaussian)."""
    g = jax.random.normal(key, (dim, r), jnp.float32)
    q, _ = jnp.linalg.qr(g)  # [dim, r], orthonormal columns
    return q.T


def init_params_anisotropic(
    rng: jax.Array,
    p: LlamaParams,
    *,
    rank_frac: float = 1.0 / 32.0,
    spectrum_alpha: float = 0.0,
    subspace_leak: float = 0.08,
    massive_frac: float = 0.01,
    massive_scale: float = 10.0,
    row_tail_frac: float = 0.005,
    row_tail_log_median: float = 3.0,
    write_scale: float = 1.0,
    dtype=jnp.float32,
) -> Dict[str, jax.Array]:
    """Flat fp32 param dict with trained-checkpoint-like anisotropy.

    Keys/shapes identical to llama.init_params, so the result drops into
    the real serving path (quantize_param_tree, GPTQ, Llama.apply).

    spectrum_alpha: the residual subspace's directions carry power-law
    energies s_i ∝ (i+1)^-alpha (normalized to unit mean square) — real
    activation covariance spectra decay, they are not flat over an
    r-dimensional ball; a flat spectrum both understates trained-model
    compressibility and makes low-rank structure meaningless below
    exactly rank r. 0 = flat (the round-4 first cut).

    write_scale: multiplier on the kernels that WRITE to the residual
    stream (wo, w_down, moe_down). Gaussian-core random init gives every
    layer a full-size contribution to the stream, so per-layer
    quantization noise accumulates with depth and the int4-RTN KL floor
    GROWS with model size (measured: 0.158 nat isotropic / 0.22-0.37
    anisotropic at 1b vs 0.085 at 400m) — the opposite of trained
    reality, where layer writes are small relative to the skip path and
    bigger models quantize EASIER. write_scale < 1 restores that
    skip-dominated composition; it is the per-size difficulty-anchor
    knob (calibrate so RTN int4-g128 lands at the published real-7B
    damage band, 0.05-0.09 nat, at the size being evaluated).
    """
    r = max(4, int(round(p.dim * rank_frac)))

    def nxt():
        nonlocal rng
        rng, k = jax.random.split(rng)
        return k

    std = 0.02
    basis = _orthonormal_rows(nxt(), r, p.dim)  # [r, dim]
    if spectrum_alpha > 0:
        pl = (jnp.arange(1, r + 1, dtype=jnp.float32) ** (-spectrum_alpha))
        pl = pl / jnp.sqrt(jnp.mean(pl ** 2))
        basis = basis * pl[:, None]
    # residual-subspace projector with epsilon full-rank leakage
    proj = basis.T @ basis  # [dim, dim]

    def to_subspace(w: jax.Array) -> jax.Array:
        """Project a [*, dim] kernel's OUTPUT onto the residual subspace
        (keep a leak so nothing is exactly singular)."""
        return w @ proj + subspace_leak * w

    def row_tails(key: jax.Array, w: jax.Array) -> jax.Array:
        """Scale a fraction of input rows by lognormal factors."""
        k_in = w.shape[0]
        n_out = max(1, int(round(k_in * row_tail_frac)))
        k1, k2 = jax.random.split(key)
        rows = jax.random.choice(k1, k_in, (n_out,), replace=False)
        factors = jnp.exp(jax.random.normal(k2, (n_out,), jnp.float32) * 0.5
                          + jnp.log(row_tail_log_median))
        mult = jnp.ones((k_in,), jnp.float32).at[rows].set(factors)
        return w * mult[:, None]

    def kernel(key: jax.Array, shape, write_to_stream: bool) -> jax.Array:
        w = jax.random.normal(key, shape, jnp.float32) * std
        w = row_tails(nxt(), w)
        if write_to_stream:
            w = to_subspace(w) * write_scale
        return w.astype(dtype)

    # embeddings: low-rank + noise, with massive channels
    z = jax.random.normal(nxt(), (p.vocab_size, r), jnp.float32)
    embed = (z @ basis) * std + subspace_leak * std * jax.random.normal(
        nxt(), (p.vocab_size, p.dim), jnp.float32)
    n_massive = max(1, int(round(p.dim * massive_frac)))
    chans = jax.random.choice(nxt(), p.dim, (n_massive,), replace=False)
    embed = embed * jnp.ones((p.dim,)).at[chans].set(massive_scale)[None, :]

    params: Dict[str, jax.Array] = {
        "embed/weight": embed.astype(dtype),
        "final_norm/scale": jnp.ones((p.dim,), dtype),
    }
    if not p.tie_embeddings:
        params["lm_head/kernel"] = kernel(
            nxt(), (p.dim, p.vocab_size), write_to_stream=False)
    qd = p.n_heads * p.head_dim
    kvd = p.n_kv_heads * p.head_dim
    for l in range(p.n_layers):
        pre = f"layers.{l}"
        params[f"{pre}/attn_norm/scale"] = jnp.ones((p.dim,), dtype)
        params[f"{pre}/wq/kernel"] = kernel(nxt(), (p.dim, qd), False)
        params[f"{pre}/wk/kernel"] = kernel(nxt(), (p.dim, kvd), False)
        params[f"{pre}/wv/kernel"] = kernel(nxt(), (p.dim, kvd), False)
        params[f"{pre}/wo/kernel"] = kernel(nxt(), (qd, p.dim), True)
        params[f"{pre}/mlp_norm/scale"] = jnp.ones((p.dim,), dtype)
        if p.n_experts:
            params[f"{pre}/router/kernel"] = kernel(
                nxt(), (p.dim, p.n_experts), False)
            params[f"{pre}/moe_gateup/kernel"] = jnp.stack([
                kernel(nxt(), (p.dim, 2 * p.ffn_dim), False)
                for _ in range(p.n_experts)])
            params[f"{pre}/moe_down/kernel"] = jnp.stack([
                kernel(nxt(), (p.ffn_dim, p.dim), True)
                for _ in range(p.n_experts)])
        else:
            params[f"{pre}/w_gate/kernel"] = kernel(
                nxt(), (p.dim, p.ffn_dim), False)
            params[f"{pre}/w_up/kernel"] = kernel(
                nxt(), (p.dim, p.ffn_dim), False)
            params[f"{pre}/w_down/kernel"] = kernel(
                nxt(), (p.ffn_dim, p.dim), True)
    return params
