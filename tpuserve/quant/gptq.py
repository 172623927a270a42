"""GPTQ: calibrated, error-compensated weight quantization.

Round-to-nearest (even with MSE clip search) quantizes each weight in
isolation; at 4 bits the per-group noise lands straight on the layer
output. GPTQ (Frantar et al., 2022) instead minimizes the OUTPUT error
||(W - Q) X||_F layer by layer: rows of W (input dims, our K axis) are
quantized in order, and each row's rounding error is propagated into the
not-yet-quantized rows through the inverse Hessian H^-1 = (X X^T + λI)^-1
of the layer's calibration activations, so later rows absorb earlier
rows' mistakes.

Output format is EXACTLY `quant.core.QTensor` (same group scales, same
split-half int4 packing), so the fused Pallas dequant matmul and every
serving path consume GPTQ weights unchanged — calibration is a pure
load-time improvement.

The implementation is written from the published algorithm (blocked
Cholesky form), not ported: host-side numpy in f64 (quantization is a
one-time load cost; the O(K^2 N) trailing updates are ~1e10 flops for 7B
projections — seconds per weight).

No pretrained checkpoints exist in this environment (zero egress), so the
in-repo calibration source is the same synthetic token distribution the
accuracy harness evaluates on; real deployments pass their own token
sample (`scripts/convert_hf_llama.py --gptq-calib`). Reference parity:
the reference server (model.cpp:1158-1328) runs pre-quantized engines and
has no quantizer at all — this is north-star BASELINE.md territory.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np

from tpuserve.quant.core import QTensor, pack_int4, _group_count


def gptq_quantize(w, h, bits: int = 4, group_size: int = 128,
                  percdamp: float = 0.01, block: int = 128,
                  n_samples: Optional[int] = None,
                  act_order: bool = True) -> QTensor:
    """Quantize one [K, N] weight given the calibration Hessian H [K, K]
    (sum over calibration tokens of x x^T; un-normalized is fine — the
    algorithm is scale-invariant in H up to the damping split).

    Group scales are computed from the CURRENT (error-updated) rows when
    row processing enters each group, exactly like grouped GPTQ.

    `n_samples`: calibration token count behind H. When it is below K the
    Hessian is rank-deficient and the inverse-Hessian propagation
    overfits the calibration subspace — MEASURED to make GPTQ *worse*
    than RTN on held-out inputs (tests/test_gptq.py). Damping is scaled
    by max(1, K / n_samples) to pull the propagation toward identity
    (= plain RTN) exactly when the data cannot support it.
    """
    import jax.numpy as jnp

    w = np.asarray(w, np.float64)
    if w.ndim != 2:
        raise ValueError(f"gptq_quantize expects a 2-D weight, got {w.shape}")
    k, n = w.shape
    h = np.asarray(h, np.float64).copy()
    if h.shape != (k, k):
        raise ValueError(f"Hessian shape {h.shape} != ({k}, {k})")

    qmax = {8: 127.0, 4: 7.0}[bits]
    groups = _group_count(k, group_size)
    gs = k // groups

    # dead inputs (never activated in calibration): freeze to 0
    diag = np.diag(h).copy()
    dead = diag <= 0
    h[dead, dead] = 1.0
    w[dead, :] = 0.0

    # act-order WITHIN each scale group (GPTQ desc_act): high-Hessian-
    # energy rows quantize first so their rounding error is absorbed by
    # the most remaining rows. The permutation is block-diagonal over the
    # groups, so group membership — and therefore the QTensor contiguous
    # group-scale layout the fused serving kernel reads — is unchanged;
    # only the elimination order inside each group moves. Measured ~15-25%
    # KL reduction on anisotropic checkpoints (tests/test_gptq.py).
    perm = np.arange(k)
    if act_order and groups >= 1:
        gs0 = k // groups
        d0 = np.diag(h)
        for g0 in range(groups):
            a, b = g0 * gs0, min((g0 + 1) * gs0, k)
            order = np.argsort(-d0[a:b], kind="stable")
            perm[a:b] = a + order
        w = w[perm, :]
        h = h[perm][:, perm]
        diag = diag[perm]
        dead = dead[perm]

    if n_samples is not None and n_samples < k:
        # rank-deficient H (fewer calibration tokens than input dims):
        # shrink toward the diagonal — a diagonal H has zero propagation,
        # i.e. exact RTN, the correct no-information asymptote. Linear-in-
        # deficit α measured on held-out data: beats both plain GPTQ
        # (which overfits the calibration subspace, up to 1.27x RTN error)
        # and pure RTN at every T/K tested (tests/test_gptq.py).
        alpha = 1.0 - n_samples / k
        h = (1.0 - alpha) * h + alpha * np.diag(np.diag(h))
    damp = percdamp * float(np.mean(diag[~dead])) if (~dead).any() else 1.0
    h[np.arange(k), np.arange(k)] += max(damp, 1e-10)

    # U upper-triangular with U^T U = H^-1; U[i, i:] carries the
    # trailing-submatrix inverse info the elimination order needs
    hinv = np.linalg.inv(h)
    # symmetrize against inv() roundoff before Cholesky
    hinv = (hinv + hinv.T) / 2.0
    u = np.linalg.cholesky(hinv).T

    q_codes = np.zeros((k, n), np.int8)
    scale = np.zeros((groups, n), np.float64)

    for i1 in range(0, k, block):
        i2 = min(i1 + block, k)
        err_blk = np.zeros((i2 - i1, n), np.float64)
        for i in range(i1, i2):
            g = i // gs
            if i % gs == 0:
                # scale from the error-updated rows of this group; MSE clip
                # search (same grid as quant.core) composes with the error
                # compensation — absmax alone loses to RTN+clip at int4
                wg = w[i : i + gs, :]
                absmax = np.abs(wg).max(axis=0)
                base = np.maximum(absmax / qmax, 1e-8)
                if bits <= 4:
                    best_err = None
                    best = base
                    for a in (1.0, 0.95, 0.9, 0.85, 0.8, 0.75, 0.7):
                        s_c = np.maximum(absmax * a / qmax, 1e-8)
                        qv = np.clip(np.round(wg / s_c), -qmax - 1, qmax)
                        err_c = ((qv * s_c - wg) ** 2).sum(axis=0)
                        if best_err is None:
                            best_err, best = err_c, s_c
                        else:
                            take = err_c < best_err
                            best_err = np.where(take, err_c, best_err)
                            best = np.where(take, s_c, best)
                    scale[g] = best
                else:
                    scale[g] = base
            d = u[i, i]
            qi = np.clip(np.round(w[i] / scale[g]), -qmax - 1, qmax)
            q_codes[i] = qi.astype(np.int8)
            dq = qi * scale[g]
            err = (w[i] - dq) / d
            if i + 1 < i2:
                w[i + 1 : i2, :] -= np.outer(u[i, i + 1 : i2], err)
            err_blk[i - i1] = err
        if i2 < k:
            w[i2:, :] -= u[i1:i2, i2:].T @ err_blk

    if act_order:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(k)
        q_codes = q_codes[inv, :]  # back to the original row order

    scale_j = jnp.asarray(scale, jnp.float32)
    if bits == 4:
        qj = pack_int4(jnp.asarray(q_codes), gs)
    else:
        qj = jnp.asarray(q_codes)
    return QTensor(q=qj, scale=scale_j, bits=bits,
                   group_size=gs if groups > 1 else 0, orig_shape=(k, n))


def lorc_factors(w, qt, h, r: int, dtype=None):
    """Rank-r Hessian-weighted factorization of the quantization residual
    (ZeroQuant-V2-style LoRC): minimize ||L^T (R - A B)||_F over rank-r
    A [K, r], B [r, N], where R = W - dq(Wq) and H = L L^T is the layer's
    calibration Hessian — the weighted SVD puts the correction exactly in
    the directions the activation covariance says matter. Serving applies
    out += (x @ A) @ B (models/llama._lorc). Returns (A, B) in `dtype`
    (bf16 default: 2r(K+N) extra bytes)."""
    import jax.numpy as jnp

    from tpuserve.quant.core import dequantize

    w = np.asarray(w, np.float64)
    k = w.shape[0]
    resid = w - np.asarray(dequantize(qt), np.float64)
    h = np.asarray(h, np.float64).copy()
    d = np.diag(h).copy()
    d[d <= 0] = 1.0
    h[np.arange(k), np.arange(k)] = d * (1.0 + 1e-6)
    h += 1e-8 * float(np.mean(d)) * np.eye(k)
    l = np.linalg.cholesky((h + h.T) / 2.0)
    u, s, vt = np.linalg.svd(l.T @ resid, full_matrices=False)
    r = min(r, len(s))
    # A = L^-T U_r S_r  (solve instead of inverting)
    a = np.linalg.solve(l.T, u[:, :r] * s[:r][None, :])
    b = vt[:r, :]
    dt = jnp.bfloat16 if dtype is None else dtype
    return jnp.asarray(a, dt), jnp.asarray(b, dt)


def collect_and_quantize_llama(params: Dict, p, tokens,
                               bits: int = 4, group_size: int = 128,
                               percdamp: float = 0.01,
                               quantize_lm_head: bool = True,
                               act_scale: bool = False,
                               lowrank_r: int = 0,
                               progress=None) -> Dict:
    """Sequentially GPTQ-quantize a Llama param dict.

    Layer by layer: (1) run the block forward with the CURRENT params
    (earlier layers already quantized — the calibration activations see
    the quantized prefix, like the reference algorithm), recording each
    projection's input Hessian via the `mm` hook; (2) GPTQ-quantize the
    layer's 2-D kernels; (3) advance activations through the quantized
    block. `tokens` [B, L] int32 calibration batch.

    MoE expert stacks are left unquantized here (per-expert routed
    Hessians are a different collection problem); callers quantize them
    with the RTN path.

    Calibration size matters: below ~2x the largest contraction dim
    (ffn_dim) the Hessians are rank-deficient and GPTQ degrades toward —
    or below — RTN on held-out data (damping auto-scales as a backstop,
    but data is the fix). A warning is logged when under-calibrated.
    """
    import logging

    import jax
    import jax.numpy as jnp

    from tpuserve.models import llama as L

    tokens = jnp.asarray(tokens, jnp.int32)
    b, seq = tokens.shape
    n_samples = b * seq
    k_max = max(p.dim, p.ffn_dim, p.n_heads * p.head_dim)
    if n_samples < 2 * k_max:
        logging.getLogger("tpuserve.quant").warning(
            "gptq: %d calibration tokens < 2x max contraction dim %d — "
            "Hessians are under-determined; expect RTN-level (not better) "
            "accuracy. Provide a larger calibration sample.",
            n_samples, k_max)
    x = params["embed/weight"][tokens].astype(jnp.float32)
    positions = jnp.arange(seq, dtype=jnp.int32)[None, :]
    cos, sin = L.rope_cos_sin(positions, p.head_dim, p.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    mask = positions[:, :, None] >= positions[:, None, :]

    def attn_fn(q, k_, v):
        q = q.reshape(b, seq, p.n_heads, p.head_dim)
        k_ = k_.reshape(b, seq, p.n_kv_heads, p.head_dim)
        v = v.reshape(b, seq, p.n_kv_heads, p.head_dim)
        q = L.apply_rope(q, cos, sin)
        k_ = L.apply_rope(k_, cos, sin)
        return L._attention_prefill(q, k_, v, mask).reshape(b, seq, -1)

    out = dict(params)

    def hessian_of(inp) -> np.ndarray:
        xf = np.asarray(inp, np.float64).reshape(-1, inp.shape[-1])
        return xf.T @ xf

    def fold_act_scale(norm_name: str, kernel_names, hs: Dict) -> None:
        """AWQ-style activation-aware scaling (Lin et al., 2023): scale
        input row r of every kernel fed by `norm_name` by
        s_r = rms(x_r)^0.5 (geomean-normalized) and fold 1/s into the
        RMSNorm's scale vector. Exact in fp — the matmul outputs are
        unchanged — but the int4 grid then sees weight rows whose
        magnitudes track activation energy, so massive-activation
        channels stop starving the other rows' resolution. Only applied
        when EVERY consumer of the norm is among the scaled kernels
        (MoE mlp_norms feed unquantized expert stacks — skipped)."""
        ks = [kn for kn in kernel_names if kn in hs]
        if len(ks) != len(kernel_names) or not ks:
            return
        d = np.sqrt(np.maximum(np.diag(hs[ks[0]]), 1e-12))  # ∝ rms(x_r)
        s = np.sqrt(d)
        s = s / np.exp(np.mean(np.log(s)))  # geomean 1
        sj = jnp.asarray(s, jnp.float32)
        for kn in ks:
            out[kn] = (jnp.asarray(out[kn], jnp.float32)
                       * sj[:, None]).astype(out[kn].dtype)
            hs[kn] = hs[kn] / np.outer(s, s)  # H for x' = x / s
        sc = f"{norm_name}/scale"
        out[sc] = (jnp.asarray(out[sc], jnp.float32) / sj).astype(out[sc].dtype)

    for l in range(p.n_layers):
        pre = f"layers.{l}"
        hs: Dict[str, np.ndarray] = {}

        def rec_mm(prm, name, inp):
            if name.endswith("kernel") and getattr(prm[name], "ndim", 0) == 2:
                key = name
                hcur = hessian_of(inp)
                hs[key] = hs[key] + hcur if key in hs else hcur
            return L._mm_direct(prm, name, inp)

        # eager (un-jitted) pass so the recorder sees concrete values
        L._forward_block(out, pre, x, p, attn_fn, mm=rec_mm)

        if act_scale:
            fold_act_scale(f"{pre}/attn_norm",
                           (f"{pre}/wq/kernel", f"{pre}/wk/kernel",
                            f"{pre}/wv/kernel"), hs)
            fold_act_scale(f"{pre}/mlp_norm",
                           (f"{pre}/w_gate/kernel", f"{pre}/w_up/kernel"), hs)

        for name, h in hs.items():
            w = out[name]
            out[name] = gptq_quantize(np.asarray(w, np.float32), h,
                                      bits=bits, group_size=group_size,
                                      percdamp=percdamp,
                                      n_samples=n_samples)
            if lowrank_r > 0:
                a, b_ = lorc_factors(np.asarray(w, np.float32), out[name],
                                     h, lowrank_r)
                out[f"{name}@lorc_a"], out[f"{name}@lorc_b"] = a, b_
            if progress:
                progress(name)

        x = L._forward_block(out, pre, x, p, attn_fn, mm=L._mm_direct)

    if quantize_lm_head and "lm_head/kernel" in out:
        hfin = hessian_of(L.rms_norm(out, "final_norm", x, p.rms_eps))
        if act_scale:
            hs_fin = {"lm_head/kernel": hfin}
            fold_act_scale("final_norm", ("lm_head/kernel",), hs_fin)
            hfin = hs_fin["lm_head/kernel"]
        w_head = np.asarray(out["lm_head/kernel"], np.float32)
        out["lm_head/kernel"] = gptq_quantize(
            w_head, hfin, bits=bits, group_size=group_size,
            percdamp=percdamp, n_samples=n_samples)
        if lowrank_r > 0:
            a, b_ = lorc_factors(w_head, out["lm_head/kernel"], hfin,
                                 lowrank_r)
            out["lm_head/kernel@lorc_a"] = a
            out["lm_head/kernel@lorc_b"] = b_
        if progress:
            progress("lm_head/kernel")
    return out
