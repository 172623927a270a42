#!/usr/bin/env python3
"""RTN-only difficulty probe for the anisotropic synthetic (headline gate
calibration). The generator's difficulty is NOT size-invariant: knobs that
put int4-g128 RTN at the published-reality anchor (0.05-0.09 nat) at 400m
measured 0.37 nat at 1b (ACCURACY.json 2026-08-20T13:53). The documented
methodology — anchor difficulty to RTN's published real-7B damage, THEN
measure the quantizer ladder — must be applied at the size being reported,
so this probe maps row_tail_log_median -> KL(int4 RTN) at a given size
cheaply (no GPTQ), to pick the anchor point for the full ladder run.

Round-4 finding: tails are NOT the dominant 1b damage — med=1.0 still
measures 0.22 nat (the gaussian-core depth floor). The per-size anchor
knob is write_scale (skip-dominated residual composition; see
models/synthetic.py). Probe it with: probe_aniso_difficulty.py llama_1b
ws=1.0 ws=0.5 ws=0.25 (med= args probe row_tail_log_median instead).
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from tpuserve.models.llama import Llama, LlamaParams
from tpuserve.models.synthetic import init_params_anisotropic
from tpuserve.quant.core import quantize

SIZES = {
    "llama_1b": LlamaParams(vocab_size=32000, dim=2048, n_layers=16,
                            n_heads=16, n_kv_heads=16, head_dim=128,
                            ffn_dim=5504),
    "llama_400m": LlamaParams(vocab_size=32000, dim=1024, n_layers=8,
                              n_heads=8, n_kv_heads=8, head_dim=128,
                              ffn_dim=2816),
}


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "llama_1b"
    knobs = []  # (med, write_scale)
    for a in sys.argv[2:]:
        if a.startswith("ws="):
            knobs.append((3.0, float(a[3:])))
        else:
            knobs.append((float(a.replace("med=", "")), 1.0))
    knobs = knobs or [(3.0, 0.5), (3.0, 0.25)]
    p = SIZES[size]
    seed = 0
    rng = np.random.default_rng(seed)
    tokens = rng.integers(0, p.vocab_size, (4, 64)).astype(np.int32)

    arch = Llama.__new__(Llama)
    arch.params_cfg = {k: getattr(p, k) for k in (
        "vocab_size", "dim", "n_layers", "n_heads", "n_kv_heads", "head_dim",
        "ffn_dim", "rope_theta", "rms_eps", "tie_embeddings")}

    def logprobs(params):
        out = arch.apply(params, {"input_ids": jnp.asarray(tokens)})
        logits = np.asarray(out["logits"], np.float64)[:, :-1, :]
        m = logits.max(-1, keepdims=True)
        return logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))

    for med, ws in knobs:
        params_fp = init_params_anisotropic(
            jax.random.PRNGKey(seed), p, row_tail_log_median=med,
            write_scale=ws)
        lp_fp = logprobs(params_fp)
        q = {}
        for name, w in params_fp.items():
            if w.ndim == 2 and name.endswith("kernel"):
                q[name] = quantize(w, bits=4, group_size=128,
                                   clip_search=False)
            else:
                q[name] = w
        lp = logprobs(q)
        kl = float((np.exp(lp_fp) * (lp_fp - lp)).sum(-1).mean())
        in_band = "IN-BAND" if 0.05 <= kl <= 0.09 else (
            "too-hard" if kl > 0.09 else "too-easy")
        print(f"{size} med={med:<4} ws={ws:<5} kl_int4_rtn={kl:.4f}  {in_band}",
              flush=True)


if __name__ == "__main__":
    main()
