#!/usr/bin/env python3
"""Turnkey real-checkpoint perplexity gate (VERDICT r4 #7).

ONE command from (any local Llama checkpoint) + (any text file) to the
BASELINE.md "<= 0.1 perplexity delta at INT4" gate row — so the day real
weights are available the gate runs with zero new code:

  # from a HuggingFace Llama dir (config.json + *.safetensors [+ tokenizer]):
  python scripts/eval_real_ppl.py --hf-dir /ckpt/Llama-2-7b-hf \
      --text /data/wikitext_val.txt --bits 4 --quantizer gptq --json

  # from an existing tpuserve repository entry:
  python scripts/eval_real_ppl.py --repository models --model llama2_7b \
      --text /data/wikitext_val.txt --json

  # tokenizer-less smoke path (used by tests/test_accuracy.py on the
  # anisotropic synthetic checkpoint): pre-tokenized ids, JSON or .npy
  python scripts/eval_real_ppl.py --repository models --model aniso \
      --token-ids ids.json --json

Method: teacher-forced next-token NLL over non-overlapping --ctx windows,
computed in two sequential passes so a 7B fp leg and its quantized leg
never share HBM (the fp params are freed before the quantized ones
upload). The quantize step itself runs on the host CPU backend. GPTQ
calibrates on the FIRST --calib-windows windows of the same text (held-in
calibration, held-out eval: eval starts after the calibration windows
unless --eval-all is set).

Tokenization: --text needs a tokenizer — taken from --hf-dir when present
(transformers, local files only) or --tokenizer-json. --token-ids skips
tokenization entirely.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import numpy as np


def _load_tokens(args) -> np.ndarray:
    if args.token_ids:
        if args.token_ids.endswith(".npy"):
            ids = np.load(args.token_ids)
        else:
            with open(args.token_ids) as f:
                ids = np.asarray(json.load(f))
        return ids.astype(np.int32).reshape(-1)
    if not args.text:
        raise SystemExit("provide --text (with a tokenizer) or --token-ids")
    with open(args.text) as f:
        text = f.read()
    if args.tokenizer_json:
        from transformers import PreTrainedTokenizerFast

        tok = PreTrainedTokenizerFast(tokenizer_file=args.tokenizer_json)
    elif args.hf_dir:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.hf_dir, local_files_only=True)
    else:
        raise SystemExit("--text needs --tokenizer-json or --hf-dir")
    return np.asarray(tok(text)["input_ids"], np.int32).reshape(-1)


def _model_entry(args):
    """Resolve (model_dir, ModelConfig): convert --hf-dir if given."""
    from tpuserve.repository.config import ModelConfig

    if args.hf_dir:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from convert_hf_llama import convert

        name = args.model or "real_ppl_eval"
        convert(args.hf_dir, args.repository, name, "1",
                quant=f"int{args.bits}", kv_cache="int8",
                max_slots=4, max_seq_len=max(args.ctx, 2048))
        model_dir = os.path.join(args.repository, name, "1")
    else:
        if not args.model:
            raise SystemExit("provide --hf-dir or --repository/--model")
        from tpuserve.repository import ModelRepository

        repo = ModelRepository(args.repository)
        model_dir = repo.get_model_path(args.model, args.version or None)
    cfg = ModelConfig.from_file(os.path.join(model_dir, "config.json"))
    return model_dir, cfg


def _nll(logits: np.ndarray, targets: np.ndarray) -> np.ndarray:
    lg = logits.astype(np.float64)
    m = lg.max(-1, keepdims=True)
    logp = lg - m - np.log(np.exp(lg - m).sum(-1, keepdims=True))
    return -np.take_along_axis(logp, targets[..., None], -1)[..., 0]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hf-dir", default="")
    ap.add_argument("--repository", default="models")
    ap.add_argument("--model", default="")
    ap.add_argument("--version", default="")
    ap.add_argument("--text", default="")
    ap.add_argument("--tokenizer-json", default="")
    ap.add_argument("--token-ids", default="",
                    help="pre-tokenized ids (.json list or .npy) — skips "
                         "the tokenizer (smoke path)")
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--max-windows", type=int, default=16)
    ap.add_argument("--calib-windows", type=int, default=4,
                    help="leading windows used for GPTQ calibration")
    ap.add_argument("--eval-all", action="store_true",
                    help="also evaluate on the calibration windows")
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--quantizer", default="gptq", choices=("rtn", "gptq"))
    ap.add_argument("--platform", default="",
                    help="force a JAX platform (e.g. cpu)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from tpuserve.engine.jax_backend import load_checkpoint
    from tpuserve.models import llama
    from tpuserve.models.llama import LlamaParams
    from tpuserve.models.registry import get_architecture
    from tpuserve.quant.core import quantize_param_tree

    model_dir, cfg = _model_entry(args)
    p = LlamaParams.from_dict(cfg.model_params)
    arch = get_architecture(cfg)
    ids = _load_tokens(args)

    ctx = min(args.ctx, int(cfg.generation.max_seq_len))
    n_win = min(args.max_windows, len(ids) // ctx)
    if n_win < 1:
        raise SystemExit(f"need >= {ctx} tokens, got {len(ids)}")
    windows = ids[: n_win * ctx].reshape(n_win, ctx)
    calib_n = min(args.calib_windows, n_win - 1) if args.quantizer == "gptq" \
        else 0
    eval_lo = 0 if (args.eval_all or calib_n == 0) else calib_n
    eval_windows = windows[eval_lo:]

    raw_np = load_checkpoint(model_dir)

    def fused(dtype):
        raw = {k: jnp.asarray(v, dtype) for k, v in raw_np.items()}
        return llama.fuse_params(raw, p)

    def run_ppl(params, tag):
        @jax.jit
        def win_logits(params, toks):
            return arch.apply(params, {"input_ids": toks[None, :]})["logits"][0]

        nll, cnt = 0.0, 0
        for i, w in enumerate(eval_windows):
            lg = np.asarray(win_logits(params, jnp.asarray(w)))[:-1]
            nll += float(_nll(lg, w[1:]).sum())
            cnt += ctx - 1
            print(f"# {tag} window {i+1}/{len(eval_windows)} "
                  f"ppl-so-far {np.exp(nll/cnt):.4f}", file=sys.stderr,
                  flush=True)
        return float(np.exp(nll / cnt))

    # pass 1: fp reference (bf16 on device — fits where fp32 would not)
    params_fp = fused(jnp.bfloat16)
    ppl_fp = run_ppl(params_fp, "fp")
    del params_fp

    # pass 2: quantize on the host CPU backend, then upload only the
    # quantized tree
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        host_fp = fused(jnp.float32)
        if args.quantizer == "gptq" and calib_n > 0:
            from tpuserve.quant.gptq import collect_and_quantize_llama

            params_q = collect_and_quantize_llama(
                host_fp, p, windows[:calib_n],
                bits=args.bits, group_size=args.group_size)
        else:
            def pred(name, arr):
                if "router" in name:
                    return False
                return arr.ndim in (2, 3) and name.endswith("kernel")

            params_q = quantize_param_tree(
                host_fp, bits=args.bits, group_size=args.group_size,
                predicate=pred)
        del host_fp
    params_q = jax.device_put(params_q)
    ppl_q = run_ppl(params_q, f"int{args.bits}-{args.quantizer}")

    result = {
        "metric": "real_ppl_delta",
        "model_dir": model_dir,
        "quantizer": args.quantizer,
        "bits": args.bits,
        "group_size": args.group_size,
        "ctx": ctx,
        "eval_windows": int(len(eval_windows)),
        "calib_windows": int(calib_n),
        "eval_tokens": int(len(eval_windows) * (ctx - 1)),
        "ppl_fp": round(ppl_fp, 4),
        "ppl_quant": round(ppl_q, 4),
        "delta": round(ppl_q - ppl_fp, 4),
        "gate": "<=0.1 ppl (BASELINE.md LLM gate)",
        "gate_pass": bool(ppl_q - ppl_fp <= 0.1),
    }
    print(json.dumps(result), flush=True)
    if not args.json:
        print(f"ppl fp {ppl_fp:.4f} -> int{args.bits} {ppl_q:.4f} "
              f"(delta {ppl_q - ppl_fp:+.4f}) "
              f"{'PASS' if result['gate_pass'] else 'FAIL'}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
