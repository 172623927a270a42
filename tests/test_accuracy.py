"""Quantization accuracy gates at test scale (BASELINE.md: ≤0.1 perplexity
delta for LLM INT4 vs FP16; ≤0.5% top-1 for CNNs — here scaled to a tiny
llama and synthetic data, asserting the same *kind* of invariant: quantized
perplexity tracks the fp32 model closely)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models import llama
from tpuserve.models.llama import LlamaParams
from tpuserve.quant.core import quantize_param_tree
from tpuserve.repository.config import ModelConfig
from tpuserve.models.registry import get_architecture

P = LlamaParams(vocab_size=256, dim=128, n_layers=2, n_heads=4, n_kv_heads=4,
                head_dim=32, ffn_dim=256)


def _arch():
    return get_architecture(ModelConfig(name="m", architecture="llama", model_params={
        "vocab_size": P.vocab_size, "dim": P.dim, "n_layers": P.n_layers,
        "n_heads": P.n_heads, "n_kv_heads": P.n_kv_heads, "head_dim": P.head_dim,
        "ffn_dim": P.ffn_dim,
    }))


def _perplexity(arch, params, tokens):
    out = arch.apply(params, {"input_ids": jnp.asarray(tokens)})
    logits = np.asarray(out["logits"], np.float64)[:, :-1, :]
    targets = np.asarray(tokens)[:, 1:]
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    nll = -np.take_along_axis(logp, targets[..., None], axis=-1).mean()
    return float(np.exp(nll))


@pytest.fixture(scope="module")
def setup():
    arch = _arch()
    params = arch.init(jax.random.PRNGKey(3))
    params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
    tokens = np.random.default_rng(0).integers(0, P.vocab_size, (4, 64)).astype(np.int32)
    return arch, params, tokens


def test_int8_perplexity_gate(setup):
    arch, params, tokens = setup
    base = _perplexity(arch, params, tokens)
    q8 = quantize_param_tree(params, bits=8, group_size=32, predicate=arch.quant_predicate)
    ppl8 = _perplexity(arch, q8, tokens)
    # random init => ppl near vocab_size; gate on relative drift
    assert abs(ppl8 - base) / base < 0.02, (base, ppl8)


def test_int4_perplexity_gate(setup):
    arch, params, tokens = setup
    base = _perplexity(arch, params, tokens)
    q4 = quantize_param_tree(params, bits=4, group_size=32, predicate=arch.quant_predicate)
    ppl4 = _perplexity(arch, q4, tokens)
    assert abs(ppl4 - base) / base < 0.10, (base, ppl4)


def test_int8_kv_cache_logits_close():
    """INT8 KV decode logits track the bf16-KV decode logits."""
    from tpuserve.models.llama import KVCache

    params = llama.init_params(jax.random.PRNGKey(1), P, dtype=jnp.float32)
    prompt = np.array([[7, 42, 99, 13, 5, 21, 8, 3]], np.int32)
    tokens16 = np.zeros((1, 16), np.int32)
    tokens16[0, :8] = prompt

    outs = {}
    for quantized in (False, True):
        cache = KVCache.create(P, 1, 32, quantized=quantized, dtype=jnp.float32)
        logits, cache = llama.prefill(params, P, jnp.asarray(tokens16), cache,
                                      jnp.int32(0), jnp.int32(8))
        t = jnp.asarray(np.array([int(np.argmax(np.asarray(logits)[0]))], np.int32))
        pos = jnp.asarray(np.array([8], np.int32))
        logits2, _ = llama.decode_step(params, P, t, cache, pos)
        outs[quantized] = np.asarray(logits2[0])

    ref, q = outs[False], outs[True]
    cc = np.corrcoef(ref, q)[0, 1]
    assert cc > 0.999, cc
    assert np.argmax(ref) == np.argmax(q)


class TestEvalHarness:
    """scripts/eval_accuracy.py — the BASELINE gates as a CLI."""

    def _make_repo(self, tmp_path, quant):
        import json as _json

        from safetensors.numpy import save_file

        rng = np.random.default_rng(0)
        vdir = tmp_path / "clf" / "1"
        vdir.mkdir(parents=True)
        save_file(
            {"dense1/kernel": rng.normal(size=(64, 128)).astype(np.float32),
             "dense1/bias": np.zeros(128, np.float32),
             "dense2/kernel": rng.normal(size=(128, 16)).astype(np.float32),
             "dense2/bias": np.zeros(16, np.float32)},
            str(vdir / "model.safetensors"),
        )
        (vdir / "config.json").write_text(_json.dumps({
            "name": "clf", "platform": "jax", "architecture": "mlp",
            "inputs": [{"name": "input", "shape": [-1, 64], "data_type": "FLOAT32"}],
            "outputs": [{"name": "output", "shape": [-1, 16], "data_type": "FLOAT32"}],
            "model_params": {"features": [128, 16]},
            "quantization": quant,
        }))
        return str(tmp_path)

    def test_classifier_gate_passes_int8(self, tmp_path):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
        import eval_accuracy

        repo = self._make_repo(tmp_path, {"weights": "int8", "group_size": 0})
        result = eval_accuracy.evaluate(repo, "clf", "", samples=32, seed=0)
        assert result["metric"] == "top1_agreement"
        assert result["gate_pass"], result

    def test_unquantized_model_rejected(self, tmp_path):
        import sys, os

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
        import eval_accuracy

        repo = self._make_repo(tmp_path, {"weights": "none"})
        with pytest.raises(SystemExit):
            eval_accuracy.evaluate(repo, "clf", "", samples=8, seed=0)

    def test_llama_perplexity_gate(self, tmp_path):
        import json as _json
        import sys, os

        from safetensors.numpy import save_file

        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
        import eval_accuracy

        arch = _arch()
        params = arch.init(jax.random.PRNGKey(1))
        vdir = tmp_path / "ll" / "1"
        vdir.mkdir(parents=True)
        save_file({k: np.asarray(v, np.float32) for k, v in params.items()},
                  str(vdir / "model.safetensors"))
        (vdir / "config.json").write_text(_json.dumps({
            "name": "ll", "platform": "llm", "architecture": "llama",
            "model_params": {"vocab_size": P.vocab_size, "dim": P.dim,
                              "n_layers": P.n_layers, "n_heads": P.n_heads,
                              "n_kv_heads": P.n_kv_heads, "head_dim": P.head_dim,
                              "ffn_dim": P.ffn_dim},
            "quantization": {"weights": "int8", "group_size": 32},
        }))
        result = eval_accuracy.evaluate(str(tmp_path), "ll", "", samples=32, seed=0)
        assert result["metric"] == "perplexity"
        assert "delta" in result


class TestMoEAccuracy:
    """Quantized MoE (stacked QExperts) tracks the fp32 MoE closely —
    the same relative-ppl gate as the dense model."""

    def _setup(self):
        p = dict(vocab_size=256, dim=128, n_layers=2, n_heads=4, n_kv_heads=4,
                 head_dim=32, ffn_dim=128, n_experts=4, n_experts_per_tok=2)
        arch = get_architecture(ModelConfig(name="moe", architecture="mixtral",
                                            model_params=p))
        params = arch.init(jax.random.PRNGKey(5))
        params = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
        tokens = np.random.default_rng(1).integers(0, 256, (4, 48)).astype(np.int32)
        return arch, params, tokens

    @pytest.mark.parametrize("bits,tol", [(8, 0.02), (4, 0.15)])
    def test_moe_perplexity_gate(self, bits, tol):
        arch, params, tokens = self._setup()
        base = _perplexity(arch, params, tokens)
        q = quantize_param_tree(params, bits=bits, group_size=32,
                                predicate=arch.quant_predicate)
        from tpuserve.quant.core import QExperts
        assert any(isinstance(v, QExperts) for v in q.values())
        ppl = _perplexity(arch, q, tokens)
        assert abs(ppl - base) / base < tol, (base, ppl)


def test_eval_real_ppl_smoke(tmp_path):
    """The turnkey real-checkpoint ppl gate (scripts/eval_real_ppl.py,
    VERDICT r4 #7) end to end on a tiny synthetic checkpoint via the
    tokenizer-less --token-ids path: same entry point a real Llama
    safetensors dir + text file would use."""
    import json
    import os
    import subprocess
    import sys

    from safetensors.numpy import save_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arch = _arch()
    params = arch.init(jax.random.PRNGKey(7))
    vdir = tmp_path / "models" / "syn" / "1"
    vdir.mkdir(parents=True)
    save_file({k: np.asarray(v, np.float32) for k, v in params.items()},
              str(vdir / "model.safetensors"))
    cfg = {
        "name": "syn", "platform": "llm", "architecture": "llama",
        "inputs": [{"name": "input_ids", "shape": [1, -1], "data_type": "INT32"}],
        "outputs": [{"name": "output_ids", "shape": [1, -1], "data_type": "INT32"}],
        "model_params": {
            "vocab_size": P.vocab_size, "dim": P.dim, "n_layers": P.n_layers,
            "n_heads": P.n_heads, "n_kv_heads": P.n_kv_heads,
            "head_dim": P.head_dim, "ffn_dim": P.ffn_dim,
        },
        "generation": {"max_seq_len": 64, "max_slots": 2, "eos_token_id": -1,
                       "max_new_tokens": 8},
        "quantization": {"weights": "int8", "group_size": 32},
    }
    with open(vdir / "config.json", "w") as f:
        json.dump(cfg, f)
    ids = np.random.default_rng(0).integers(0, P.vocab_size, 4 * 64)
    with open(tmp_path / "ids.json", "w") as f:
        json.dump([int(t) for t in ids], f)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "eval_real_ppl.py"),
         "--repository", str(tmp_path / "models"), "--model", "syn",
         "--token-ids", str(tmp_path / "ids.json"), "--ctx", "64",
         "--max-windows", "3", "--bits", "8", "--group-size", "32",
         "--quantizer", "rtn", "--platform", "cpu", "--json"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    row = json.loads(out.stdout.strip().splitlines()[-1])
    assert row["metric"] == "real_ppl_delta"
    assert row["eval_tokens"] == 3 * 63
    # int8 on a tiny random-init model: distributions near-identical
    assert abs(row["delta"]) <= 0.1 and row["gate_pass"]


def test_eval_real_ppl_gptq_calibration_split(tmp_path):
    """GPTQ leg of the turnkey gate: calibration windows are held out of
    the eval set (eval_windows + calib_windows == total windows)."""
    import json
    import os
    import subprocess
    import sys

    from safetensors.numpy import save_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arch = _arch()
    params = arch.init(jax.random.PRNGKey(9))
    vdir = tmp_path / "models" / "syn" / "1"
    vdir.mkdir(parents=True)
    save_file({k: np.asarray(v, np.float32) for k, v in params.items()},
              str(vdir / "model.safetensors"))
    cfg = {
        "name": "syn", "platform": "llm", "architecture": "llama",
        "inputs": [{"name": "input_ids", "shape": [1, -1], "data_type": "INT32"}],
        "outputs": [{"name": "output_ids", "shape": [1, -1], "data_type": "INT32"}],
        "model_params": {
            "vocab_size": P.vocab_size, "dim": P.dim, "n_layers": P.n_layers,
            "n_heads": P.n_heads, "n_kv_heads": P.n_kv_heads,
            "head_dim": P.head_dim, "ffn_dim": P.ffn_dim,
        },
        "generation": {"max_seq_len": 64, "max_slots": 2, "eos_token_id": -1,
                       "max_new_tokens": 8},
        "quantization": {"weights": "int4", "group_size": 32, "method": "gptq"},
    }
    with open(vdir / "config.json", "w") as f:
        json.dump(cfg, f)
    ids = np.random.default_rng(1).integers(0, P.vocab_size, 4 * 64)
    with open(tmp_path / "ids.json", "w") as f:
        json.dump([int(t) for t in ids], f)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "eval_real_ppl.py"),
         "--repository", str(tmp_path / "models"), "--model", "syn",
         "--token-ids", str(tmp_path / "ids.json"), "--ctx", "64",
         "--max-windows", "4", "--calib-windows", "2", "--bits", "4",
         "--group-size", "32", "--quantizer", "gptq", "--platform", "cpu",
         "--json"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    row = json.loads(out.stdout.strip().splitlines()[-1])
    assert row["calib_windows"] == 2
    assert row["eval_windows"] == 2  # held out: 4 total - 2 calibration
    assert np.isfinite(row["ppl_quant"]) and np.isfinite(row["ppl_fp"])
