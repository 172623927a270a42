"""HF-checkpoint converter (scripts/convert_hf_llama.py): synthetic
HF-format checkpoints -> tpuserve repository entries that the engine can
actually serve. Covers the dense Llama mapping and the Mixtral
block-sparse-MoE stacking (w1|w3 -> fused moe_gateup, w2 -> moe_down,
gate -> router)."""

import importlib.util
import json
import os

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "convert_hf_llama",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "convert_hf_llama.py"))
conv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(conv)

safetensors = pytest.importorskip("safetensors.numpy")


def _write_hf_llama(d, rng, n_layers=2, dim=16, heads=2, kv=2, ffn=24, vocab=64):
    cfg = {"num_hidden_layers": n_layers, "num_attention_heads": heads,
           "num_key_value_heads": kv, "hidden_size": dim,
           "intermediate_size": ffn, "vocab_size": vocab,
           "eos_token_id": [9, 10]}  # list form (Llama-3 style)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    w = {"model.embed_tokens.weight": rng.normal(size=(vocab, dim)),
         "model.norm.weight": np.ones(dim),
         "lm_head.weight": rng.normal(size=(vocab, dim))}
    hd = dim // heads
    for l in range(n_layers):
        pre = f"model.layers.{l}"
        w[f"{pre}.input_layernorm.weight"] = np.ones(dim)
        w[f"{pre}.post_attention_layernorm.weight"] = np.ones(dim)
        w[f"{pre}.self_attn.q_proj.weight"] = rng.normal(size=(heads * hd, dim))
        w[f"{pre}.self_attn.k_proj.weight"] = rng.normal(size=(kv * hd, dim))
        w[f"{pre}.self_attn.v_proj.weight"] = rng.normal(size=(kv * hd, dim))
        w[f"{pre}.self_attn.o_proj.weight"] = rng.normal(size=(dim, heads * hd))
        w[f"{pre}.mlp.gate_proj.weight"] = rng.normal(size=(ffn, dim))
        w[f"{pre}.mlp.up_proj.weight"] = rng.normal(size=(ffn, dim))
        w[f"{pre}.mlp.down_proj.weight"] = rng.normal(size=(dim, ffn))
    w = {k: (v * 0.05).astype(np.float32) for k, v in w.items()}
    safetensors.save_file(w, os.path.join(d, "model.safetensors"))
    return w


def _write_hf_mixtral(d, rng, n_layers=2, dim=16, heads=2, kv=2, ffn=24,
                      vocab=64, n_exp=4):
    cfg = {"num_hidden_layers": n_layers, "num_attention_heads": heads,
           "num_key_value_heads": kv, "hidden_size": dim,
           "intermediate_size": ffn, "vocab_size": vocab,
           "num_local_experts": n_exp, "num_experts_per_tok": 2,
           "eos_token_id": 2}
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg, f)
    w = {"model.embed_tokens.weight": rng.normal(size=(vocab, dim)),
         "model.norm.weight": np.ones(dim),
         "lm_head.weight": rng.normal(size=(vocab, dim))}
    hd = dim // heads
    for l in range(n_layers):
        pre = f"model.layers.{l}"
        w[f"{pre}.input_layernorm.weight"] = np.ones(dim)
        w[f"{pre}.post_attention_layernorm.weight"] = np.ones(dim)
        w[f"{pre}.self_attn.q_proj.weight"] = rng.normal(size=(heads * hd, dim))
        w[f"{pre}.self_attn.k_proj.weight"] = rng.normal(size=(kv * hd, dim))
        w[f"{pre}.self_attn.v_proj.weight"] = rng.normal(size=(kv * hd, dim))
        w[f"{pre}.self_attn.o_proj.weight"] = rng.normal(size=(dim, heads * hd))
        w[f"{pre}.block_sparse_moe.gate.weight"] = rng.normal(size=(n_exp, dim))
        for e in range(n_exp):
            epre = f"{pre}.block_sparse_moe.experts.{e}"
            w[f"{epre}.w1.weight"] = rng.normal(size=(ffn, dim))
            w[f"{epre}.w2.weight"] = rng.normal(size=(dim, ffn))
            w[f"{epre}.w3.weight"] = rng.normal(size=(ffn, dim))
    w = {k: (v * 0.05).astype(np.float32) for k, v in w.items()}
    safetensors.save_file(w, os.path.join(d, "model.safetensors"))
    return w


class TestLlamaConvert:
    def test_mapping_and_eos_list(self, tmp_path):
        rng = np.random.default_rng(0)
        hf = _write_hf_llama(str(tmp_path / "hf"), rng)
        vdir = conv.convert(str(tmp_path / "hf"), str(tmp_path / "repo"),
                            "m", "1", "none", "none", 4, 64)
        out = safetensors.load_file(os.path.join(vdir, "model.safetensors"))
        np.testing.assert_array_equal(
            out["layers.0/wq/kernel"],
            hf["model.layers.0.self_attn.q_proj.weight"].T)
        np.testing.assert_array_equal(
            out["lm_head/kernel"], hf["lm_head.weight"].T)
        cfg = json.load(open(os.path.join(vdir, "config.json")))
        assert cfg["generation"]["eos_token_id"] == 9  # list -> first id
        assert cfg["architecture"] == "llama"

    def test_converted_repo_serves(self, tmp_path):
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        rng = np.random.default_rng(1)
        _write_hf_llama(str(tmp_path / "hf"), rng)
        vdir = conv.convert(str(tmp_path / "hf"), str(tmp_path / "repo"),
                            "m", "1", "int8", "int8", 4, 64)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            r = eng.generate([5, 17, 30], max_new_tokens=4)
            assert r["num_generated"] >= 1
        finally:
            eng.stop()


class TestMixtralConvert:
    def test_expert_stacking(self, tmp_path):
        rng = np.random.default_rng(2)
        hf = _write_hf_mixtral(str(tmp_path / "hf"), rng)
        vdir = conv.convert(str(tmp_path / "hf"), str(tmp_path / "repo"),
                            "mx", "1", "none", "none", 4, 64)
        out = safetensors.load_file(os.path.join(vdir, "model.safetensors"))
        gu = out["layers.1/moe_gateup/kernel"]   # [E, D, 2F]
        dn = out["layers.1/moe_down/kernel"]     # [E, F, D]
        assert gu.shape == (4, 16, 48) and dn.shape == (4, 24, 16)
        e = 3
        np.testing.assert_array_equal(
            gu[e, :, :24], hf["model.layers.1.block_sparse_moe.experts.3.w1.weight"].T)
        np.testing.assert_array_equal(
            gu[e, :, 24:], hf["model.layers.1.block_sparse_moe.experts.3.w3.weight"].T)
        np.testing.assert_array_equal(
            dn[e], hf["model.layers.1.block_sparse_moe.experts.3.w2.weight"].T)
        np.testing.assert_array_equal(
            out["layers.0/router/kernel"],
            hf["model.layers.0.block_sparse_moe.gate.weight"].T)
        cfg = json.load(open(os.path.join(vdir, "config.json")))
        assert cfg["architecture"] == "mixtral"
        assert cfg["model_params"]["n_experts"] == 4
        assert cfg["model_params"]["n_experts_per_tok"] == 2

    def test_converted_mixtral_serves_quantized(self, tmp_path):
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        rng = np.random.default_rng(3)
        _write_hf_mixtral(str(tmp_path / "hf"), rng)
        vdir = conv.convert(str(tmp_path / "hf"), str(tmp_path / "repo"),
                            "mx", "1", "int8", "int8", 4, 64)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            r = eng.generate([5, 17, 30], max_new_tokens=4)
            assert r["num_generated"] >= 1
        finally:
            eng.stop()
