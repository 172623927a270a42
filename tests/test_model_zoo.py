"""Model-zoo tests: ResNet/BERT/DenseNet forward shapes, quantized-vs-fp32
accuracy gates at reduced scale, mixed-repository lifecycle (BASELINE.md
configs[2]: ResNet-50 + BERT-base mixed repo, dynamic load/unload)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models.registry import get_architecture, known_architectures
from tpuserve.quant.core import quantize_param_tree
from tpuserve.repository.config import ModelConfig


def _cfg(arch, model_params=None, inputs=None, outputs=None):
    return ModelConfig.from_dict(
        {
            "name": f"test_{arch}",
            "architecture": arch,
            "platform": "jax",
            "inputs": inputs or [],
            "outputs": outputs or [],
            "model_params": model_params or {},
        }
    )


def test_registry_has_all_families():
    known = known_architectures()
    for a in ("mlp", "llama", "resnet50", "bert", "densenet121"):
        assert a in known, f"{a} missing from registry ({known})"


class TestResNet:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = _cfg(
            "resnet50",
            inputs=[{"name": "input", "shape": [-1, 56, 56, 3], "data_type": "FLOAT32"}],
            outputs=[{"name": "logits", "shape": [-1, 10], "data_type": "FLOAT32"}],
            model_params={"num_classes": 10},
        )
        arch = get_architecture(cfg)
        params = arch.init(jax.random.PRNGKey(0))
        return arch, params

    def test_forward_shape(self, setup):
        arch, params = setup
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 56, 56, 3)), jnp.float32)
        out = arch.apply(params, {"input": x})
        assert out["logits"].shape == (2, 10)
        assert not np.any(np.isnan(np.asarray(out["logits"])))

    def test_nchw_input_accepted(self, setup):
        arch, params = setup
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 56, 56)), jnp.float32)
        out = arch.apply(params, {"input": x})
        assert out["logits"].shape == (1, 10)

    def test_int8_quantized_close(self, setup):
        """INT8 weight-only ≤ small top-1 disturbance (BASELINE.md ≤0.5%
        top-1 gate analogue at test scale: argmax agreement)."""
        arch, params = setup
        qparams = quantize_param_tree(params, bits=8, group_size=0, predicate=arch.quant_predicate)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 56, 56, 3)), jnp.float32)
        ref = np.asarray(arch.apply(params, {"input": x})["logits"])
        got = np.asarray(arch.apply(qparams, {"input": x})["logits"])
        # logits correlation should be very high
        cc = np.corrcoef(ref.reshape(-1), got.reshape(-1))[0, 1]
        assert cc > 0.99, cc


class TestBert:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = _cfg(
            "bert",
            inputs=[{"name": "input_ids", "shape": [-1, 32], "data_type": "INT32"}],
            outputs=[{"name": "logits", "shape": [-1, 2], "data_type": "FLOAT32"}],
            model_params={"vocab_size": 1000, "dim": 64, "n_layers": 2, "n_heads": 4,
                           "ffn_dim": 128, "max_len": 64},
        )
        arch = get_architecture(cfg)
        params = arch.init(jax.random.PRNGKey(0))
        return arch, params

    def test_forward_shape(self, setup):
        arch, params = setup
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (2, 32)), jnp.int32)
        out = arch.apply(params, {"input_ids": ids})
        assert out["logits"].shape == (2, 2)
        assert out["pooled"].shape == (2, 64)

    def test_attention_mask(self, setup):
        """Padding tokens must not change the [CLS] representation given the
        same real prefix."""
        arch, params = setup
        rng = np.random.default_rng(0)
        ids = rng.integers(1, 1000, (1, 32)).astype(np.int32)
        mask = np.ones((1, 32), np.int32)
        mask[0, 16:] = 0
        out1 = arch.apply(params, {"input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(mask)})
        ids2 = ids.copy()
        ids2[0, 16:] = rng.integers(1, 1000, 16)  # different padding content
        out2 = arch.apply(params, {"input_ids": jnp.asarray(ids2), "attention_mask": jnp.asarray(mask)})
        np.testing.assert_allclose(
            np.asarray(out1["pooled"]), np.asarray(out2["pooled"]), rtol=1e-2, atol=1e-2
        )

    def test_int8_quantized_close(self, setup):
        arch, params = setup
        qparams = quantize_param_tree(params, bits=8, group_size=32, predicate=arch.quant_predicate)
        ids = jnp.asarray(np.random.default_rng(2).integers(0, 1000, (2, 32)), jnp.int32)
        ref = np.asarray(arch.apply(params, {"input_ids": ids})["logits"])
        got = np.asarray(arch.apply(qparams, {"input_ids": ids})["logits"])
        assert np.corrcoef(ref.reshape(-1), got.reshape(-1))[0, 1] > 0.99


class TestDenseNet:
    def test_forward_shape_reference_layout(self):
        """Reference densenet config: NCHW input, [B,1000,1,1] output."""
        cfg = _cfg(
            "densenet121",
            inputs=[{"name": "data_0", "shape": [-1, 3, 64, 64], "data_type": "FLOAT32"}],
            outputs=[{"name": "fc6_1", "shape": [-1, 10, 1, 1], "data_type": "FLOAT32"}],
            model_params={"num_classes": 10},
        )
        arch = get_architecture(cfg)
        params = arch.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 3, 64, 64)), jnp.float32)
        out = arch.apply(params, {"data_0": x})
        assert out["fc6_1"].shape == (1, 10, 1, 1)


class TestMixedRepository:
    def test_resnet_bert_mixed_lifecycle(self, tmp_path):
        """BASELINE.md configs[2]: mixed repo, dynamic load/unload, INT8."""
        from safetensors.numpy import save_file

        from tpuserve.engine import InferenceManager
        from tpuserve.utils.tensor import Tensor

        # resnet entry (small input for speed)
        for name, arch_name, cfg_extra in [
            ("resnet", "resnet50", {
                "inputs": [{"name": "input", "shape": [-1, 32, 32, 3], "data_type": "FLOAT32"}],
                "outputs": [{"name": "logits", "shape": [-1, 4], "data_type": "FLOAT32"}],
                "model_params": {"num_classes": 4},
            }),
            ("bert", "bert", {
                "inputs": [{"name": "input_ids", "shape": [-1, 16], "data_type": "INT32"}],
                "outputs": [{"name": "logits", "shape": [-1, 2], "data_type": "FLOAT32"}],
                "model_params": {"vocab_size": 100, "dim": 32, "n_layers": 1, "n_heads": 2,
                                  "ffn_dim": 64, "max_len": 32},
            }),
        ]:
            cfg = {"name": name, "platform": "jax", "architecture": arch_name,
                   "quantization": {"weights": "int8", "group_size": 0}, **cfg_extra}
            arch = get_architecture(ModelConfig.from_dict(cfg))
            params = arch.init(jax.random.PRNGKey(0))
            vdir = tmp_path / name / "1"
            vdir.mkdir(parents=True)
            save_file({k: np.asarray(v, np.float32) for k, v in params.items()},
                      str(vdir / "model.safetensors"))
            (vdir / "config.json").write_text(json.dumps(cfg))

        m = InferenceManager(str(tmp_path))
        try:
            m.load_model("resnet")
            m.load_model("bert")
            assert m.is_model_loaded("resnet") and m.is_model_loaded("bert")
            out = m.run_inference(
                "resnet",
                [Tensor.from_numpy("input", np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32))],
            )
            assert out[0].shape == (1, 4)
            out = m.run_inference(
                "bert",
                [Tensor.from_numpy("input_ids", np.random.default_rng(0).integers(0, 100, (1, 16)).astype(np.int32))],
            )
            assert out[0].shape == (1, 2)
            m.unload_model("resnet")
            assert not m.is_model_loaded("resnet") and m.is_model_loaded("bert")
            m.load_model("resnet")  # reload after unload
            assert m.is_model_loaded("resnet")
        finally:
            m.shutdown()
