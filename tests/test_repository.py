"""Repository + config tests (≙ reference ModelRepository semantics,
model_repository.cpp — but with a real config parser)."""

import json
import os

import pytest

from tpuserve.fixtures import create_test_model
from tpuserve.repository import ModelConfig, ModelRepository, ModelType
from tpuserve.utils.dtypes import DataType
from tpuserve.utils.errors import InvalidArgumentError, ModelNotFoundError


@pytest.fixture()
def repo_dir(tmp_path):
    create_test_model(str(tmp_path))
    return str(tmp_path)


class TestModelConfig:
    def test_parse_reference_style_config(self, tmp_path):
        """The reference's own config.json formats must parse (test_model and
        densenet variants, models/*/1/config.json)."""
        cfg_dict = {
            "name": "densenet_onnx",
            "platform": "onnxruntime_onnx",
            "version": "1",
            "inputs": [
                {"name": "data_0", "dims": [3, 224, 224], "shape": [1, 3, 224, 224], "data_type": "FLOAT32"}
            ],
            "outputs": [
                {"name": "fc6_1", "dims": [1000], "shape": [1, 1000, 1, 1], "data_type": "FLOAT32",
                 "label_filename": "densenet_label.txt"}
            ],
        }
        cfg = ModelConfig.from_dict(cfg_dict)
        assert cfg.name == "densenet_onnx"
        assert cfg.inputs[0].shape == [1, 3, 224, 224]
        assert cfg.inputs[0].data_type == DataType.FP32
        assert cfg.outputs[0].label_filename == "densenet_label.txt"
        assert ModelType.from_platform(cfg.platform) == ModelType.ONNX

    def test_dims_only_gets_batch_dim(self):
        cfg = ModelConfig.from_dict(
            {"name": "m", "inputs": [{"name": "x", "dims": [3, 224, 224]}], "outputs": []}
        )
        assert cfg.inputs[0].shape == [1, 3, 224, 224]

    def test_missing_name_rejected(self):
        with pytest.raises(InvalidArgumentError):
            ModelConfig.from_dict({"inputs": []})

    def test_bad_quantization_rejected(self):
        with pytest.raises(InvalidArgumentError):
            ModelConfig.from_dict({"name": "m", "quantization": {"weights": "int2"}})

    def test_quantization_roundtrip(self):
        cfg = ModelConfig.from_dict(
            {"name": "m", "quantization": {"weights": "int4", "group_size": 64, "kv_cache": "int8"}}
        )
        assert cfg.quantization.weights == "int4"
        assert cfg.quantization.group_size == 64
        d = cfg.to_dict()
        cfg2 = ModelConfig.from_dict(d)
        assert cfg2.quantization == cfg.quantization

    def test_label_file_resolution_fixes_reference_bug(self, tmp_path):
        """Reference resolves labels against the repo root and silently fails
        (SURVEY.md §2c.7). We resolve against the model version dir, with a
        fuzzy fallback for the reference's broken filename."""
        vdir = tmp_path / "m" / "1"
        vdir.mkdir(parents=True)
        (vdir / "densenet_labels.txt").write_text("a\nb\n")
        cfg = ModelConfig.from_dict(
            {"name": "m",
             "outputs": [{"name": "out", "shape": [1, 2], "label_filename": "densenet_label.txt"}]}
        )
        resolved = cfg.resolve_label_file(str(vdir), "out")
        assert resolved is not None and resolved.endswith("densenet_labels.txt")


class TestModelRepository:
    def test_scan_finds_fixture(self, repo_dir):
        repo = ModelRepository(repo_dir)
        assert repo.get_model_names() == ["test_model"]
        assert repo.has_model("test_model")
        assert repo.has_model("test_model", "1")
        assert not repo.has_model("nope")

    def test_version_resolution_numeric_descending(self, repo_dir):
        for v in ["2", "9", "10"]:
            create_test_model(repo_dir, version=v)
        repo = ModelRepository(repo_dir)
        assert repo.get_versions("test_model") == ["10", "9", "2", "1"]
        # "10" beats "9": numeric sort, not the Go path's string sort (§2c.5)
        assert repo.get_latest_version("test_model") == "10"
        assert repo.resolve_version("test_model", None) == "10"
        assert repo.resolve_version("test_model", "2") == "2"
        with pytest.raises(ModelNotFoundError):
            repo.resolve_version("test_model", "3")

    def test_non_numeric_versions_sort_after_numeric(self, repo_dir):
        """'latest' must not beat '10' (matches native VersionGreater:
        numeric first under the descending sort)."""
        for v in ["9", "10", "latest"]:
            create_test_model(repo_dir, version=v)
        repo = ModelRepository(repo_dir)
        assert repo.get_versions("test_model") == ["10", "9", "1", "latest"]
        assert repo.get_latest_version("test_model") == "10"

    def test_live_rescan(self, repo_dir):
        repo = ModelRepository(repo_dir)
        create_test_model(repo_dir, name="late_model")
        assert "late_model" in repo.get_model_names()  # no explicit rescan call

    def test_type_detection(self, repo_dir, tmp_path):
        repo = ModelRepository(repo_dir)
        assert repo.detect_model_type("test_model") == ModelType.JAX
        # marker-file detection without config platform
        onnx_dir = os.path.join(repo_dir, "onnx_model", "1")
        os.makedirs(onnx_dir)
        open(os.path.join(onnx_dir, "model.onnx"), "wb").close()
        assert repo.detect_model_type("onnx_model") == ModelType.ONNX

    def test_get_config_parses_for_real(self, repo_dir):
        repo = ModelRepository(repo_dir)
        cfg = repo.get_config("test_model")
        assert cfg.architecture == "mlp"
        assert [t.name for t in cfg.inputs] == ["input"]
        assert [t.name for t in cfg.outputs] == ["output"]
        assert cfg.inputs[0].shape == [1, 3]

    def test_missing_model_raises(self, repo_dir):
        repo = ModelRepository(repo_dir)
        with pytest.raises(ModelNotFoundError):
            repo.get_versions("ghost")

    def test_empty_repository(self, tmp_path):
        repo = ModelRepository(str(tmp_path / "empty"))
        assert repo.get_model_names() == []
