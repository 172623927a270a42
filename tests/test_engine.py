"""Engine-core tests: backends, Model validation/stats, InferenceManager
lifecycle (≙ reference test/onnx_test.cpp engine-level lifecycle, §3.5, plus
the manager semantics the reference never exercised)."""

import threading
import time

import numpy as np
import pytest

from tpuserve.engine import InferenceManager, Model, ModelState
from tpuserve.fixtures import create_test_model, make_test_model_weights, reference_mlp_forward
from tpuserve.repository import ModelRepository, ModelType
from tpuserve.utils.dtypes import DataType
from tpuserve.utils.errors import (
    ModelAlreadyLoadedError,
    ModelNotFoundError,
    ModelNotLoadedError,
    UnsupportedError,
    ValidationError,
)
from tpuserve.utils.tensor import Tensor


@pytest.fixture()
def repo_dir(tmp_path):
    create_test_model(str(tmp_path))
    return str(tmp_path)


@pytest.fixture()
def manager(repo_dir):
    m = InferenceManager(repo_dir)
    yield m
    m.shutdown()


def _input_tensor(x=None):
    if x is None:
        x = np.ones((1, 3), np.float32)
    return Tensor.from_numpy("input", x)


class TestModelLifecycle:
    def test_load_infer_unload(self, manager):
        model = manager.load_model("test_model")
        assert manager.is_model_loaded("test_model")
        assert manager.get_model_state("test_model") == ModelState.LOADED

        outputs = manager.run_inference("test_model", [_input_tensor()])
        assert len(outputs) == 1
        assert outputs[0].name == "output"
        assert outputs[0].shape == (1, 2)

        # numerically identical to the reference fixture math (seed 42)
        expected = reference_mlp_forward(make_test_model_weights(), np.ones((1, 3), np.float32))
        np.testing.assert_allclose(outputs[0].numpy(), expected, rtol=1e-5)

        manager.unload_model("test_model")
        assert not manager.is_model_loaded("test_model")
        assert manager.get_model_state("test_model") == ModelState.UNLOADED

    def test_double_load_rejected(self, manager):
        manager.load_model("test_model")
        with pytest.raises(ModelAlreadyLoadedError):
            manager.load_model("test_model")

    def test_unload_not_loaded_rejected(self, manager):
        with pytest.raises(ModelNotLoadedError):
            manager.unload_model("test_model")

    def test_load_unknown_model(self, manager):
        with pytest.raises(ModelNotFoundError):
            manager.load_model("ghost")
        assert manager.get_model_state("ghost") == ModelState.UNAVAILABLE

    def test_infer_unloaded_rejected(self, manager):
        with pytest.raises(ModelNotLoadedError):
            manager.run_inference("test_model", [_input_tensor()])

    def test_async_load_unload(self, manager):
        done = threading.Event()
        results = {}

        def cb(success, error):
            results["load"] = (success, error)
            done.set()

        manager.load_model_async("test_model", callback=cb)
        assert done.wait(timeout=30)
        assert results["load"] == (True, None)
        assert manager.is_model_loaded("test_model")

        done2 = threading.Event()
        manager.unload_model_async("test_model", callback=lambda s, e: done2.set())
        assert done2.wait(timeout=30)
        assert not manager.is_model_loaded("test_model")

    def test_version_keyed_identity(self, repo_dir):
        """Two versions loadable simultaneously — fixing the reference's
        name-only bridge map (SURVEY.md §2c.1)."""
        create_test_model(repo_dir, version="2")
        m = InferenceManager(repo_dir)
        try:
            m.load_model("test_model", "1")
            m.load_model("test_model", "2")
            assert m.is_model_loaded("test_model", "1")
            assert m.is_model_loaded("test_model", "2")
            # empty-version unload targets the highest loaded version
            m.unload_model("test_model")
            assert not m.is_model_loaded("test_model", "2")
            assert m.is_model_loaded("test_model", "1")
        finally:
            m.shutdown()

    def test_unload_picks_numerically_highest_version(self, repo_dir):
        """Versions {"9","10"}: empty-version unload must target 10, not 9
        (string sort would pick "9" — VERDICT r1 weak #4)."""
        create_test_model(repo_dir, version="9")
        create_test_model(repo_dir, version="10")
        m = InferenceManager(repo_dir)
        try:
            m.load_model("test_model", "9")
            m.load_model("test_model", "10")
            m.unload_model("test_model")
            assert m.is_model_loaded("test_model", "9")
            assert not m.is_model_loaded("test_model", "10")
        finally:
            m.shutdown()

    def test_list_models_live_rescan(self, manager, repo_dir):
        create_test_model(repo_dir, name="another")
        listed = manager.list_models()
        names = {e["name"] for e in listed}
        assert names == {"test_model", "another"}

    def test_status(self, manager):
        manager.load_model("test_model")
        manager.run_inference("test_model", [_input_tensor()])
        status = manager.get_model_status("test_model")
        assert status["state"] == "LOADED"
        assert status["metadata"]["name"] == "test_model"
        assert status["stats"]["inference_count"] == 1
        assert status["stats"]["load_time_ns"] > 0


class TestValidation:
    def test_wrong_input_name(self, manager):
        manager.load_model("test_model")
        bad = Tensor.from_numpy("wrong", np.ones((1, 3), np.float32))
        with pytest.raises(ValidationError):
            manager.run_inference("test_model", [bad])

    def test_wrong_shape(self, manager):
        manager.load_model("test_model")
        bad = _input_tensor(np.ones((1, 4), np.float32))
        with pytest.raises(ValidationError):
            manager.run_inference("test_model", [bad])

    def test_wrong_dtype(self, manager):
        manager.load_model("test_model")
        bad = Tensor.from_numpy("input", np.ones((1, 3), np.int32))
        with pytest.raises(ValidationError):
            manager.run_inference("test_model", [bad])

    def test_wrong_count(self, manager):
        manager.load_model("test_model")
        with pytest.raises(ValidationError):
            manager.run_inference("test_model", [])

    def test_error_counted_in_stats(self, manager):
        manager.load_model("test_model")
        with pytest.raises(ValidationError):
            manager.run_inference("test_model", [])
        stats = manager.get_model("test_model").get_stats()
        assert stats["error_count"] == 1
        assert stats["inference_count"] == 0


class TestConcurrency:
    def test_concurrent_inference(self, manager):
        manager.load_model("test_model")
        errors = []

        def worker():
            try:
                for _ in range(10):
                    manager.run_inference("test_model", [_input_tensor()])
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        assert manager.get_model("test_model").get_stats()["inference_count"] == 80


class TestUnsupportedBackends:
    def test_malformed_onnx_errors_cleanly(self, tmp_path):
        """ONNX is a REAL backend now (tpuserve/engine/onnx_backend.py);
        a malformed blob must land the model in ERROR and permit reload
        attempts (≙ inference_manager.cpp:308-311)."""
        from tpuserve.utils.errors import TpuServeError

        vdir = tmp_path / "onnx_model" / "1"
        vdir.mkdir(parents=True)
        (vdir / "model.onnx").write_bytes(b"")  # empty: no GraphProto
        m = InferenceManager(str(tmp_path))
        try:
            with pytest.raises((TpuServeError, ValueError)):
                m.load_model("onnx_model")
            assert m.get_model_state("onnx_model") == ModelState.ERROR
            with pytest.raises((TpuServeError, ValueError)):
                m.load_model("onnx_model")
        finally:
            m.shutdown()


class TestStateMachineGuards:
    def test_busy_states_rejected(self, manager):
        """LOADING/UNLOADING guard transitions (≙ inference_manager.cpp:291-316)."""
        from tpuserve.utils.errors import TpuServeError

        key = manager._begin_load("test_model", None)
        assert manager.get_model_state("test_model") == ModelState.LOADING
        with pytest.raises(TpuServeError):
            manager._begin_load("test_model", None)  # busy loading
        with pytest.raises(TpuServeError):
            manager._begin_unload("test_model", None)  # can't unload while loading
        manager._do_load(key)
        assert manager.get_model_state("test_model") == ModelState.LOADED

        key = manager._begin_unload("test_model", None)
        assert manager.get_model_state("test_model") == ModelState.UNLOADING
        with pytest.raises(TpuServeError):
            manager._begin_load("test_model", None)  # busy unloading
        manager._do_unload(key)
        assert manager.get_model_state("test_model") == ModelState.UNLOADED

    def test_all_stub_backends_rejected_clearly(self, tmp_path):
        """TF/TensorRT markers load-fail with 501-class errors (≙ the
        reference's stub backends, model.cpp:1104-1149)."""
        import os

        for name, marker in (("tf_model", "saved_model.pb"), ("trt_model", "model.plan")):
            d = os.path.join(str(tmp_path), name, "1")
            os.makedirs(d)
            open(os.path.join(d, marker), "wb").close()
        m = InferenceManager(str(tmp_path))
        try:
            for name in ("tf_model", "trt_model"):
                with pytest.raises(UnsupportedError):
                    m.load_model(name)
                assert m.get_model_state(name) == ModelState.ERROR
        finally:
            m.shutdown()
