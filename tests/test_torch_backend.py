"""PyTorch-CPU backend tests — the backend the reference declared but
stubbed out (model.cpp:1130-1149); ours executes TorchScript archives."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tpuserve.engine import InferenceManager
from tpuserve.repository import ModelType
from tpuserve.utils.tensor import Tensor


@pytest.fixture()
def torch_repo(tmp_path):
    class TinyNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.fc = torch.nn.Linear(3, 2)

        def forward(self, x):
            return torch.relu(self.fc(x))

    torch.manual_seed(0)
    net = TinyNet().eval()
    vdir = tmp_path / "torch_model" / "1"
    vdir.mkdir(parents=True)
    torch.jit.script(net).save(str(vdir / "model.pt"))
    (vdir / "config.json").write_text(json.dumps({
        "name": "torch_model",
        "platform": "pytorch",
        "inputs": [{"name": "input", "shape": [1, 3], "data_type": "FLOAT32"}],
        "outputs": [{"name": "output", "shape": [1, 2], "data_type": "FLOAT32"}],
    }))
    return tmp_path, net


def test_detected_as_pytorch(torch_repo):
    repo_dir, _ = torch_repo
    m = InferenceManager(str(repo_dir))
    try:
        assert m.repository.detect_model_type("torch_model") == ModelType.PYTORCH
    finally:
        m.shutdown()


def test_load_infer_matches_torch(torch_repo):
    repo_dir, net = torch_repo
    m = InferenceManager(str(repo_dir))
    try:
        m.load_model("torch_model")
        x = np.array([[0.5, -1.0, 2.0]], np.float32)
        out = m.run_inference("torch_model", [Tensor.from_numpy("input", x)])
        with torch.no_grad():
            expected = net(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(out[0].numpy(), expected, rtol=1e-5)
        assert out[0].name == "output"
        m.unload_model("torch_model")
    finally:
        m.shutdown()


def test_missing_archive_fails_cleanly(tmp_path):
    vdir = tmp_path / "broken" / "1"
    vdir.mkdir(parents=True)
    (vdir / "config.json").write_text(json.dumps({"name": "broken", "platform": "pytorch"}))
    m = InferenceManager(str(tmp_path))
    try:
        from tpuserve.utils.errors import BackendError

        with pytest.raises(BackendError):
            m.load_model("broken")
    finally:
        m.shutdown()
