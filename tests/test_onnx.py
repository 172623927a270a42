"""ONNX subsystem tests: wire-format parser round-trip, importer op
coverage vs direct jax/numpy, serving the reference's own model.onnx
fixture, and end-to-end lifecycle through the InferenceManager
(≙ reference model.cpp ONNX Runtime backend + test_client flows)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from tpuserve.fixtures import (
    create_onnx_test_model,
    make_test_model_weights,
    reference_mlp_forward,
)
from tpuserve.onnx import Graph, Node, ValueInfo, build, load_model, save_model
from tpuserve.onnx.proto import DT_FLOAT

REFERENCE_ONNX = "/root/reference/models/test_model/1/model.onnx"


def _run_graph(graph, **inputs):
    params, apply, _, _ = build(graph)
    out = apply(params, {k: jnp.asarray(v) for k, v in inputs.items()})
    return {k: np.asarray(v) for k, v in out.items()}


class TestProtoRoundTrip:
    def test_save_load_round_trip(self, tmp_path):
        w = make_test_model_weights()
        vdir = create_onnx_test_model(str(tmp_path))
        g = load_model(os.path.join(vdir, "model.onnx"))
        assert [n.op_type for n in g.nodes] == ["MatMul", "Add", "Relu", "MatMul", "Add"]
        np.testing.assert_array_equal(g.initializers["weight1"], w["dense1/kernel"])
        assert [vi.name for vi in g.inputs] == ["input"]
        assert g.inputs[0].shape == [1, 3]
        assert [vi.name for vi in g.outputs] == ["output"]


class TestReferenceFixture:
    """The reference repo's own model.onnx must serve unmodified."""

    @pytest.mark.skipif(not os.path.exists(REFERENCE_ONNX), reason="reference not mounted")
    def test_parses_reference_model(self):
        g = load_model(REFERENCE_ONNX)
        assert [n.op_type for n in g.nodes] == ["MatMul", "Add", "Relu", "MatMul", "Add"]
        assert g.initializers["weight1"].shape == (3, 5)
        assert g.initializers["weight2"].shape == (5, 2)

    @pytest.mark.skipif(not os.path.exists(REFERENCE_ONNX), reason="reference not mounted")
    def test_reference_model_output_matches_ground_truth(self):
        """The reference generator used np.random.seed(42) with the same
        draw order as make_test_model_weights — outputs must agree."""
        g = load_model(REFERENCE_ONNX)
        x = np.array([[1.0, 2.0, 3.0]], np.float32)
        out = _run_graph(g, input=x)["output"]
        expect = reference_mlp_forward(make_test_model_weights(), x)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


class TestImporterOps:
    def test_gemm_with_transpose_and_beta(self):
        a = np.random.RandomState(0).randn(4, 3).astype(np.float32)
        w = np.random.RandomState(1).randn(5, 3).astype(np.float32)  # transB
        b = np.random.RandomState(2).randn(5).astype(np.float32)
        g = Graph(
            "g", [Node("Gemm", ["x", "w", "b"], ["y"], attrs={})],
            {"w": w, "b": b},
            [ValueInfo("x", DT_FLOAT, [4, 3])], [ValueInfo("y", DT_FLOAT, [4, 5])],
        )
        from tpuserve.onnx.proto import Attribute

        g.nodes[0].attrs = {
            "transB": Attribute("transB", i=1),
            "alpha": Attribute("alpha", f=2.0),
            "beta": Attribute("beta", f=0.5),
        }
        out = _run_graph(g, x=a)["y"]
        np.testing.assert_allclose(out, 2.0 * (a @ w.T) + 0.5 * b, rtol=1e-5)

    def test_conv_bn_pool_stack(self):
        """NCHW Conv + BatchNorm + MaxPool + GlobalAveragePool + Flatten."""
        rs = np.random.RandomState(3)
        x = rs.randn(2, 3, 8, 8).astype(np.float32)
        w = rs.randn(4, 3, 3, 3).astype(np.float32)
        bias = rs.randn(4).astype(np.float32)
        scale = rs.rand(4).astype(np.float32) + 0.5
        bnb = rs.randn(4).astype(np.float32)
        mean = rs.randn(4).astype(np.float32)
        var = rs.rand(4).astype(np.float32) + 0.5
        from tpuserve.onnx.proto import Attribute

        g = Graph(
            "cnn",
            [
                Node("Conv", ["x", "w", "bias"], ["c"], attrs={
                    "pads": Attribute("pads", ints=[1, 1, 1, 1]),
                    "strides": Attribute("strides", ints=[1, 1]),
                }),
                Node("BatchNormalization", ["c", "scale", "bnb", "mean", "var"], ["bn"]),
                Node("Relu", ["bn"], ["r"]),
                Node("MaxPool", ["r"], ["mp"], attrs={
                    "kernel_shape": Attribute("kernel_shape", ints=[2, 2]),
                    "strides": Attribute("strides", ints=[2, 2]),
                }),
                Node("GlobalAveragePool", ["mp"], ["gap"]),
                Node("Flatten", ["gap"], ["y"]),
            ],
            {"w": w, "bias": bias, "scale": scale, "bnb": bnb, "mean": mean, "var": var},
            [ValueInfo("x", DT_FLOAT, [2, 3, 8, 8])],
            [ValueInfo("y", DT_FLOAT, [2, 4])],
        )
        out = _run_graph(g, x=x)["y"]
        # independent reference with torch (CPU)
        import torch
        import torch.nn.functional as F

        tx = torch.from_numpy(x)
        c = F.conv2d(tx, torch.from_numpy(w), torch.from_numpy(bias), padding=1)
        bn = F.batch_norm(c, torch.from_numpy(mean), torch.from_numpy(var),
                          torch.from_numpy(scale), torch.from_numpy(bnb), eps=1e-5)
        r = F.relu(bn)
        mp = F.max_pool2d(r, 2, 2)
        ref = mp.mean(dim=(2, 3)).numpy()
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    def test_softmax_reshape_transpose_concat(self):
        rs = np.random.RandomState(4)
        x = rs.randn(2, 6).astype(np.float32)
        from tpuserve.onnx.proto import Attribute

        g = Graph(
            "misc",
            [
                Node("Reshape", ["x", "shape"], ["r"]),
                Node("Transpose", ["r"], ["t"], attrs={"perm": Attribute("perm", ints=[0, 2, 1])}),
                Node("Softmax", ["t"], ["s"], attrs={"axis": Attribute("axis", i=-1)}),
                Node("Concat", ["s", "s"], ["y"], attrs={"axis": Attribute("axis", i=2)}),
            ],
            {"shape": np.asarray([2, 2, 3], np.int64)},
            [ValueInfo("x", DT_FLOAT, [2, 6])],
            [ValueInfo("y", DT_FLOAT, [2, 3, 4])],
        )
        out = _run_graph(g, x=x)["y"]
        r = x.reshape(2, 2, 3).transpose(0, 2, 1)
        e = np.exp(r - r.max(-1, keepdims=True))
        s = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(out, np.concatenate([s, s], axis=2), rtol=1e-5)

    def test_unsupported_op_raises_clearly(self):
        from tpuserve.utils.errors import UnsupportedError

        g = Graph("bad", [Node("NonMaxSuppression", ["x"], ["y"])], {},
                  [ValueInfo("x", DT_FLOAT, [1])], [ValueInfo("y", DT_FLOAT, [1])])
        with pytest.raises(UnsupportedError, match="NonMaxSuppression"):
            _run_graph(g, x=np.zeros((1,), np.float32))


class TestOnnxServing:
    def test_manager_lifecycle_and_infer(self, tmp_path):
        """Full lifecycle: scan -> load -> infer -> unload on an ONNX model
        (the flow the reference drives through ORT)."""
        from tpuserve.engine.manager import InferenceManager
        from tpuserve.utils.tensor import Tensor
        from tpuserve.utils.dtypes import DataType

        create_onnx_test_model(str(tmp_path), name="onnx_mlp")
        m = InferenceManager(str(tmp_path))
        try:
            m.load_model("onnx_mlp")
            x = np.array([[1.0, 2.0, 3.0]], np.float32)
            out = m.run_inference(
                "onnx_mlp",
                [Tensor(name="input", dtype=DataType.FP32, shape=x.shape, data=x)],
            )
            assert out[0].name == "output"
            expect = reference_mlp_forward(make_test_model_weights(), x)
            np.testing.assert_allclose(out[0].numpy(), expect, rtol=1e-4)
            meta = m.get_model_status("onnx_mlp")["metadata"]
            m.unload_model("onnx_mlp")
        finally:
            m.shutdown()
