"""ONNX import without onnxruntime: wire-format parser (proto.py) + graph
-> jitted JAX function importer (importer.py). Serves the reference's own
model.onnx fixtures on TPU (≙ reference model.cpp ONNX Runtime backend)."""

from tpuserve.onnx.proto import Graph, Node, ValueInfo, load_model, save_model
from tpuserve.onnx.importer import build

__all__ = ["Graph", "Node", "ValueInfo", "load_model", "save_model", "build"]
