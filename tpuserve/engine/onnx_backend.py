"""ONNX-format backend: model.onnx served natively on TPU.

Reference counterpart: the ONNX Runtime backend — the reference's ONLY real
execution path (model.cpp:825-1035 load/session, :1158-1328 infer with
dynamic-batch handling). TPU redesign: the graph is imported ONCE at load
into a pure JAX function (tpuserve/onnx/importer.py) and jitted, so the
whole network compiles to a single fused XLA computation; dynamic batch
dims are served by power-of-two bucketing exactly like the JAX zoo backend
(the XLA analogue of ORT dynamic axes, model.cpp:944-958).

The reference's own fixture (`models/test_model/1/model.onnx`) loads and
serves unmodified.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuserve.engine.backend import Backend, register_backend
from tpuserve.repository.repo import ModelType
from tpuserve.utils.dtypes import DataType
from tpuserve.utils.errors import BackendError, ValidationError
from tpuserve.utils.tensor import Tensor


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max(max_batch, n)) if max_batch > 0 else b


@register_backend(ModelType.ONNX)
class OnnxBackend(Backend):
    def __init__(self, model_dir: str, config):
        super().__init__(model_dir, config)
        self.params = None
        self._apply_jit = None
        self._input_names: List[str] = []
        self._output_names: List[str] = []
        self._param_bytes = 0

    def load(self) -> None:
        from tpuserve.onnx import build, load_model

        path = os.path.join(self.model_dir, "model.onnx")
        if not os.path.exists(path):
            raise BackendError(f"no model.onnx in {self.model_dir}")
        graph = load_model(path)
        params, apply, self._input_names, self._output_names = build(graph)
        self.params = jax.device_put({k: jnp.asarray(v) for k, v in params.items()})
        self._param_bytes = sum(v.size * v.dtype.itemsize for v in params.values())
        self._apply_jit = jax.jit(apply)

    def warmup(self) -> None:
        if self._apply_jit is None:
            return
        dummy = {}
        for t in self.config.inputs:
            shape = [1 if d == -1 else d for d in t.shape]
            dummy[t.name] = jnp.zeros(shape, t.data_type.np_dtype or np.float32)
        if dummy:
            jax.block_until_ready(self._apply_jit(self.params, dummy))

    def unload(self) -> None:
        self.params = None
        self._apply_jit = None

    def memory_usage_bytes(self) -> int:
        return self._param_bytes

    def metadata_extras(self) -> Dict:
        return {"format": "onnx", "graph_inputs": self._input_names,
                "graph_outputs": self._output_names}

    def infer(self, inputs: List[Tensor]) -> List[Tensor]:
        if self._apply_jit is None:
            raise BackendError("model not loaded")
        batch: Dict[str, jnp.ndarray] = {}
        orig_batch: Optional[int] = None
        for t in inputs:
            decl = self.config.input_config(t.name)
            arr = t.numpy()
            if decl is not None and decl.shape and decl.shape[0] == -1:
                n = arr.shape[0]
                b = _bucket(n, self.config.max_batch_size)
                if b != n:
                    arr = np.pad(arr, [(0, b - n)] + [(0, 0)] * (arr.ndim - 1))
                    orig_batch = n
            batch[t.name] = jnp.asarray(arr)
        missing = [n for n in self._input_names if n not in batch]
        if missing:
            raise ValidationError(f"missing graph inputs: {missing}")

        outputs = {k: np.asarray(v) for k, v in self._apply_jit(self.params, batch).items()}
        declared = {t.name: t for t in self.config.outputs}
        result: List[Tensor] = []
        for name in self._output_names:
            arr = outputs[name]
            if orig_batch is not None:
                arr = arr[:orig_batch]
            decl = declared.get(name)
            dtype = decl.data_type if decl else DataType.from_np(arr.dtype)
            if dtype.np_dtype is not None and arr.dtype != dtype.np_dtype:
                arr = arr.astype(dtype.np_dtype)
            result.append(Tensor(name=name, dtype=dtype, shape=arr.shape, data=arr))
        return result
