"""PyTorch backend (CPU).

The reference declares a PyTorch backend but stubs it out with "not
implemented" (model.cpp:1130-1149). Here it is real: TorchScript `model.pt`
archives execute on CPU via torch.jit. It exists for capability parity and
for serving small pre/post-processing models; TPU compute paths are the JAX
and LLM backends.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from tpuserve.engine.backend import Backend, register_backend
from tpuserve.repository.repo import ModelType
from tpuserve.utils.dtypes import DataType
from tpuserve.utils.errors import BackendError
from tpuserve.utils.tensor import Tensor


@register_backend(ModelType.PYTORCH)
class TorchBackend(Backend):
    def __init__(self, model_dir: str, config):
        super().__init__(model_dir, config)
        self._module = None

    def load(self) -> None:
        try:
            import torch
        except ImportError:  # pragma: no cover
            raise BackendError("torch is not available in this environment")
        path = os.path.join(self.model_dir, "model.pt")
        if not os.path.exists(path):
            raise BackendError(f"model.pt not found in {self.model_dir}")
        try:
            self._module = torch.jit.load(path, map_location="cpu")
            self._module.eval()
        except Exception as e:
            raise BackendError(f"failed to load TorchScript model: {e}")

    def unload(self) -> None:
        self._module = None

    def memory_usage_bytes(self) -> int:
        if self._module is None:
            return 0
        try:
            return sum(p.numel() * p.element_size() for p in self._module.parameters())
        except Exception:
            return 0

    def infer(self, inputs: List[Tensor]) -> List[Tensor]:
        import torch

        if self._module is None:
            raise BackendError("model not loaded")
        # positional order follows the config's declared inputs
        order = [t.name for t in self.config.inputs] or [t.name for t in inputs]
        by_name = {t.name: t for t in inputs}
        args = [torch.from_numpy(np.ascontiguousarray(by_name[n].numpy())) for n in order]
        with torch.no_grad():
            out = self._module(*args)
        if isinstance(out, (tuple, list)):
            outs = list(out)
        else:
            outs = [out]
        names = [t.name for t in self.config.outputs]
        result = []
        for i, o in enumerate(outs):
            arr = o.detach().cpu().numpy()
            name = names[i] if i < len(names) else f"output_{i}"
            result.append(Tensor(name=name, dtype=DataType.from_np(arr.dtype), shape=arr.shape, data=arr))
        return result
