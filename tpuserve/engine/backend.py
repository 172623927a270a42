"""Backend interface and registry.

Reference counterpart: `ModelImpl`'s per-type dispatch switches
(model.cpp:514-540 Load, :575-600 Infer, :620-645 Unload) with one real
backend (ONNX Runtime) and four stubs. Here backends are classes in a
registry keyed by `ModelType`; JAX and LLM are the real TPU paths, PyTorch
runs on CPU via torch, ONNX is real via the native wire-format importer
(onnx/importer.py, registered in engine/onnx_backend.py — no onnxruntime
dependency), and TF/TensorRT raise a clear UnsupportedError (≙ the
reference's "not implemented" returns, model.cpp:801-818).
"""

from __future__ import annotations

import abc
from typing import Dict, List, Optional, Type

from tpuserve.repository.config import ModelConfig
from tpuserve.repository.repo import ModelType
from tpuserve.utils.errors import UnsupportedError
from tpuserve.utils.tensor import Tensor


class Backend(abc.ABC):
    """One loaded model instance's execution engine."""

    def __init__(self, model_dir: str, config: ModelConfig):
        self.model_dir = model_dir
        self.config = config

    @abc.abstractmethod
    def load(self) -> None:
        """Materialize weights on device and compile the serving function."""

    @abc.abstractmethod
    def unload(self) -> None:
        """Release device memory."""

    @abc.abstractmethod
    def infer(self, inputs: List[Tensor]) -> List[Tensor]:
        """Synchronous inference on named tensors."""

    def warmup(self) -> None:
        """Optional: trigger compilation before first request."""

    def memory_usage_bytes(self) -> int:
        return 0

    def metadata_extras(self) -> Dict:
        return {}


class UnsupportedBackend(Backend):
    """≙ the reference's stub backends returning 'not implemented'
    (model.cpp:1104-1121 TF, :1130-1149 TensorRT, :1337-1356 custom)."""

    def __init__(self, model_dir: str, config: ModelConfig, kind: str):
        super().__init__(model_dir, config)
        self.kind = kind

    def load(self) -> None:
        raise UnsupportedError(
            f"backend '{self.kind}' is not supported on TPU; supported: jax, llm, pytorch"
        )

    def unload(self) -> None:  # pragma: no cover
        pass

    def infer(self, inputs: List[Tensor]) -> List[Tensor]:  # pragma: no cover
        raise UnsupportedError(f"backend '{self.kind}' is not supported")


_REGISTRY: Dict[ModelType, Type[Backend]] = {}


def register_backend(mtype: ModelType):
    def deco(cls: Type[Backend]):
        _REGISTRY[mtype] = cls
        return cls

    return deco


def get_backend_class(mtype: ModelType) -> Optional[Type[Backend]]:
    _ensure_builtins()
    return _REGISTRY.get(mtype)


def create_backend(mtype: ModelType, model_dir: str, config: ModelConfig) -> Backend:
    _ensure_builtins()
    cls = _REGISTRY.get(mtype)
    if cls is None:
        return UnsupportedBackend(model_dir, config, mtype.value)
    return cls(model_dir, config)


_LOADED = False


def _ensure_builtins() -> None:
    """Import built-in backends lazily to avoid import cycles."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from tpuserve.engine import jax_backend  # noqa: F401
    from tpuserve.engine import llm_backend  # noqa: F401
    from tpuserve.engine import onnx_backend  # noqa: F401
    from tpuserve.engine import torch_backend  # noqa: F401
