"""Architecture registry for the JAX graph backend.

The reference executes opaque ONNX graphs; a TPU-native engine executes
jittable functions. Each architecture is a (init, apply) pair over a flat
param dict, selected by the config's `architecture` field; checkpoints carry
only the weights.
"""

from __future__ import annotations

import abc
from typing import Callable, Dict, Optional

import jax

from tpuserve.repository.config import ModelConfig
from tpuserve.utils.errors import InvalidArgumentError


class Architecture(abc.ABC):
    """A servable model family."""

    name: str = ""

    def __init__(self, config: ModelConfig):
        self.config = config
        self.params_cfg = dict(config.model_params)

    @abc.abstractmethod
    def init(self, rng: jax.Array) -> Dict[str, jax.Array]:
        """Random-init a flat param dict (used by fixtures/tests)."""

    @abc.abstractmethod
    def apply(self, params: Dict, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        """Forward pass: named inputs -> named outputs. Must be jittable."""

    def quant_predicate(self, name: str, arr) -> bool:
        """Which params are weight-quantizable (2-D matmul weights)."""
        return arr.ndim == 2 and name.endswith("kernel")


_REGISTRY: Dict[str, Callable[[ModelConfig], Architecture]] = {}


def register_architecture(name: str):
    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls

    return deco


def get_architecture(config: ModelConfig) -> Architecture:
    _ensure_builtins()
    name = (config.architecture or "").lower()
    if not name:
        raise InvalidArgumentError(
            f"model '{config.name}' config has no 'architecture' field; "
            f"known: {sorted(_REGISTRY)}"
        )
    cls = _REGISTRY.get(name)
    if cls is None:
        raise InvalidArgumentError(
            f"unknown architecture '{name}'; known: {sorted(_REGISTRY)}"
        )
    return cls(config)


def known_architectures():
    _ensure_builtins()
    return sorted(_REGISTRY)


_LOADED = False


def _ensure_builtins() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from tpuserve.models import mlp  # noqa: F401

    for optional in ("resnet", "bert", "densenet", "llama"):
        try:
            __import__(f"tpuserve.models.{optional}")
        except ImportError:
            pass
