"""MLP architecture — the test_model family.

Capability parity with the reference's fixture (scripts/create-test-model.py:
3→5(ReLU)→2 MatMul/Add/Relu graph). `features` and `activation` come from
config.model_params; layer i uses params "dense{i+1}/kernel|bias".
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpuserve.models.layers import activation, linear
from tpuserve.models.registry import Architecture, register_architecture


@register_architecture("mlp")
class MLP(Architecture):
    def _features(self):
        return [int(f) for f in self.params_cfg.get("features", [5, 2])]

    def _in_features(self) -> int:
        if self.config.inputs:
            return int(self.config.inputs[0].shape[-1])
        return int(self.params_cfg.get("in_features", 3))

    def _io_names(self):
        in_name = self.config.inputs[0].name if self.config.inputs else "input"
        out_name = self.config.outputs[0].name if self.config.outputs else "output"
        return in_name, out_name

    def init(self, rng: jax.Array) -> Dict[str, jax.Array]:
        params: Dict[str, jax.Array] = {}
        dims = [self._in_features()] + self._features()
        for i in range(len(dims) - 1):
            rng, k1, k2 = jax.random.split(rng, 3)
            params[f"dense{i+1}/kernel"] = jax.random.normal(k1, (dims[i], dims[i + 1]), jnp.float32)
            params[f"dense{i+1}/bias"] = jax.random.normal(k2, (dims[i + 1],), jnp.float32)
        return params

    def apply(self, params: Dict, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        in_name, out_name = self._io_names()
        x = inputs[in_name]
        act = activation(self.params_cfg.get("activation", "relu"))
        n_layers = len(self._features())
        for i in range(n_layers):
            x = linear(params, f"dense{i+1}", x)
            if i < n_layers - 1:
                x = act(x)
        return {out_name: x}
