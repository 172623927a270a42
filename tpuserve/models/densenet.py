"""DenseNet family (DenseNet-121 default) — the reference repository ships a
densenet_onnx entry (models/densenet_onnx/1/config.json: input data_0
[1,3,224,224] -> fc6_1 [1,1000,1,1] with ImageNet labels); this is its
TPU-native counterpart (BASELINE.md configs[1]: INT8 weight-only, batch
1-64, one chip).

Dense blocks with bottleneck (BN-ReLU-Conv1x1 -> BN-ReLU-Conv3x3, growth
k=32), transition layers with 0.5 compression. Conv kernels stored flat
[h*w*cin, cout] for the INT8 quantizer. Accepts NHWC or the reference's
NCHW layout; output shape follows the config (e.g. [B,1000,1,1] reference
compat or [B,1000]).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpuserve.models.layers import avg_pool, batch_norm_inference, conv2d, linear, max_pool
from tpuserve.models.registry import Architecture, register_architecture

_LAYOUTS = {
    "densenet121": [6, 12, 24, 16],
    "densenet169": [6, 12, 32, 32],
}


class _DenseNetBase(Architecture):
    blocks = _LAYOUTS["densenet121"]
    growth = 32

    def _num_classes(self) -> int:
        if self.config.outputs:
            shape = self.config.outputs[0].shape
            return int(max(shape[1:]) if len(shape) > 1 else shape[-1])
        return int(self.params_cfg.get("num_classes", 1000))

    def init(self, rng: jax.Array) -> Dict[str, jax.Array]:
        dtype = jnp.bfloat16
        params: Dict[str, jax.Array] = {}

        def nxt():
            nonlocal rng
            rng, k = jax.random.split(rng)
            return k

        def conv(prefix, kh, kw, cin, cout):
            fan_in = kh * kw * cin
            params[f"{prefix}/kernel"] = (
                jax.random.normal(nxt(), (kh * kw * cin, cout)) * (2.0 / fan_in) ** 0.5
            ).astype(dtype)

        def bn(prefix, c):
            params[f"{prefix}/scale"] = jnp.ones((c,), dtype)
            params[f"{prefix}/bias"] = jnp.zeros((c,), dtype)
            params[f"{prefix}/mean"] = jnp.zeros((c,), dtype)
            params[f"{prefix}/var"] = jnp.ones((c,), dtype)

        conv("stem/conv", 7, 7, 3, 64)
        bn("stem/bn", 64)
        c = 64
        for bi, n_layers in enumerate(self.blocks):
            for li in range(n_layers):
                pre = f"block{bi}/layer{li}"
                bn(f"{pre}/bn1", c)
                conv(f"{pre}/conv1", 1, 1, c, 4 * self.growth)
                bn(f"{pre}/bn2", 4 * self.growth)
                conv(f"{pre}/conv2", 3, 3, 4 * self.growth, self.growth)
                c += self.growth
            if bi < len(self.blocks) - 1:
                bn(f"trans{bi}/bn", c)
                conv(f"trans{bi}/conv", 1, 1, c, c // 2)
                c = c // 2
        bn("final/bn", c)
        params["head/kernel"] = (jax.random.normal(nxt(), (c, self._num_classes())) * 0.01).astype(dtype)
        params["head/bias"] = jnp.zeros((self._num_classes(),), dtype)
        return params

    def apply(self, params: Dict, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        in_name = self.config.inputs[0].name if self.config.inputs else "data_0"
        out_cfg = self.config.outputs[0] if self.config.outputs else None
        out_name = out_cfg.name if out_cfg else "logits"
        x = inputs[in_name]
        if x.ndim != 4:
            raise ValueError(f"image input must be 4-D, got {x.shape}")
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(jnp.bfloat16)

        x = conv2d(params, "stem/conv", x, kernel_hw=(7, 7), stride=2)
        x = jax.nn.relu(batch_norm_inference(params, "stem/bn", x))
        x = max_pool(x, 3, 2)

        for bi, n_layers in enumerate(self.blocks):
            for li in range(n_layers):
                pre = f"block{bi}/layer{li}"
                y = jax.nn.relu(batch_norm_inference(params, f"{pre}/bn1", x))
                y = conv2d(params, f"{pre}/conv1", y, kernel_hw=(1, 1))
                y = jax.nn.relu(batch_norm_inference(params, f"{pre}/bn2", y))
                y = conv2d(params, f"{pre}/conv2", y, kernel_hw=(3, 3))
                x = jnp.concatenate([x, y], axis=-1)
            if bi < len(self.blocks) - 1:
                x = jax.nn.relu(batch_norm_inference(params, f"trans{bi}/bn", x))
                x = conv2d(params, f"trans{bi}/conv", x, kernel_hw=(1, 1))
                x = avg_pool(x, 2, 2)

        x = jax.nn.relu(batch_norm_inference(params, "final/bn", x))
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
        logits = linear(params, "head", x).astype(jnp.float32)
        if out_cfg and len(out_cfg.shape) == 4:  # reference fc6_1 [B,1000,1,1]
            logits = logits[:, :, None, None]
        return {out_name: logits}

    def quant_predicate(self, name: str, arr) -> bool:
        return arr.ndim == 2 and name.endswith("kernel")


@register_architecture("densenet121")
class DenseNet121(_DenseNetBase):
    blocks = _LAYOUTS["densenet121"]


@register_architecture("densenet169")
class DenseNet169(_DenseNetBase):
    blocks = _LAYOUTS["densenet169"]
