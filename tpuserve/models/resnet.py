"""ResNet family (ResNet-50 default) — BASELINE.md configs[2] image model.

NHWC, inference-mode BN, bottleneck blocks. Conv kernels are stored flat
([h*w*cin, cout]) so the INT8 weight-only quantizer (2-D QTensors) covers
them; `conv2d` dequantizes on the fly. Inputs accept NHWC [B,224,224,3]
(TPU-native) or NCHW [B,3,224,224] (reference densenet config layout,
auto-transposed).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from tpuserve.models.layers import avg_pool, batch_norm_inference, conv2d, linear, max_pool
from tpuserve.models.registry import Architecture, register_architecture

_STAGES = {  # resnet50/101/152 bottleneck layout
    "resnet50": [3, 4, 6, 3],
    "resnet101": [3, 4, 23, 3],
}


def _init_conv(rng, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    w = jax.random.normal(rng, (kh * kw * cin, cout)) * (2.0 / fan_in) ** 0.5
    return w.astype(dtype)


def _init_bn(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


class _ResNetBase(Architecture):
    stages: List[int] = [3, 4, 6, 3]

    def _num_classes(self) -> int:
        if self.config.outputs:
            return int(self.config.outputs[0].shape[-1])
        return int(self.params_cfg.get("num_classes", 1000))

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array) -> Dict[str, jax.Array]:
        dtype = jnp.bfloat16
        params: Dict[str, jax.Array] = {}

        def nxt():
            nonlocal rng
            rng, k = jax.random.split(rng)
            return k

        def add_bn(prefix, c):
            for k, v in _init_bn(c, dtype).items():
                params[f"{prefix}/{k}"] = v

        params["stem/conv/kernel"] = _init_conv(nxt(), 7, 7, 3, 64, dtype)
        add_bn("stem/bn", 64)

        cin = 64
        for si, blocks in enumerate(self.stages):
            width = 64 * (2 ** si)
            out_c = width * 4
            for bi in range(blocks):
                pre = f"stage{si}/block{bi}"
                params[f"{pre}/conv1/kernel"] = _init_conv(nxt(), 1, 1, cin, width, dtype)
                add_bn(f"{pre}/bn1", width)
                params[f"{pre}/conv2/kernel"] = _init_conv(nxt(), 3, 3, width, width, dtype)
                add_bn(f"{pre}/bn2", width)
                params[f"{pre}/conv3/kernel"] = _init_conv(nxt(), 1, 1, width, out_c, dtype)
                add_bn(f"{pre}/bn3", out_c)
                if bi == 0:
                    params[f"{pre}/proj/kernel"] = _init_conv(nxt(), 1, 1, cin, out_c, dtype)
                    add_bn(f"{pre}/proj_bn", out_c)
                cin = out_c
        params["head/kernel"] = (jax.random.normal(nxt(), (cin, self._num_classes())) * 0.01).astype(dtype)
        params["head/bias"] = jnp.zeros((self._num_classes(),), dtype)
        return params

    # ------------------------------------------------------------------
    def apply(self, params: Dict, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        in_name = self.config.inputs[0].name if self.config.inputs else "input"
        out_name = self.config.outputs[0].name if self.config.outputs else "logits"
        x = inputs[in_name]
        if x.ndim != 4:
            raise ValueError(f"image input must be 4-D, got {x.shape}")
        if x.shape[1] == 3 and x.shape[-1] != 3:
            x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW (reference layout) -> NHWC
        x = x.astype(jnp.bfloat16)

        x = conv2d(params, "stem/conv", x, kernel_hw=(7, 7), stride=2)
        x = batch_norm_inference(params, "stem/bn", x)
        x = jax.nn.relu(x)
        x = max_pool(x, 3, 2)

        for si, blocks in enumerate(self.stages):
            for bi in range(blocks):
                pre = f"stage{si}/block{bi}"
                stride = 2 if (si > 0 and bi == 0) else 1
                shortcut = x
                y = conv2d(params, f"{pre}/conv1", x, kernel_hw=(1, 1))
                y = jax.nn.relu(batch_norm_inference(params, f"{pre}/bn1", y))
                y = conv2d(params, f"{pre}/conv2", y, kernel_hw=(3, 3), stride=stride)
                y = jax.nn.relu(batch_norm_inference(params, f"{pre}/bn2", y))
                y = conv2d(params, f"{pre}/conv3", y, kernel_hw=(1, 1))
                y = batch_norm_inference(params, f"{pre}/bn3", y)
                if bi == 0:
                    shortcut = conv2d(params, f"{pre}/proj", x, kernel_hw=(1, 1), stride=stride)
                    shortcut = batch_norm_inference(params, f"{pre}/proj_bn", shortcut)
                x = jax.nn.relu(y + shortcut)

        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)  # global avg pool
        logits = linear(params, "head", x).astype(jnp.float32)
        return {out_name: logits}

    def quant_predicate(self, name: str, arr) -> bool:
        # conv kernels are stored 2-D ([h*w*cin, cout]); BN stats stay float
        return arr.ndim == 2 and name.endswith("kernel")


@register_architecture("resnet50")
class ResNet50(_ResNetBase):
    stages = _STAGES["resnet50"]


@register_architecture("resnet101")
class ResNet101(_ResNetBase):
    stages = _STAGES["resnet101"]
