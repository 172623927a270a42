"""Shared functional layers for the model zoo.

Models are pure functions over flat param dicts ({"block/name": array}).
Linear layers transparently accept quantized weights: if the kernel entry is
a `QTensor` the matmul runs through `qmatmul` (fused dequant+matmul on TPU).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tpuserve.quant.core import QTensor, qmatmul


def linear(params: Dict, prefix: str, x: jax.Array, *, bias: bool = True) -> jax.Array:
    w = params[f"{prefix}/kernel"]
    if isinstance(w, QTensor):
        y = qmatmul(x, w)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if bias:
        b = params.get(f"{prefix}/bias")
        if b is not None:
            y = y + b.astype(y.dtype)
    return y


def layer_norm(params: Dict, prefix: str, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    scale = params.get(f"{prefix}/scale")
    offset = params.get(f"{prefix}/bias")
    if scale is not None:
        y = y * scale.astype(y.dtype)
    if offset is not None:
        y = y + offset.astype(y.dtype)
    return y


def rms_norm(params: Dict, prefix: str, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # compute in f32 for stability, cast back (standard Llama practice)
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    scale = params[f"{prefix}/scale"]
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def conv2d(
    params: Dict,
    prefix: str,
    x: jax.Array,
    *,
    kernel_hw,
    stride=1,
    padding="SAME",
    bias: bool = False,
) -> jax.Array:
    """NHWC conv. The kernel may be a QTensor holding the [h*w*cin, cout]
    flattening of the weights (INT8 weight-only conv: dequantized on the fly
    — XLA fuses the dequant into the conv's weight read, so HBM traffic is
    the int8 bytes)."""
    w = params[f"{prefix}/kernel"]
    kh, kw = kernel_hw
    if isinstance(w, QTensor):
        cin = w.orig_shape[0] // (kh * kw)
        from tpuserve.quant.core import dequantize

        w = dequantize(w, dtype=x.dtype).reshape(kh, kw, cin, w.orig_shape[1])
    else:
        w = w.astype(x.dtype)
        if w.ndim == 2:  # flat [h*w*cin, cout] storage (quantizer-compatible)
            cin = w.shape[0] // (kh * kw)
            w = w.reshape(kh, kw, cin, w.shape[1])
    strides = (stride, stride) if isinstance(stride, int) else stride
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias:
        b = params.get(f"{prefix}/bias")
        if b is not None:
            y = y + b.astype(y.dtype)
    return y


def batch_norm_inference(params: Dict, prefix: str, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference-mode BN from stored (scale, bias, mean, var)."""
    scale = params[f"{prefix}/scale"].astype(jnp.float32)
    bias = params[f"{prefix}/bias"].astype(jnp.float32)
    mean = params[f"{prefix}/mean"].astype(jnp.float32)
    var = params[f"{prefix}/var"].astype(jnp.float32)
    inv = scale * jax.lax.rsqrt(var + eps)
    return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


def max_pool(x: jax.Array, window: int, stride: int, padding="SAME") -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), padding,
    )


def avg_pool(x: jax.Array, window: int, stride: int, padding="VALID") -> jax.Array:
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), padding,
    )
    return (summed / (window * window)).astype(x.dtype)


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


def activation(name: str):
    try:
        return _ACTIVATIONS[name.lower()]
    except KeyError:
        raise ValueError(f"unknown activation '{name}'")
