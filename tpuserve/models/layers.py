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
