"""ONNX graph -> jitted JAX function.

Reference counterpart: the ONNX Runtime backend (model.cpp:825-1035 session
construction, :1158-1328 Infer) — the reference's only real execution path.
TPU-native redesign: instead of handing the graph to an interpreter, the
graph is topologically evaluated once at trace time into a single XLA
computation, so the whole model fuses and compiles for the MXU like any
hand-written JAX model. Static shapes only (dynamic batch handled by the
backend's bucketing, like the JAX zoo backend).

Supported opset (the reference fixture + common CNN/MLP classifiers):
MatMul, Gemm, Add, Sub, Mul, Div, Relu, Sigmoid, Tanh, Erf, Sqrt, Pow,
Exp, Log, Neg, Softmax, LogSoftmax, Clip, LeakyRelu, Elu, Gelu, Identity,
Dropout (inference no-op), Flatten, Reshape, Transpose, Concat, Squeeze,
Unsqueeze, Shape+Gather+Constant folding for static shapes, ReduceMean,
Conv, MaxPool, AveragePool, GlobalAveragePool, BatchNormalization.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuserve.onnx.proto import Graph, Node
from tpuserve.utils.errors import UnsupportedError, ValidationError


def _attr_i(node: Node, name: str, default: int = 0) -> int:
    a = node.attrs.get(name)
    return default if a is None or a.i is None else int(a.i)


def _attr_f(node: Node, name: str, default: float = 0.0) -> float:
    a = node.attrs.get(name)
    return default if a is None or a.f is None else float(a.f)


def _attr_ints(node: Node, name: str, default=()) -> List[int]:
    a = node.attrs.get(name)
    return list(a.ints) if a is not None and a.ints else list(default)


def _attr_s(node: Node, name: str, default: str = "") -> str:
    a = node.attrs.get(name)
    return a.s.decode() if a is not None and a.s is not None else default


def _conv_pads(node: Node, spatial: int) -> Sequence[Tuple[int, int]]:
    auto = _attr_s(node, "auto_pad", "NOTSET")
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        return auto  # handled by lax's "SAME"
    pads = _attr_ints(node, "pads", [0] * (2 * spatial))
    return [(pads[i], pads[i + spatial]) for i in range(spatial)]


def _pool(x, node: Node, reducer, init, avg: bool):
    # ONNX pools are NCHW; window over trailing spatial dims
    kshape = _attr_ints(node, "kernel_shape")
    spatial = len(kshape)
    strides = _attr_ints(node, "strides", [1] * spatial)
    pads = _conv_pads(node, spatial)
    window = (1, 1, *kshape)
    strides_full = (1, 1, *strides)
    if isinstance(pads, str):
        padding = "SAME"
    else:
        padding = [(0, 0), (0, 0), *pads]
    out = jax.lax.reduce_window(x, init, reducer, window, strides_full, padding)
    if avg:
        ones = jnp.ones_like(x)
        counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides_full, padding)
        out = out / counts
    return out


def _eval_node(node: Node, vals: List[jnp.ndarray]):
    op = node.op_type
    if op == "MatMul":
        return jnp.matmul(vals[0], vals[1])
    if op == "Gemm":
        a, b = vals[0], vals[1]
        if _attr_i(node, "transA"):
            a = a.T
        if _attr_i(node, "transB"):
            b = b.T
        out = _attr_f(node, "alpha", 1.0) * jnp.matmul(a, b)
        if len(vals) > 2:
            out = out + _attr_f(node, "beta", 1.0) * vals[2]
        return out
    if op == "Add":
        return vals[0] + vals[1]
    if op == "Sub":
        return vals[0] - vals[1]
    if op == "Mul":
        return vals[0] * vals[1]
    if op == "Div":
        return vals[0] / vals[1]
    if op == "Relu":
        return jax.nn.relu(vals[0])
    if op == "Sigmoid":
        return jax.nn.sigmoid(vals[0])
    if op == "Tanh":
        return jnp.tanh(vals[0])
    if op == "Erf":
        return jax.lax.erf(vals[0])
    if op == "Sqrt":
        return jnp.sqrt(vals[0])
    if op == "Exp":
        return jnp.exp(vals[0])
    if op == "Log":
        return jnp.log(vals[0])
    if op == "Neg":
        return -vals[0]
    if op == "Pow":
        return vals[0] ** vals[1]
    if op == "Softmax":
        return jax.nn.softmax(vals[0], axis=_attr_i(node, "axis", -1))
    if op == "LogSoftmax":
        return jax.nn.log_softmax(vals[0], axis=_attr_i(node, "axis", -1))
    if op == "LeakyRelu":
        return jax.nn.leaky_relu(vals[0], _attr_f(node, "alpha", 0.01))
    if op == "Elu":
        return jax.nn.elu(vals[0], _attr_f(node, "alpha", 1.0))
    if op == "Gelu":
        return jax.nn.gelu(vals[0], approximate=_attr_s(node, "approximate", "none") == "tanh")
    if op == "Clip":
        lo = vals[1] if len(vals) > 1 and vals[1] is not None else _attr_f(node, "min", -np.inf)
        hi = vals[2] if len(vals) > 2 and vals[2] is not None else _attr_f(node, "max", np.inf)
        return jnp.clip(vals[0], lo, hi)
    if op in ("Identity", "Dropout"):
        return vals[0]
    if op == "Flatten":
        ax = _attr_i(node, "axis", 1)
        shape = vals[0].shape
        lead = int(np.prod(shape[:ax])) if ax > 0 else 1
        return vals[0].reshape(lead, -1)
    if op == "Reshape":
        target = np.asarray(vals[1]).astype(np.int64).tolist()
        shape = [vals[0].shape[i] if d == 0 else d for i, d in enumerate(target)]
        return vals[0].reshape(shape)
    if op == "Transpose":
        perm = _attr_ints(node, "perm") or list(range(vals[0].ndim))[::-1]
        return jnp.transpose(vals[0], perm)
    if op == "Concat":
        return jnp.concatenate(vals, axis=_attr_i(node, "axis", 0))
    if op == "Squeeze":
        axes = _attr_ints(node, "axes") or (
            np.asarray(vals[1]).tolist() if len(vals) > 1 else None)
        return jnp.squeeze(vals[0], axis=tuple(axes) if axes else None)
    if op == "Unsqueeze":
        axes = _attr_ints(node, "axes") or np.asarray(vals[1]).tolist()
        out = vals[0]
        for ax in sorted(axes):
            out = jnp.expand_dims(out, ax)
        return out
    if op == "ReduceMean":
        axes = _attr_ints(node, "axes") or (
            np.asarray(vals[1]).tolist() if len(vals) > 1 else None)
        keep = bool(_attr_i(node, "keepdims", 1))
        return jnp.mean(vals[0], axis=tuple(axes) if axes else None, keepdims=keep)
    if op == "Conv":
        spatial = vals[1].ndim - 2
        out = jax.lax.conv_general_dilated(
            vals[0], vals[1],
            window_strides=_attr_ints(node, "strides", [1] * spatial),
            padding=("SAME" if isinstance(_conv_pads(node, spatial), str)
                     else _conv_pads(node, spatial)),
            rhs_dilation=_attr_ints(node, "dilations", [1] * spatial),
            feature_group_count=_attr_i(node, "group", 1),
        )  # default dim numbers = NCHW/OIHW: ONNX's convention
        if len(vals) > 2:  # bias [C]
            out = out + vals[2].reshape((1, -1) + (1,) * spatial)
        return out
    if op == "MaxPool":
        return _pool(vals[0], node, jax.lax.max, -jnp.inf, avg=False)
    if op == "AveragePool":
        return _pool(vals[0], node, jax.lax.add, 0.0, avg=True)
    if op == "GlobalAveragePool":
        return jnp.mean(vals[0], axis=tuple(range(2, vals[0].ndim)), keepdims=True)
    if op == "BatchNormalization":
        x, scale, bias, mean, var = vals[:5]
        eps = _attr_f(node, "epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = jax.lax.rsqrt(var.reshape(shape) + eps)
        return (x - mean.reshape(shape)) * inv * scale.reshape(shape) + bias.reshape(shape)
    if op == "Constant":
        a = node.attrs.get("value")
        if a is not None and a.t is not None:
            return jnp.asarray(a.t.array)
        raise UnsupportedError(f"Constant node '{node.name}' without tensor value")
    if op == "Shape":
        return jnp.asarray(vals[0].shape, jnp.int64)
    if op == "Gather":
        return jnp.take(vals[0], vals[1], axis=_attr_i(node, "axis", 0))
    if op == "Cast":
        from tpuserve.onnx.proto import _NP_FROM_ONNX

        to = _NP_FROM_ONNX.get(_attr_i(node, "to"))
        if to is None:
            raise UnsupportedError(f"Cast to unsupported onnx dtype {_attr_i(node, 'to')}")
        return vals[0].astype(to)
    raise UnsupportedError(
        f"ONNX op '{op}' is not supported by the TPU importer "
        f"(node '{node.name}'); supported set in tpuserve/onnx/importer.py"
    )


def build(graph: Graph) -> Tuple[Dict[str, np.ndarray], Callable, List[str], List[str]]:
    """Compile-time import: returns (params, apply, input_names, output_names)
    where `apply(params, inputs: dict) -> dict` is pure and jittable."""
    init_names = set(graph.initializers)
    input_names = [vi.name for vi in graph.inputs if vi.name not in init_names]
    output_names = [vi.name for vi in graph.outputs]
    params = {k: v for k, v in graph.initializers.items()}
    nodes = list(graph.nodes)

    def apply(params: Dict, inputs: Dict) -> Dict:
        env: Dict[str, jnp.ndarray] = {}
        for k, v in params.items():
            env[k] = jnp.asarray(v)
        for k in input_names:
            if k not in inputs:
                raise ValidationError(f"missing graph input '{k}'")
            env[k] = jnp.asarray(inputs[k])
        remaining = list(nodes)
        progress = True
        while remaining and progress:  # tolerate non-topological node order
            progress = False
            still = []
            for node in remaining:
                if all((not n) or n in env for n in node.inputs):
                    vals = [env[n] if n else None for n in node.inputs]
                    out = _eval_node(node, vals)
                    outs = out if isinstance(out, (tuple, list)) else (out,)
                    for name, val in zip(node.outputs, outs):
                        if name:
                            env[name] = val
                    progress = True
                else:
                    still.append(node)
            remaining = still
        if remaining:
            missing = {n for node in remaining for n in node.inputs if n and n not in env}
            raise ValidationError(f"unresolvable graph inputs: {sorted(missing)}")
        return {k: env[k] for k in output_names}

    return params, apply, input_names, output_names
