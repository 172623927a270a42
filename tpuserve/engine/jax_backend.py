"""JAX graph backend — executes checkpointed model-zoo architectures under
`jax.jit`.

Reference counterpart: the ONNX Runtime backend (model.cpp:825-1035 load,
:1158-1328 infer) — the only real backend of the five. TPU-native redesign:

- graph construction is a jitted pure function from the architecture registry
  (no session object, no graph format; XLA is the graph compiler);
- weights load from safetensors/npz and are optionally quantized on the fly
  (INT8/INT4 weight-only per config.quantization) before `device_put` — the
  north-star "sharded checkpoint loader with on-the-fly quantizer";
- dynamic batch dims are served by power-of-two bucketing: requests are
  padded to the next bucket so XLA sees a small, static set of shapes
  (the XLA analogue of ORT's dynamic axes, model.cpp:944-958).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuserve.engine.backend import Backend, register_backend
from tpuserve.models.registry import get_architecture
from tpuserve.quant.core import QTensor, quantize_param_tree
from tpuserve.repository.repo import ModelType
from tpuserve.utils.dtypes import DataType
from tpuserve.utils.errors import BackendError, ValidationError
from tpuserve.utils.tensor import Tensor

_QUANT_BITS = {"int8": 8, "int4": 4}


def load_checkpoint(model_dir: str) -> Dict[str, np.ndarray]:
    """Flat param dict from the version directory. Formats: model.safetensors
    (primary), params.npz, or an orbax `checkpoint/` directory (nested trees
    are flattened with '/'-joined keys)."""
    st = os.path.join(model_dir, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return dict(load_file(st))
    npz = os.path.join(model_dir, "params.npz")
    if os.path.exists(npz):
        with np.load(npz) as data:
            return {k: data[k] for k in data.files}
    ckpt = os.path.join(model_dir, "checkpoint")
    if os.path.isdir(ckpt):
        try:
            import orbax.checkpoint as ocp

            with ocp.PyTreeCheckpointer() as checkpointer:
                tree = checkpointer.restore(ckpt)
        except Exception as e:
            raise BackendError(f"failed to restore orbax checkpoint {ckpt}: {e}")
        flat: Dict[str, np.ndarray] = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix}/{k}" if prefix else str(k), v)
            else:
                flat[prefix] = np.asarray(node)

        walk("", tree)
        return flat
    raise BackendError(
        f"no checkpoint found in {model_dir} (model.safetensors / params.npz / checkpoint/)"
    )


def _bucket(n: int, max_batch: int) -> int:
    """Next power-of-two bucket ≥ n (capped)."""
    b = 1
    while b < n:
        b *= 2
    return min(b, max(max_batch, n)) if max_batch > 0 else b


@register_backend(ModelType.JAX)
class JaxBackend(Backend):
    def __init__(self, model_dir: str, config):
        super().__init__(model_dir, config)
        self.params = None
        self._apply_jit = None
        self._arch = None
        self._param_bytes = 0

    # ------------------------------------------------------------------
    def load(self) -> None:
        self._arch = get_architecture(self.config)
        raw = load_checkpoint(self.model_dir)

        qcfg = self.config.quantization
        bits = _QUANT_BITS.get(qcfg.weights)
        if bits is not None:
            params = quantize_param_tree(
                raw,
                bits=bits,
                group_size=qcfg.group_size,
                predicate=self._arch.quant_predicate,
                act_bits=8 if qcfg.activations == "int8" else 0,
                act_fp8=qcfg.activations == "fp8",
            )
        else:
            params = {k: jnp.asarray(v) for k, v in raw.items()}

        # place on device once at load (≙ ORT allocating GPU memory at
        # session construction, model.cpp:847)
        self.params = jax.device_put(params)
        self._param_bytes = sum(
            p.nbytes if isinstance(p, QTensor) else p.size * p.dtype.itemsize
            for p in jax.tree_util.tree_leaves(self.params, is_leaf=lambda x: isinstance(x, QTensor))
        )

        arch = self._arch

        def fwd(params, inputs):
            return arch.apply(params, inputs)

        self._apply_jit = jax.jit(fwd)

    def warmup(self) -> None:
        """Compile for the config-declared shapes (batch bucket 1)."""
        if self._apply_jit is None:
            return
        dummy = {}
        for t in self.config.inputs:
            shape = [1 if d == -1 else d for d in t.shape]
            np_dt = t.data_type.np_dtype or np.float32
            dummy[t.name] = jnp.zeros(shape, np_dt)
        if dummy:
            out = self._apply_jit(self.params, dummy)
            jax.block_until_ready(out)

    def unload(self) -> None:
        self.params = None
        self._apply_jit = None
        self._arch = None

    def memory_usage_bytes(self) -> int:
        return self._param_bytes

    # ------------------------------------------------------------------
    def infer(self, inputs: List[Tensor]) -> List[Tensor]:
        if self._apply_jit is None:
            raise BackendError("model not loaded")

        batch, padded = self._prepare(inputs)
        outputs = self._apply_jit(self.params, batch)
        outputs = {k: np.asarray(v) for k, v in outputs.items()}

        result: List[Tensor] = []
        declared = {t.name: t for t in self.config.outputs}
        for name, arr in outputs.items():
            if padded is not None:
                arr = arr[:padded]
            decl = declared.get(name)
            dtype = decl.data_type if decl else DataType.from_np(arr.dtype)
            if dtype.np_dtype is not None and arr.dtype != dtype.np_dtype:
                arr = arr.astype(dtype.np_dtype)
            result.append(Tensor(name=name, dtype=dtype, shape=arr.shape, data=arr))
        return result

    def _prepare(self, inputs: List[Tensor]):
        """Tensors -> jax dict; pad dynamic batch to a power-of-two bucket.
        Returns (batch_dict, original_batch_or_None)."""
        batch: Dict[str, jax.Array] = {}
        orig_batch: Optional[int] = None
        for t in inputs:
            decl = self.config.input_config(t.name)
            arr = t.numpy()
            if decl is not None and decl.shape and decl.shape[0] == -1:
                n = arr.shape[0]
                b = _bucket(n, self.config.max_batch_size)
                if b != n:
                    pad_width = [(0, b - n)] + [(0, 0)] * (arr.ndim - 1)
                    arr = np.pad(arr, pad_width)
                    orig_batch = n
            batch[t.name] = jnp.asarray(arr)
        return batch, orig_batch
