"""Device smoke test: a Pallas elementwise-add kernel.

Reference counterpart: the `addVectors` CUDA kernel + `VectorAdd` host wrapper
(inference_engine/src/cuda_utils.cu:10-15, 59-150) — the repo's only
hand-written kernel, used purely to verify the toolchain reaches the device.

Here the same role is played by a minimal Pallas TPU kernel: it proves that
HBM→VMEM block pipelining, the VPU, and the Mosaic compiler all work on the
chips this process sees. On non-TPU platforms (CPU tests) the kernel runs in
interpreter mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _add_kernel(a_ref, b_ref, out_ref):
    out_ref[:] = a_ref[:] + b_ref[:]


_LANE = 128
_BLOCK_ROWS = 256


def _pad_to_2d(x: jax.Array):
    """Lay a 1-D vector out as (rows, 128) lanes, padding the tail."""
    n = x.shape[0]
    rows = max(pl.cdiv(n, _LANE), 1)
    padded = jnp.zeros((rows * _LANE,), x.dtype).at[:n].set(x)
    return padded.reshape(rows, _LANE), rows


def vector_add(a, b, interpret: bool | None = None):
    """Elementwise a + b through a Pallas kernel. Accepts 1-D arrays of any
    length; tiles them onto (256, 128) VMEM blocks."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.shape != b.shape or a.ndim != 1:
        raise ValueError("vector_add expects two 1-D arrays of equal length")
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n = a.shape[0]

    a2, rows = _pad_to_2d(a)
    b2, _ = _pad_to_2d(b)
    grid = (pl.cdiv(rows, _BLOCK_ROWS),)
    block = (min(rows, _BLOCK_ROWS), _LANE)

    out = pl.pallas_call(
        _add_kernel,
        out_shape=jax.ShapeDtypeStruct(a2.shape, a2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a2, b2)
    return out.reshape(-1)[:n]


def run_smoke_test(n: int = 1_000_000) -> bool:
    """1M-element vector add with verification (reference:
    test/cuda_test.cpp:38-58 runs exactly this on the GPU)."""
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (n,), dtype=jnp.float32)
    b = jax.random.normal(kb, (n,), dtype=jnp.float32)
    out = vector_add(a, b)
    expected = a + b
    return bool(jnp.allclose(out, expected, atol=1e-5))
