"""Bench-scale weight materialization.

Generates already-quantized random Llama weights directly on device
(QTensor values + scales) — initializing 13 GB of bf16 and quantizing it
would not fit HBM next to the INT4 copy on a 16 GB chip, and bench numbers
only need realistic shapes/dtypes, not trained values.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from tpuserve.models.llama import LlamaParams
from tpuserve.quant.core import QTensor


def init_quantized_params(
    rng: jax.Array, p: LlamaParams, bits: int = 4, group_size: int = 128, dtype=jnp.bfloat16
) -> Dict[str, object]:
    qd = p.n_heads * p.head_dim
    kvd = p.n_kv_heads * p.head_dim

    def nxt():
        nonlocal rng
        rng, k = jax.random.split(rng)
        return k

    def qweight(k_dim: int, n_dim: int) -> QTensor:
        gs = group_size if 0 < group_size < k_dim else k_dim
        groups = k_dim // gs
        scale = jnp.full((groups, n_dim), 0.02 / (7.0 if bits == 4 else 127.0), jnp.float32)
        if bits == 4:
            q = jax.random.randint(nxt(), (k_dim // 2, n_dim), 0, 256, jnp.int32).astype(jnp.uint8)
        else:
            q = jax.random.randint(nxt(), (k_dim, n_dim), -127, 128, jnp.int32).astype(jnp.int8)
        return QTensor(q=q, scale=scale, bits=bits,
                       group_size=gs if groups > 1 else 0, orig_shape=(k_dim, n_dim))

    params: Dict[str, object] = {
        "embed/weight": (jax.random.normal(nxt(), (p.vocab_size, p.dim)) * 0.02).astype(dtype),
        "final_norm/scale": jnp.ones((p.dim,), dtype),
        "lm_head/kernel": qweight(p.dim, p.vocab_size),
    }
    def qexperts(n_e: int, k_dim: int, n_dim: int):
        from tpuserve.quant.core import QExperts

        gs = group_size if 0 < group_size < k_dim else k_dim
        groups = k_dim // gs
        scale = jnp.full((n_e, groups, n_dim),
                         0.02 / (7.0 if bits == 4 else 127.0), jnp.float32)
        if bits == 4:
            q = jax.random.randint(nxt(), (n_e, k_dim // 2, n_dim), 0, 256,
                                   jnp.int32).astype(jnp.uint8)
        else:
            q = jax.random.randint(nxt(), (n_e, k_dim, n_dim), -127, 128,
                                   jnp.int32).astype(jnp.int8)
        return QExperts(q=q, scale=scale, bits=bits,
                        group_size=gs if groups > 1 else 0,
                        orig_shape=(n_e, k_dim, n_dim))

    for l in range(p.n_layers):
        pre = f"layers.{l}"
        params[f"{pre}/attn_norm/scale"] = jnp.ones((p.dim,), dtype)
        params[f"{pre}/mlp_norm/scale"] = jnp.ones((p.dim,), dtype)
        # fused projections (see llama._forward_block): fewer, wider kernels
        params[f"{pre}/wqkv/kernel"] = qweight(p.dim, qd + 2 * kvd)
        params[f"{pre}/wo/kernel"] = qweight(qd, p.dim)
        if p.n_experts:
            params[f"{pre}/router/kernel"] = (
                jax.random.normal(nxt(), (p.dim, p.n_experts)) * 0.02).astype(dtype)
            params[f"{pre}/moe_gateup/kernel"] = qexperts(p.n_experts, p.dim, 2 * p.ffn_dim)
            params[f"{pre}/moe_down/kernel"] = qexperts(p.n_experts, p.ffn_dim, p.dim)
        else:
            params[f"{pre}/w_gateup/kernel"] = qweight(p.dim, 2 * p.ffn_dim)
            params[f"{pre}/w_down/kernel"] = qweight(p.ffn_dim, p.dim)
    return params


def param_bytes(params: Dict) -> int:
    total = 0
    for v in jax.tree_util.tree_leaves(params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(v, QTensor):
            total += v.nbytes
        else:
            total += v.size * v.dtype.itemsize
    return total
