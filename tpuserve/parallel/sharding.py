"""Sharding rules for the Llama serving path.

GSPMD-style: we annotate parameter/cache/activation shardings with
`NamedSharding(mesh, PartitionSpec)` and let XLA's partitioner insert the
collectives (all-reduce after the row-sharded wo/w_down contractions rides
the "tp" axis over ICI). This is the scaling-book recipe: pick a mesh,
annotate, let XLA do the comms, profile.

Rules (mesh axes ("dp", "tp")):
- column-sharded (output dim over tp):  wq, wk, wv, w_gate, w_up, lm_head
- row-sharded (input dim over tp):      wo, w_down
- replicated:                           norms, embed table
- KV cache [layers, S, L, Hkv, hd]:     slots over dp, kv-heads over tp
- tokens/positions [S]:                 dp; logits [S, V]: (dp, tp)

QTensor leaves shard like their dense counterparts: values [K, N] and
scales [G, N] carry the same column/row spec (G tracks K).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.quant.core import QTensor

_COL = (
    "wq/kernel", "wk/kernel", "wv/kernel", "wqkv/kernel",
    "w_gate/kernel", "w_up/kernel", "w_gateup/kernel", "lm_head/kernel",
)
_ROW = ("wo/kernel", "w_down/kernel")


def _spec_for(name: str) -> P:
    if any(name.endswith(s) for s in _COL):
        return P(None, "tp")
    if any(name.endswith(s) for s in _ROW):
        return P("tp", None)
    return P()  # norms, embed, biases: replicated


def _scale_spec(spec: P, scale) -> P:
    """Scales [G, N] track the weight's spec, except per-channel scales
    (G == 1, forced by act_bits or group_size=0) whose size-1 dim 0 cannot
    be partitioned over tp — replicate dim 0; per-column values are
    mathematically identical on every row shard."""
    if len(spec) >= 1 and spec[0] is not None and scale.shape[0] == 1:
        return P(None, *spec[1:])
    return spec


def llama_param_pspecs(params: Dict) -> Dict[str, object]:
    """name -> PartitionSpec (or QTensor of specs, matching its pytree)."""
    specs: Dict[str, object] = {}
    for name, val in params.items():
        spec = _spec_for(name)
        if isinstance(val, QTensor):
            specs[name] = QTensor(
                q=spec, scale=_scale_spec(spec, val.scale), bits=val.bits,
                group_size=val.group_size, orig_shape=val.orig_shape,
                act_bits=val.act_bits,
            )
        else:
            specs[name] = spec
    return specs


def shard_llama_params(params: Dict, mesh: Mesh) -> Dict:
    """device_put every param with its NamedSharding."""
    out = {}
    for name, val in params.items():
        spec = _spec_for(name)
        if isinstance(val, QTensor):
            out[name] = QTensor(
                q=jax.device_put(val.q, NamedSharding(mesh, spec)),
                scale=jax.device_put(val.scale, NamedSharding(mesh, _scale_spec(spec, val.scale))),
                bits=val.bits,
                group_size=val.group_size,
                orig_shape=val.orig_shape,
                act_bits=val.act_bits,
            )
        else:
            out[name] = jax.device_put(val, NamedSharding(mesh, spec))
    return out


def cache_pspec() -> KVCache:
    """PartitionSpecs for the KVCache pytree: [layers, S, L, Hkv, hd]."""
    kv = P(None, "dp", None, "tp", None)
    sc = P(None, "dp", None, "tp")
    return KVCache(k=kv, v=kv, k_scale=sc, v_scale=sc)


def shard_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    kv = NamedSharding(mesh, P(None, "dp", None, "tp", None))
    sc = NamedSharding(mesh, P(None, "dp", None, "tp"))
    return KVCache(
        k=jax.device_put(cache.k, kv),
        v=jax.device_put(cache.v, kv),
        k_scale=None if cache.k_scale is None else jax.device_put(cache.k_scale, sc),
        v_scale=None if cache.v_scale is None else jax.device_put(cache.v_scale, sc),
    )
