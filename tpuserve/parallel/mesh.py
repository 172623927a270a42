"""Device mesh construction.

The TPU-native replacement for the reference's (absent) distributed backend
(SURVEY.md §2b): scaling is expressed as a `jax.sharding.Mesh` over
("dp", "tp") axes; XLA's SPMD partitioner inserts the all-reduce /
all-gather collectives over ICI. Multi-host extends the same mesh across
processes via `jax.distributed.initialize` — the serving code is identical.

Axis convention:
- "dp": data parallel — decode slots / request batches replicate weights.
- "tp": tensor parallel — attention heads and FFN columns shard; KV cache
  shards over heads on the same axis so attention never crosses chips.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_devices(n: Optional[int] = None) -> List:
    devs = jax.devices()
    if n is not None:
        if n > len(devs):
            raise ValueError(f"requested {n} devices, have {len(devs)}")
        devs = devs[:n]
    return devs


def make_mesh(tp: int = 1, dp: int = 1, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ("dp", "tp") — or ("dp", "sp", "tp") when sp > 1.

    tp should map to the fastest (ICI-adjacent) axis, so it is the minor
    mesh dimension; "sp" (sequence parallel — KV length shards) sits between
    it and "dp" so the per-token flash-decoding merge collectives
    (pmax/psum over "sp") ride near-neighbour ICI links."""
    n = tp * dp * sp
    devs = list(devices) if devices is not None else mesh_devices(n)
    if len(devs) != n:
        raise ValueError(
            f"need {n} devices for dp={dp} sp={sp} tp={tp}, have {len(devs)}")
    if sp > 1:
        arr = np.array(devs).reshape(dp, sp, tp)
        return Mesh(arr, axis_names=("dp", "sp", "tp"))
    arr = np.array(devs).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def make_pipeline_mesh(pp: int, tp: int = 1, dp: int = 1,
                       sp: int = 1,
                       devices: Optional[Sequence] = None) -> Mesh:
    """("pp",) mesh — or ("pp", "tp") / ("dp", "pp"[, "tp"]) /
    ("pp", "sp"): transformer layers stage over "pp"; each stage's
    weights/heads shard over "tp" (Megatron split, see
    parallel/pipeline.py); whole pipeline replicas batch-parallel over
    "dp" (slots shard, weights replicate); each stage's KV length shards
    over "sp" (flash-decoding merge inside the rotation island, r5 —
    exclusive with tp in v1). Minor dims carry the per-layer collectives
    (tp psums / sp merge) so they ride ICI-adjacent links; "pp"
    activations rotate once per tick; "dp" is outermost."""
    if sp > 1 and tp > 1:
        raise ValueError("pipeline sp x tp is not composed yet (v1)")
    devs = list(devices) if devices is not None else mesh_devices(
        pp * tp * dp * sp)
    arr = np.array(devs)
    if sp > 1:
        names = (("dp",) if dp > 1 else ()) + ("pp", "sp")
        shape = ((dp,) if dp > 1 else ()) + (pp, sp)
        return Mesh(arr.reshape(shape), axis_names=names)
    if dp > 1:
        names = ("dp", "pp") + (("tp",) if tp > 1 else ())
        shape = (dp, pp) + ((tp,) if tp > 1 else ())
        return Mesh(arr.reshape(shape), axis_names=names)
    if tp > 1:
        return Mesh(arr.reshape(pp, tp), axis_names=("pp", "tp"))
    return Mesh(arr, axis_names=("pp",))


def single_device_mesh() -> Mesh:
    return make_mesh(tp=1, dp=1)
