"""Multi-host process-group initialization.

The TPU-native replacement for NCCL/MPI bootstrap (the reference has no
distributed machinery — SURVEY.md §2b): every serving host runs the same
engine; `initialize()` joins the jax.distributed process group so
`jax.devices()` spans the full slice and the meshes in
tpuserve/parallel/mesh.py stretch across hosts. Collectives ride ICI within
a slice and DCN across slices — inserted by XLA from the NamedShardings,
never hand-written.

Serving topology (BASELINE.md configs[4], Llama-70B N>=2 hosts): one
controller process receives HTTP/gRPC traffic and broadcasts request
batches; every process enters the same jitted step (GSPMD requirement).
Single-host serving never needs to call anything here.

Env convention (matches jax.distributed defaults / TPU pod metadata):
  TPUSERVE_COORDINATOR  host:port of process 0  (or JAX coordinator env)
  TPUSERVE_NUM_PROCESSES, TPUSERVE_PROCESS_ID   (auto-detected on TPU pods)
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host process group. No-op if already initialized or
    if no coordinator is configured (single-host)."""
    coordinator_address = coordinator_address or os.environ.get("TPUSERVE_COORDINATOR")
    if num_processes is None and os.environ.get("TPUSERVE_NUM_PROCESSES"):
        num_processes = int(os.environ["TPUSERVE_NUM_PROCESSES"])
    if process_id is None and os.environ.get("TPUSERVE_PROCESS_ID"):
        process_id = int(os.environ["TPUSERVE_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # On TPU pods jax.distributed.initialize() autodetects from metadata;
        # only call it when we are actually in a pod (multi-process env).
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def is_multi_host() -> bool:
    return jax.process_count() > 1


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
