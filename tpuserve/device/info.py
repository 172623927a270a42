"""Chip discovery and telemetry.

Reference counterpart: inference_engine/src/cuda_utils.cu (namespace
inference::cuda) — IsCudaAvailable/GetDeviceCount/GetDeviceInfo/GetMemoryInfo
via the CUDA runtime, surfaced over REST at /cuda, /devices, /gpu/memory
(server/main.go:134-187).

TPU-native: one process, `jax.devices()` is the device registry and
`Device.memory_stats()` is the telemetry source. Works identically on real
TPU chips and on the CPU test platform (where memory stats are estimated).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax


@dataclasses.dataclass
class DeviceInfo:
    device_id: int
    platform: str  # "tpu" / "cpu" / "gpu"
    device_kind: str  # e.g. "TPU v5 lite"
    process_index: int
    coords: Optional[tuple] = None  # physical mesh coordinates, TPU only
    core_on_chip: Optional[int] = None

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        if self.coords is not None:
            d["coords"] = list(self.coords)
        return d

    def describe(self) -> str:
        """Human-readable one-liner (reference: cuda::GetDeviceInfo returns
        "<name> (Compute Capability X.Y)", cuda_utils.cu:41-57)."""
        loc = f" coords={self.coords}" if self.coords is not None else ""
        return f"Device {self.device_id}: {self.device_kind} [{self.platform}]{loc}"


@dataclasses.dataclass
class MemoryInfo:
    device_id: int
    total_bytes: int
    used_bytes: int
    free_bytes: int

    @property
    def used_percent(self) -> float:
        return 100.0 * self.used_bytes / self.total_bytes if self.total_bytes else 0.0

    def to_dict(self) -> dict:
        mb = 1024.0 * 1024.0
        return {
            "device_id": self.device_id,
            "total_mb": round(self.total_bytes / mb, 2),
            "used_mb": round(self.used_bytes / mb, 2),
            "free_mb": round(self.free_bytes / mb, 2),
            "used_percent": round(self.used_percent, 2),
        }


# Default HBM size used when the backend does not expose memory stats
# (CPU test platform): pretend each "chip" has 16 GiB like a v5e.
_FALLBACK_BYTE_LIMIT = 16 * 1024**3


def platform_name() -> str:
    return jax.devices()[0].platform


def is_tpu_available() -> bool:
    """True when real TPU chips back this process (reference:
    cuda::IsCudaAvailable, cuda_utils.cu:17-28)."""
    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


def get_device_count() -> int:
    return len(jax.devices())


def get_device_info(device_id: int) -> DeviceInfo:
    devices = jax.devices()
    if device_id < 0 or device_id >= len(devices):
        raise IndexError(f"invalid device id {device_id} (have {len(devices)})")
    d = devices[device_id]
    return DeviceInfo(
        device_id=device_id,
        platform=d.platform,
        device_kind=getattr(d, "device_kind", d.platform),
        process_index=d.process_index,
        coords=tuple(d.coords) if hasattr(d, "coords") else None,
        core_on_chip=getattr(d, "core_on_chip", None),
    )


def get_memory_info(device_id: int) -> MemoryInfo:
    """Per-chip HBM telemetry (reference: cuda::GetMemoryInfo via
    cudaMemGetInfo, cuda_utils.cu:152-176)."""
    devices = jax.devices()
    if device_id < 0 or device_id >= len(devices):
        raise IndexError(f"invalid device id {device_id} (have {len(devices)})")
    d = devices[device_id]
    stats = {}
    try:
        stats = d.memory_stats() or {}
    except Exception:
        stats = {}
    total = int(stats.get("bytes_limit", 0)) or _FALLBACK_BYTE_LIMIT
    used = int(stats.get("bytes_in_use", 0))
    return MemoryInfo(
        device_id=device_id,
        total_bytes=total,
        used_bytes=used,
        free_bytes=max(total - used, 0),
    )


def all_device_infos() -> List[DeviceInfo]:
    return [get_device_info(i) for i in range(get_device_count())]


def all_memory_infos() -> List[MemoryInfo]:
    return [get_memory_info(i) for i in range(get_device_count())]
