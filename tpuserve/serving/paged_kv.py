"""Paged KV cache: fixed-size pages + per-slot page tables.

North-star component (BASELINE.md: "HBM arena + KV-page allocator"). The
contiguous per-slot cache (llama.KVCache) reserves max_seq_len for every
slot; the paged cache allocates pages on demand, so total HBM commitment
follows the *actual* token count — more concurrent slots fit the same
memory. Page bookkeeping (free list, per-sequence chains) lives in the
native allocator (native/src/kv_allocator.cpp via
tpuserve.bindings.native.NativeKvAllocator) with a pure-Python fallback.

Device layout:
  pages_k/pages_v: [n_layers, n_pages, page_size, Hkv, hd] (int8 or bf16)
  scales:          [n_layers, n_pages, page_size, Hkv] f32 (int8 only)
  page table:      [S, max_pages_per_slot] int32, -1 = unallocated; page 0
                   is reserved as the zero page that -1 entries map to.

Reads materialize the gathered view [S, P*page_size, Hkv, hd] per layer —
the allocation win is capacity, and the gather costs one extra HBM pass
over the live window (documented tradeoff; the contiguous layout remains
the throughput default). Enable per model with
config.generation.paged = true.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tpuserve.models.llama import LlamaParams
from tpuserve.utils.errors import ResourceExhaustedError


class _PyKvAllocator:
    """Pure-Python fallback with NativeKvAllocator's exact semantics."""

    def __init__(self, num_pages: int, page_size: int):
        self.page_size = page_size
        self.total_pages = num_pages
        self._free = list(range(num_pages - 1, -1, -1))
        self._chains: Dict[int, List[int]] = {}
        self._lock = threading.Lock()

    @property
    def free_pages(self) -> int:
        with self._lock:
            return len(self._free)

    def ensure(self, seq_id: int, num_tokens: int) -> bool:
        with self._lock:
            chain = self._chains.setdefault(seq_id, [])
            need = -(-num_tokens // self.page_size)
            extra = need - len(chain)
            if extra <= 0:
                return True
            if extra > len(self._free):
                return False
            for _ in range(extra):
                chain.append(self._free.pop())
            return True

    def release(self, seq_id: int) -> bool:
        with self._lock:
            chain = self._chains.pop(seq_id, None)
            if chain is None:
                return False
            self._free.extend(chain)
            return True

    def page_table(self, seq_id: int) -> Optional[List[int]]:
        with self._lock:
            chain = self._chains.get(seq_id)
            return None if chain is None else list(chain)


def make_allocator(num_pages: int, page_size: int):
    """Native allocator when libtpuserve.so is built, Python fallback else."""
    try:
        from tpuserve.bindings import native

        if native.available():
            return native.NativeKvAllocator(num_pages, page_size)
    except Exception:
        pass
    return _PyKvAllocator(num_pages, page_size)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PagedKVCache:
    """Device-side page pool (see module docstring).

    Like llama.KVCache, supports two layouts (``flat`` is pytree aux data):
    flat=False keeps [layers, n_pages, page_size, Hkv, hd]; flat=True merges
    the head dims to [layers, n_pages, page_size, W] so the paged Pallas
    kernel's [n_layers*n_pages*ps, W] pool view is a bitcast (TPU tiling
    lives on the last two dims — see KVCache docstring for the measured
    cost of getting this wrong)."""

    k: jax.Array  # [layers, n_pages, page_size, Hkv, hd] or [..., W]
    v: jax.Array
    k_scale: Optional[jax.Array]  # [layers, n_pages, page_size, Hkv]
    v_scale: Optional[jax.Array]
    flat: bool = False

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), (self.flat,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, flat=aux[0])

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def nbytes(self) -> int:
        total = self.k.size * self.k.dtype.itemsize + self.v.size * self.v.dtype.itemsize
        if self.k_scale is not None:
            total += self.k_scale.size * 4 + self.v_scale.size * 4
        return total

    @classmethod
    def create(cls, p: LlamaParams, n_pages: int, page_size: int, quantized: bool,
               dtype=jnp.bfloat16, flat: bool = False) -> "PagedKVCache":
        if flat:
            shape = (p.n_layers, n_pages, page_size, p.n_kv_heads * p.head_dim)
        else:
            shape = (p.n_layers, n_pages, page_size, p.n_kv_heads, p.head_dim)
        scale_shape = (p.n_layers, n_pages, page_size, p.n_kv_heads)
        if quantized:
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(scale_shape, jnp.float32),
                v_scale=jnp.zeros(scale_shape, jnp.float32),
                flat=flat,
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None, flat=flat)


class PageTableManager:
    """Host-side bridge: sequence ids -> device page-table array [S, P].

    Page index 0 is the reserved zero page (never allocated) so -1 / unused
    table entries gather zeros, which the attention mask already ignores.
    """

    def __init__(self, n_pages: int, page_size: int, n_slots: int, max_len: int):
        if n_pages < 2:
            raise ValueError("need at least 2 pages (page 0 is reserved)")
        # page 0 reserved: hand the allocator n_pages-1 pages, shift ids by 1
        self._alloc = make_allocator(n_pages - 1, page_size)
        self.page_size = page_size
        self.max_pages = -(-max_len // page_size)
        self.n_slots = n_slots
        import numpy as np

        self._np = np
        self.table = np.zeros((n_slots, self.max_pages), np.int32)  # 0 = zero page

    @property
    def free_pages(self) -> int:
        return self._alloc.free_pages

    def ensure(self, slot: int, num_tokens: int) -> None:
        """Grow slot's chain to cover num_tokens; raises ResourceExhaustedError
        when the pool is out of pages."""
        if not self._alloc.ensure(slot, num_tokens):
            raise ResourceExhaustedError(
                f"KV page pool exhausted ({self._alloc.free_pages} pages free)"
            )
        chain = self._alloc.page_table(slot) or []
        row = self._np.zeros((self.max_pages,), self._np.int32)
        row[: len(chain)] = self._np.asarray(chain, self._np.int32) + 1  # shift past zero page
        self.table[slot] = row

    def release(self, slot: int) -> None:
        self._alloc.release(slot)
        self.table[slot] = 0

    def device_table(self) -> jax.Array:
        return jnp.asarray(self.table)
