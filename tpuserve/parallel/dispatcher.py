"""Multi-host serving dispatcher: controller-broadcast step topology.

GSPMD's contract is that EVERY process enters the same jitted computation
with the same global shapes. Serving traffic, however, arrives at one
frontend. This module implements the standard resolution (the topology
`distributed.py` documents): process 0 is the controller — it owns the
HTTP/gRPC surface and each step broadcasts the tiny host-side inputs
(token ids, positions, lengths) to all processes over the collective
fabric; every process then dispatches the same jitted step over the global
mesh, and XLA's partitioner keeps the heavy tensors (weights, KV cache)
resident and sharded. Only O(batch) integers cross hosts per step.

No reference counterpart (the reference is single-process; SURVEY.md §2b
"distributed comm backend: none"). Tested multi-process for real on CPU
devices in tests/test_multihost.py via scripts/multihost_worker.py
(SURVEY.md §4's "multi-host tests via multiprocess jax.distributed").
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.parallel.sharding import llama_param_pspecs, cache_pspec


def broadcast_step(payload: np.ndarray) -> np.ndarray:
    """Controller (process 0) -> all processes. On followers the input
    value is ignored; the controller's array is returned everywhere."""
    return np.asarray(multihost_utils.broadcast_one_to_all(payload))


# ------------------------------------------------------------- serving bus
# The controller-broadcast event bus the SERVER runs on (VERDICT r4 #3):
# process 0 owns the REST/gRPC surface and publishes one pickled event
# before every device dispatch; followers replay the identical dispatch
# sequence so every process enters the same jitted computation (the GSPMD
# contract). Two-phase broadcast: a fixed [1]-int32 length header, then the
# payload bytes at that length — both sides always call with equal shapes,
# as broadcast_one_to_all requires. Only O(batch) integers cross hosts.

import pickle
import threading

# publishes may come from different controller threads (the scheduler loop,
# the manager's load/unload workers, server teardown); the two-phase
# broadcast must not interleave, and followers receive strictly in publish
# order
_PUBLISH_LOCK = threading.Lock()


def is_controller() -> bool:
    return jax.process_index() == 0


def publish_event(obj) -> None:
    """Controller: broadcast one event object to all follower processes."""
    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    with _PUBLISH_LOCK:
        multihost_utils.broadcast_one_to_all(
            np.asarray([data.size], np.int32))
        multihost_utils.broadcast_one_to_all(data)


def recv_event():
    """Follower: receive the next event (blocks in the collective)."""
    n = int(np.asarray(multihost_utils.broadcast_one_to_all(
        np.zeros((1,), np.int32)))[0])
    data = np.asarray(multihost_utils.broadcast_one_to_all(
        np.zeros((n,), np.uint8)))
    return pickle.loads(data.tobytes())


class MultiHostGenerator:
    """A minimal multi-host generation loop over the global device mesh.

    Every process constructs this with the SAME arguments (config is
    static, seed-derived weights are identical by construction) and then
    calls `generate()` in lockstep; prompt data is taken from process 0
    and broadcast, so followers can pass anything (or None).

    This is the serving-dispatcher core: the GenerationEngine scheduler
    runs on the controller and followers run `generate()`'s loop body via
    `follow()`; both sides execute identical jitted steps.
    """

    def __init__(self, p: LlamaParams, *, n_slots: int = 4, max_len: int = 64,
                 tp: int = 1, dp: int = 1, seed: int = 0,
                 quantized_kv: bool = False):
        self.p = p
        self.n_slots = n_slots
        self.max_len = max_len
        devs = np.asarray(jax.devices()[: tp * dp]).reshape(dp, tp)
        self.mesh = Mesh(devs, ("dp", "tp"))

        # identical on every process: same seed, same draw order
        host_params = llama.init_params(jax.random.PRNGKey(seed), p, dtype=jnp.float32)
        pspecs = llama_param_pspecs(host_params)
        self.params = {
            name: self._make_global(np.asarray(arr), pspecs[name])
            for name, arr in host_params.items()
        }
        cspec = cache_pspec()
        host_cache = KVCache.create(p, n_slots, max_len, quantized=quantized_kv,
                                    dtype=jnp.float32)
        self.cache = KVCache(
            k=self._make_global(np.asarray(host_cache.k), cspec.k),
            v=self._make_global(np.asarray(host_cache.v), cspec.v),
            k_scale=None if host_cache.k_scale is None else
            self._make_global(np.asarray(host_cache.k_scale), cspec.k_scale),
            v_scale=None if host_cache.v_scale is None else
            self._make_global(np.asarray(host_cache.v_scale), cspec.v_scale),
        )

        repl = NamedSharding(self.mesh, P())

        def prefill_fn(params, tokens, cache, slot, length):
            logits, cache = llama.prefill(params, p, tokens, cache, slot, length)
            return jnp.argmax(logits[0]).astype(jnp.int32), cache

        def decode_fn(params, tokens, cache, positions):
            logits, cache = llama.decode_step(params, p, tokens, cache, positions)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache

        # replicated token outputs: every process can read them
        self._prefill = jax.jit(prefill_fn, donate_argnums=(2,),
                                out_shardings=(repl, None))
        self._decode = jax.jit(decode_fn, donate_argnums=(2,),
                               out_shardings=(repl, None))

    def _make_global(self, arr: np.ndarray, spec: P):
        s = NamedSharding(self.mesh, spec if isinstance(spec, P) else P())
        return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

    def _repl(self, arr: np.ndarray):
        return self._make_global(np.asarray(arr), P())

    def generate(self, prompt_ids: Optional[Sequence[int]], max_new_tokens: int,
                 prompt_len_hint: int = 16) -> List[int]:
        """Run one greedy generation in slot 0. The controller passes the
        prompt; followers may pass None — the controller's data is
        broadcast. Every process returns the same token list."""
        if jax.process_index() == 0:
            if prompt_ids is None:
                raise ValueError("controller must pass prompt_ids")
            buf = np.zeros((prompt_len_hint + 1,), np.int32)
            buf[0] = len(prompt_ids)
            buf[1 : 1 + len(prompt_ids)] = prompt_ids
        else:
            buf = np.zeros((prompt_len_hint + 1,), np.int32)
        buf = broadcast_step(buf)  # controller-authoritative
        l = int(buf[0])
        prompt = [int(t) for t in buf[1 : 1 + l]]

        bucket = 16
        while bucket < l:
            bucket *= 2
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :l] = prompt
        tok, self.cache = self._prefill(
            self.params, self._repl(tokens), self.cache,
            self._repl(np.int32(0)), self._repl(np.int32(l)),
        )
        out = [int(np.asarray(tok))]
        pos = l
        for _ in range(max_new_tokens - 1):
            t_arr = np.zeros((self.n_slots,), np.int32)
            p_arr = np.full((self.n_slots,), -1, np.int32)
            t_arr[0] = out[-1]
            p_arr[0] = pos
            toks, self.cache = self._decode(
                self.params, self._repl(t_arr), self.cache, self._repl(p_arr)
            )
            out.append(int(np.asarray(toks)[0]))
            pos += 1
        return out

    def follow(self, max_new_tokens: int, prompt_len_hint: int = 16) -> List[int]:
        """Follower-side entry: identical loop, data arrives by broadcast."""
        return self.generate(None, max_new_tokens, prompt_len_hint)
