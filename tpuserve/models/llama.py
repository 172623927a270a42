"""Llama-family decoder (the quantized-LLM serving architecture).

No reference counterpart — the reference serves opaque ONNX graphs and has
no attention/KV machinery (SURVEY.md §5 long-context: green-field per
BASELINE.md configs 3-4). TPU-first design:

- pure functions over a flat param dict; all matmul weights may be QTensors
  (INT8/INT4 weight-only) dispatched through the fused Pallas kernel;
- grouped-query attention + RoPE, RMSNorm, SwiGLU MLP (Llama-2/3 shapes);
- two jitted entry points shaped for continuous batching:
    prefill(params, tokens[1, L], cache, slot, pos0)  -> logits[1, V], cache
    decode (params, tokens[S],    cache, positions)   -> logits[S, V], cache
- KV cache as an explicit pytree argument (functional update, donate-able),
  contiguous per slot: [n_layers, S, L_max, n_kv_heads, head_dim], bf16 or
  INT8 with per-(slot, pos, head) scales. INT8 dequant folds into the
  attention products (scale * (q·k_q), (p*vscale)·v_q) so it costs O(L),
  not O(L·head_dim).

Hyperparameters (config.model_params): vocab_size, dim, n_layers, n_heads,
n_kv_heads, head_dim, ffn_dim, rope_theta, rms_eps, tie_embeddings.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tpuserve.models.layers import rms_norm
from tpuserve.models.registry import Architecture, register_architecture
from tpuserve.quant.core import QTensor, qmatmul


# ---------------------------------------------------------------------- config
@dataclasses.dataclass(frozen=True)
class LlamaParams:
    vocab_size: int = 32000
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 32
    head_dim: int = 128
    ffn_dim: int = 11008
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    # Mixture-of-Experts (Mixtral-style): n_experts > 0 replaces every
    # layer's FFN with a top-k router over E independent gated-silu experts
    # of ffn_dim each. Expert weights are stored STACKED [E, ...] so expert
    # parallelism is a real array-dim sharding (see parallel/sharding.py
    # moe_ffn_sharded).
    n_experts: int = 0
    n_experts_per_tok: int = 2

    @classmethod
    def from_dict(cls, d: Dict) -> "LlamaParams":
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in fields}
        p = cls(**kw)
        assert p.n_heads % p.n_kv_heads == 0, "n_heads must be divisible by n_kv_heads"
        if p.n_experts:
            assert 0 < p.n_experts_per_tok <= p.n_experts
        return p

    # canonical model sizes for configs/bench
    @classmethod
    def llama2_7b(cls) -> "LlamaParams":
        return cls()

    @classmethod
    def tiny(cls) -> "LlamaParams":
        """CPU-test scale."""
        return cls(vocab_size=256, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                   head_dim=16, ffn_dim=128)


def active_param_count(p: LlamaParams) -> int:
    """Matmul-active parameters per decoded token (MoE counts only the
    top-k experts a token routes through). 2*this is the step's matmul
    FLOPs per token — the MFU numerator (bench.py)."""
    qd = p.n_heads * p.head_dim
    kvd = p.n_kv_heads * p.head_dim
    attn = p.dim * qd + 2 * p.dim * kvd + qd * p.dim
    ffn = 3 * p.dim * p.ffn_dim
    if p.n_experts:
        ffn = ffn * p.n_experts_per_tok + p.dim * p.n_experts  # + router
    head = p.dim * p.vocab_size  # lm_head (tied or not, the matmul runs)
    return p.n_layers * (attn + ffn) + head


# ---------------------------------------------------------------------- weights
def init_params(rng: jax.Array, p: LlamaParams, dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Random-init weights (flat dict). Serving normally loads a checkpoint;
    this exists for tests/bench fixtures."""

    def nxt():
        nonlocal rng
        rng, k = jax.random.split(rng)
        return k

    std = 0.02
    params: Dict[str, jax.Array] = {
        "embed/weight": (jax.random.normal(nxt(), (p.vocab_size, p.dim)) * std).astype(dtype),
        "final_norm/scale": jnp.ones((p.dim,), dtype),
    }
    if not p.tie_embeddings:
        params["lm_head/kernel"] = (jax.random.normal(nxt(), (p.dim, p.vocab_size)) * std).astype(dtype)
    qd = p.n_heads * p.head_dim
    kvd = p.n_kv_heads * p.head_dim
    for l in range(p.n_layers):
        pre = f"layers.{l}"
        params[f"{pre}/attn_norm/scale"] = jnp.ones((p.dim,), dtype)
        params[f"{pre}/wq/kernel"] = (jax.random.normal(nxt(), (p.dim, qd)) * std).astype(dtype)
        params[f"{pre}/wk/kernel"] = (jax.random.normal(nxt(), (p.dim, kvd)) * std).astype(dtype)
        params[f"{pre}/wv/kernel"] = (jax.random.normal(nxt(), (p.dim, kvd)) * std).astype(dtype)
        params[f"{pre}/wo/kernel"] = (jax.random.normal(nxt(), (qd, p.dim)) * std).astype(dtype)
        params[f"{pre}/mlp_norm/scale"] = jnp.ones((p.dim,), dtype)
        if p.n_experts:
            params[f"{pre}/router/kernel"] = (
                jax.random.normal(nxt(), (p.dim, p.n_experts)) * std).astype(dtype)
            params[f"{pre}/moe_gateup/kernel"] = (
                jax.random.normal(nxt(), (p.n_experts, p.dim, 2 * p.ffn_dim)) * std).astype(dtype)
            params[f"{pre}/moe_down/kernel"] = (
                jax.random.normal(nxt(), (p.n_experts, p.ffn_dim, p.dim)) * std).astype(dtype)
        else:
            params[f"{pre}/w_gate/kernel"] = (jax.random.normal(nxt(), (p.dim, p.ffn_dim)) * std).astype(dtype)
            params[f"{pre}/w_up/kernel"] = (jax.random.normal(nxt(), (p.dim, p.ffn_dim)) * std).astype(dtype)
            params[f"{pre}/w_down/kernel"] = (jax.random.normal(nxt(), (p.ffn_dim, p.dim)) * std).astype(dtype)
    return params


def _lorc(params: Dict, name: str, x: jax.Array, out: jax.Array) -> jax.Array:
    """Low-rank error correction (ZeroQuant-V2-style LoRC): when the
    quantizer stored a rank-r factorization of its residual under
    `{name}@lorc_a` / `{name}@lorc_b` ([K, r], [r, N], bf16), add
    (x @ A) @ B to the quantized matmul's output. 2r(K+N) extra weight
    bytes and FLOPs per token — a few % at r<=32 — for the accuracy the
    int4 grid alone cannot reach (quant/gptq.py lowrank_r)."""
    a = params.get(f"{name}@lorc_a")
    if a is None:
        return out
    b = params[f"{name}@lorc_b"]
    corr = jnp.dot(jnp.dot(x.astype(a.dtype), a), b,
                   preferred_element_type=jnp.float32)
    return (out.astype(jnp.float32) + corr).astype(out.dtype)


def _mm(params: Dict, name: str, x: jax.Array) -> jax.Array:
    w = params[name]
    if isinstance(w, QTensor):
        # under a live multi-chip mesh, run the fused kernel per shard via
        # shard_map (GSPMD cannot partition a pallas_call); lazy import
        # breaks the llama<->sharding module cycle
        from tpuserve.parallel.sharding import active_mesh, qmatmul_sharded

        mesh = active_mesh()
        if mesh is not None and mesh.devices.size > 1:
            return qmatmul_sharded(x, w, name, mesh)
        return _lorc(params, name, x, qmatmul(x, w))
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------- rope
def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float, dtype=jnp.float32):
    """positions [...] -> cos/sin [..., head_dim/2]."""
    half = head_dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., half]
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [..., n_heads, head_dim]; cos/sin broadcastable [..., 1, head_dim/2].
    Rotate-half convention (matches HF Llama)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    o1 = xf1 * cos - xf2 * sin
    o2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------- kv cache
@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Contiguous per-slot KV cache.

    Two device layouts (``flat`` is static pytree aux data):

    - flat=False: k/v [n_layers, S, L, n_kv_heads, head_dim] — natural for
      the XLA einsum attention (head dim explicit).
    - flat=True:  k/v [n_layers, S, L, W], W = n_kv_heads*head_dim — the
      layout the wide Pallas decode kernel streams. TPU arrays are tiled
      (8, 128) on the LAST TWO dims, so a [.., Hkv, hd] <-> [.., W] reshape
      regroups across tile boundaries and XLA materializes it as a
      full-cache copy per layer (measured: 137 GB of copy per 7B decode
      step, 444 ms vs 28.8 ms). Storing flat makes the kernel's
      [n_layers*S*L, W] view a true bitcast (major-dims merge only); the
      per-step [S, Hkv, hd] -> [S, W] writer reshapes are ~KB-scale.

    k_scale/v_scale: [n_layers, S, n_kv_heads, L] f32 (int8 only, else
    None) — HEAD-MAJOR (L last): every reader (the wide kernel's [S*M, L]
    score rows, the XLA fallback's [S, Hkv, 1, L] broadcast) wants scales
    L-minor, so storing them this way deletes a materialized per-layer
    repeat+transpose (~3-4%% of decode step bytes at 7B); the writers'
    scatters are KB-scale either way. Same shape in both layouts.
    """

    k: jax.Array
    v: jax.Array
    k_scale: Optional[jax.Array]
    v_scale: Optional[jax.Array]
    flat: bool = False
    # packed-int4 chunk count (pack_kv_codes chunks): 1 single-chip;
    # = tp under a mesh so the byte array shards on head boundaries
    pack_chunks: int = 1

    def tree_flatten(self):
        return (self.k, self.v, self.k_scale, self.v_scale), (
            self.flat, self.pack_chunks)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, flat=aux[0], pack_chunks=aux[1])

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def n_slots(self) -> int:
        return self.k.shape[1]

    @property
    def nbytes(self) -> int:
        total = self.k.size * self.k.dtype.itemsize + self.v.size * self.v.dtype.itemsize
        if self.k_scale is not None:
            total += self.k_scale.size * self.k_scale.dtype.itemsize \
                + self.v_scale.size * self.v_scale.dtype.itemsize
        return total

    @property
    def kv_bits(self) -> int:
        """8 (int8 or bf16/f32 storage) or 4 (uint8 = packed int4, two
        codes per byte along the last dim — see pack_kv_codes)."""
        return 4 if self.k.dtype == jnp.uint8 else 8

    @classmethod
    def create(cls, p: LlamaParams, n_slots: int, max_len: int, quantized: bool,
               dtype=jnp.bfloat16, flat: bool = False,
               scale_dtype=jnp.float32, kv_bits: int = 8,
               pack_chunks: int = 1) -> "KVCache":
        if flat:
            shape = (p.n_layers, n_slots, max_len, p.n_kv_heads * p.head_dim)
        else:
            shape = (p.n_layers, n_slots, max_len, p.n_kv_heads, p.head_dim)
        scale_shape = (p.n_layers, n_slots, p.n_kv_heads, max_len)
        if kv_bits == 4:
            # packed int4: half the KV bytes of int8 — the decode step is
            # HBM-bound, so this is a direct step-time lever. Flat-only
            # (the global split-half pack is defined on the flat W dim);
            # same per-(pos, head) scales with qmax 7.
            if not (quantized and flat):
                raise ValueError("kv_bits=4 requires quantized flat caches")
            w = p.n_kv_heads * p.head_dim
            if w % 2:
                raise ValueError("kv_bits=4 requires an even n_kv_heads*head_dim")
            shape = shape[:-1] + (w // 2,)
            if pack_chunks > 1 and p.n_kv_heads % pack_chunks:
                raise ValueError("pack_chunks must divide n_kv_heads")
            return cls(
                k=jnp.zeros(shape, jnp.uint8),
                v=jnp.zeros(shape, jnp.uint8),
                k_scale=jnp.zeros(scale_shape, scale_dtype),
                v_scale=jnp.zeros(scale_shape, scale_dtype),
                flat=flat,
                pack_chunks=pack_chunks,
            )
        if quantized:
            # scale_dtype=bfloat16 halves the scale stream the decode kernel
            # reads (config quantization.kv_scale_dtype)
            return cls(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(scale_shape, scale_dtype),
                v_scale=jnp.zeros(scale_shape, scale_dtype),
                flat=flat,
            )
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                   k_scale=None, v_scale=None, flat=flat)


def preferred_cache_flat(p: LlamaParams, max_len: Optional[int] = None) -> bool:
    """Whether caches for this process should use the flat layout (i.e. the
    wide Pallas decode kernel will serve decode — see KVCache docstring).

    Interleaved A/B (scripts/ab_decode.py) across 7B/GQA shapes and
    bs16-96: the kernel ties or beats the XLA path everywhere — sub-MB
    full windows (GQA-class) go through the multi-slot packed variant
    (GQA L=256 ratio 0.986 vs 1.070 for single-slot blocks), larger
    windows through the L-blocked variant with per-slot DMA skip (L=1024
    mixed-context ratio 0.858). The only unpacked sub-MB case left is a
    bucketed window below the full sequence (decode_buckets > 0), a ~7%
    regression bounded by the bucket — acceptable against maintaining a
    second layout. `max_len` is unused but kept for callers that sized
    the policy historically.
    """
    del max_len
    return _decode_attn_mode(p) == "pallas"


def _write_slot_kv(cache: KVCache, layer, slot, start, kq, vq, ks, vs) -> KVCache:
    """dynamic_update_slice a [C, Hkv, hd] chunk (+ scales [C, Hkv] or None)
    into (layer, slot, start..start+C), handling both cache layouts."""
    c = kq.shape[0]
    if cache.flat:
        kw, vw = kq.reshape(c, -1), vq.reshape(c, -1)
        if cache.k.dtype == jnp.uint8:  # packed int4 (see pack_kv_codes)
            kw = pack_kv_codes(kw, cache.pack_chunks)
            vw = pack_kv_codes(vw, cache.pack_chunks)
        kw, vw = kw[None][None], vw[None][None]
        idx = (layer, slot, start, 0)
    else:
        kw, vw = kq[None][None], vq[None][None]
        idx = (layer, slot, start, 0, 0)
    k = jax.lax.dynamic_update_slice(cache.k, kw.astype(cache.k.dtype), idx)
    v = jax.lax.dynamic_update_slice(cache.v, vw.astype(cache.v.dtype), idx)
    if ks is not None:
        # scale cache is head-major [.., Hkv, L]: write the [Hkv, C] block
        ks_ = jax.lax.dynamic_update_slice(
            cache.k_scale, ks.T[None][None].astype(cache.k_scale.dtype),
            (layer, slot, 0, start))
        vs_ = jax.lax.dynamic_update_slice(
            cache.v_scale, vs.T[None][None].astype(cache.v_scale.dtype),
            (layer, slot, 0, start))
    else:
        ks_ = vs_ = None
    return KVCache(k, v, ks_, vs_, flat=cache.flat,
                   pack_chunks=cache.pack_chunks)


def _decode_attn_mode(p: "LlamaParams") -> str:
    """Decode-attention implementation (TPUSERVE_DECODE_ATTN):

    - "pallas" (DEFAULT on TPU): the v3 "wide" kernel
      (ops/decode_attention.py) reading the full flat cache in place via a
      scalar-prefetched layer index — [bl, Hkv*hd] KV blocks, int8 MXU for
      both the score and P@V dots, in-VMEM Q_wide, per-slot DMA skip.
      Interleaved A/B vs the XLA einsum path (scripts/ab_decode.py):
      identical streaming rate at equal bytes (ratio 1.001 at L=256), and
      14% faster at L=1024 with mixed context lengths because the skip
      reads only live KV while XLA must read the full static window.
    - "xla": batched-einsum fallback (the r1 default; CPU always uses it).
    - "grouped": the r1 head-group kernel (slower: minimum-tile MXU dots);
      kept for sweeps.
    """
    import os

    mode = os.environ.get("TPUSERVE_DECODE_ATTN", "pallas").lower()
    if mode not in ("pallas", "grouped"):
        return "xla"
    if jax.devices()[0].platform != "tpu":
        return "xla"
    if mode == "pallas" and p.head_dim % 128 != 0:
        return "xla"  # wide epilogue needs lane-tile-aligned head slices
    return mode


def _quantize_kv(x: jax.Array, qmax: float = 127.0) -> Tuple[jax.Array, jax.Array]:
    """[..., head_dim] -> int codes + f32 scale over the last dim.
    qmax 127 = int8 cache; qmax 7 = int4 cache (codes in [-8, 7], packed
    by the writer via pack_kv_codes)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / qmax, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -qmax - 1, qmax).astype(jnp.int8)
    return q, scale


def _quantize_kv_cache(cache: "KVCache", x: jax.Array):
    """_quantize_kv at the cache's own bit width (uint8 storage = packed
    int4, see pack_kv_codes)."""
    return _quantize_kv(x, 7.0 if cache.k.dtype == jnp.uint8 else 127.0)


def pack_kv_codes(codes: jax.Array, chunks: int = 1) -> jax.Array:
    """int8 codes in [-8, 7] [..., W] -> packed uint8 [..., W/2],
    split-half along the last dim PER CHUNK: within each of `chunks`
    equal slices of W, byte lane d holds positions d (lo nibble) and
    Wc/2 + d (hi nibble), offset-8. chunks=1 (the single-chip default) is
    the original GLOBAL split-half, matching the wide kernel's
    two-half-dot unpack (ops/decode_attention._unpack_nibbles).

    chunks = tp makes the packed array SHARDABLE over kv-heads: a tp
    shard's byte slice [(W/2)/tp] is exactly its own W/tp positions
    split-half-packed locally, so each shard_map kernel island reads its
    local bytes with the standard (chunks=1) unpack. Requires tp | Hkv
    (head-aligned chunks)."""
    w = codes.shape[-1]
    if chunks > 1:
        wc = w // chunks
        x = codes.reshape(codes.shape[:-1] + (chunks, wc))
        lo = x[..., : wc // 2].astype(jnp.int32) + 8
        hi = x[..., wc // 2:].astype(jnp.int32) + 8
        return ((lo | (hi << 4)).astype(jnp.uint8)
                .reshape(codes.shape[:-1] + (w // 2,)))
    half = w // 2
    lo = (codes[..., :half].astype(jnp.int32) + 8)
    hi = (codes[..., half:].astype(jnp.int32) + 8)
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_kv_codes(packed: jax.Array, chunks: int = 1) -> jax.Array:
    """Inverse of pack_kv_codes: uint8 [..., W/2] -> int8 [..., W]."""
    p32 = packed.astype(jnp.int32)
    if chunks > 1:
        wb = packed.shape[-1] // chunks  # bytes per chunk
        x = p32.reshape(p32.shape[:-1] + (chunks, wb))
        return (jnp.concatenate([(x & 15) - 8, (x >> 4) - 8], axis=-1)
                .reshape(packed.shape[:-1] + (packed.shape[-1] * 2,))
                .astype(jnp.int8))
    return jnp.concatenate([(p32 & 15) - 8, (p32 >> 4) - 8],
                           axis=-1).astype(jnp.int8)


def _pad_heads(x: jax.Array, hp: int) -> jax.Array:
    """[.., Hkv] -> [.., hp] zero-padded — paged scale pools store
    pad8(Hkv) head-major rows per page (Mosaic sublane minimum)."""
    pad = hp - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)


def _unpack_if_int4(arr: jax.Array, chunks: int = 1) -> jax.Array:
    """XLA read-path helper: packed int4 cache slices unpack in-graph
    (uint8 anywhere in a KV read = packed int4)."""
    return unpack_kv_codes(arr, chunks) if arr.dtype == jnp.uint8 else arr


# ---------------------------------------------------------------------- blocks
def _attention_prefill(q, k, v, mask):
    """Full self-attention over the prompt. q,k,v [B, L, H(kv), hd]."""
    b, l, h, hd = q.shape
    n_rep = h // k.shape[2]
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    scores = jnp.einsum("blhd,bmhd->bhlm", q.astype(jnp.float32), k.astype(jnp.float32))
    scores = scores / math.sqrt(hd)
    scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhlm,bmhd->blhd", probs.astype(v.dtype), v)
    return out


def _mm_direct(params: Dict, name: str, x: jax.Array) -> jax.Array:
    """Name-keyed matmul WITHOUT mesh routing — for code already inside a
    shard_map island (e.g. the pipeline-parallel stage loop), where nested
    shard_map is illegal and the island owns the partitioning."""
    return _lorc(params, name, x, _mm_w(x, params[name]))


def _forward_block(params, pre, x, p: LlamaParams, attn_fn, mm=None):
    """One transformer block; attn_fn maps (q, k, v) -> attn output.

    Projections are fused when the checkpoint carries fused weights
    (wqkv = [q|k|v] columns, w_gateup = [gate|up]): one weight stream +
    one MXU dot instead of three/two — kernel-launch count per decode
    step drops from 7 to 4 per layer, worth ~2x step time at decode batch
    sizes. Split checkpoints (wq/wk/wv) still work.

    `mm` overrides the matmul implementation (default `_mm`, which routes
    through shard_map islands under a live mesh; pipeline stages pass
    `_mm_direct`).
    """
    mm = mm or _mm
    qd = p.n_heads * p.head_dim
    kvd = p.n_kv_heads * p.head_dim
    h = rms_norm(params, f"{pre}/attn_norm", x, p.rms_eps)
    if f"{pre}/wqkv/kernel" in params:
        qkv = mm(params, f"{pre}/wqkv/kernel", h)
        q = qkv[..., :qd]
        k = qkv[..., qd : qd + kvd]
        v = qkv[..., qd + kvd :]
    else:
        q = mm(params, f"{pre}/wq/kernel", h)
        k = mm(params, f"{pre}/wk/kernel", h)
        v = mm(params, f"{pre}/wv/kernel", h)
    attn_out = attn_fn(q, k, v)
    x = x + mm(params, f"{pre}/wo/kernel", attn_out)
    h = rms_norm(params, f"{pre}/mlp_norm", x, p.rms_eps)
    if p.n_experts:
        return x + _moe_ffn(params, pre, h, p, mm=mm)
    if f"{pre}/w_gateup/kernel" in params:
        gateup = mm(params, f"{pre}/w_gateup/kernel", h)
        gate, up = gateup[..., : p.ffn_dim], gateup[..., p.ffn_dim :]
    else:
        gate = mm(params, f"{pre}/w_gate/kernel", h)
        up = mm(params, f"{pre}/w_up/kernel", h)
    gate = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype)
    x = x + mm(params, f"{pre}/w_down/kernel", gate * up)
    return x


def _expert_slice(w, e: int):
    """One expert's [K, N] weight from a stacked [E, K, N] array or QExperts
    (an XLA slice inside jit — no copy materializes in HBM)."""
    from tpuserve.quant.core import QExperts

    if isinstance(w, QExperts):
        return w.expert(e)
    return w[e]


def _mm_w(x: jax.Array, w, use_pallas=None) -> jax.Array:
    """Matmul against a direct weight value (dense or QTensor), single-chip
    path (callers inside shard_map islands own the partitioning)."""
    if isinstance(w, QTensor):
        return qmatmul(x, w, use_pallas=use_pallas)
    return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)


def expert_forward(h: jax.Array, gu, dn, ffn_dim: int, use_pallas=None) -> jax.Array:
    """One expert's gated-silu FFN over ALL rows of h [T, D] -> [T, D].
    gu [D, 2F] (fused gate|up), dn [F, D]; dense arrays or QTensors."""
    gateup = _mm_w(h, gu, use_pallas)
    gate, up = gateup[..., :ffn_dim], gateup[..., ffn_dim:]
    gate = jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype)
    return _mm_w(gate * up, dn, use_pallas)


def moe_combine_weights(logits: jax.Array, n_experts: int, k: int) -> jax.Array:
    """Top-k routing: logits [.., E] -> combine weights [.., E] (softmax over
    the selected k, zero elsewhere) — Mixtral convention."""
    top_vals, top_idx = jax.lax.top_k(logits.astype(jnp.float32), k)
    gates = jax.nn.softmax(top_vals, axis=-1)  # [.., k]
    onehot = jax.nn.one_hot(top_idx, n_experts, dtype=jnp.float32)  # [.., k, E]
    return jnp.sum(onehot * gates[..., None], axis=-2)  # [.., E]


def _moe_ffn(params, pre, h, p: LlamaParams, mm=None):
    """Mixture-of-Experts FFN (Mixtral-style top-k routing).

    TPU-first design: every expert runs over ALL tokens and the outputs
    combine through the routing weights (zeros for unrouted pairs). Decode
    is weight-read bound — each expert's weights stream from HBM exactly
    once either way (at serving batch sizes ~every expert is hit), so the
    extra MXU flops vs a gather/scatter dispatch are ~free, while dynamic
    gathers would break XLA's static-shape tiling. Under a live mesh the
    expert loop runs as a shard_map island with experts sharded over "tp"
    (TRUE expert parallelism: each device computes only its E/tp experts,
    one psum combines) — see parallel/sharding.moe_ffn_sharded.
    """
    router = params[f"{pre}/router/kernel"]
    logits = jnp.dot(h.astype(jnp.float32), router.astype(jnp.float32))
    w_se = moe_combine_weights(logits, p.n_experts, p.n_experts_per_tok)
    gu = params[f"{pre}/moe_gateup/kernel"]
    dn = params[f"{pre}/moe_down/kernel"]

    lead_shape = h.shape[:-1]
    h2 = h.reshape(-1, h.shape[-1])           # [T, D]
    w2 = w_se.reshape(-1, p.n_experts)        # [T, E]

    from tpuserve.parallel.sharding import active_mesh

    direct = mm is _mm_direct  # already inside an island: no nested shard_map
    mesh = None if direct else active_mesh()
    if (mesh is not None and mesh.devices.size > 1
            and p.n_experts % mesh.shape.get("tp", 1) == 0):
        from tpuserve.parallel.sharding import moe_ffn_sharded

        out = moe_ffn_sharded(h2, w2, gu, dn, p, mesh)
        return out.reshape(*lead_shape, h.shape[-1])

    # mesh active but experts don't divide tp: replicated loop through XLA
    # dequant (GSPMD cannot partition the single-chip pallas_call)
    up_flag = False if (mesh is not None and not direct) else None

    # Prefill (3-D input, many tokens): top-k capacity dispatch — each
    # expert computes over only the <= cap tokens routed to it instead of
    # all T, so FLOPs drop from T*E to T*k*cf expert-passes (the all-experts
    # form was r2's documented E/k x prefill overhead). Decode (2-D, few
    # tokens): the r5 on-chip slope A/B (.r5_ab_moe_small2.log, moe_small
    # class) measured dispatch/dense = 1.07 at bs8 but 0.89 at bs64 — the
    # capacity cut (cap = T*k/E*cf < T) pays for the gather/scatter once
    # the batch is large enough, so decode routes through dispatch at
    # T >= TPUSERVE_MOE_DECODE_DISPATCH_T (default 64; small batches keep
    # the dense loop, VERDICT r4 #4 closed with data).
    cf = float(os.environ.get("TPUSERVE_MOE_CF", "2.0"))
    decode_t = int(os.environ.get("TPUSERVE_MOE_DECODE_DISPATCH_T", "64"))
    t = h2.shape[0]
    if cf > 0 and (len(lead_shape) > 1 or t >= decode_t):
        cap = min(t, max(8, int(math.ceil(
            t * p.n_experts_per_tok / p.n_experts * cf))))
        if cap < t:
            out = _moe_dispatch(h2, w2, gu, dn, p, cap, use_pallas=up_flag)
            return out.reshape(*lead_shape, h.shape[-1])

    out = jnp.zeros_like(h2)
    for e in range(p.n_experts):
        y = expert_forward(h2, _expert_slice(gu, e), _expert_slice(dn, e),
                           p.ffn_dim, use_pallas=up_flag)
        out = out + w2[:, e : e + 1].astype(y.dtype) * y
    return out.reshape(*lead_shape, h.shape[-1])


def _moe_dispatch(h2: jax.Array, w2: jax.Array, gu, dn, p: LlamaParams,
                  cap: int, use_pallas=None) -> jax.Array:
    """Static-capacity top-k MoE dispatch: gather each expert's routed
    tokens into an [E, cap, D] buffer, run every expert over its own cap
    rows, scatter-add the combined outputs back. All shapes static (XLA/MXU
    friendly — no dynamic shapes); tokens routed past an expert's capacity
    drop that expert's contribution (standard capacity-factor semantics;
    TPUSERVE_MOE_CF sizes cap, default 2x the balanced load, 0 disables).

    h2 [T, D] tokens; w2 [T, E] combine weights (zeros off the top-k)."""
    t = h2.shape[0]
    e_n, k = p.n_experts, p.n_experts_per_tok
    top_w, top_idx = jax.lax.top_k(w2, k)           # [T, k]
    pair_e = top_idx.reshape(-1)                    # [T*k] expert per pair
    pair_t = jnp.repeat(jnp.arange(t, dtype=jnp.int32), k)
    pair_w = top_w.reshape(-1)
    onehot = jax.nn.one_hot(pair_e, e_n, dtype=jnp.int32)      # [T*k, E]
    # position of each pair within its expert's arrival order
    pos_in_e = jnp.sum((jnp.cumsum(onehot, axis=0) - 1) * onehot, axis=1)
    slot = jnp.where(pos_in_e < cap, pos_in_e, cap)  # cap = overflow bin
    gat_t = jnp.zeros((e_n, cap + 1), jnp.int32).at[pair_e, slot].set(pair_t)
    gat_w = jnp.zeros((e_n, cap + 1), jnp.float32).at[pair_e, slot].set(
        pair_w.astype(jnp.float32))
    gat_t, gat_w = gat_t[:, :cap], gat_w[:, :cap]   # drop the overflow bin
    xg = h2[gat_t.reshape(-1)].reshape(e_n, cap, h2.shape[1])
    out = jnp.zeros((t, h2.shape[1]), jnp.float32)
    for e in range(e_n):
        y = expert_forward(xg[e], _expert_slice(gu, e), _expert_slice(dn, e),
                           p.ffn_dim, use_pallas=use_pallas)
        # unrouted slots carry weight 0 (token 0's row) — contribute nothing
        out = out.at[gat_t[e]].add(gat_w[e][:, None] * y.astype(jnp.float32))
    return out.astype(h2.dtype)


def fuse_params(params: Dict, p: LlamaParams) -> Dict:
    """Concatenate wq/wk/wv -> wqkv and w_gate/w_up -> w_gateup (column-wise;
    safe before quantization since scales are per output column). Idempotent."""
    out = dict(params)
    for l in range(p.n_layers):
        pre = f"layers.{l}"
        if f"{pre}/wq/kernel" in out and f"{pre}/wqkv/kernel" not in out:
            out[f"{pre}/wqkv/kernel"] = jnp.concatenate(
                [out.pop(f"{pre}/wq/kernel"), out.pop(f"{pre}/wk/kernel"),
                 out.pop(f"{pre}/wv/kernel")], axis=1)
        if f"{pre}/w_gate/kernel" in out and f"{pre}/w_gateup/kernel" not in out:
            out[f"{pre}/w_gateup/kernel"] = jnp.concatenate(
                [out.pop(f"{pre}/w_gate/kernel"), out.pop(f"{pre}/w_up/kernel")], axis=1)
    return out


def _logits(params, x, p: LlamaParams):
    h = rms_norm(params, "final_norm", x, p.rms_eps)
    if p.tie_embeddings:
        w = params["embed/weight"]
        if isinstance(w, QTensor):  # pragma: no cover - tied embeds stay unquantized
            raise ValueError("tied embeddings cannot be quantized")
        return jnp.dot(h, w.T.astype(h.dtype), preferred_element_type=jnp.float32)
    return _mm(params, "lm_head/kernel", h).astype(jnp.float32)


# ---------------------------------------------------------------------- prefill
def prefill(params, p: LlamaParams, tokens: jax.Array, cache: KVCache,
            slot: jax.Array, length: jax.Array):
    """Process a prompt into cache slot `slot`.

    tokens: int32 [1, L] (right-padded to a bucket; `length` = real length).
    Returns (logits_last [1, V] at position length-1, updated cache).
    """
    b, l = tokens.shape
    x = params["embed/weight"][tokens]  # embeddings stay unquantized
    positions = jnp.arange(l, dtype=jnp.int32)[None, :]  # [1, L]
    cos, sin = rope_cos_sin(positions, p.head_dim, p.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]  # [1, L, 1, hd/2]
    valid = positions < length  # [1, L]
    mask = valid[:, None, :] & (positions[:, :, None] >= positions[:, None, :])  # [1, L, L] causal & valid

    new_cache = cache
    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(b, l, p.n_heads, p.head_dim)
            k = k.reshape(b, l, p.n_kv_heads, p.head_dim)
            v = v.reshape(b, l, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            # write K/V into the slot (whole bucket; invalid tail is masked on read)
            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k[0])
                vq, vs = _quantize_kv_cache(new_cache, v[0])
            else:
                kq, vq, ks, vs = k[0], v[0], None, None
            new_cache = _write_slot_kv(new_cache, layer, slot, 0, kq, vq, ks, vs)
            out = _attention_prefill(q, k, v, mask)
            return out.reshape(b, l, p.n_heads * p.head_dim)

        x = _forward_block(params, pre, x, p, attn_fn)

    # logits at the last real position
    last = jnp.take_along_axis(x, (length - 1)[None, None, None], axis=1)[:, 0, :]  # [1, D]
    return _logits(params, last, p), new_cache


# ---------------------------------------------------------------- chunked prefill
def prefill_chunk(params, p: LlamaParams, tokens: jax.Array, cache: KVCache,
                  slot: jax.Array, start: jax.Array, length: jax.Array,
                  window: int):
    """Process ONE chunk of a prompt into cache slot `slot`.

    Chunked prefill keeps long-prompt admission from freezing the decode
    batch (VERDICT r1 weak #5): the scheduler interleaves one chunk per
    decode step, so active slots' token cadence is bounded by a chunk's
    cost, not the whole prompt's.

    tokens: int32 [1, C] (chunk, right-padded; `length` = valid tokens in
    it); start: global position of tokens[0]; `window` (static) = bucket
    covering start+C. Queries attend to cache positions < start (earlier
    chunks, already written) plus causally within the chunk. The padded
    tail writes garbage K/V at [start+length, start+C) — harmless: decode
    overwrites position start+length before any read reaches it.
    Returns (logits [1, V] at the chunk's last valid position, cache).
    """
    b, c = tokens.shape
    x = params["embed/weight"][tokens]  # [1, C, D]
    gpos = start + jnp.arange(c, dtype=jnp.int32)  # [C] global positions
    cos, sin = rope_cos_sin(gpos[None, :], p.head_dim, p.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]  # [1, C, 1, hd/2]
    kpos = jnp.arange(window, dtype=jnp.int32)
    # key l visible to chunk row ci iff l <= start+ci (global causal)
    mask = kpos[None, :] <= gpos[:, None]  # [C, win]

    new_cache = cache
    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(b, c, p.n_heads, p.head_dim)
            k = k.reshape(b, c, p.n_kv_heads, p.head_dim)
            v = v.reshape(b, c, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k[0])
                vq, vs = _quantize_kv_cache(new_cache, v[0])
            else:
                kq, vq, ks, vs = k[0], v[0], None, None
            new_cache = _write_slot_kv(new_cache, layer, slot, start, kq, vq, ks, vs)
            # attend over the cache prefix [0, window) for THIS slot
            k_all = jax.lax.dynamic_slice_in_dim(new_cache.k[layer], slot, 1, 0)[0, :window]
            v_all = jax.lax.dynamic_slice_in_dim(new_cache.v[layer], slot, 1, 0)[0, :window]
            if new_cache.flat:
                k_all = _unpack_if_int4(k_all, new_cache.pack_chunks)
                v_all = _unpack_if_int4(v_all, new_cache.pack_chunks)
                k_all = k_all.reshape(window, p.n_kv_heads, p.head_dim)
                v_all = v_all.reshape(window, p.n_kv_heads, p.head_dim)
            n_rep = p.n_heads // p.n_kv_heads
            qg = q[0].reshape(c, p.n_kv_heads, n_rep, p.head_dim)
            cdt = jnp.float32 if k_all.dtype == jnp.float32 else jnp.bfloat16
            scores = jnp.einsum(
                "cgrd,lgd->cgrl", qg.astype(cdt), k_all.astype(cdt),
                preferred_element_type=jnp.float32,
            )  # [C, Hkv, rep, win]
            if new_cache.quantized:
                ksc = jax.lax.dynamic_slice_in_dim(new_cache.k_scale[layer], slot, 1, 0)[0][:, :window]
                scores = scores * ksc[None, :, None, :]
            scores = scores / math.sqrt(p.head_dim)
            scores = jnp.where(mask[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            if new_cache.quantized:
                vsc = jax.lax.dynamic_slice_in_dim(new_cache.v_scale[layer], slot, 1, 0)[0][:, :window]
                probs = probs * vsc[None, :, None, :]
            out = jnp.einsum(
                "cgrl,lgd->cgrd", probs.astype(cdt), v_all.astype(cdt),
                preferred_element_type=jnp.float32,
            )
            return out.astype(x.dtype).reshape(b, c, p.n_heads * p.head_dim)

        x = _forward_block(params, pre, x, p, attn_fn)

    last = jnp.take_along_axis(x, (length - 1)[None, None, None], axis=1)[:, 0, :]
    return _logits(params, last, p), new_cache


# ---------------------------------------------------------------------- decode
def _gqa_decode_attention(q, k_all, v_all, k_scale, v_scale, read_mask,
                          p: LlamaParams, out_dtype):
    """Shared decode attention over a logical [S, L, Hkv, hd] K/V view
    (contiguous slice or gathered pages). q: [S, H*hd] post-RoPE; scales
    HEAD-MAJOR [S, Hkv, L] (the cache's stored layout — no transpose).
    Batch-gemm einsums; int8 reads convert to bf16 (fuses into the dot),
    f32 accumulation; INT8 scales fold in at O(L)."""
    s = q.shape[0]
    n_rep = p.n_heads // p.n_kv_heads
    qg = q.reshape(s, p.n_kv_heads, n_rep, p.head_dim)
    cdt = jnp.float32 if k_all.dtype == jnp.float32 else jnp.bfloat16
    scores = jnp.einsum(
        "shrd,slhd->shrl",
        qg.astype(cdt),
        k_all.astype(cdt),
        preferred_element_type=jnp.float32,
    )  # [S, Hkv, rep, L] f32
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]
    scores = scores / math.sqrt(p.head_dim)
    scores = jnp.where(read_mask[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :]
    out = jnp.einsum(
        "shrl,slhd->shrd",
        probs.astype(cdt),
        v_all.astype(cdt),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype).reshape(s, p.n_heads * p.head_dim)


def draft_lookup(hist: jax.Array, seq_lens: jax.Array, n: int, k: int,
                 k_cap: jax.Array):
    """On-device prompt-lookup drafting (speculative decoding).

    Device port of GenerationEngine._propose_lookup's host semantics so
    that drafting can run INSIDE a fused multi-round speculation dispatch
    (the host version costs an O(S*L) numpy scan plus a host round-trip
    per single verify — serving/engine.py round-4 notes).

    hist [S, L] int32 — right-padded token history per slot (prompt +
    generated, including the uncommitted last token); seq_lens [S] —
    valid tokens per row; n/k static (n-gram length, max draft length);
    k_cap [S] int32 — per-slot dynamic draft cap (capacity/room bound).

    Match rule (identical to the host): the trailing n-gram is matched
    against every earlier window (windows ending strictly before the
    sequence tail); prefer the RIGHTMOST match with >= k continuation
    tokens, else the match with the longest continuation. Returns
    (drafts [S, k] right-padded, k_eff [S]).
    """
    s, L = hist.shape
    idx = jnp.arange(L - n + 1, dtype=jnp.int32)  # window starts
    # [S, L-n+1, n] sliding windows (static slices, n is tiny)
    win = jnp.stack([hist[:, j:j + L - n + 1] for j in range(n)], axis=-1)
    pat_idx = jnp.clip(seq_lens[:, None] - n + jnp.arange(n, dtype=jnp.int32)[None, :],
                       0, L - 1)
    pat = jnp.take_along_axis(hist, pat_idx, axis=1)  # [S, n]
    match = (win == pat[:, None, :]).all(-1)  # [S, L-n+1]
    avail = seq_lens[:, None] - (idx[None, :] + n)  # continuation tokens
    valid = match & (avail >= 1) & (seq_lens[:, None] >= n + 1)
    full = valid & (avail >= k)
    j_full = jnp.max(jnp.where(full, idx[None, :], -1), axis=1)  # rightmost
    avail_masked = jnp.where(valid, avail, -1)
    j_best = jnp.argmax(avail_masked, axis=1).astype(jnp.int32)  # first max
    has_any = jnp.max(avail_masked, axis=1) >= 1
    j = jnp.where(j_full >= 0, j_full, j_best)
    av = jnp.take_along_axis(avail, j[:, None], axis=1)[:, 0]
    k_eff = jnp.where(has_any,
                      jnp.clip(jnp.minimum(av, k_cap), 0, k),
                      0).astype(jnp.int32)
    gidx = jnp.clip(j[:, None] + n + jnp.arange(k, dtype=jnp.int32)[None, :],
                    0, L - 1)
    drafts = jnp.take_along_axis(hist, gidx, axis=1)
    drafts = jnp.where(jnp.arange(k, dtype=jnp.int32)[None, :] < k_eff[:, None],
                       drafts, 0)
    return drafts, k_eff


def verify_step(params, p: LlamaParams, tokens: jax.Array, cache: KVCache,
                positions: jax.Array, lengths: jax.Array,
                window: Optional[int] = None):
    """Speculative-decoding verification: process C candidate tokens per
    slot in ONE batched step (prompt-lookup / draft verification).

    tokens [S, C] int32 — column 0 is the slot's real next token, columns
    1.. a drafted continuation (right-padded); positions [S] — where column
    0 goes (-1 = inactive); lengths [S] — valid tokens per row (>= 1).
    Returns (logits [S, C, V] f32 — position j's logits predict token j+1 —
    and the updated cache).

    All C tokens write their K/V before attention reads (same order as
    decode_step), so draft token j attends to drafts < j through the cache
    itself. Cache entries for REJECTED drafts become stale-but-harmless:
    every future read masks kpos <= the slot's live position and later
    writes overwrite — the same invariant the fused decode horizon relies
    on for its post-EOS over-generation.
    """
    s, c = tokens.shape
    active = positions >= 0
    pos0 = jnp.maximum(positions, 0)
    l_max = cache.max_len
    pos_c = jnp.minimum(pos0[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :],
                        l_max - 1)  # [S, C]
    valid = active[:, None] & (
        jnp.arange(c, dtype=jnp.int32)[None, :] < lengths[:, None])
    # activations run 2-D [S*C, D] through the blocks: 3-D elementwise ops
    # strip-mine into per-slice loops on TPU (measured ~0.9 ms per layer
    # per candidate at 7B — a 4.4x verify step at C=9); attn_fn reshapes
    # to [S, C, ...] only where candidate structure matters
    x = params["embed/weight"][tokens].reshape(s * c, p.dim)
    cos, sin = rope_cos_sin(pos_c, p.head_dim, p.rope_theta)  # [S, C, hd/2]
    cos_q, sin_q = cos[:, :, None, :], sin[:, :, None, :]
    win = l_max if window is None else min(int(window), l_max)
    kpos = jnp.arange(win, dtype=jnp.int32)
    read_mask = kpos[None, None, :] <= pos_c[:, :, None]  # [S, C, win]

    new_cache = cache
    slot_idx = jnp.arange(s, dtype=jnp.int32)

    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(s, c, p.n_heads, p.head_dim)
            k = k.reshape(s, c, p.n_kv_heads, p.head_dim)
            v = v.reshape(s, c, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos_q, sin_q)
            k = apply_rope(k, cos_q, sin_q)

            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k)  # [S, C, Hkv, hd], [S, C, Hkv]
                vq, vs = _quantize_kv_cache(new_cache, v)
                ks = ks.astype(new_cache.k_scale.dtype)
                vs = vs.astype(new_cache.v_scale.dtype)
            else:
                kq = k.astype(new_cache.k.dtype)
                vq = v.astype(new_cache.v.dtype)
                ks = vs = None
            if new_cache.flat:
                kq, vq = kq.reshape(s, c, -1), vq.reshape(s, c, -1)
                if new_cache.k.dtype == jnp.uint8:  # packed int4
                    kq = pack_kv_codes(kq, new_cache.pack_chunks)
                    vq = pack_kv_codes(vq, new_cache.pack_chunks)
            sidx = slot_idx[:, None]  # [S, 1] broadcasts against pos_c [S, C]

            def masked(new, old_arr):
                old = old_arr[layer, sidx, pos_c]
                m = valid.reshape((s, c) + (1,) * (new.ndim - 2))
                return jnp.where(m, new, old)

            def masked_sc(new, old_arr):  # head-major scale cache
                old = old_arr[layer, sidx, :, pos_c]
                m = valid.reshape((s, c) + (1,) * (new.ndim - 2))
                return jnp.where(m, new, old)

            new_cache = KVCache(
                k=new_cache.k.at[layer, sidx, pos_c].set(masked(kq.astype(new_cache.k.dtype), new_cache.k)),
                v=new_cache.v.at[layer, sidx, pos_c].set(masked(vq.astype(new_cache.v.dtype), new_cache.v)),
                k_scale=None if ks is None else new_cache.k_scale.at[layer, sidx, :, pos_c].set(masked_sc(ks, new_cache.k_scale)),
                v_scale=None if vs is None else new_cache.v_scale.at[layer, sidx, :, pos_c].set(masked_sc(vs, new_cache.v_scale)),
                flat=new_cache.flat,
                pack_chunks=new_cache.pack_chunks,
            )

            # kernel path: the flat cache is read IN PLACE by the
            # multi-candidate wide kernel — KV bytes stream once for all C
            # candidates with zero relayout (the XLA path below pays a
            # per-layer window copy for flat caches on TPU); single-chip
            # only (meshes take the GSPMD path)
            attn_mode = _decode_attn_mode(p)
            if attn_mode == "pallas":
                if jax.devices()[0].platform == "tpu" and not new_cache.flat:
                    attn_mode = "xla"
                from tpuserve.parallel.sharding import active_mesh

                mesh_now = active_mesh()
                if mesh_now is not None and mesh_now.devices.size > 1:
                    attn_mode = "xla"
            if attn_mode == "pallas":
                from tpuserve.ops.decode_attention import (
                    decode_attention_wide_cache_multi)

                out = decode_attention_wide_cache_multi(
                    q / math.sqrt(p.head_dim),
                    new_cache.k,
                    new_cache.v,
                    new_cache.k_scale[layer] if new_cache.quantized else None,
                    new_cache.v_scale[layer] if new_cache.quantized else None,
                    positions,
                    layer,
                    window=win,
                )
                return out.astype(x.dtype).reshape(s * c, p.n_heads * p.head_dim)

            k_all = new_cache.k[layer, :, :win]  # [S, win, ...]
            v_all = new_cache.v[layer, :, :win]
            if new_cache.flat:
                k_all = _unpack_if_int4(k_all, new_cache.pack_chunks)
                v_all = _unpack_if_int4(v_all, new_cache.pack_chunks)
                k_all = k_all.reshape(s, win, p.n_kv_heads, p.head_dim)
                v_all = v_all.reshape(s, win, p.n_kv_heads, p.head_dim)
            if new_cache.quantized:
                k_scale = new_cache.k_scale[layer, :, :, :win]  # [S, Hkv, win]
                v_scale = new_cache.v_scale[layer, :, :, :win]
            else:
                k_scale = v_scale = None
            n_rep = p.n_heads // p.n_kv_heads
            qg = q.reshape(s, c, p.n_kv_heads, n_rep, p.head_dim)
            cdt = jnp.float32 if k_all.dtype == jnp.float32 else jnp.bfloat16
            scores = jnp.einsum(
                "schrd,slhd->schrl", qg.astype(cdt), k_all.astype(cdt),
                preferred_element_type=jnp.float32)  # [S, C, Hkv, rep, win]
            if k_scale is not None:
                scores = scores * k_scale[:, None, :, None, :]
            scores = scores / math.sqrt(p.head_dim)
            scores = jnp.where(read_mask[:, :, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            if v_scale is not None:
                probs = probs * v_scale[:, None, :, None, :]
            out = jnp.einsum(
                "schrl,slhd->schrd", probs.astype(cdt), v_all.astype(cdt),
                preferred_element_type=jnp.float32)
            return out.astype(x.dtype).reshape(s * c, p.n_heads * p.head_dim)

        x = _forward_block(params, pre, x, p, attn_fn)

    logits = _logits(params, x, p).reshape(s, c, -1)
    return jnp.where(valid[:, :, None], logits, 0.0), new_cache


def decode_step(params, p: LlamaParams, tokens: jax.Array, cache: KVCache,
                positions: jax.Array, window: Optional[int] = None):
    """One continuous-batching decode step over all S slots.

    tokens: int32 [S] (current token per slot); positions: int32 [S] (index
    where this token goes; negative = inactive slot).
    `window` (static) limits attention reads to the first `window` cache
    positions — decode is KV-read bound, so when every active position is
    below a bucket boundary, reading only that prefix saves proportional
    HBM traffic. Callers guarantee max(positions)+1 <= window.
    Returns (logits [S, V], updated cache).
    """
    s = tokens.shape[0]
    active = positions >= 0
    pos = jnp.maximum(positions, 0)
    x = params["embed/weight"][tokens]  # [S, D]
    cos, sin = rope_cos_sin(pos, p.head_dim, p.rope_theta)  # [S, hd/2]
    cos_q, sin_q = cos[:, None, :], sin[:, None, :]  # [S, 1, hd/2]
    l_max = cache.max_len
    win = l_max if window is None else min(int(window), l_max)
    ar = jnp.arange(win, dtype=jnp.int32)
    read_mask = ar[None, :] <= pos[:, None]  # [S, win] attend to <= current pos

    new_cache = cache
    slot_idx = jnp.arange(s, dtype=jnp.int32)

    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(s, p.n_heads, p.head_dim)
            k = k.reshape(s, p.n_kv_heads, p.head_dim)
            v = v.reshape(s, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos_q, sin_q)
            k = apply_rope(k, cos_q, sin_q)

            # scatter this step's K/V into [layer, slot, pos] for every
            # *active* slot; inactive slots re-write their existing value
            # (position -1 clamps to 0 — an unmasked write would corrupt it)
            def masked(new, old_arr):
                old = old_arr[layer, slot_idx, pos]
                mask = active.reshape((s,) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new, old)

            def masked_sc(new, old_arr):  # head-major scale cache
                old = old_arr[layer, slot_idx, :, pos]
                mask = active.reshape((s,) + (1,) * (new.ndim - 1))
                return jnp.where(mask, new, old)

            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k)  # [S, Hkv, hd], [S, Hkv]
                vq, vs = _quantize_kv_cache(new_cache, v)
                ks = ks.astype(new_cache.k_scale.dtype)
                vs = vs.astype(new_cache.v_scale.dtype)
            else:
                kq = k.astype(new_cache.k.dtype)
                vq = v.astype(new_cache.v.dtype)
                ks = vs = None
            if new_cache.flat:
                kq, vq = kq.reshape(s, -1), vq.reshape(s, -1)  # [S, W] rows
                if new_cache.k.dtype == jnp.uint8:  # packed int4
                    kq = pack_kv_codes(kq, new_cache.pack_chunks)
                    vq = pack_kv_codes(vq, new_cache.pack_chunks)
            new_cache = KVCache(
                k=new_cache.k.at[layer, slot_idx, pos].set(masked(kq.astype(new_cache.k.dtype), new_cache.k)),
                v=new_cache.v.at[layer, slot_idx, pos].set(masked(vq.astype(new_cache.v.dtype), new_cache.v)),
                k_scale=None if ks is None else new_cache.k_scale.at[layer, slot_idx, :, pos].set(masked_sc(ks, new_cache.k_scale)),
                v_scale=None if vs is None else new_cache.v_scale.at[layer, slot_idx, :, pos].set(masked_sc(vs, new_cache.v_scale)),
                flat=new_cache.flat,
                pack_chunks=new_cache.pack_chunks,
            )

            from tpuserve.parallel.sharding import active_mesh, mesh_sp

            if mesh_sp(active_mesh()) > 1:
                # sequence-parallel long context: KV length sharded over the
                # "sp" mesh axis, per-shard partial softmax merged with one
                # pmax + two psums (flash-decoding). Reads the full L (the
                # window bucket is a per-chip HBM optimization; under sp the
                # per-shard window is already L/sp and a sub-L slice of a
                # sharded dim would force a resharding gather).
                from tpuserve.parallel.sharding import decode_attention_seq_sharded

                k_l, v_l = new_cache.k[layer], new_cache.v[layer]
                if new_cache.flat:
                    # engine forces 5D cache under sp; direct callers with a
                    # flat cache pay the relayout here (documented fallback)
                    k_l = _unpack_if_int4(k_l, new_cache.pack_chunks)
                    v_l = _unpack_if_int4(v_l, new_cache.pack_chunks)
                    k_l = k_l.reshape(s, l_max, p.n_kv_heads, p.head_dim)
                    v_l = v_l.reshape(s, l_max, p.n_kv_heads, p.head_dim)
                out = decode_attention_seq_sharded(
                    q / math.sqrt(p.head_dim), k_l, v_l,
                    new_cache.k_scale[layer] if new_cache.quantized else None,
                    new_cache.v_scale[layer] if new_cache.quantized else None,
                    positions, active_mesh())
                return out.astype(x.dtype).reshape(s, p.n_heads * p.head_dim)

            attn_mode = _decode_attn_mode(p)
            attn_mesh = None
            if attn_mode == "pallas":
                # kernel only where it pays (see preferred_cache_flat): on
                # TPU a 5D (non-flat) cache means the layout chooser ruled
                # the config out — routing it to the kernel anyway would
                # re-introduce the tile-crossing relayout copies
                if jax.devices()[0].platform == "tpu" and not new_cache.flat:
                    attn_mode = "xla"
                # GSPMD cannot partition a pallas_call: under a live
                # multi-chip mesh the kernel runs as a shard_map island
                # (decode_attention_sharded — zero-collective GQA split over
                # dp slots x tp kv-head groups) when shapes divide, else
                # decode attention stays on the XLA path
                from tpuserve.parallel.sharding import (
                    active_mesh, can_shard_decode_attention)

                mesh = active_mesh()
                if mesh is not None and mesh.devices.size > 1:
                    tp_now = int(mesh.shape.get("tp", 1))
                    if new_cache.k.dtype == jnp.uint8:
                        # packed int4: sliceable on head boundaries ONLY
                        # when packed per shard (pack_chunks == tp — see
                        # pack_kv_codes); each island then reads its local
                        # bytes with the standard unpack. A globally packed
                        # cache (chunks=1) under tp>1 interleaves W
                        # positions across shards — XLA unpacks first.
                        w_local = p.n_kv_heads * p.head_dim // max(tp_now, 1)
                        if ((tp_now == 1 or new_cache.pack_chunks == tp_now)
                                and can_shard_decode_attention(mesh, s, p.n_kv_heads)
                                and (w_local // 2) % 128 == 0):
                            attn_mesh = mesh
                        else:
                            attn_mode = "xla"
                    elif can_shard_decode_attention(mesh, s, p.n_kv_heads):
                        attn_mesh = mesh
                    else:
                        attn_mode = "xla"
            if attn_mode == "pallas":
                # v3 wide kernel over the cache IN PLACE: no per-layer
                # [S, win, Hkv, hd] slice copy (that copy is a second full
                # KV pass), one Mosaic compile shared by all layers via the
                # scalar-prefetched layer index
                from tpuserve.ops.decode_attention import decode_attention_wide_cache

                args = (
                    q / math.sqrt(p.head_dim),
                    new_cache.k,
                    new_cache.v,
                    new_cache.k_scale[layer] if new_cache.quantized else None,
                    new_cache.v_scale[layer] if new_cache.quantized else None,
                    positions,
                    layer,
                )
                if attn_mesh is not None:
                    from tpuserve.parallel.sharding import decode_attention_sharded

                    out = decode_attention_sharded(*args, attn_mesh, window=win)
                else:
                    out = decode_attention_wide_cache(*args, window=win)
                return out.astype(x.dtype).reshape(s, p.n_heads * p.head_dim)

            k_all = new_cache.k[layer, :, :win]  # [S, win, Hkv, hd]
            v_all = new_cache.v[layer, :, :win]
            if new_cache.flat:
                # tile-crossing relayout (full window copy per layer on TPU)
                # — acceptable only on this fallback path; the kernel path
                # above reads the flat cache in place
                k_all = _unpack_if_int4(k_all, new_cache.pack_chunks)
                v_all = _unpack_if_int4(v_all, new_cache.pack_chunks)
                k_all = k_all.reshape(s, win, p.n_kv_heads, p.head_dim)
                v_all = v_all.reshape(s, win, p.n_kv_heads, p.head_dim)
            if new_cache.quantized:
                k_scale = new_cache.k_scale[layer, :, :, :win]  # [S, Hkv, win]
                v_scale = new_cache.v_scale[layer, :, :, :win]
            else:
                k_scale = v_scale = None

            if attn_mode == "grouped":
                # r1 head-group kernel (slower than XLA on v5e; kept for
                # sweeps/ablation)
                from tpuserve.ops.decode_attention import decode_attention

                out = decode_attention(
                    q / math.sqrt(p.head_dim),
                    k_all,
                    v_all,
                    # the r1 kernel keeps the [S, L, Hkv] scale contract
                    None if k_scale is None else k_scale.transpose(0, 2, 1),
                    None if v_scale is None else v_scale.transpose(0, 2, 1),
                    positions,
                )
                return out.astype(x.dtype).reshape(s, p.n_heads * p.head_dim)

            # XLA fallback: grouped-query decode attention over the cache.
            # Cache reads convert int8->bf16 (fuses into the dot; an f32
            # cast would materialize a 4x copy) and the MXU accumulates in
            # f32 via preferred_element_type.
            n_rep = p.n_heads // p.n_kv_heads
            qg = q.reshape(s, p.n_kv_heads, n_rep, p.head_dim)
            # f32 caches (tests / exactness) keep f32 math; int8/bf16 use bf16
            cdt = jnp.float32 if k_all.dtype == jnp.float32 else jnp.bfloat16
            scores = jnp.einsum(
                "shrd,slhd->shrl",
                qg.astype(cdt),
                k_all.astype(cdt),
                preferred_element_type=jnp.float32,
            )  # [S, Hkv, rep, L] f32
            if k_scale is not None:
                scores = scores * k_scale[:, :, None, :]
            scores = scores / math.sqrt(p.head_dim)
            scores = jnp.where(read_mask[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)  # [S, Hkv, rep, L] f32
            if v_scale is not None:
                probs = probs * v_scale[:, :, None, :]
            out = jnp.einsum(
                "shrl,slhd->shrd",
                probs.astype(cdt),
                v_all.astype(cdt),
                preferred_element_type=jnp.float32,
            )
            out = out.astype(x.dtype).reshape(s, p.n_heads * p.head_dim)
            return out

        x = _forward_block(params, pre, x, p, attn_fn)

    logits = _logits(params, x, p)  # [S, V]
    logits = jnp.where(active[:, None], logits, 0.0)
    return logits, new_cache


# ---------------------------------------------------------------------- paged
def prefill_paged(params, p: LlamaParams, tokens: jax.Array, cache,
                  page_table: jax.Array, slot: jax.Array, length: jax.Array):
    """Prefill into a PagedKVCache (tpuserve/serving/paged_kv.py).

    tokens [1, L_bucket]; page_table [S, P] (page ids into the pool, 0 =
    reserved zero page); the engine guarantees the slot's chain covers the
    whole bucket. Returns (logits_last [1, V], updated cache).
    """
    from tpuserve.serving.paged_kv import PagedKVCache

    b, l = tokens.shape
    ps = cache.page_size
    x = params["embed/weight"][tokens]
    positions = jnp.arange(l, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(positions, p.head_dim, p.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    valid = positions < length
    mask = valid[:, None, :] & (positions[:, :, None] >= positions[:, None, :])

    # physical coordinates of logical positions 0..l-1 in this slot
    lpos = jnp.arange(l, dtype=jnp.int32)
    row = page_table[slot]  # [P]
    page_ids = row[lpos // ps]  # [L]
    offsets = lpos % ps  # [L]

    new_cache = cache
    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(b, l, p.n_heads, p.head_dim)
            k = k.reshape(b, l, p.n_kv_heads, p.head_dim)
            v = v.reshape(b, l, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k[0])  # [L, Hkv, hd], [L, Hkv]
                vq, vs = _quantize_kv_cache(new_cache, v[0])
            else:
                kq = k[0].astype(new_cache.k.dtype)
                vq = v[0].astype(new_cache.v.dtype)
                ks = vs = None
            if new_cache.flat:
                kq, vq = kq.reshape(l, -1), vq.reshape(l, -1)
                if new_cache.k.dtype == jnp.uint8:  # packed int4 pool
                    kq, vq = pack_kv_codes(kq), pack_kv_codes(vq)
            hp = new_cache.k_scale.shape[2] if ks is not None else 0
            new_cache = PagedKVCache(
                k=new_cache.k.at[layer, page_ids, offsets].set(kq.astype(new_cache.k.dtype)),
                v=new_cache.v.at[layer, page_ids, offsets].set(vq.astype(new_cache.v.dtype)),
                k_scale=None if ks is None else new_cache.k_scale.at[layer, page_ids, :, offsets].set(_pad_heads(ks, hp)),
                v_scale=None if vs is None else new_cache.v_scale.at[layer, page_ids, :, offsets].set(_pad_heads(vs, hp)),
                flat=new_cache.flat,
            )
            out = _attention_prefill(q, k, v, mask)
            return out.reshape(b, l, p.n_heads * p.head_dim)

        x = _forward_block(params, pre, x, p, attn_fn)

    last = jnp.take_along_axis(x, (length - 1)[None, None, None], axis=1)[:, 0, :]
    return _logits(params, last, p), new_cache


def prefill_paged_suffix(params, p: LlamaParams, tokens: jax.Array, cache,
                         page_table: jax.Array, slot: jax.Array,
                         start: jax.Array, length: jax.Array, window: int):
    """Prefill the SUFFIX of a prompt whose first `start` tokens already
    hold valid KV in the slot's pages (prefix sharing: the engine matched
    them in the PageTableManager's block cache, so their prefill compute
    AND page writes are skipped entirely).

    tokens [1, C] (suffix, right-padded; `length` = valid tokens in it);
    start = global position of tokens[0] (page-aligned by the caller);
    window (static, page multiple) covers start+C. Queries attend to the
    shared prefix pages plus causally within the suffix — the paged analogue
    of prefill_chunk. The padded tail writes garbage K/V at
    [start+length, start+C) inside the slot's own pages — harmless, decode
    overwrites position start+length before any read reaches it.
    Returns (logits [1, V] at the suffix's last valid position, cache).
    """
    from tpuserve.serving.paged_kv import PagedKVCache

    b, c = tokens.shape
    ps = cache.page_size
    x = params["embed/weight"][tokens]  # [1, C, D]
    gpos = start + jnp.arange(c, dtype=jnp.int32)  # [C] global positions
    cos, sin = rope_cos_sin(gpos[None, :], p.head_dim, p.rope_theta)
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    n_cols = max(1, min(int(window) // ps, page_table.shape[1]))
    l_virt = n_cols * ps
    kpos = jnp.arange(l_virt, dtype=jnp.int32)
    mask = kpos[None, :] <= gpos[:, None]  # [C, win] global causal

    full_row = jax.lax.dynamic_slice_in_dim(page_table, slot, 1, 0)[0]  # [P]
    row = full_row[:n_cols]  # [P_win]
    lpos = jnp.arange(c, dtype=jnp.int32)
    # padded-tail rows (lpos >= length) may index past the slot's chain, so
    # they are routed to the reserved zero page and masked to re-write its
    # old (zero) value — a no-op that cannot collide with a valid write
    # (chain pages are >= 1; duplicate zero-page targets all carry the same
    # old value, so scatter order is irrelevant)
    wvalid = lpos < length
    wpage = jnp.where(
        wvalid,
        full_row[jnp.minimum((start + lpos) // ps, full_row.shape[0] - 1)],
        0)
    woff = (start + lpos) % ps

    new_cache = cache
    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(b, c, p.n_heads, p.head_dim)
            k = k.reshape(b, c, p.n_kv_heads, p.head_dim)
            v = v.reshape(b, c, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k[0])  # [C, Hkv, hd], [C, Hkv]
                vq, vs = _quantize_kv_cache(new_cache, v[0])
            else:
                kq = k[0].astype(new_cache.k.dtype)
                vq = v[0].astype(new_cache.v.dtype)
                ks = vs = None
            if new_cache.flat:
                kq, vq = kq.reshape(c, -1), vq.reshape(c, -1)
                if new_cache.k.dtype == jnp.uint8:  # packed int4 pool
                    kq, vq = pack_kv_codes(kq), pack_kv_codes(vq)

            def masked(new, old_arr):
                old = old_arr[layer, wpage, woff]
                m = wvalid.reshape((c,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            hp = new_cache.k_scale.shape[2] if ks is not None else 0

            def masked_sc(new, old_arr):
                old = old_arr[layer, wpage, :, woff]
                return jnp.where(wvalid[:, None], _pad_heads(new, hp), old)

            new_cache = PagedKVCache(
                k=new_cache.k.at[layer, wpage, woff].set(masked(kq.astype(new_cache.k.dtype), new_cache.k)),
                v=new_cache.v.at[layer, wpage, woff].set(masked(vq.astype(new_cache.v.dtype), new_cache.v)),
                k_scale=None if ks is None else new_cache.k_scale.at[layer, wpage, :, woff].set(masked_sc(ks, new_cache.k_scale)),
                v_scale=None if vs is None else new_cache.v_scale.at[layer, wpage, :, woff].set(masked_sc(vs, new_cache.v_scale)),
                flat=new_cache.flat,
            )
            # gathered logical window view [win, Hkv, hd] (prefix pages +
            # this suffix's just-written pages — the documented paged-gather
            # tradeoff, see paged_kv.py)
            k_all = _unpack_if_int4(new_cache.k[layer, row]).reshape(
                l_virt, p.n_kv_heads, p.head_dim)
            v_all = _unpack_if_int4(new_cache.v[layer, row]).reshape(
                l_virt, p.n_kv_heads, p.head_dim)
            n_rep = p.n_heads // p.n_kv_heads
            qg = q[0].reshape(c, p.n_kv_heads, n_rep, p.head_dim)
            cdt = jnp.float32 if k_all.dtype == jnp.float32 else jnp.bfloat16
            scores = jnp.einsum(
                "cgrd,lgd->cgrl", qg.astype(cdt), k_all.astype(cdt),
                preferred_element_type=jnp.float32,
            )  # [C, Hkv, rep, win]
            if new_cache.quantized:
                # pool scales are head-major [P, HP, ps]: permute+merge to
                # [Hkv, l_virt] (suffix prefill only — decode reads pools
                # in place through the kernel)
                hp_r = new_cache.k_scale.shape[2]
                ksc = new_cache.k_scale[layer, row].transpose(1, 0, 2).reshape(
                    hp_r, l_virt)[: p.n_kv_heads]
                scores = scores * ksc[None, :, None, :]
            scores = scores / math.sqrt(p.head_dim)
            scores = jnp.where(mask[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            if new_cache.quantized:
                vsc = new_cache.v_scale[layer, row].transpose(1, 0, 2).reshape(
                    new_cache.v_scale.shape[2], l_virt)[: p.n_kv_heads]
                probs = probs * vsc[None, :, None, :]
            out = jnp.einsum(
                "cgrl,lgd->cgrd", probs.astype(cdt), v_all.astype(cdt),
                preferred_element_type=jnp.float32,
            )
            return out.astype(x.dtype).reshape(b, c, p.n_heads * p.head_dim)

        x = _forward_block(params, pre, x, p, attn_fn)

    last = jnp.take_along_axis(x, (length - 1)[None, None, None], axis=1)[:, 0, :]
    return _logits(params, last, p), new_cache


def decode_step_paged(params, p: LlamaParams, tokens: jax.Array, cache,
                      page_table: jax.Array, positions: jax.Array,
                      window: Optional[int] = None):
    """One decode step over a PagedKVCache.

    page_table [S, P]; positions [S] (-1 = inactive). The engine guarantees
    every active slot's chain covers positions[s]+1 tokens. The logical
    [S, P*page_size, Hkv, hd] view is gathered per layer (capacity-for-
    bandwidth tradeoff documented in paged_kv.py). `window` (static,
    multiple of page_size) limits gathers/reads to the leading pages —
    see decode_step."""
    from tpuserve.serving.paged_kv import PagedKVCache

    s = tokens.shape[0]
    ps = cache.page_size
    active = positions >= 0
    pos = jnp.maximum(positions, 0)
    x = params["embed/weight"][tokens]
    cos, sin = rope_cos_sin(pos, p.head_dim, p.rope_theta)
    cos_q, sin_q = cos[:, None, :], sin[:, None, :]
    if window is not None:
        n_cols = max(1, min(int(window) // ps, page_table.shape[1]))
        page_table = page_table[:, :n_cols]
    l_virt = page_table.shape[1] * ps
    ar = jnp.arange(l_virt, dtype=jnp.int32)
    read_mask = ar[None, :] <= pos[:, None]

    # physical write coordinates per slot; inactive slots target the zero
    # page and re-write its (zero) contents via the masked gather below
    slot_idx = jnp.arange(s, dtype=jnp.int32)
    wpage = page_table[slot_idx, pos // ps] * active.astype(jnp.int32)  # 0 when inactive
    woff = (pos % ps) * active.astype(jnp.int32)

    new_cache = cache
    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(s, p.n_heads, p.head_dim)
            k = k.reshape(s, p.n_kv_heads, p.head_dim)
            v = v.reshape(s, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos_q, sin_q)
            k = apply_rope(k, cos_q, sin_q)

            def masked(new, old_arr):
                old = old_arr[layer, wpage, woff]
                m = active.reshape((s,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)

            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k)
                vq, vs = _quantize_kv_cache(new_cache, v)
            else:
                kq = k.astype(new_cache.k.dtype)
                vq = v.astype(new_cache.v.dtype)
                ks = vs = None
            if new_cache.flat:
                kq, vq = kq.reshape(s, -1), vq.reshape(s, -1)
                if new_cache.k.dtype == jnp.uint8:  # packed int4 pool
                    kq, vq = pack_kv_codes(kq), pack_kv_codes(vq)
            hp = new_cache.k_scale.shape[2] if ks is not None else 0

            def masked_sc(new, old_arr):
                old = old_arr[layer, wpage, :, woff]
                return jnp.where(active[:, None], _pad_heads(new, hp), old)

            new_cache = PagedKVCache(
                k=new_cache.k.at[layer, wpage, woff].set(masked(kq.astype(new_cache.k.dtype), new_cache.k)),
                v=new_cache.v.at[layer, wpage, woff].set(masked(vq.astype(new_cache.v.dtype), new_cache.v)),
                k_scale=None if ks is None else new_cache.k_scale.at[layer, wpage, :, woff].set(masked_sc(ks, new_cache.k_scale)),
                v_scale=None if vs is None else new_cache.v_scale.at[layer, wpage, :, woff].set(masked_sc(vs, new_cache.v_scale)),
                flat=new_cache.flat,
            )

            def gathered_scales():
                # fallback paths only: pool scales are head-major
                # [P, HP, ps] pages; permute+merge to [S, Hkv, l_virt].
                # The single-chip kernel reads the POOL in place instead —
                # this gather+transpose measured ~6.7% of 7B step bytes
                # (the round-3 "paged gap").
                if not new_cache.quantized:
                    return None, None
                ksq = new_cache.k_scale[layer][page_table].transpose(
                    0, 2, 1, 3).reshape(s, hp, l_virt)[:, : p.n_kv_heads]
                vsq = new_cache.v_scale[layer][page_table].transpose(
                    0, 2, 1, 3).reshape(s, hp, l_virt)[:, : p.n_kv_heads]
                return ksq, vsq

            use_kernel = _decode_attn_mode(p) == "pallas" and ps % 8 == 0
            if use_kernel and jax.devices()[0].platform == "tpu" and not new_cache.flat:
                use_kernel = False  # see decode_step: 5D + pallas = relayout copies
            attn_mesh = None
            if use_kernel:
                # under a multi-chip mesh the paged kernel runs as a
                # shard_map island (pool tp-sharded over kv-heads, slots
                # over dp) when shapes divide, else the XLA gather path
                from tpuserve.parallel.sharding import (
                    active_mesh, can_shard_decode_attention)

                mesh = active_mesh()
                if mesh is not None and mesh.devices.size > 1:
                    if new_cache.k.dtype == jnp.uint8:
                        # packed int4 bytes interleave W positions — a
                        # kv-head split of the packed pool would be wrong
                        # (see decode_step); XLA path unpacks first
                        use_kernel = False
                    elif can_shard_decode_attention(mesh, s, p.n_kv_heads):
                        attn_mesh = mesh
                    else:
                        use_kernel = False
            if use_kernel:
                # paged wide kernel: page indirection rides the scalar-
                # prefetch channel; pages stream from the pool IN PLACE —
                # no [S, P, ps, ...] gather pass (the XLA path's documented
                # extra HBM pass per layer)
                from tpuserve.ops.decode_attention import decode_attention_wide_paged

                if attn_mesh is None and new_cache.quantized:
                    # single-chip: hand the kernel the SCALE POOLS — read
                    # in place through the page-indexed channel
                    k_scale, v_scale = new_cache.k_scale, new_cache.v_scale
                else:
                    k_scale, v_scale = gathered_scales()
                args = (
                    q / math.sqrt(p.head_dim),
                    new_cache.k,
                    new_cache.v,
                    k_scale,
                    v_scale,
                    page_table,
                    positions,
                    layer,
                )
                if attn_mesh is not None:
                    from tpuserve.parallel.sharding import decode_attention_paged_sharded

                    out = decode_attention_paged_sharded(
                        *args, attn_mesh, window=l_virt)
                else:
                    out = decode_attention_wide_paged(*args, window=l_virt)
                return out.astype(x.dtype).reshape(s, p.n_heads * p.head_dim)

            # gather the logical per-slot view from the page pool
            kp = _unpack_if_int4(new_cache.k[layer][page_table])  # [S, P, ps, ...]
            k_all = kp.reshape(s, l_virt, p.n_kv_heads, p.head_dim)
            v_all = _unpack_if_int4(new_cache.v[layer][page_table]).reshape(
                s, l_virt, p.n_kv_heads, p.head_dim)
            k_scale, v_scale = gathered_scales()
            return _gqa_decode_attention(
                q.reshape(s, -1), k_all, v_all, k_scale, v_scale, read_mask, p, x.dtype
            )

        x = _forward_block(params, pre, x, p, attn_fn)

    logits = _logits(params, x, p)
    logits = jnp.where(active[:, None], logits, 0.0)
    return logits, new_cache


def verify_step_paged(params, p: LlamaParams, tokens: jax.Array, cache,
                      page_table: jax.Array, positions: jax.Array,
                      lengths: jax.Array, window: Optional[int] = None):
    """Speculative verification over a PagedKVCache — the paged analogue of
    verify_step: C candidate tokens per slot write into their slots' pages
    and attend through the gathered window in ONE step. The engine ensures
    each slot's chain covers positions[s] + lengths[s] tokens before the
    dispatch; rejected drafts leave stale entries inside already-allocated
    pages (masked by position, overwritten by later writes). tokens [S, C],
    lengths [S] >= 1; returns (logits [S, C, V] f32, cache)."""
    from tpuserve.serving.paged_kv import PagedKVCache

    s, c = tokens.shape
    ps = cache.page_size
    active = positions >= 0
    pos0 = jnp.maximum(positions, 0)
    if window is not None:
        n_cols = max(1, min(int(window) // ps, page_table.shape[1]))
        page_table = page_table[:, :n_cols]
    l_virt = page_table.shape[1] * ps
    pos_c = jnp.minimum(pos0[:, None] + jnp.arange(c, dtype=jnp.int32)[None, :],
                        l_virt - 1)  # [S, C]
    valid = active[:, None] & (
        jnp.arange(c, dtype=jnp.int32)[None, :] < lengths[:, None])
    # 2-D activations through the blocks (see verify_step: 3-D elementwise
    # strip-mines per candidate on TPU)
    x = params["embed/weight"][tokens].reshape(s * c, p.dim)
    cos, sin = rope_cos_sin(pos_c, p.head_dim, p.rope_theta)
    cos_q, sin_q = cos[:, :, None, :], sin[:, :, None, :]
    kpos = jnp.arange(l_virt, dtype=jnp.int32)
    read_mask = kpos[None, None, :] <= pos_c[:, :, None]  # [S, C, win]

    # physical write coordinates per (slot, candidate); invalid entries
    # target the zero page and re-write its old (zero) contents
    slot_idx = jnp.arange(s, dtype=jnp.int32)
    wpage = page_table[slot_idx[:, None], pos_c // ps] * valid.astype(jnp.int32)
    woff = (pos_c % ps) * valid.astype(jnp.int32)

    new_cache = cache
    for layer in range(p.n_layers):
        pre = f"layers.{layer}"

        def attn_fn(q, k, v, layer=layer):
            nonlocal new_cache
            q = q.reshape(s, c, p.n_heads, p.head_dim)
            k = k.reshape(s, c, p.n_kv_heads, p.head_dim)
            v = v.reshape(s, c, p.n_kv_heads, p.head_dim)
            q = apply_rope(q, cos_q, sin_q)
            k = apply_rope(k, cos_q, sin_q)

            def masked(new, old_arr):
                old = old_arr[layer, wpage, woff]
                m = valid.reshape((s, c) + (1,) * (new.ndim - 2))
                return jnp.where(m, new, old)

            if new_cache.quantized:
                kq, ks = _quantize_kv_cache(new_cache, k)  # [S, C, Hkv, hd], [S, C, Hkv]
                vq, vs = _quantize_kv_cache(new_cache, v)
            else:
                kq = k.astype(new_cache.k.dtype)
                vq = v.astype(new_cache.v.dtype)
                ks = vs = None
            if new_cache.flat:
                kq, vq = kq.reshape(s, c, -1), vq.reshape(s, c, -1)
                if new_cache.k.dtype == jnp.uint8:  # packed int4 pool
                    kq, vq = pack_kv_codes(kq), pack_kv_codes(vq)
            hp = new_cache.k_scale.shape[2] if ks is not None else 0

            def masked_sc(new, old_arr):
                old = old_arr[layer, wpage, :, woff]
                return jnp.where(valid[:, :, None], _pad_heads(new, hp), old)

            new_cache = PagedKVCache(
                k=new_cache.k.at[layer, wpage, woff].set(masked(kq.astype(new_cache.k.dtype), new_cache.k)),
                v=new_cache.v.at[layer, wpage, woff].set(masked(vq.astype(new_cache.v.dtype), new_cache.v)),
                k_scale=None if ks is None else new_cache.k_scale.at[layer, wpage, :, woff].set(masked_sc(ks, new_cache.k_scale)),
                v_scale=None if vs is None else new_cache.v_scale.at[layer, wpage, :, woff].set(masked_sc(vs, new_cache.v_scale)),
                flat=new_cache.flat,
            )

            # gathered logical window view (documented paged tradeoff)
            k_all = _unpack_if_int4(new_cache.k[layer][page_table]).reshape(
                s, l_virt, p.n_kv_heads, p.head_dim)
            v_all = _unpack_if_int4(new_cache.v[layer][page_table]).reshape(
                s, l_virt, p.n_kv_heads, p.head_dim)
            if new_cache.quantized:
                k_scale = new_cache.k_scale[layer][page_table].transpose(
                    0, 2, 1, 3).reshape(s, hp, l_virt)[:, : p.n_kv_heads]
                v_scale = new_cache.v_scale[layer][page_table].transpose(
                    0, 2, 1, 3).reshape(s, hp, l_virt)[:, : p.n_kv_heads]
            else:
                k_scale = v_scale = None
            n_rep = p.n_heads // p.n_kv_heads
            qg = q.reshape(s, c, p.n_kv_heads, n_rep, p.head_dim)
            cdt = jnp.float32 if k_all.dtype == jnp.float32 else jnp.bfloat16
            scores = jnp.einsum(
                "schrd,slhd->schrl", qg.astype(cdt), k_all.astype(cdt),
                preferred_element_type=jnp.float32)
            if k_scale is not None:
                scores = scores * k_scale[:, None, :, None, :]
            scores = scores / math.sqrt(p.head_dim)
            scores = jnp.where(read_mask[:, :, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            if v_scale is not None:
                probs = probs * v_scale[:, None, :, None, :]
            out = jnp.einsum(
                "schrl,slhd->schrd", probs.astype(cdt), v_all.astype(cdt),
                preferred_element_type=jnp.float32)
            return out.astype(x.dtype).reshape(s * c, p.n_heads * p.head_dim)

        x = _forward_block(params, pre, x, p, attn_fn)

    logits = _logits(params, x, p).reshape(s, c, -1)
    return jnp.where(valid[:, :, None], logits, 0.0), new_cache


# ---------------------------------------------------------------------- zoo glue
@register_architecture("llama")
@register_architecture("mixtral")  # MoE Llama: set model_params.n_experts
class Llama(Architecture):
    """Model-zoo wrapper: whole-sequence forward for the generic JAX backend
    (logits for given input_ids). Generation runs through the LLM backend
    (tpuserve/serving), not this path."""

    def _p(self) -> LlamaParams:
        return LlamaParams.from_dict(self.params_cfg)

    def init(self, rng: jax.Array) -> Dict[str, jax.Array]:
        return init_params(rng, self._p())

    def apply(self, params: Dict, inputs: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        p = self._p()
        tokens = inputs["input_ids"].astype(jnp.int32)
        b, l = tokens.shape
        x = params["embed/weight"][tokens]
        positions = jnp.arange(l, dtype=jnp.int32)[None, :]
        cos, sin = rope_cos_sin(positions, p.head_dim, p.rope_theta)
        cos, sin = cos[:, :, None, :], sin[:, :, None, :]
        mask = positions[:, :, None] >= positions[:, None, :]

        for layer in range(p.n_layers):
            def attn_fn(q, k, v):
                q = q.reshape(b, l, p.n_heads, p.head_dim)
                k = k.reshape(b, l, p.n_kv_heads, p.head_dim)
                v = v.reshape(b, l, p.n_kv_heads, p.head_dim)
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)
                return _attention_prefill(q, k, v, mask).reshape(b, l, -1)

            x = _forward_block(params, f"layers.{layer}", x, p, attn_fn)
        return {"logits": _logits(params, x, p)}

    def quant_predicate(self, name: str, arr) -> bool:
        # 2-D projections + stacked 3-D MoE expert weights; routers stay
        # bf16 (routing decisions are precision-sensitive)
        if "router" in name:
            return False
        return arr.ndim in (2, 3) and name.endswith("kernel")
