"""Pipeline parallelism: transformer layers staged over a "pp" mesh axis.

TPU-native design (no reference counterpart — SURVEY §2b lists PP as absent
upstream): layer weights stack into [n_layers, ...] leaves whose leading dim
shards over "pp" (each device holds n_layers/pp contiguous layers — the
model's weight footprint per chip drops pp x, which is what PP buys an
inference server: capacity beyond one chip's HBM after TP is exhausted).
The KV cache needs NO restructuring — its layer dim already leads, so the
same PartitionSpec shards it stage-local.

Decode runs a microbatch-rotation pipeline inside ONE shard_map island
(the SPMD formulation of GPipe from the scaling book): the S decode slots
split into pp microbatches; at tick t, stage s processes microbatch
(t - s) and `ppermute`s its activations to stage s+1. Every device executes
the same program every tick — fill/drain ticks compute on garbage whose
cache writes are masked. 2*pp-1 ticks per step => bubble fraction
(pp-1)/(2pp-1); the final hidden states psum once ([S, D] — NOT the [S, V]
logits) and the replicated lm_head finishes locally on every stage.

Prefill pushes the whole prompt chunk through as a single microbatch
(stage t computes at tick t — the bubble is inherent for one sequence;
admission-time work, not the steady-state decode path).

Trade-off (documented, not hidden): each stage re-reads its layer weights
once per RESIDENT microbatch, so a pp-staged decode step moves ~the same
weight bytes as pp independent steps at 1/pp batch — PP here is a capacity
feature; throughput scaling comes from dp/tp.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuserve.models.llama import (
    KVCache,
    LlamaParams,
    _attention_prefill,
    _forward_block,
    _gqa_decode_attention,
    _mm_direct,
    _mm_w,
    _quantize_kv,
    apply_rope,
    rope_cos_sin,
)
from tpuserve.models.layers import rms_norm
from tpuserve.quant.core import QExperts, QTensor

_STACK = "stacked_layers/"  # param-dict prefix for [n_layers, ...] stacks

# pp x tp composition (v2): within each pipeline stage, layer weights also
# shard over a "tp" axis — column-parallel qkv/gate-up, row-parallel
# wo/w_down with one psum each (Megatron split), attention over local
# kv-head groups. Fused weights ([q|k|v], [gate|up]) are column-REGROUPED
# rank-major at stack time (_tp_shuffle_cols) so each tp shard's slice is
# exactly its local fused weight and the in-island `qkv[..., :qd_local]`
# splits stay correct.
_COL_SFX = ("wq/kernel", "wk/kernel", "wv/kernel", "wqkv/kernel",
            "w_gate/kernel", "w_up/kernel", "w_gateup/kernel")
_ROW_SFX = ("wo/kernel", "w_down/kernel")


def _fused_segments(sfx: str, p: LlamaParams):
    """Column segment widths of a fused weight (None = not fused)."""
    if sfx.endswith("wqkv/kernel"):
        qd = p.n_heads * p.head_dim
        kvd = p.n_kv_heads * p.head_dim
        return [qd, kvd, kvd]
    if sfx.endswith("w_gateup/kernel"):
        return [p.ffn_dim, p.ffn_dim]
    return None


def _tp_shuffle_cols(leaf, segs, tp: int):
    """Reorder the last axis of a stacked weight from segment-major
    [s0 | s1 | ...] to rank-major [s0_r0|s1_r0|...|s0_r1|...] so a plain
    P(..., "tp") split hands rank r exactly its heads'/columns' fused
    slice. Host-side one-time gather; scales permute identically (per
    output column)."""
    offs = np.cumsum([0] + segs[:-1])
    perm = []
    for r in range(tp):
        for off, w_ in zip(offs, segs):
            if w_ % tp != 0:
                raise ValueError(
                    f"fused segment width {w_} must divide tensor_parallel {tp}")
            wl = w_ // tp
            perm.extend(range(off + r * wl, off + (r + 1) * wl))
    perm = jnp.asarray(np.asarray(perm, np.int32))
    if isinstance(leaf, QExperts):
        return dataclasses.replace(
            leaf, q=leaf.q[..., perm], scale=leaf.scale[..., perm])
    return leaf[..., perm]


def stack_layer_params(params: Dict, p: LlamaParams, tp: int = 1) -> Dict:
    """Flat param dict with per-layer leaves -> one dict holding
    [n_layers, ...] stacks (prefix `stacked_layers/`) plus the shared
    (non-layer) params unchanged. QTensor layers stack into QExperts —
    a layer stack IS a stack of 2-D quantized weights, the same container
    expert stacks use."""
    out = {k: v for k, v in params.items() if not k.startswith("layers.")}
    suffixes = sorted({k.split("/", 1)[1] for k in params if k.startswith("layers.")})
    for sfx in suffixes:
        leaves = [params[f"layers.{l}/{sfx}"] for l in range(p.n_layers)]
        first = leaves[0]
        if isinstance(first, QExperts):
            # MoE expert stacks nest one level deeper: a layer stack of
            # [E, K, N] expert stacks is a QExperts holding 4-D arrays
            # [L, E, Kp, N] (pipeline_pspecs already pads the extra dims;
            # _layer_view slices dim 0 back out as an ordinary QExperts).
            # tp > 1 with MoE stays excluded at the engine (expert columns
            # would need the rank-major regroup per expert).
            stacked = QExperts(
                q=jnp.stack([t.q for t in leaves]),
                scale=jnp.stack([t.scale for t in leaves]),
                bits=first.bits, group_size=first.group_size,
                orig_shape=(p.n_layers,) + tuple(first.orig_shape),
                act_bits=first.act_bits, act_fp8=first.act_fp8,
            )
        elif isinstance(first, QTensor):
            stacked = QExperts(
                q=jnp.stack([t.q for t in leaves]),
                scale=jnp.stack([t.scale for t in leaves]),
                bits=first.bits, group_size=first.group_size,
                orig_shape=(p.n_layers,) + tuple(first.orig_shape),
            )
        else:
            stacked = jnp.stack(leaves)
        if tp > 1:
            segs = _fused_segments(sfx, p)
            if segs is not None:
                stacked = _tp_shuffle_cols(stacked, segs, tp)
        out[_STACK + sfx] = stacked
    return out


def _layer_view(params: Dict, l: int) -> Dict:
    """Name-keyed view of ONE layer's weights sliced from the stacks, shaped
    exactly like an ordinary per-layer param dict (prefix "L")."""
    view = {}
    for k, v in params.items():
        if not k.startswith(_STACK):
            continue
        sfx = k[len(_STACK):]
        if isinstance(v, QExperts) and v.q.ndim == 4:
            # layer stack OF expert stacks (pp x MoE): slice the layer dim,
            # leaving an ordinary [E, ...] QExperts for _moe_ffn
            view[f"L/{sfx}"] = dataclasses.replace(
                v, q=v.q[l], scale=v.scale[l], orig_shape=v.orig_shape[1:])
        elif isinstance(v, QExperts):
            view[f"L/{sfx}"] = v.expert(l)
        else:
            view[f"L/{sfx}"] = v[l]
    return view


def _stack_tp_axes(sfx: str, v, tp: int) -> Tuple[Optional[str], Optional[str]]:
    """(weight-dim-1 axis, weight-dim-2 axis) for a [L, K, N] stack under
    tp. Column weights shard N; row weights shard K (psum in-island)."""
    if tp <= 1:
        return None, None
    if any(sfx.endswith(s) for s in _COL_SFX):
        return None, "tp"
    if any(sfx.endswith(s) for s in _ROW_SFX):
        return "tp", None
    return None, None


def _local_params(p: LlamaParams, tp: int) -> LlamaParams:
    """Per-tp-shard view of the model dims: each shard owns H/tp query
    heads, Hkv/tp kv heads, F/tp ffn columns. The in-island compute uses
    these so fused splits / reshapes / attention run on local shapes."""
    if tp <= 1:
        return p
    return dataclasses.replace(
        p, n_heads=p.n_heads // tp, n_kv_heads=p.n_kv_heads // tp,
        ffn_dim=p.ffn_dim // tp)


def _island_mm(tp: int):
    """Matmul impl for code inside the pipeline island. tp == 1 is exactly
    _mm_direct (unchanged graphs). Under tp: QTensor shards rebuild their
    static orig_shape/group metadata from the LOCAL arrays (the stack aux
    still says the global shape), and row-sharded contractions (wo, w_down)
    psum their partials over "tp"."""
    if tp <= 1:
        return _mm_direct

    def mm(view: Dict, name: str, x: jax.Array) -> jax.Array:
        w = view[name]
        if isinstance(w, QTensor):
            k = w.q.shape[0] * (2 if w.bits == 4 else 1)
            gs = 0 if w.scale.shape[0] == 1 else w.group_size
            w = dataclasses.replace(
                w, orig_shape=(k, w.q.shape[1]), group_size=gs)
        out = _mm_w(x, w)
        if any(name.endswith(s) for s in _ROW_SFX):
            out = jax.lax.psum(out, "tp")
        return out

    return mm


def pipeline_pspecs(params: Dict, tp: int = 1) -> Dict:
    """PartitionSpec tree for a stacked param dict: stacks shard dim 0 over
    "pp" (and their weight dims over "tp" per the Megatron col/row split
    when tp > 1); shared params (norms, embed, lm_head) replicate."""
    specs = {}
    for k, v in params.items():
        if k.startswith(_STACK):
            sfx = k[len(_STACK):]
            ax1, ax2 = _stack_tp_axes(sfx, v, tp)
            if isinstance(v, QExperts):
                pad = [None] * (v.q.ndim - 3)
                sp = P("pp", ax1, *pad, ax2)
                # scales [L, G, N]: G tracks K. G == 1 (one group spans all
                # K) replicates correctly across row shards; G % tp != 0
                # has no clean local dequant
                s_ax1 = ax1
                if ax1 is not None:
                    g = v.scale.shape[1]
                    if g == 1:
                        s_ax1 = None
                    elif g % tp != 0:
                        raise ValueError(
                            f"{sfx}: scale groups {g} must divide tp {tp} "
                            "(or use group_size spanning the shard)")
                ssp = P("pp", s_ax1, *([None] * (v.scale.ndim - 3)), ax2)
                specs[k] = dataclasses.replace(v, q=sp, scale=ssp)
            elif getattr(v, "ndim", 0) >= 3:
                specs[k] = P("pp", ax1, *([None] * (v.ndim - 3)), ax2)
            else:
                specs[k] = P("pp", *([None] * (v.ndim - 1)))
        else:
            specs[k] = dataclasses.replace(v, q=P(), scale=P()) \
                if isinstance(v, QTensor) else P()
    return specs


def place_pipeline_params(params: Dict, mesh: Mesh) -> Dict:
    """device_put stacked params per pipeline_pspecs."""
    specs = pipeline_pspecs(params, tp=int(mesh.shape.get("tp", 1)))
    out = {}
    for k, v in params.items():
        s = specs[k]
        if isinstance(v, (QTensor, QExperts)):
            out[k] = dataclasses.replace(
                v,
                q=jax.device_put(v.q, NamedSharding(mesh, s.q)),
                scale=jax.device_put(v.scale, NamedSharding(mesh, s.scale)),
            )
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, s))
    return out


def shard_cache_pp(cache: KVCache, mesh: Mesh) -> KVCache:
    """Stage-local KV: the layer (leading) dim shards over "pp"; under a
    ("pp", "tp") mesh the kv-head dim additionally shards over "tp"; under
    ("pp", "sp") the L dim shards over "sp" (r5)."""
    tp = int(mesh.shape.get("tp", 1))
    dp = int(mesh.shape.get("dp", 1))
    sp = int(mesh.shape.get("sp", 1))
    kv_spec, sc_spec = _cache_specs(cache, tp, dp, sp)
    kv = NamedSharding(mesh, kv_spec)
    sc = NamedSharding(mesh, sc_spec if sc_spec is not None
                       else P("pp", None, None, None))
    return KVCache(
        k=jax.device_put(cache.k, kv),
        v=jax.device_put(cache.v, kv),
        k_scale=None if cache.k_scale is None else jax.device_put(cache.k_scale, sc),
        v_scale=None if cache.v_scale is None else jax.device_put(cache.v_scale, sc),
        flat=cache.flat,
    )


def _cache_specs(cache: KVCache, tp: int = 1, dp: int = 1,
                 sp: int = 1) -> Tuple:
    nd_kv = cache.k.ndim
    h_ax = "tp" if tp > 1 else None
    d_ax = "dp" if dp > 1 else None
    l_ax = "sp" if sp > 1 else None
    if nd_kv == 5:  # [lp, S, L, Hkv, hd] (pp islands read the 5D layout)
        kv = P("pp", d_ax, l_ax, h_ax, None)
    else:           # flat [lp, S, L, W]: W splits on head boundaries
        kv = P("pp", d_ax, l_ax, h_ax)
    sc = P("pp", d_ax, h_ax, l_ax) if cache.quantized else None  # [lp,S,Hkv,L]
    return kv, sc


def _gqa_decode_attention_sp(q, k_all, v_all, k_scale, v_scale, read_mask,
                             p_loc: LlamaParams, out_dtype):
    """sp-sharded decode attention inside a pipeline island (r5): k_all/
    v_all hold this shard's L/sp slice of the window; each shard computes
    partial softmax statistics over its slice and the flash-decoding merge
    (pmax/psum over "sp") combines them — the island-local analogue of
    parallel/sharding.decode_attention_seq_sharded. read_mask is built
    against GLOBAL positions by the caller. Fully-masked shards contribute
    e^(m - m_global) = 0 weight, so their uniform fake mass cancels."""
    import math as _math

    s = q.shape[0]
    n_rep = p_loc.n_heads // p_loc.n_kv_heads
    qg = q.reshape(s, p_loc.n_kv_heads, n_rep, p_loc.head_dim)
    cdt = jnp.float32 if k_all.dtype == jnp.float32 else jnp.bfloat16
    scores = jnp.einsum("shrd,slhd->shrl", qg.astype(cdt), k_all.astype(cdt),
                        preferred_element_type=jnp.float32)
    if k_scale is not None:
        scores = scores * k_scale[:, :, None, :]
    scores = scores / _math.sqrt(p_loc.head_dim)
    scores = jnp.where(read_mask[:, None, None, :], scores, -1e30)
    m = jnp.max(scores, axis=-1)                       # [S, Hkv, rep]
    probs = jnp.exp(scores - m[..., None])
    ssum = jnp.sum(probs, axis=-1)
    if v_scale is not None:
        probs = probs * v_scale[:, :, None, :]
    o = jnp.einsum("shrl,slhd->shrd", probs.astype(cdt), v_all.astype(cdt),
                   preferred_element_type=jnp.float32)
    m_g = jax.lax.pmax(m, "sp")
    w = jnp.exp(m - m_g)                               # underflows to 0
    o = jax.lax.psum(o * w[..., None], "sp")
    ssum = jax.lax.psum(ssum * w, "sp")
    out = o / jnp.maximum(ssum, 1e-20)[..., None]
    return out.astype(out_dtype).reshape(s, p_loc.n_heads * p_loc.head_dim)


def _logits_shared(shared: Dict, x: jax.Array, p: LlamaParams) -> jax.Array:
    h = rms_norm(shared, "final_norm", x, p.rms_eps)
    if p.tie_embeddings:
        w = shared["embed/weight"]
        return jnp.dot(h, w.T.astype(h.dtype), preferred_element_type=jnp.float32)
    return _mm_w(h, shared["lm_head/kernel"]).astype(jnp.float32)


def pp_decode_step(params: Dict, p: LlamaParams, tokens: jax.Array,
                   cache: KVCache, positions: jax.Array, mesh: Mesh,
                   window: Optional[int] = None):
    """One continuous-batching decode step through the layer pipeline.

    Same contract as llama.decode_step (tokens [S], positions [S] with -1 =
    inactive; returns (logits [S, V] f32, cache)) — params is the STACKED
    dict from stack_layer_params, cache layer-dim pp-sharded. S must divide
    by pp (the engine enforces n_slots % pp == 0). Under a ("pp", "tp")
    mesh each stage's weights/heads additionally shard over "tp" (Megatron
    col/row split; one psum per wo and per w_down, riding minor-axis ICI)."""
    pp = int(mesh.shape["pp"])
    tp = int(mesh.shape.get("tp", 1))
    dp = int(mesh.shape.get("dp", 1))
    sp = int(mesh.shape.get("sp", 1))
    p_loc = _local_params(p, tp)
    lp = p.n_layers // pp
    s_dim = int(tokens.shape[0])
    s_loc = s_dim // dp  # per-dp-replica slots (the island's local view)
    mb = s_loc // pp
    l_max = cache.max_len
    win = l_max if window is None else min(int(window), l_max)
    if sp > 1:
        # sp shards the KV length: every shard reads its full local window
        # and the flash-decoding merge handles liveness (decode buckets are
        # off under sp — engine sets window = max_seq_len)
        win = l_max
    l_loc = l_max // sp
    quantized = cache.quantized

    stack_keys = [k for k in params if k.startswith(_STACK)]
    shared = {k: v for k, v in params.items() if not k.startswith(_STACK)}
    stacks = {k: params[k] for k in stack_keys}

    spec_tree_stacks = {k: v for k, v in pipeline_pspecs(params, tp=tp).items()
                        if k.startswith(_STACK)}
    spec_tree_shared = {k: (dataclasses.replace(v, q=P(), scale=P())
                            if isinstance(v, QTensor) else P())
                        for k, v in shared.items()}
    kv_spec, sc_spec = _cache_specs(cache, tp, dp, sp)
    from jax.experimental.shard_map import shard_map

    def island(stk, shr, toks, pos, k_c, v_c, ks_c, vs_c):
        stage = jax.lax.axis_index("pp")
        dtype = shr["embed/weight"].dtype
        x = jnp.zeros((mb, p.dim), dtype)
        xs_final = jnp.zeros((s_loc, p.dim), dtype)
        for t in range(2 * pp - 1):  # static pipeline schedule
            mb_idx = t - stage                       # resident microbatch
            valid = (mb_idx >= 0) & (mb_idx < pp)
            mbc = jnp.clip(mb_idx, 0, pp - 1)
            if t < pp:
                # stage 0's resident microbatch at tick t is t (static)
                inject = shr["embed/weight"][
                    jax.lax.dynamic_slice_in_dim(toks, t * mb, mb)]
                x = jnp.where(stage == 0, inject, x)
            row0 = mbc * mb
            pos_mb = jax.lax.dynamic_slice_in_dim(pos, row0, mb)
            act = (pos_mb >= 0) & valid
            posc = jnp.maximum(pos_mb, 0)
            cos, sin = rope_cos_sin(posc, p.head_dim, p.rope_theta)
            cos_q, sin_q = cos[:, None, :], sin[:, None, :]
            rows = row0 + jnp.arange(mb, dtype=jnp.int32)
            if sp > 1:
                # this shard's L window covers global positions
                # [sp_idx*l_loc, (sp_idx+1)*l_loc); writes land only on the
                # owner shard, reads mask against GLOBAL liveness
                sp_idx = jax.lax.axis_index("sp")
                ar = sp_idx * l_loc + jnp.arange(l_loc, dtype=jnp.int32)
                owner = (posc // l_loc) == sp_idx
                posc_w = jax.lax.rem(posc, l_loc)
            else:
                ar = jnp.arange(win, dtype=jnp.int32)
                owner = jnp.ones_like(posc, jnp.bool_)
                posc_w = posc
            read_mask = ar[None, :] <= posc[:, None]
            for ll in range(lp):
                view = _layer_view(stk, ll)

                def attn_fn(q, k, v, ll=ll):
                    nonlocal k_c, v_c, ks_c, vs_c
                    q = q.reshape(mb, p_loc.n_heads, p.head_dim)
                    k = k.reshape(mb, p_loc.n_kv_heads, p.head_dim)
                    v = v.reshape(mb, p_loc.n_kv_heads, p.head_dim)
                    q = apply_rope(q, cos_q, sin_q)
                    k = apply_rope(k, cos_q, sin_q)
                    if quantized:
                        kq, ks = _quantize_kv(k)
                        vq, vs = _quantize_kv(v)
                        ks = ks.astype(ks_c.dtype)
                        vs = vs.astype(vs_c.dtype)
                    else:
                        kq = k.astype(k_c.dtype)
                        vq = v.astype(v_c.dtype)
                        ks = vs = None

                    act_w = act & owner

                    def masked(new, old_arr):
                        old = old_arr[ll, rows, posc_w]
                        m = act_w.reshape((mb,) + (1,) * (new.ndim - 1))
                        return jnp.where(m, new, old)

                    k_c = k_c.at[ll, rows, posc_w].set(masked(kq.astype(k_c.dtype), k_c))
                    v_c = v_c.at[ll, rows, posc_w].set(masked(vq.astype(v_c.dtype), v_c))
                    if ks is not None:
                        # scale cache is head-major [.., Hkv, L]

                        def masked_sc(new, old_arr):
                            old = old_arr[ll, rows, :, posc_w]
                            m = act_w.reshape((mb,) + (1,) * (new.ndim - 1))
                            return jnp.where(m, new, old)

                        ks_c = ks_c.at[ll, rows, :, posc_w].set(masked_sc(ks, ks_c))
                        vs_c = vs_c.at[ll, rows, :, posc_w].set(masked_sc(vs, vs_c))
                    rwin = l_loc if sp > 1 else win
                    k_all = jax.lax.dynamic_slice_in_dim(k_c[ll], row0, mb)[:, :rwin]
                    v_all = jax.lax.dynamic_slice_in_dim(v_c[ll], row0, mb)[:, :rwin]
                    if quantized:
                        ksl = jax.lax.dynamic_slice_in_dim(ks_c[ll], row0, mb)[:, :, :rwin]
                        vsl = jax.lax.dynamic_slice_in_dim(vs_c[ll], row0, mb)[:, :, :rwin]
                    else:
                        ksl = vsl = None
                    if sp > 1:
                        out = _gqa_decode_attention_sp(
                            q.reshape(mb, p_loc.n_heads * p.head_dim),
                            k_all, v_all, ksl, vsl, read_mask, p_loc,
                            x.dtype)
                    else:
                        out = _gqa_decode_attention(
                            q.reshape(mb, p_loc.n_heads * p.head_dim),
                            k_all, v_all, ksl, vsl, read_mask, p_loc, x.dtype)
                    return out

                x = _forward_block(view, "L", x, p_loc, attn_fn,
                                   mm=_island_mm(tp))
            # last stage banks the finished microbatch's hidden states
            emit = jnp.logical_and(stage == pp - 1, valid)
            upd = jax.lax.dynamic_update_slice(xs_final, x, (row0, 0))
            xs_final = jnp.where(emit, upd, xs_final)
            # rotate activations to the next stage
            x = jax.lax.ppermute(
                x, "pp", [(i, (i + 1) % pp) for i in range(pp)])
        # one [S, D] psum (NOT [S, V]); the replicated lm_head finishes
        # locally so logits come out identical on every stage
        xs_final = jax.lax.psum(
            jnp.where(stage == pp - 1, xs_final, jnp.zeros_like(xs_final)), "pp")
        logits = _logits_shared(shr, xs_final, p)
        logits = jnp.where(pos[:, None] >= 0, logits, 0.0)
        return logits, k_c, v_c, ks_c, vs_c

    args = (stacks, shared, tokens, positions, cache.k, cache.v,
            cache.k_scale if quantized else jnp.zeros((), jnp.float32),
            cache.v_scale if quantized else jnp.zeros((), jnp.float32))
    d_ax = "dp" if dp > 1 else None
    in_specs = (spec_tree_stacks, spec_tree_shared, P(d_ax), P(d_ax),
                kv_spec, kv_spec,
                sc_spec if quantized else P(), sc_spec if quantized else P())
    out_specs = (P(d_ax), kv_spec, kv_spec,
                 sc_spec if quantized else P(), sc_spec if quantized else P())
    logits, k_c, v_c, ks_c, vs_c = shard_map(
        island, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )(*args)
    new_cache = KVCache(k=k_c, v=v_c,
                        k_scale=ks_c if quantized else None,
                        v_scale=vs_c if quantized else None,
                        flat=cache.flat)
    return logits, new_cache


def pp_prefill(params: Dict, p: LlamaParams, tokens: jax.Array,
               cache: KVCache, slot: jax.Array, length: jax.Array,
               mesh: Mesh):
    """Prompt prefill through the layer pipeline (single microbatch: stage t
    computes at tick t; the fill bubble is inherent for one sequence).
    Same contract as llama.prefill: tokens [1, C] right-padded, `length`
    real tokens; returns (logits [1, V] at length-1, cache)."""
    pp = int(mesh.shape["pp"])
    tp = int(mesh.shape.get("tp", 1))
    dp = int(mesh.shape.get("dp", 1))
    sp = int(mesh.shape.get("sp", 1))
    p_loc = _local_params(p, tp)
    lp = p.n_layers // pp
    b, c = tokens.shape
    s_loc = cache.n_slots // dp  # slots per dp replica (local cache view)
    l_loc = cache.max_len // sp  # local L window under sp (r5)
    quantized = cache.quantized

    stack_keys = [k for k in params if k.startswith(_STACK)]
    shared = {k: v for k, v in params.items() if not k.startswith(_STACK)}
    stacks = {k: params[k] for k in stack_keys}
    spec_tree_stacks = {k: v for k, v in pipeline_pspecs(params, tp=tp).items()
                        if k.startswith(_STACK)}
    spec_tree_shared = {k: (dataclasses.replace(v, q=P(), scale=P())
                            if isinstance(v, QTensor) else P())
                        for k, v in shared.items()}
    kv_spec, sc_spec = _cache_specs(cache, tp, dp, sp)
    from jax.experimental.shard_map import shard_map

    def island(stk, shr, toks, slot_, length_, k_c, v_c, ks_c, vs_c):
        stage = jax.lax.axis_index("pp")
        # under dp the cache's slot dim is sharded: only the dp replica
        # owning `slot_` writes (activations/logits are identical on every
        # replica — tokens and weights replicate over "dp")
        if dp > 1:
            own = jax.lax.axis_index("dp") == slot_ // s_loc
            slot_ = jax.lax.rem(slot_, s_loc)
        else:
            own = jnp.bool_(True)
        x = shr["embed/weight"][toks]  # [1, C, D] (meaningful on stage 0)
        positions = jnp.arange(c, dtype=jnp.int32)[None, :]
        cos, sin = rope_cos_sin(positions, p.head_dim, p.rope_theta)
        cos_q, sin_q = cos[:, :, None, :], sin[:, :, None, :]
        mask = positions[:, :, None] >= positions[:, None, :]
        x_last = jnp.zeros((b, p.dim), x.dtype)
        for t in range(pp):  # tick t: stage t holds the chunk
            valid = stage == t
            for ll in range(lp):
                view = _layer_view(stk, ll)

                def attn_fn(q, k, v, ll=ll):
                    nonlocal k_c, v_c, ks_c, vs_c
                    q = q.reshape(b, c, p_loc.n_heads, p.head_dim)
                    k = k.reshape(b, c, p_loc.n_kv_heads, p.head_dim)
                    v = v.reshape(b, c, p_loc.n_kv_heads, p.head_dim)
                    q = apply_rope(q, cos_q, sin_q)
                    k = apply_rope(k, cos_q, sin_q)
                    if quantized:
                        kq, ks = _quantize_kv(k[0])
                        vq, vs = _quantize_kv(v[0])
                        ks = ks.astype(ks_c.dtype)
                        vs = vs.astype(vs_c.dtype)
                    else:
                        kq = k[0].astype(k_c.dtype)
                        vq = v[0].astype(v_c.dtype)
                        ks = vs = None

                    if sp > 1:
                        # the chunk's global rows [0, c) split across sp
                        # shards: take this shard's [sp_idx*l_loc, ..+l_loc)
                        # slice (zero-padded tail; dynamic_slice clamps are
                        # safe — rows past c are masked out below)
                        sp_idx = jax.lax.axis_index("sp")

                        def loc(new, axis):
                            pads = [(0, 0)] * new.ndim
                            pads[axis] = (0, l_loc)
                            padded = jnp.pad(new, pads)
                            return jax.lax.dynamic_slice_in_dim(
                                padded, sp_idx * l_loc, l_loc, axis=axis)

                        ok_rows = (sp_idx * l_loc
                                   + jnp.arange(l_loc, dtype=jnp.int32)) < c
                        kq, vq = loc(kq, 0), loc(vq, 0)
                        ok_kv = ok_rows[:, None, None]
                        ok_sc = ok_rows[None, :]
                        if ks is not None:
                            ks = loc(ks.T, 1)   # head-major [Hkv, l_loc]
                            vs = loc(vs.T, 1)
                    else:
                        ok_kv = ok_sc = None
                        if ks is not None:
                            ks, vs = ks.T, vs.T  # head-major [Hkv, C]

                    def masked(new, old_arr, okm=None):
                        old = jax.lax.dynamic_slice(
                            old_arr[ll], (slot_,) + (0,) * (old_arr.ndim - 2),
                            (1,) + new.shape)[0]
                        m = valid & own
                        if okm is not None:
                            m = m & okm
                        return jnp.where(m, new, old)

                    def put(arr, new, okm=None):
                        return jax.lax.dynamic_update_slice(
                            arr, masked(new, arr, okm)[None][None],
                            (ll, slot_) + (0,) * (arr.ndim - 2))

                    k_c = put(k_c, kq.astype(k_c.dtype), ok_kv)
                    v_c = put(v_c, vq.astype(v_c.dtype), ok_kv)
                    if ks is not None:
                        ks_c = put(ks_c, ks, ok_sc)
                        vs_c = put(vs_c, vs, ok_sc)
                    return _attention_prefill(q, k, v, mask).reshape(b, c, -1)

                x = _forward_block(view, "L", x, p_loc, attn_fn,
                                   mm=_island_mm(tp))
            last = jnp.take_along_axis(
                x, (length_ - 1)[None, None, None], axis=1)[:, 0, :]
            x_last = jnp.where(valid & (stage == pp - 1), last, x_last)
            x = jax.lax.ppermute(
                x, "pp", [(i, (i + 1) % pp) for i in range(pp)])
        x_last = jax.lax.psum(
            jnp.where(stage == pp - 1, x_last, jnp.zeros_like(x_last)), "pp")
        logits = _logits_shared(shr, x_last, p)
        return logits, k_c, v_c, ks_c, vs_c

    # cache writes clamp to the slot's row; padded K/V past `length` lands in
    # the slot's own row beyond the live window, exactly like llama.prefill
    args = (stacks, shared, tokens, slot, length, cache.k, cache.v,
            cache.k_scale if quantized else jnp.zeros((), jnp.float32),
            cache.v_scale if quantized else jnp.zeros((), jnp.float32))
    in_specs = (spec_tree_stacks, spec_tree_shared, P(), P(), P(),
                kv_spec, kv_spec,
                sc_spec if quantized else P(), sc_spec if quantized else P())
    out_specs = (P(), kv_spec, kv_spec,
                 sc_spec if quantized else P(), sc_spec if quantized else P())
    logits, k_c, v_c, ks_c, vs_c = shard_map(
        island, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )(*args)
    new_cache = KVCache(k=k_c, v=v_c,
                        k_scale=ks_c if quantized else None,
                        v_scale=vs_c if quantized else None,
                        flat=cache.flat)
    return logits, new_cache


# ---------------------------------------------------------------- pp x paged
# Round-4 composition (VERDICT r3 #9: 70B serving wants capacity staging AND
# demand-paged KV). The page pool's layer dim already leads, so it stages
# over "pp" exactly like the contiguous cache; page tables are host-global
# and enter the island replicated. v1 scope: pp only (tp = dp = 1 — the
# engine gates), 5D pool layout (pp islands read 5D), no prefix sharing.


def _pp_pad_heads(x, hp: int):
    """[.., Hkv] -> [.., hp] zero-padded (paged scale pool rows)."""
    pad = hp - x.shape[-1]
    if pad <= 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)


def shard_paged_cache_pp(cache, mesh: Mesh):
    """Stage-local page pool: layer (leading) dim over "pp", pages global
    per stage."""
    from tpuserve.serving.paged_kv import PagedKVCache

    nd = cache.k.ndim
    kv = NamedSharding(mesh, P(*(("pp",) + (None,) * (nd - 1))))
    sc = NamedSharding(mesh, P("pp", None, None, None))
    return PagedKVCache(
        k=jax.device_put(cache.k, kv),
        v=jax.device_put(cache.v, kv),
        k_scale=None if cache.k_scale is None else jax.device_put(cache.k_scale, sc),
        v_scale=None if cache.v_scale is None else jax.device_put(cache.v_scale, sc),
        flat=cache.flat,
    )


def pp_decode_step_paged(params: Dict, p: LlamaParams, tokens: jax.Array,
                         cache, page_table: jax.Array,
                         positions: jax.Array, mesh: Mesh,
                         window: Optional[int] = None):
    """One decode step through the layer pipeline over a PagedKVCache.

    Contract of llama.decode_step_paged (tokens [S], page_table [S, P],
    positions [S]; the engine grows each active slot's chain first), with
    pp_decode_step's microbatch-rotation schedule: stage s writes/reads
    ONLY its local lp layers' pages."""
    from tpuserve.serving.paged_kv import PagedKVCache

    pp = int(mesh.shape["pp"])
    lp = p.n_layers // pp
    s_dim = int(tokens.shape[0])
    mb = s_dim // pp
    ps = cache.page_size
    quantized = cache.quantized
    if window is not None:
        n_cols = max(1, min(int(window) // ps, page_table.shape[1]))
        page_table = page_table[:, :n_cols]
    l_virt = page_table.shape[1] * ps

    stack_keys = [k for k in params if k.startswith(_STACK)]
    shared = {k: v for k, v in params.items() if not k.startswith(_STACK)}
    stacks = {k: params[k] for k in stack_keys}
    spec_tree_stacks = {k: v for k, v in pipeline_pspecs(params).items()
                        if k.startswith(_STACK)}
    spec_tree_shared = {k: (dataclasses.replace(v, q=P(), scale=P())
                            if isinstance(v, QTensor) else P())
                        for k, v in shared.items()}
    nd = cache.k.ndim
    kv_spec = P(*(("pp",) + (None,) * (nd - 1)))
    sc_spec = P("pp", None, None, None)
    from jax.experimental.shard_map import shard_map

    def island(stk, shr, toks, table, pos, k_c, v_c, ks_c, vs_c):
        stage = jax.lax.axis_index("pp")
        dtype = shr["embed/weight"].dtype
        x = jnp.zeros((mb, p.dim), dtype)
        xs_final = jnp.zeros((s_dim, p.dim), dtype)
        for t in range(2 * pp - 1):
            mb_idx = t - stage
            valid = (mb_idx >= 0) & (mb_idx < pp)
            mbc = jnp.clip(mb_idx, 0, pp - 1)
            if t < pp:
                inject = shr["embed/weight"][
                    jax.lax.dynamic_slice_in_dim(toks, t * mb, mb)]
                x = jnp.where(stage == 0, inject, x)
            row0 = mbc * mb
            pos_mb = jax.lax.dynamic_slice_in_dim(pos, row0, mb)
            act = (pos_mb >= 0) & valid
            posc = jnp.maximum(pos_mb, 0)
            cos, sin = rope_cos_sin(posc, p.head_dim, p.rope_theta)
            cos_q, sin_q = cos[:, None, :], sin[:, None, :]
            table_mb = jax.lax.dynamic_slice_in_dim(table, row0, mb)  # [mb, P]
            mrow = jnp.arange(mb, dtype=jnp.int32)
            # physical write coords; invalid rows target the zero page and
            # re-write its old (zero) contents via the masked gather below
            wpage = table_mb[mrow, posc // ps] * act.astype(jnp.int32)
            woff = (posc % ps) * act.astype(jnp.int32)
            ar = jnp.arange(l_virt, dtype=jnp.int32)
            read_mask = ar[None, :] <= posc[:, None]
            for ll in range(lp):
                view = _layer_view(stk, ll)

                def attn_fn(q, k, v, ll=ll):
                    nonlocal k_c, v_c, ks_c, vs_c
                    q = q.reshape(mb, p.n_heads, p.head_dim)
                    k = k.reshape(mb, p.n_kv_heads, p.head_dim)
                    v = v.reshape(mb, p.n_kv_heads, p.head_dim)
                    q = apply_rope(q, cos_q, sin_q)
                    k = apply_rope(k, cos_q, sin_q)
                    if quantized:
                        kq, ks = _quantize_kv(k)
                        vq, vs = _quantize_kv(v)
                        ks = ks.astype(ks_c.dtype)
                        vs = vs.astype(vs_c.dtype)
                    else:
                        kq = k.astype(k_c.dtype)
                        vq = v.astype(v_c.dtype)
                        ks = vs = None

                    def masked(new, old_arr):
                        old = old_arr[ll, wpage, woff]
                        m = act.reshape((mb,) + (1,) * (new.ndim - 1))
                        return jnp.where(m, new, old)

                    k_c = k_c.at[ll, wpage, woff].set(masked(kq.astype(k_c.dtype), k_c))
                    v_c = v_c.at[ll, wpage, woff].set(masked(vq.astype(v_c.dtype), v_c))
                    if ks is not None:
                        # pool scales are HEAD-MAJOR [.., pad8(Hkv), ps]
                        hp = ks_c.shape[2]

                        def masked_sc(new, old_arr):
                            old = old_arr[ll, wpage, :, woff]
                            return jnp.where(act[:, None],
                                             _pp_pad_heads(new, hp), old)

                        ks_c = ks_c.at[ll, wpage, :, woff].set(masked_sc(ks, ks_c))
                        vs_c = vs_c.at[ll, wpage, :, woff].set(masked_sc(vs, vs_c))
                    # gathered logical window view (paged tradeoff)
                    k_all = k_c[ll][table_mb].reshape(
                        mb, l_virt, p.n_kv_heads, p.head_dim)
                    v_all = v_c[ll][table_mb].reshape(
                        mb, l_virt, p.n_kv_heads, p.head_dim)
                    if quantized:
                        hp = ks_c.shape[2]
                        ksl = ks_c[ll][table_mb].transpose(0, 2, 1, 3).reshape(
                            mb, hp, l_virt)[:, : p.n_kv_heads]
                        vsl = vs_c[ll][table_mb].transpose(0, 2, 1, 3).reshape(
                            mb, hp, l_virt)[:, : p.n_kv_heads]
                    else:
                        ksl = vsl = None
                    return _gqa_decode_attention(
                        q.reshape(mb, p.n_heads * p.head_dim),
                        k_all, v_all, ksl, vsl, read_mask, p, x.dtype)

                x = _forward_block(view, "L", x, p, attn_fn, mm=_island_mm(1))
            emit = jnp.logical_and(stage == pp - 1, valid)
            upd = jax.lax.dynamic_update_slice(xs_final, x, (row0, 0))
            xs_final = jnp.where(emit, upd, xs_final)
            x = jax.lax.ppermute(
                x, "pp", [(i, (i + 1) % pp) for i in range(pp)])
        xs_final = jax.lax.psum(
            jnp.where(stage == pp - 1, xs_final, jnp.zeros_like(xs_final)), "pp")
        logits = _logits_shared(shr, xs_final, p)
        logits = jnp.where(pos[:, None] >= 0, logits, 0.0)
        return logits, k_c, v_c, ks_c, vs_c

    args = (stacks, shared, tokens, page_table, positions, cache.k, cache.v,
            cache.k_scale if quantized else jnp.zeros((), jnp.float32),
            cache.v_scale if quantized else jnp.zeros((), jnp.float32))
    in_specs = (spec_tree_stacks, spec_tree_shared, P(), P(), P(),
                kv_spec, kv_spec,
                sc_spec if quantized else P(), sc_spec if quantized else P())
    out_specs = (P(), kv_spec, kv_spec,
                 sc_spec if quantized else P(), sc_spec if quantized else P())
    logits, k_c, v_c, ks_c, vs_c = shard_map(
        island, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )(*args)
    new_cache = PagedKVCache(k=k_c, v=v_c,
                             k_scale=ks_c if quantized else None,
                             v_scale=vs_c if quantized else None,
                             flat=cache.flat)
    return logits, new_cache


def pp_prefill_paged(params: Dict, p: LlamaParams, tokens: jax.Array,
                     cache, page_table: jax.Array, slot: jax.Array,
                     length: jax.Array, mesh: Mesh):
    """Prompt prefill through the layer pipeline into a PagedKVCache.
    Contract of llama.prefill_paged (the engine guarantees the slot's
    chain covers the bucket); single microbatch, stage t computes at tick
    t, each stage writes its local layers' pages only."""
    from tpuserve.serving.paged_kv import PagedKVCache

    pp = int(mesh.shape["pp"])
    lp = p.n_layers // pp
    b, c = tokens.shape
    ps = cache.page_size
    quantized = cache.quantized

    stack_keys = [k for k in params if k.startswith(_STACK)]
    shared = {k: v for k, v in params.items() if not k.startswith(_STACK)}
    stacks = {k: params[k] for k in stack_keys}
    spec_tree_stacks = {k: v for k, v in pipeline_pspecs(params).items()
                        if k.startswith(_STACK)}
    spec_tree_shared = {k: (dataclasses.replace(v, q=P(), scale=P())
                            if isinstance(v, QTensor) else P())
                        for k, v in shared.items()}
    nd = cache.k.ndim
    kv_spec = P(*(("pp",) + (None,) * (nd - 1)))
    sc_spec = P("pp", None, None, None)
    from jax.experimental.shard_map import shard_map

    def island(stk, shr, toks, table, slot_, length_, k_c, v_c, ks_c, vs_c):
        stage = jax.lax.axis_index("pp")
        x = shr["embed/weight"][toks]  # [1, C, D]
        positions = jnp.arange(c, dtype=jnp.int32)[None, :]
        cos, sin = rope_cos_sin(positions, p.head_dim, p.rope_theta)
        cos_q, sin_q = cos[:, :, None, :], sin[:, :, None, :]
        mask = positions[:, :, None] >= positions[:, None, :]
        # physical coords of logical positions 0..c-1 in this slot's chain
        lpos = jnp.arange(c, dtype=jnp.int32)
        row = jax.lax.dynamic_slice_in_dim(table, slot_, 1, 0)[0]  # [P]
        page_ids = row[lpos // ps]
        offsets = lpos % ps
        x_last = jnp.zeros((b, p.dim), x.dtype)
        for t in range(pp):
            valid = stage == t
            for ll in range(lp):
                view = _layer_view(stk, ll)

                def attn_fn(q, k, v, ll=ll):
                    nonlocal k_c, v_c, ks_c, vs_c
                    q = q.reshape(b, c, p.n_heads, p.head_dim)
                    k = k.reshape(b, c, p.n_kv_heads, p.head_dim)
                    v = v.reshape(b, c, p.n_kv_heads, p.head_dim)
                    q = apply_rope(q, cos_q, sin_q)
                    k = apply_rope(k, cos_q, sin_q)
                    if quantized:
                        kq, ks = _quantize_kv(k[0])
                        vq, vs = _quantize_kv(v[0])
                        ks = ks.astype(ks_c.dtype)
                        vs = vs.astype(vs_c.dtype)
                    else:
                        kq = k[0].astype(k_c.dtype)
                        vq = v[0].astype(v_c.dtype)
                        ks = vs = None

                    def masked(new, old_arr):
                        # garbage ticks (stage != t) must not touch pages
                        old = old_arr[ll, page_ids, offsets]
                        return jnp.where(valid, new, old)

                    k_c = k_c.at[ll, page_ids, offsets].set(masked(kq.astype(k_c.dtype), k_c))
                    v_c = v_c.at[ll, page_ids, offsets].set(masked(vq.astype(v_c.dtype), v_c))
                    if ks is not None:
                        hp = ks_c.shape[2]

                        def masked_sc(new, old_arr):
                            old = old_arr[ll, page_ids, :, offsets]
                            return jnp.where(valid, _pp_pad_heads(new, hp),
                                             old)

                        ks_c = ks_c.at[ll, page_ids, :, offsets].set(masked_sc(ks, ks_c))
                        vs_c = vs_c.at[ll, page_ids, :, offsets].set(masked_sc(vs, vs_c))
                    return _attention_prefill(q, k, v, mask).reshape(b, c, -1)

                x = _forward_block(view, "L", x, p, attn_fn, mm=_island_mm(1))
            last = jnp.take_along_axis(
                x, (length_ - 1)[None, None, None], axis=1)[:, 0, :]
            x_last = jnp.where(valid & (stage == pp - 1), last, x_last)
            x = jax.lax.ppermute(
                x, "pp", [(i, (i + 1) % pp) for i in range(pp)])
        x_last = jax.lax.psum(
            jnp.where(stage == pp - 1, x_last, jnp.zeros_like(x_last)), "pp")
        logits = _logits_shared(shr, x_last, p)
        return logits, k_c, v_c, ks_c, vs_c

    args = (stacks, shared, tokens, page_table, slot, length,
            cache.k, cache.v,
            cache.k_scale if quantized else jnp.zeros((), jnp.float32),
            cache.v_scale if quantized else jnp.zeros((), jnp.float32))
    in_specs = (spec_tree_stacks, spec_tree_shared, P(), P(), P(), P(),
                kv_spec, kv_spec,
                sc_spec if quantized else P(), sc_spec if quantized else P())
    out_specs = (P(), kv_spec, kv_spec,
                 sc_spec if quantized else P(), sc_spec if quantized else P())
    logits, k_c, v_c, ks_c, vs_c = shard_map(
        island, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )(*args)
    new_cache = PagedKVCache(k=k_c, v=v_c,
                             k_scale=ks_c if quantized else None,
                             v_scale=vs_c if quantized else None,
                             flat=cache.flat)
    return logits, new_cache
