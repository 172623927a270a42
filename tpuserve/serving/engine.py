"""GenerationEngine — continuous batching over a slotted KV cache.

North-star serving core (BASELINE.md configs 3-4); no reference counterpart
(the reference maps 1 HTTP request to 1 Session::Run — SURVEY.md §2b).

Design:
- S decode *slots* (config.generation.max_slots). A scheduler thread owns
  the device loop: admit pending requests into free slots (prefill), then
  run one batched decode step for all active slots, sample, emit, retire
  finished slots. Requests arrive/depart without ever stopping the batch —
  this is continuous batching, not static batching.
- Prefill compiles once per power-of-two length bucket; decode compiles
  once, shape [S]. The KV cache pytree is donated through both jitted
  functions, so the cache is updated in place on device (no O(cache) copy
  per step).
- Per-slot sampling params + RNG; EOS/max_new_tokens tracked host-side.
- Weights load from safetensors (flat llama.py names) and are quantized
  on the fly per config.quantization; `model_params.init = "random"`
  generates weights at load for fixtures/bench.
"""

from __future__ import annotations

import dataclasses
import itertools
import logging
import os
import queue
import threading
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.quant.core import QTensor, quantize_param_tree
from tpuserve.repository.config import ModelConfig
from tpuserve.serving.sampling import (
    SamplingParams, sample, sample_with_logprobs, spec_accept)
from tpuserve.utils.dtypes import DataType

# the single live engine under multi-host serving (v1: one model at a time
# — the dispatch event bus is one ordered stream shared by all processes)
_MH_LIVE_ENGINE = None
from tpuserve.utils.errors import BackendError, InvalidArgumentError, ResourceExhaustedError
from tpuserve.utils.tensor import Tensor

log = logging.getLogger("tpuserve.engine")

_QUANT_BITS = {"int8": 8, "int4": 4}


@dataclasses.dataclass
class Request:
    prompt_ids: List[int]
    max_new_tokens: int
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    min_p: float = 0.0
    repetition_penalty: float = 1.0  # CTRL-style, over prompt + generated
    stop_token_ids: List[int] = dataclasses.field(default_factory=list)
    want_logprobs: bool = False
    id: int = 0
    logprobs: List[float] = dataclasses.field(default_factory=list)
    # filled during serving
    output_ids: List[int] = dataclasses.field(default_factory=list)
    done: threading.Event = dataclasses.field(default_factory=threading.Event)
    error: Optional[str] = None
    token_queue: "queue.Queue[Optional[int]]" = dataclasses.field(default_factory=queue.Queue)
    finish_reason: str = ""
    # set by the transport when the client goes away; the scheduler retires
    # the slot at the next step instead of generating to max_new_tokens
    aborted: bool = False


@dataclasses.dataclass
class _SlotState:
    request: Request
    next_pos: int  # cache position the *next* fed token occupies
    generated: int
    last_token: int
    # --- speculation bookkeeping (lazy; see _sync_slot_history) ---
    # tokens of (prompt + outputs) already copied into the engine's
    # device-upload history buffer row
    hist_synced: int = 0
    # n-gram index over the history with a ONE-TOKEN LAG (n-grams ending
    # at most at index len-2), so a lookup of the trailing n-gram finds
    # only strictly-earlier occurrences — the O(1)-per-token gate that
    # replaced the O(S*L) numpy scan per dispatch
    ngram_idx: Dict[tuple, int] = dataclasses.field(default_factory=dict)
    ngram_synced: int = 0
    # EMA of ACCEPTED DRAFT TOKENS per verify round (a count, not a
    # fraction) for the break-even guard; starts optimistic (k-ish) so
    # new slots get probed — set properly on first admission
    acc_ema: float = 8.0


class GenerationEngine:
    def __init__(self, model_dir: str, config: ModelConfig):
        self.config = config
        self.model_dir = model_dir
        self.p = LlamaParams.from_dict(config.model_params)
        gen = config.generation
        self.max_seq_len = int(gen.max_seq_len)
        self.n_slots = int(gen.max_slots)
        self.eos_token_id = int(gen.eos_token_id)
        self.default_max_new = int(gen.max_new_tokens)

        self.params = None
        self.cache = None  # KVCache or PagedKVCache
        self.ptm = None  # PageTableManager (paged mode only)
        self.mesh = None  # jax Mesh when config.sharding > 1x1
        self._prefill_jit = None
        self._decode_jit = None
        self._decode_multi_jit = None
        self._sample_jit = None
        self._param_bytes = 0

        self._pending: "queue.Queue[Optional[Request]]" = queue.Queue()
        self._slots: List[Optional[_SlotState]] = [None] * self.n_slots
        # chunked-prefill admission in flight: {"req", "slot", "progress"}
        self._chunk_size = int(getattr(gen, "prefill_chunk", 0))
        self._chunking: Optional[Dict] = None
        self._prefill_chunk_jit = None
        self._prefill_suffix_jit = None  # paged prefix-sharing suffix prefill
        self._tok_ms_ema: Optional[float] = None  # adaptive-horizon EMA
        self._verify_jit = None  # speculative verification (plain mode)
        self._spec_multi_jit = None  # fused multi-round speculation
        self._hist_np = None  # [S, max_seq_len] host-side history buffer
        self._spec_disabled = False  # latched on verify dispatch failure
        self._spec_probe = 0  # break-even-guard probe counter
        self.spec_drafted = 0   # drafted tokens proposed
        self.spec_accepted = 0  # drafted tokens accepted (actually emitted)
        self._horizon_last = 1
        self._thread: Optional[threading.Thread] = None
        self._running = False
        # multi-host serving (VERDICT r4 #3): when jax.process_count() > 1,
        # process 0 (controller) owns the frontends and publishes every
        # device dispatch on the event bus; followers replay them in order
        # via run_follower() so all processes enter the same jitted
        # computations over the global mesh. Set for real in _finish_start.
        self._mh = False
        self._mh_ctrl = True
        self._admit_sample_jit = None
        self._req_ids = itertools.count(1)
        self._key = jax.random.PRNGKey(int(config.model_params.get("seed", 0)))
        self._sampling = SamplingParams.create(self.n_slots)
        # per-slot token-presence mask [S, V] (repetition penalty working
        # set): prompt tokens seeded at admission, generated tokens marked
        # in-scan by sample_with_logprobs
        self._presence = None  # created at start() (needs vocab size)
        # serving counters
        self.steps = 0
        self.tokens_out = 0
        self.tokens_in = 0

    # ------------------------------------------------------------------ setup
    @property
    def tokenizer(self):
        """Model-local tokenizer (tokenizer.json in the version dir, HF
        `tokenizers` format), lazily loaded; None when absent — the token-id
        APIs always work without one."""
        if not hasattr(self, "_tokenizer"):
            self._tokenizer = None
            path = os.path.join(self.model_dir, "tokenizer.json")
            if os.path.exists(path):
                try:
                    from tokenizers import Tokenizer

                    self._tokenizer = Tokenizer.from_file(path)
                except Exception:
                    self._tokenizer = None
        return self._tokenizer

    def generate_text(self, text: str, **kw) -> Dict:
        """Text-in/text-out generation; requires tokenizer.json."""
        tok = self.tokenizer
        if tok is None:
            raise InvalidArgumentError(
                "model has no tokenizer.json; send 'input_ids' instead of 'text'"
            )
        ids = tok.encode(text).ids
        result = self.generate(ids, **kw)
        result["text"] = tok.decode(result["generated_ids"])
        return result

    def _load_params(self) -> Dict[str, jax.Array]:
        init_mode = str(self.config.model_params.get("init", "")).lower()
        st_path = os.path.join(self.model_dir, "model.safetensors")
        if os.path.exists(st_path):
            from safetensors.numpy import load_file

            raw = load_file(st_path)
            return {k: jnp.asarray(v, jnp.bfloat16) if np.issubdtype(v.dtype, np.floating) else jnp.asarray(v)
                    for k, v in raw.items()}
        if init_mode == "random":
            return llama.init_params(jax.random.PRNGKey(42), self.p)
        raise BackendError(
            f"no checkpoint in {self.model_dir} and model_params.init != 'random'"
        )

    def _gptq_quantize(self, raw: Dict, bits: int, qcfg) -> Dict:
        """Hessian-calibrated GPTQ for the dense llama projections (2-D
        kernels incl. fused wqkv/w_gateup and lm_head); MoE expert stacks
        fall back to the RTN path afterwards (routed per-expert Hessians
        are not collected). Calibration tokens: an .npy int32 [B, L] file
        named by quantization.calibration, or a synthetic random draw."""
        from tpuserve.quant.gptq import collect_and_quantize_llama

        calib_src = qcfg.calibration
        if calib_src and calib_src != "synthetic":
            path = calib_src if os.path.isabs(calib_src) else os.path.join(
                self.model_dir, calib_src)
            tokens = np.load(path).astype(np.int32)
            if tokens.ndim != 2:
                raise BackendError(
                    f"gptq calibration file {path} must be int32 [B, L]")
        else:
            tokens = np.random.default_rng(0).integers(
                0, self.p.vocab_size, (16, 128)).astype(np.int32)
        t0 = time.monotonic()
        params = collect_and_quantize_llama(
            raw, self.p, tokens, bits=bits, group_size=qcfg.group_size,
            lowrank_r=int(getattr(qcfg, "lowrank_correction", 0) or 0))
        if self.p.n_experts:
            params = quantize_param_tree(
                params, bits=bits, group_size=qcfg.group_size,
                predicate=lambda n, a: getattr(a, "ndim", 0) == 3
                and n.endswith("kernel") and "router" not in n)
        log.info("gptq calibration+quantization took %.1fs (%d tokens)",
                 time.monotonic() - t0, tokens.size)
        return params

    def start(self) -> None:
        if jax.process_count() > 1 and jax.process_index() == 0:
            # tell follower processes to construct + start this same engine
            # (same model_dir on a shared repository path); they then block
            # in run_follower() replaying dispatch events. The one-model
            # guard must run BEFORE the publish — a second load event would
            # reach followers still inside the first engine's replay loop.
            global _MH_LIVE_ENGINE
            if _MH_LIVE_ENGINE is not None and _MH_LIVE_ENGINE is not self:
                raise BackendError(
                    "multi-host serving v1 serves ONE model at a time (the "
                    "event bus is a single ordered stream)")
            _MH_LIVE_ENGINE = self
            from tpuserve.parallel.dispatcher import publish_event

            publish_event(("load", self.model_dir))
        p = self.p
        qcfg = self.config.quantization
        bits = _QUANT_BITS.get(qcfg.weights)
        init_mode = str(self.config.model_params.get("init", "")).lower()
        if init_mode == "random_quantized":
            # bench/fixture path for models too big to init in bf16 first:
            # generate already-quantized weights directly on device (a 7B
            # bf16 init is 13.5 GB — it does not fit HBM next to its own
            # INT4 copy on a 16 GB chip; see models/llama_bench.py)
            if bits is None:
                raise BackendError(
                    "model_params.init 'random_quantized' requires "
                    "quantization.weights int8/int4")
            from tpuserve.models.llama_bench import init_quantized_params

            params = init_quantized_params(
                jax.random.PRNGKey(42), p, bits=bits,
                group_size=qcfg.group_size)
            self._finish_start(params)
            return
        raw = llama.fuse_params(self._load_params(), p)
        if bits is not None:
            def pred(name, arr):
                # 2-D projections + stacked 3-D MoE expert weights; the
                # router stays bf16 (tiny, and routing decisions are
                # precision-sensitive)
                if "router" in name:
                    return False
                return arr.ndim in (2, 3) and name.endswith("kernel")

            if qcfg.method == "gptq":
                params = self._gptq_quantize(raw, bits, qcfg)
            else:
                params = quantize_param_tree(
                    raw, bits=bits, group_size=qcfg.group_size, predicate=pred,
                    act_bits=8 if qcfg.activations == "int8" else 0,
                    act_fp8=qcfg.activations == "fp8",
                )
        else:
            params = raw
        self._finish_start(params)

    def _finish_start(self, params) -> None:
        p = self.p
        qcfg = self.config.quantization
        # multi-chip placement per config.sharding (TP x DP [x SP]
        # NamedShardings; XLA inserts the collectives). 1x1 = plain
        # single-device put.
        shard = self.config.sharding
        sp = int(getattr(shard, "sequence_parallel", 1))
        pp = int(getattr(shard, "pipeline_parallel", 1))
        self.mesh = None
        self._pp = 1
        if pp > 1:
            # layer pipeline (capacity scaling); composes with tensor
            # parallelism (stage-local Megatron split) and data parallelism
            # (whole-pipeline replicas, slots sharded over "dp") — see
            # parallel/pipeline.py. sp stays exclusive.
            tp_pp = int(shard.tensor_parallel)
            dp_pp = int(shard.data_parallel)
            if sp > 1:
                # pp x sp (r5): each stage's KV length shards over "sp",
                # flash-decoding merge inside the rotation island
                if tp_pp > 1:
                    raise BackendError(
                        "pipeline_parallel x sequence_parallel does not "
                        "compose with tensor_parallel (v1)")
                if self.config.generation.paged:
                    raise BackendError(
                        "sequence_parallel does not compose with paged KV")
                if self.max_seq_len % sp != 0:
                    raise BackendError(
                        f"max_seq_len {self.max_seq_len} must divide by "
                        f"sequence_parallel {sp}")
            if self.config.generation.paged:
                # pp x paged v1 (parallel/pipeline.py): pp-only meshes, no
                # prefix sharing (the suffix-prefill island is not staged)
                if tp_pp > 1 or dp_pp > 1:
                    raise BackendError(
                        "pipeline_parallel x paged KV requires "
                        "tensor_parallel = data_parallel = 1 (v1)")
                if bool(getattr(self.config.generation, "prefix_sharing",
                                False)):
                    raise BackendError(
                        "pipeline_parallel x paged KV does not compose "
                        "with prefix_sharing")
            if self._chunk_size > 0:
                raise BackendError(
                    "pipeline_parallel does not compose with prefill_chunk (v1)")
            if p.n_layers % pp != 0:
                raise BackendError(
                    f"n_layers {p.n_layers} must divide by pipeline_parallel {pp}")
            if self.n_slots % (pp * dp_pp) != 0:
                raise BackendError(
                    f"max_slots {self.n_slots} must divide by "
                    f"pipeline_parallel*data_parallel {pp * dp_pp}")
            if tp_pp > 1 and (p.n_kv_heads % tp_pp or p.n_heads % tp_pp
                              or p.ffn_dim % tp_pp):
                raise BackendError(
                    f"n_heads/n_kv_heads/ffn_dim must divide by "
                    f"tensor_parallel {tp_pp} under pipeline_parallel")
            if tp_pp > 1 and p.n_experts:
                raise BackendError(
                    "pipeline_parallel x tensor_parallel does not compose "
                    "with MoE yet")
            from tpuserve.parallel.mesh import make_pipeline_mesh
            from tpuserve.parallel.pipeline import (
                place_pipeline_params, stack_layer_params)

            self.mesh = make_pipeline_mesh(pp, tp_pp, dp_pp, sp)
            self._pp = pp
            self.params = place_pipeline_params(
                stack_layer_params(params, p, tp=tp_pp), self.mesh)
        elif shard.tensor_parallel * shard.data_parallel * sp > 1:
            from tpuserve.parallel.mesh import make_mesh
            from tpuserve.parallel.sharding import shard_llama_params

            self.mesh = make_mesh(
                tp=shard.tensor_parallel, dp=shard.data_parallel, sp=sp)
            if self.n_slots % shard.data_parallel != 0:
                raise BackendError(
                    f"max_slots {self.n_slots} must divide by data_parallel {shard.data_parallel}"
                )
            if sp > 1:
                if self.config.generation.paged:
                    raise BackendError(
                        "sequence_parallel does not compose with paged KV "
                        "(page pools address L dynamically; shard slots/heads "
                        "via data_parallel/tensor_parallel instead)")
                if self.max_seq_len % sp != 0:
                    raise BackendError(
                        f"max_seq_len {self.max_seq_len} must divide by "
                        f"sequence_parallel {sp}")
            self.params = shard_llama_params(params, self.mesh)
            # publish the mesh so llama._mm routes QTensor matmuls through
            # the shard_map-wrapped kernel instead of an unpartitionable
            # single-chip pallas_call
            from tpuserve.parallel.sharding import set_active_mesh

            set_active_mesh(self.mesh)
        else:
            self.params = jax.device_put(params)

        # ---- multi-host serving activation + v1 restrictions
        self._mh = jax.process_count() > 1
        self._mh_ctrl = jax.process_index() == 0
        if self._mh:
            if self.mesh is None:
                raise BackendError(
                    "multi-host serving requires a multi-chip sharding "
                    "config (set sharding.tensor_parallel/data_parallel)")
            if self._pp > 1:
                raise BackendError(
                    "multi-host serving v1 does not compose with "
                    "pipeline_parallel")
            if self.config.generation.paged:
                raise BackendError(
                    "multi-host serving v1 does not compose with paged KV "
                    "(page-table bookkeeping is controller-local)")
            if int(getattr(self.config.generation, "speculation_tokens", 0)
                   or 0) > 0:
                raise BackendError(
                    "multi-host serving v1 does not compose with "
                    "speculative decoding")
            global _MH_LIVE_ENGINE
            if _MH_LIVE_ENGINE is not None and _MH_LIVE_ENGINE is not self:
                raise BackendError(
                    "multi-host serving v1 serves ONE model at a time (the "
                    "event bus is a single ordered stream)")
            _MH_LIVE_ENGINE = self
            # PRNG key lives host-side so per-dispatch splits are replicated
            # values on every process (device-local keys cannot enter jits
            # over a multi-process mesh)
            self._key = np.asarray(self._key)
            from tpuserve.parallel.sharding import _put
            from jax.sharding import PartitionSpec as _P

            self._sampling = jax.tree_util.tree_map(
                lambda a: _put(np.asarray(a), self.mesh, _P()), self._sampling)
        self._param_bytes = sum(
            x.nbytes if isinstance(x, QTensor) else x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(
                self.params, is_leaf=lambda x: isinstance(x, QTensor)
            )
        )
        gen = self.config.generation
        if gen.paged and self._chunk_size > 0 \
                and self._chunk_size % int(gen.page_size) != 0:
            raise BackendError(
                f"generation.prefill_chunk ({self._chunk_size}) must be a "
                f"multiple of page_size ({gen.page_size}) in paged mode")
        if self._chunk_size > 0 and self.max_seq_len % self._chunk_size != 0:
            # a trailing chunk may not straddle max_seq_len: the cache write
            # would clamp and overwrite earlier positions
            raise BackendError(
                f"generation.prefill_chunk ({self._chunk_size}) must divide "
                f"max_seq_len ({self.max_seq_len})"
            )
        quant_kv = qcfg.kv_cache in ("int8", "int4")
        kv_bits = 4 if qcfg.kv_cache == "int4" else 8
        if int(getattr(qcfg, "lowrank_correction", 0) or 0) > 0 and (
                self.mesh is not None):
            raise BackendError(
                "quantization.lowrank_correction is single-chip (v1): the "
                "rank-r correction factors are not sharded")
        kv_pack_chunks = 1
        if kv_bits == 4:
            # packed int4 KV: flat caches/pools only (pack convention is
            # defined on the flat W dim; see models/llama.pack_kv_codes).
            # Under a tp mesh the cache packs per shard (pack_chunks = tp)
            # so the byte array shards on head boundaries; sp forces the
            # 5D layout and pp islands read 5D, so neither composes.
            if pp > 1:
                raise BackendError("kv_cache int4 does not compose with "
                                   "pipeline_parallel (5D stage caches)")
            if self.mesh is not None:
                from tpuserve.parallel.sharding import mesh_sp

                tp = int(self.mesh.shape.get("tp", 1))
                if mesh_sp(self.mesh) > 1:
                    raise BackendError(
                        "kv_cache int4 does not compose with "
                        "sequence_parallel (sp reads the 5D layout)")
                if tp > 1:
                    if p.n_kv_heads % tp or (p.n_kv_heads * p.head_dim // tp) % 2:
                        raise BackendError(
                            "kv_cache int4 under tp needs tp | n_kv_heads")
                    kv_pack_chunks = tp
            if (p.n_kv_heads * p.head_dim) % 2:
                raise BackendError("kv_cache int4 needs even n_kv_heads*head_dim")
        if gen.paged:
            from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager

            ps = int(gen.page_size)
            max_pages = -(-self.max_seq_len // ps)
            num_pages = int(gen.num_pages) or self.n_slots * max_pages + 1
            flat = llama.preferred_cache_flat(self.p, self.max_seq_len)
            if flat and self.mesh is not None:
                from tpuserve.parallel.sharding import can_shard_decode_attention

                flat = can_shard_decode_attention(
                    self.mesh, self.n_slots, p.n_kv_heads)
            if kv_bits == 4:
                flat = True  # pack convention lives on the flat W dim
                if self.mesh is not None:
                    raise BackendError(
                        "paged kv_cache int4 is single-chip (the shared "
                        "pool cannot shard a packed W dim)")
            if self._pp > 1:
                flat = False  # pp islands read the 5D pool layout
            self.cache = PagedKVCache.create(
                self.p, num_pages, ps, quantized=quant_kv, flat=flat,
                kv_bits=kv_bits,
            )
            if self._pp > 1:
                # pool stages layer-dim over "pp" (parallel/pipeline.py)
                from tpuserve.parallel.pipeline import shard_paged_cache_pp

                self.cache = shard_paged_cache_pp(self.cache, self.mesh)
            elif self.mesh is not None:
                # pool: kv-heads over tp, replicated across dp (pages are a
                # global resource addressed by per-slot tables — see
                # shard_paged_cache; dp > 1 costs dp x pool HBM)
                from tpuserve.parallel.sharding import shard_paged_cache

                self.cache = shard_paged_cache(self.cache, self.mesh)
            self.ptm = PageTableManager(
                num_pages, ps, self.n_slots, self.max_seq_len,
                prefix_sharing=bool(getattr(gen, "prefix_sharing", False)))
        else:
            # flat (kernel) layout also under a mesh when the shard_map
            # island's divisibility holds (decode_attention_sharded);
            # otherwise sharded decode reads the 5D cache on the XLA path
            flat = llama.preferred_cache_flat(p, self.max_seq_len)
            if flat and self.mesh is not None:
                from tpuserve.parallel.sharding import can_shard_decode_attention

                flat = can_shard_decode_attention(
                    self.mesh, self.n_slots, p.n_kv_heads)
            if self._pp > 1:
                flat = False  # pipeline islands read the 5D layout
            scale_dtype = jnp.bfloat16 \
                if getattr(qcfg, "kv_scale_dtype", "float32") == "bfloat16" \
                else jnp.float32
            if kv_bits == 4:
                flat = True  # pack convention lives on the flat W dim
            self.cache = KVCache.create(
                p, self.n_slots, self.max_seq_len, quantized=quant_kv,
                flat=flat, scale_dtype=scale_dtype, kv_bits=kv_bits,
                pack_chunks=kv_pack_chunks,
            )
            if self._pp > 1:
                from tpuserve.parallel.pipeline import shard_cache_pp

                self.cache = shard_cache_pp(self.cache, self.mesh)
            elif self.mesh is not None:
                from tpuserve.parallel.sharding import shard_cache

                self.cache = shard_cache(self.cache, self.mesh)
            self.ptm = None
        if gen.paged and self._pp > 1:
            # pp x paged v1: staged pool, microbatch-rotation decode over
            # page indirection (parallel/pipeline.py); no prefix sharing,
            # no speculation (single-round verify island not staged)
            from tpuserve.parallel import pipeline as pp_mod

            pp_mesh = self.mesh

            def prefill_fn(params, tokens, cache, table, slot, length):
                return pp_mod.pp_prefill_paged(
                    params, p, tokens, cache, table, slot, length, pp_mesh)

            def decode_fn(params, tokens, cache, table, positions, sampling,
                          key, presence, window):
                logits, cache = pp_mod.pp_decode_step_paged(
                    params, p, tokens, cache, table, positions, pp_mesh,
                    window=window)
                toks, lp, presence = sample_with_logprobs(
                    logits, sampling, key, presence)
                return toks, lp, cache, presence

            def decode_multi_fn(params, tokens, cache, table, positions,
                                sampling, key, presence, window, horizon):
                def body(carry, _):
                    toks, cache, pos, key, presence = carry
                    key, sub = jax.random.split(key)
                    logits, cache = pp_mod.pp_decode_step_paged(
                        params, p, toks, cache, table, pos, pp_mesh,
                        window=window)
                    toks, lp, presence = sample_with_logprobs(
                        logits, sampling, sub, presence)
                    pos = jnp.where(pos >= 0, pos + 1, pos)
                    return (toks, cache, pos, key, presence), (toks, lp)

                (_, cache, _, _, presence), (out, lps) = jax.lax.scan(
                    body, (tokens, cache, positions, key, presence), None,
                    length=horizon)
                return out, lps, cache, presence

        elif gen.paged:

            def prefill_fn(params, tokens, cache, table, slot, length):
                return llama.prefill_paged(params, p, tokens, cache, table, slot, length)

            def prefill_suffix_fn(params, tokens, cache, table, slot, start,
                                  length, window):
                return llama.prefill_paged_suffix(
                    params, p, tokens, cache, table, slot, start, length,
                    window=window)

            self._prefill_suffix_jit = jax.jit(
                prefill_suffix_fn, donate_argnums=(2,),
                static_argnames=("window",))

            def decode_fn(params, tokens, cache, table, positions, sampling,
                          key, presence, window):
                logits, cache = llama.decode_step_paged(
                    params, p, tokens, cache, table, positions, window=window
                )
                toks, lp, presence = sample_with_logprobs(
                    logits, sampling, key, presence)
                return toks, lp, cache, presence

            def decode_multi_fn(params, tokens, cache, table, positions,
                                sampling, key, presence, window, horizon):
                """`horizon` fused decode+sample steps in one dispatch (see
                GenerationConfig.decode_horizon). Inactive slots stay at
                position -1 across the scan."""

                def body(carry, _):
                    toks, cache, pos, key, presence = carry
                    key, sub = jax.random.split(key)
                    logits, cache = llama.decode_step_paged(
                        params, p, toks, cache, table, pos, window=window
                    )
                    toks, lp, presence = sample_with_logprobs(
                        logits, sampling, sub, presence)
                    pos = jnp.where(pos >= 0, pos + 1, pos)
                    return (toks, cache, pos, key, presence), (toks, lp)

                (_, cache, _, _, presence), (out, lps) = jax.lax.scan(
                    body, (tokens, cache, positions, key, presence), None,
                    length=horizon,
                )
                return out, lps, cache, presence

            def verify_fn(params, tokens, cache, table, positions, lengths,
                          sampling, key, window):
                """Verification + exact acceptance (greedy AND sampled slots)
                in one dispatch: spec_accept implements point-mass rejection
                sampling, so only [S, C] token/logprob/accept arrays cross
                the host boundary — never the [S, C, V] logits."""
                logits, cache = llama.verify_step_paged(
                    params, p, tokens, cache, table, positions, lengths,
                    window=window)
                out, lp, acc = spec_accept(logits, tokens, lengths, sampling, key)
                return out, lp, acc, cache

            self._verify_jit = jax.jit(
                verify_fn, donate_argnums=(2,), static_argnames=("window",))
        elif self._pp > 1:
            from tpuserve.parallel import pipeline as pp_mod

            pp_mesh = self.mesh

            def prefill_fn(params, tokens, cache, slot, length):
                return pp_mod.pp_prefill(params, p, tokens, cache, slot, length, pp_mesh)

            def decode_fn(params, tokens, cache, positions, sampling, key,
                          presence, window):
                logits, cache = pp_mod.pp_decode_step(
                    params, p, tokens, cache, positions, pp_mesh, window=window)
                toks, lp, presence = sample_with_logprobs(
                    logits, sampling, key, presence)
                return toks, lp, cache, presence

            def decode_multi_fn(params, tokens, cache, positions, sampling,
                                key, presence, window, horizon):
                def body(carry, _):
                    toks, cache, pos, key, presence = carry
                    key, sub = jax.random.split(key)
                    logits, cache = pp_mod.pp_decode_step(
                        params, p, toks, cache, pos, pp_mesh, window=window)
                    toks, lp, presence = sample_with_logprobs(
                        logits, sampling, sub, presence)
                    pos = jnp.where(pos >= 0, pos + 1, pos)
                    return (toks, cache, pos, key, presence), (toks, lp)

                (_, cache, _, _, presence), (out, lps) = jax.lax.scan(
                    body, (tokens, cache, positions, key, presence), None,
                    length=horizon)
                return out, lps, cache, presence
        else:

            def prefill_fn(params, tokens, cache, slot, length):
                return llama.prefill(params, p, tokens, cache, slot, length)

            def decode_fn(params, tokens, cache, positions, sampling, key,
                          presence, window):
                """Decode + sample in ONE dispatch: host round-trips cost
                ~4 ms each on remote-device setups, so the loop fetches only
                the sampled token ids. `window` (static) bounds KV reads to
                the live context bucket."""
                logits, cache = llama.decode_step(
                    params, p, tokens, cache, positions, window=window
                )
                toks, lp, presence = sample_with_logprobs(
                    logits, sampling, key, presence)
                return toks, lp, cache, presence

            def decode_multi_fn(params, tokens, cache, positions, sampling,
                                key, presence, window, horizon):
                """`horizon` fused decode+sample steps in one dispatch (see
                GenerationConfig.decode_horizon)."""

                def body(carry, _):
                    toks, cache, pos, key, presence = carry
                    key, sub = jax.random.split(key)
                    logits, cache = llama.decode_step(
                        params, p, toks, cache, pos, window=window
                    )
                    toks, lp, presence = sample_with_logprobs(
                        logits, sampling, sub, presence)
                    pos = jnp.where(pos >= 0, pos + 1, pos)
                    return (toks, cache, pos, key, presence), (toks, lp)

                (_, cache, _, _, presence), (out, lps) = jax.lax.scan(
                    body, (tokens, cache, positions, key, presence), None,
                    length=horizon,
                )
                return out, lps, cache, presence

            def verify_fn(params, tokens, cache, positions, lengths,
                          sampling, key, window):
                """Verification + exact acceptance (greedy AND sampled slots)
                in one dispatch: spec_accept implements point-mass rejection
                sampling, so only [S, C] token/logprob/accept arrays cross
                the host boundary — never the [S, C, V] logits."""
                logits, cache = llama.verify_step(
                    params, p, tokens, cache, positions, lengths, window=window)
                out, lp, acc = spec_accept(logits, tokens, lengths, sampling, key)
                return out, lp, acc, cache

            self._verify_jit = jax.jit(
                verify_fn, donate_argnums=(2,), static_argnames=("window",))

            spec_k_cfg = int(getattr(gen, "speculation_tokens", 0) or 0)
            spec_n_cfg = int(getattr(gen, "speculation_ngram", 3) or 3)

            def spec_multi_fn(params, last, cache, hist, positions, k_cap,
                              sampling, key, window, rounds):
                """`rounds` fused draft+verify+accept rounds in ONE dispatch
                — the speculation analogue of decode_multi_fn. Drafting runs
                ON DEVICE (llama.draft_lookup) against the uploaded history
                buffer, which the scan extends with each round's committed
                tokens; the host pays ONE dispatch (and one [S, L] history
                upload) for up to rounds*(k+1) tokens. Round-3 profiling
                showed verify itself costs only 1.29x a decode step while
                end-to-end speculation delivered 1.44x of a ~7x ceiling —
                the missing factor was host drafting + per-verify dispatch
                overhead, which this amortizes away (VERDICT r3 #3)."""
                c = spec_k_cfg + 1
                s_dim = hist.shape[0]
                rows = jnp.arange(s_dim, dtype=jnp.int32)[:, None]
                cols = jnp.arange(c, dtype=jnp.int32)[None, :]

                def body(carry, _):
                    cache, last, pos, hist, key = carry
                    key, sub = jax.random.split(key)
                    slen = jnp.where(pos >= 0, pos + 1, 0)
                    drafts, k_eff = llama.draft_lookup(
                        hist, slen, spec_n_cfg, spec_k_cfg, k_cap)
                    toks = jnp.concatenate([last[:, None], drafts], axis=1)
                    lens = jnp.where(pos >= 0, 1 + k_eff, 0)
                    logits, cache = llama.verify_step(
                        params, p, toks, cache, pos, lens, window=window)
                    g, lp, acc = spec_accept(logits, toks, lens, sampling, sub)
                    acc = jnp.minimum(acc, k_eff)
                    adv = jnp.where(pos >= 0, acc + 1, 0)
                    new_last = jnp.where(
                        pos >= 0,
                        jnp.take_along_axis(g, acc[:, None], axis=1)[:, 0],
                        last)
                    # append the committed run to the history buffer
                    wr_idx = jnp.clip(slen[:, None] + cols, 0, hist.shape[1] - 1)
                    cur = hist[rows, wr_idx]
                    hist = hist.at[rows, wr_idx].set(
                        jnp.where(cols < adv[:, None], g, cur))
                    pos = jnp.where(pos >= 0, pos + adv, pos)
                    return (cache, new_last, pos, hist, key), (g, lp, acc, k_eff)

                (cache, _, _, _, _), (g, lp, acc, k_eff) = jax.lax.scan(
                    body, (cache, last, positions, hist, key), None,
                    length=rounds)
                return g, lp, acc, k_eff, cache

            self._spec_multi_jit = jax.jit(
                spec_multi_fn, donate_argnums=(2,),
                static_argnames=("window", "rounds"))

            def prefill_chunk_fn(params, tokens, cache, slot, start, length, window):
                return llama.prefill_chunk(
                    params, p, tokens, cache, slot, start, length, window=window
                )

            self._prefill_chunk_jit = jax.jit(
                prefill_chunk_fn, donate_argnums=(2,), static_argnames=("window",)
            )
            if self._mh:
                from jax.sharding import NamedSharding as _NS, \
                    PartitionSpec as _P

                _repl = _NS(self.mesh, _P())
                _cache_sh = jax.tree_util.tree_map(
                    lambda x: x.sharding, self.cache)
                self._prefill_chunk_jit = jax.jit(
                    prefill_chunk_fn, donate_argnums=(2,),
                    static_argnames=("window",),
                    out_shardings=(_repl, _cache_sh))

        if self._mh:
            # multi-host: small outputs (logits, tokens, logprobs, presence)
            # must come back fully replicated so every process can fetch
            # them with np.asarray; the cache keeps its input shardings
            # (donation requires the match anyway).
            from jax.sharding import NamedSharding as _NS, PartitionSpec as _P

            repl = _NS(self.mesh, _P())
            cache_sh = jax.tree_util.tree_map(lambda x: x.sharding, self.cache)
            self._prefill_jit = jax.jit(
                prefill_fn, donate_argnums=(2,),
                out_shardings=(repl, cache_sh))
            self._decode_jit = jax.jit(
                decode_fn, donate_argnums=(2,), static_argnames=("window",),
                out_shardings=(repl, repl, cache_sh, repl))
            self._decode_multi_jit = jax.jit(
                decode_multi_fn, donate_argnums=(2,),
                static_argnames=("window", "horizon"),
                out_shardings=(repl, repl, cache_sh, repl))
            self._sample_jit = jax.jit(sample_with_logprobs)
            n_slots, vocab = self.n_slots, p.vocab_size

            def admit_sample_fn(logits, slot, sampling, key, presence):
                # scatter the admitted slot's prefill logits into the full
                # [S, V] grid INSIDE the jit (eager scatter would mix a
                # process-local zeros array with global operands)
                full = jnp.zeros((n_slots, vocab), jnp.float32) \
                    .at[slot].set(logits[0])
                return sample_with_logprobs(full, sampling, key, presence)

            self._admit_sample_jit = jax.jit(
                admit_sample_fn, out_shardings=(repl, repl, repl))
            self._presence = jax.jit(
                lambda: jnp.zeros((self.n_slots, p.vocab_size), jnp.bool_),
                out_shardings=repl)()
        else:
            self._prefill_jit = jax.jit(prefill_fn, donate_argnums=(2,))
            self._decode_jit = jax.jit(decode_fn, donate_argnums=(2,), static_argnames=("window",))
            self._decode_multi_jit = jax.jit(
                decode_multi_fn, donate_argnums=(2,), static_argnames=("window", "horizon")
            )
            self._sample_jit = jax.jit(sample_with_logprobs)
            self._presence = jnp.zeros((self.n_slots, p.vocab_size), jnp.bool_)

        self._running = True
        if not (self._mh and not self._mh_ctrl):
            self._thread = threading.Thread(target=self._loop, name="tpuserve-genloop", daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._running = False
        self._pending.put(None)
        if self._thread is not None:
            self._thread.join(timeout=60)
            self._thread = None
        global _MH_LIVE_ENGINE
        if _MH_LIVE_ENGINE is self:
            _MH_LIVE_ENGINE = None
        # release followers AFTER the scheduler thread has issued its last
        # dispatch (event order == dispatch order)
        self._publish(("unload",))
        self._fail_outstanding("engine stopped")
        if self.mesh is not None:
            from tpuserve.parallel.sharding import set_active_mesh

            set_active_mesh(None)
        self.params = None
        self.cache = None

    def _fail_outstanding(self, reason: str) -> None:
        """Complete every in-flight and queued request with an error so no
        caller blocks forever across a stop/crash."""
        if self._chunking is not None:
            req = self._chunking["req"]
            req.error = reason
            req.token_queue.put(None)
            req.done.set()
            self._chunking = None
        for i, st in enumerate(self._slots):
            if st is not None:
                st.request.error = reason
                st.request.token_queue.put(None)
                st.request.done.set()
                self._slots[i] = None
                if self.ptm is not None:
                    self.ptm.release(i)
        while True:
            try:
                req = self._pending.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                req.error = reason
                req.token_queue.put(None)
                req.done.set()

    def memory_usage_bytes(self) -> int:
        total = self._param_bytes
        if self.cache is not None:
            total += self.cache.nbytes
        return total

    def serving_stats(self) -> Dict:
        """Scheduler-level telemetry for /metrics."""
        stats = {
            "active_slots": sum(1 for s in self._slots if s is not None),
            "max_slots": self.n_slots,
            "queue_depth": self._pending.qsize(),
            "decode_steps": self.steps,
            "tokens_generated": self.tokens_out,
            "tokens_prefilled": self.tokens_in,
            "paged": self.ptm is not None,
        }
        stats["decode_horizon_last"] = self._horizon_last
        if self.spec_drafted:
            stats["spec_drafted"] = self.spec_drafted
            stats["spec_accepted"] = self.spec_accepted
        if self._tok_ms_ema is not None:
            stats["decode_token_ms_ema"] = round(self._tok_ms_ema, 3)
        if self.ptm is not None:
            stats["kv_free_pages"] = self.ptm.free_pages
            if self.ptm.prefix_sharing:
                stats["prefix_cached_blocks"] = self.ptm.cached_blocks
                stats["prefix_hits"] = self.ptm.prefix_hits
                stats["prefix_hit_tokens"] = self.ptm.prefix_hit_tokens
            stats["kv_page_size"] = self.ptm.page_size
        return stats

    # ------------------------------------------------------------------ API
    def submit(self, prompt_ids: List[int], max_new_tokens: Optional[int] = None,
               temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
               seed: Optional[int] = None, repetition_penalty: float = 1.0,
               min_p: float = 0.0,
               stop_token_ids: Optional[List[int]] = None,
               logprobs: bool = False) -> Request:
        if not self._running:
            raise BackendError("engine is not running")
        prompt_ids = [int(t) for t in prompt_ids]
        if not prompt_ids:
            raise InvalidArgumentError("empty prompt")
        if len(prompt_ids) >= self.max_seq_len:
            raise InvalidArgumentError(
                f"prompt length {len(prompt_ids)} exceeds max_seq_len {self.max_seq_len}"
            )
        req = Request(
            prompt_ids=prompt_ids,
            max_new_tokens=int(max_new_tokens or self.default_max_new),
            temperature=float(temperature),
            top_k=int(top_k),
            top_p=float(top_p),
            repetition_penalty=float(repetition_penalty),
            min_p=float(min_p),
            stop_token_ids=[int(t) for t in (stop_token_ids or [])],
            want_logprobs=bool(logprobs),
            id=next(self._req_ids),
        )
        self._pending.put(req)
        return req

    def generate(self, prompt_ids, max_new_tokens: Optional[int] = None, **kw) -> Dict:
        """Blocking generation; returns {"output_ids", "num_generated",
        "finish_reason"}."""
        req = self.submit(prompt_ids, max_new_tokens=max_new_tokens, **kw)
        req.done.wait()
        if req.error:
            raise BackendError(req.error)
        out = {
            "output_ids": list(req.prompt_ids) + list(req.output_ids),
            "generated_ids": list(req.output_ids),
            "num_generated": len(req.output_ids),
            "finish_reason": req.finish_reason,
        }
        if req.want_logprobs:
            out["logprobs"] = list(req.logprobs)
        return out

    def infer_tensors(self, inputs: List[Tensor]) -> List[Tensor]:
        by_name = {t.name: t for t in inputs}
        if "input_ids" not in by_name:
            raise InvalidArgumentError("LLM infer requires an 'input_ids' tensor")
        ids = by_name["input_ids"].numpy().reshape(-1).astype(np.int64).tolist()
        max_new = self.default_max_new
        if "max_new_tokens" in by_name:
            max_new = int(by_name["max_new_tokens"].numpy().reshape(-1)[0])
        result = self.generate(ids, max_new_tokens=max_new)
        out = np.asarray(result["output_ids"], np.int32)[None, :]
        return [Tensor(name="output_ids", dtype=DataType.INT32, shape=out.shape, data=out)]

    # ------------------------------------------------------------------ loop
    def _bucket_len(self, n: int) -> int:
        b = 16
        while b < n:
            b *= 2
        return min(b, self.max_seq_len)

    def _free_slot(self) -> Optional[int]:
        busy = self._chunking["slot"] if self._chunking is not None else -1
        for i, s in enumerate(self._slots):
            if s is None and i != busy:
                return i
        return None

    # ------------------------------------------------- device-dispatch mirrors
    # Every device dispatch of the scheduler funnels through a _dev_* method
    # so that, under multi-host serving, followers can replay the identical
    # sequence (run_follower) after the controller publishes the host-side
    # inputs. Single-host behavior is unchanged: _publish is a no-op and the
    # mirrors are just the original dispatch code.

    def _publish(self, ev) -> None:
        if self._mh and self._mh_ctrl:
            from tpuserve.parallel.dispatcher import publish_event

            publish_event(ev)

    def _split_key(self):
        k, sub = jax.random.split(self._key)
        if self._mh:
            # host-side values: replicated-by-construction jit inputs
            return np.asarray(k), np.asarray(sub)
        return k, sub

    def _dev_admit(self, slot: int, prompt_ids, samp):
        """Non-paged admission: prefill + first-token sample."""
        l = len(prompt_ids)
        bucket = self._bucket_len(l)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :l] = prompt_ids
        logits, self.cache = self._prefill_jit(
            self.params, tokens, self.cache, np.int32(slot), np.int32(l))
        return self._dev_first_sample(slot, prompt_ids, samp, logits)

    def _dev_first_sample(self, slot: int, prompt_ids, samp, logits):
        """Sample the first generated token from prefill logits (shared by
        plain, chunked, and paged admission tails)."""
        self._sampling = self._sampling.update_slot(slot, *samp)
        self._seed_presence(slot, prompt_ids)
        self._key, sub = self._split_key()
        if self._mh:
            toks_d, lps_d, _ = self._admit_sample_jit(
                logits, np.int32(slot), self._sampling, sub, self._presence)
        else:
            full_logits = jnp.zeros((self.n_slots, logits.shape[-1]),
                                    jnp.float32).at[slot].set(logits[0])
            toks_d, lps_d, _ = self._sample_jit(full_logits, self._sampling,
                                                sub, self._presence)
        tok = int(np.asarray(toks_d)[slot])
        lp0 = float(np.asarray(lps_d)[slot])
        self._presence = self._presence.at[slot, tok].set(True)
        return tok, lp0

    def _dev_chunk(self, slot: int, chunk_ids, c0: int, n: int, window: int):
        """One contiguous-mode prefill chunk; returns this chunk's logits."""
        tokens = np.zeros((1, self._chunk_size), np.int32)
        tokens[0, :n] = chunk_ids
        logits, self.cache = self._prefill_chunk_jit(
            self.params, tokens, self.cache, np.int32(slot), np.int32(c0),
            np.int32(n), window=window)
        return logits

    def _dev_decode(self, tokens, positions, window: int, horizon: int):
        """The batched decode dispatch; returns ([H, S] tokens, [H, S]
        logprobs) as host arrays."""
        self._key, sub = self._split_key()
        args = [self.params, np.asarray(tokens, np.int32), self.cache]
        if self.ptm is not None:
            args.append(self.ptm.device_table())
        args += [np.asarray(positions, np.int32), self._sampling, sub,
                 self._presence]
        if horizon > 1:
            toks_dev, lps_dev, self.cache, self._presence = \
                self._decode_multi_jit(*args, window=window, horizon=horizon)
            return np.asarray(toks_dev), np.asarray(lps_dev)
        next_dev, lp_dev, self.cache, self._presence = \
            self._decode_jit(*args, window=window)
        return np.asarray(next_dev)[None], np.asarray(lp_dev)[None]

    def run_follower(self) -> None:
        """Follower-process loop (multi-host serving): replay the
        controller's device dispatches in event order until the model
        unloads. Call after start() on processes with index > 0."""
        from tpuserve.parallel.dispatcher import recv_event

        last_logits = None
        while True:
            ev = recv_event()
            op = ev[0]
            if op == "admit":
                _, slot, ids, samp = ev
                self._dev_admit(slot, ids, samp)
            elif op == "decode":
                _, tokens, positions, window, horizon = ev
                self._dev_decode(tokens, positions, window, horizon)
            elif op == "chunk":
                _, slot, chunk_ids, c0, n, window = ev
                last_logits = self._dev_chunk(slot, chunk_ids, c0, n, window)
            elif op == "chunk_final":
                _, slot, ids, samp = ev
                self._dev_first_sample(slot, ids, samp, last_logits)
            elif op in ("unload", "shutdown"):
                # "shutdown" covers a server teardown that never unloaded
                # the model; the caller (server/follower.py) re-checks it
                return op
            else:
                raise BackendError(f"unknown multi-host event: {op!r}")

    def _admit(self, req: Request, slot: int) -> None:
        l = len(req.prompt_ids)
        bucket = self._bucket_len(l)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :l] = req.prompt_ids
        samp = (req.temperature, req.top_k, req.top_p,
                getattr(req, "repetition_penalty", 1.0),
                getattr(req, "min_p", 0.0))
        if self.ptm is not None:
            # prefix sharing: install matched/registered shared pages at the
            # head of the slot's row, then allocate private pages for the rest
            shared, matched = self.ptm.admit_shared(slot, req.prompt_ids)
            try:
                self.ptm.ensure(slot, bucket)  # raises ResourceExhaustedError
            except Exception:
                self.ptm.release(slot)  # drop the shared refs taken above
                raise
            if matched > 0:
                # matched pages already hold valid KV: prefill only the
                # suffix (page-aligned start), skipping `matched` tokens of
                # compute and page writes
                suffix = req.prompt_ids[matched:]
                cb = self._bucket_len(len(suffix))
                stoks = np.zeros((1, cb), np.int32)
                stoks[0, : len(suffix)] = suffix
                ps = self.ptm.page_size
                win = -(-min(matched + cb, self.max_seq_len) // ps) * ps
                logits, self.cache = self._prefill_suffix_jit(
                    self.params,
                    jnp.asarray(stoks),
                    self.cache,
                    self.ptm.device_table(),
                    jnp.int32(slot),
                    jnp.int32(matched),
                    jnp.int32(len(suffix)),
                    window=win,
                )
            else:
                logits, self.cache = self._prefill_jit(
                    self.params,
                    jnp.asarray(tokens),
                    self.cache,
                    self.ptm.device_table(),
                    jnp.int32(slot),
                    jnp.int32(l),
                )
            tok, lp0 = self._dev_first_sample(slot, req.prompt_ids, samp,
                                              logits)
        else:
            self._publish(("admit", slot, list(req.prompt_ids), samp))
            tok, lp0 = self._dev_admit(slot, req.prompt_ids, samp)
        self.tokens_in += l
        self._emit(req, tok, lp0)
        st = _SlotState(request=req, next_pos=l, generated=1, last_token=tok)
        if self._retire_if_done(st):
            if self.ptm is not None:
                self.ptm.release(slot)
        else:
            self._slots[slot] = st

    def _advance_chunk(self) -> None:
        """One chunk of the in-flight long admission (contiguous mode)."""
        ch = self._chunking
        req, slot = ch["req"], ch["slot"]
        if req.aborted:
            req.finish_reason = "aborted"
            req.token_queue.put(None)
            req.done.set()
            self._chunking = None
            return
        ids = req.prompt_ids
        c0 = ch["progress"]
        cs = self._chunk_size
        try:
            if self.ptm is not None:
                # paged chunked prefill rides the prefix-sharing suffix path
                # (prefill_paged_suffix handles any page-aligned start; the
                # engine validates prefill_chunk % page_size == 0)
                if c0 == 0:
                    shared, matched = self.ptm.admit_shared(slot, ids)
                    if matched > 0:  # matched pages already hold valid KV
                        ch["progress"] = c0 = matched
                n = min(cs, len(ids) - c0)
                self.ptm.ensure(slot, c0 + n)
                ps = self.ptm.page_size
                window = -(-min(c0 + cs, self.max_seq_len) // ps) * ps
                stoks = np.zeros((1, cs), np.int32)
                stoks[0, :n] = ids[c0 : c0 + n]
                logits, self.cache = self._prefill_suffix_jit(
                    self.params,
                    jnp.asarray(stoks),
                    self.cache,
                    self.ptm.device_table(),
                    jnp.int32(slot),
                    jnp.int32(c0),
                    jnp.int32(n),
                    window=window,
                )
            else:
                n = min(cs, len(ids) - c0)
                window = self._bucket_len(min(c0 + cs, self.max_seq_len))
                self._publish(("chunk", slot, list(ids[c0 : c0 + n]), c0, n,
                               window))
                logits = self._dev_chunk(slot, ids[c0 : c0 + n], c0, n,
                                         window)
        except Exception as e:
            req.error = str(e)
            req.token_queue.put(None)
            req.done.set()
            self._chunking = None
            if self.ptm is not None:
                self.ptm.release(slot)
            return
        ch["progress"] = c0 + n
        if ch["progress"] < len(ids):
            return
        # prompt fully prefilled: sample the first generated token
        self._chunking = None
        samp = (req.temperature, req.top_k, req.top_p,
                getattr(req, "repetition_penalty", 1.0),
                getattr(req, "min_p", 0.0))
        self._publish(("chunk_final", slot, list(req.prompt_ids), samp))
        tok, lp0 = self._dev_first_sample(slot, req.prompt_ids, samp, logits)
        self.tokens_in += len(ids)
        self._emit(req, tok, lp0)
        st = _SlotState(request=req, next_pos=len(ids), generated=1, last_token=tok)
        if not self._retire_if_done(st):
            self._slots[slot] = st

    def _seed_presence(self, slot: int, prompt_ids: List[int]) -> None:
        row = np.zeros((self.p.vocab_size,), np.bool_)
        row[np.asarray(prompt_ids, np.int64)] = True
        # np operand (not jnp.asarray): under multi-host the presence array
        # is a global array and a process-local device operand cannot mix in
        self._presence = self._presence.at[slot].set(row)

    def _emit(self, req: Request, tok: int, logprob: Optional[float] = None) -> None:
        req.output_ids.append(tok)
        if logprob is not None:
            req.logprobs.append(logprob)
        req.token_queue.put(tok)
        self.tokens_out += 1

    def _retire_if_done(self, st: _SlotState) -> bool:
        req = st.request
        if req.aborted:
            req.finish_reason = "aborted"
        elif st.last_token == self.eos_token_id:
            req.finish_reason = "eos"
        elif st.last_token in (req.stop_token_ids or ()):
            req.finish_reason = "stop"
        elif st.generated >= req.max_new_tokens:
            req.finish_reason = "max_new_tokens"
        elif st.next_pos >= self.max_seq_len:
            req.finish_reason = "max_seq_len"
        else:
            return False
        req.token_queue.put(None)
        req.done.set()
        return True

    def _propose_lookup(self, st: _SlotState, k: int, n: int) -> List[int]:
        """Prompt-lookup draft: match the sequence's trailing n-gram against
        its own history (prompt + generated) and propose the k tokens that
        followed the most recent earlier occurrence."""
        hist = st.request.prompt_ids + st.request.output_ids
        if len(hist) < n + 1 or k <= 0:
            return []
        arr = np.asarray(hist, np.int64)
        pat = arr[-n:]
        # vectorized rightmost-match: windows of length n ending before the
        # trailing n-gram itself
        win = np.lib.stride_tricks.sliding_window_view(arr[:-1], n)
        hits = np.nonzero((win == pat).all(axis=1))[0]
        if len(hits) == 0:
            return []
        # Prefer the most recent occurrence that still has a full k-token
        # continuation to copy. Picking hits[-1] unconditionally is a trap:
        # on repetitive text the latest match abuts the sequence tail and
        # yields a 0-1 token draft, so every verify dispatch delivers ~2
        # tokens and speculation runs SLOWER than plain decode (measured
        # 0.48x in .r3_spec_bench.log). Fall back to the longest available
        # continuation when no match has k tokens after it.
        avail = len(arr) - (hits + n)
        full = hits[avail >= k]
        j = int(full[-1]) if len(full) else int(hits[np.argmax(avail)])
        return [int(t) for t in arr[j + n : j + n + k]]

    def _sync_slot_history(self, i: int, st: _SlotState) -> int:
        """Bring the engine's upload-history buffer row and the slot's
        LAGGED n-gram index up to date; O(new tokens) amortized. The index
        holds n-grams ending at most at index len-2, so a lookup of the
        trailing n-gram finds only strictly-earlier occurrences — the
        exact window set the old O(S*L) numpy scan searched."""
        if self._hist_np is None:
            self._hist_np = np.zeros((self.n_slots, self.max_seq_len), np.int32)
        req = st.request
        p_len = len(req.prompt_ids)
        total = min(p_len + len(req.output_ids), self.max_seq_len)
        row = self._hist_np[i]
        if st.hist_synced == 0:
            row[:total] = (req.prompt_ids + req.output_ids)[:total]
        elif total > st.hist_synced:
            row[st.hist_synced:total] = \
                req.output_ids[st.hist_synced - p_len: total - p_len]
        st.hist_synced = total
        n = int(getattr(self.config.generation, "speculation_ngram", 3) or 3)
        for m in range(max(st.ngram_synced, n), total):
            st.ngram_idx[tuple(int(x) for x in row[m - n:m])] = m - n
        st.ngram_synced = max(st.ngram_synced, total)
        return total

    def _slot_has_match(self, i: int, st: _SlotState, total: int, n: int) -> bool:
        if total < n + 1:
            return False
        pat = tuple(int(x) for x in self._hist_np[i, total - n: total])
        return pat in st.ngram_idx

    def _spec_step(self, active, positions, tokens, spec_k: int) -> bool:
        """One speculative iteration. Returns False when drafting isn't
        worthwhile (caller falls through to the normal decode dispatch).

        Fused mode (speculation_rounds > 1, contiguous single-island):
        up to `rounds` draft+verify rounds run in ONE dispatch with
        on-device drafting — see spec_multi_fn. Single-round mode is the
        round-3 host-drafted path (_spec_step_single), kept for paged and
        multi-chip configurations."""
        gen = self.config.generation
        rounds = int(getattr(gen, "speculation_rounds", 1) or 1)
        if (self._spec_multi_jit is None or rounds <= 1 or self.ptm is not None
                or (self.mesh is not None and self.mesh.devices.size > 1)):
            return self._spec_step_single(active, positions, tokens, spec_k)

        n = int(getattr(gen, "speculation_ngram", 3) or 3)
        match = {}
        for i in active:
            st = self._slots[i]
            total = self._sync_slot_history(i, st)
            match[i] = self._slot_has_match(i, st, total, n)
        if not any(match.values()):
            return False

        # break-even guard: a C-wide verify round costs ~1.3x a decode
        # step (.r3_verify_profile.log), so the EXPECTED extra tokens per
        # slot per round (per-slot EMA of accepted drafts/round, counted,
        # not a fraction) must clear speculation_min_gain or plain decode
        # wins. EMAs refresh via a periodic probe dispatch so a workload
        # shift can re-enable speculation.
        min_gain = float(getattr(gen, "speculation_min_gain", 0.0) or 0.0)
        exp_gain = sum(
            min(self._slots[i].acc_ema, spec_k) for i in active if match[i]
        ) / len(active)
        if exp_gain < min_gain:
            self._spec_probe += 1
            if self._spec_probe % 16 != 0:
                return False

        k_cap = np.zeros((self.n_slots,), np.int32)
        for i in active:
            st = self._slots[i]
            # positions may advance (k_cap+1) per round; cap so even a
            # fully-accepted run stays inside the sequence capacity.
            # NOT match-gated: the fused verify is compiled at static
            # C = k+1 width, so suppressing an unmatched slot's drafts
            # saves nothing — and the device lookup re-matches every round
            # as in-dispatch history grows, so a slot that missed at round
            # 0 can still draft at rounds 1..R-1 (r5: raises the drafted
            # fraction the .r5_spec_bench.log economics showed limiting).
            room = (self.max_seq_len - 1 - st.next_pos) // rounds - 1
            k_cap[i] = min(spec_k, max(0, room))
        if not k_cap.any():
            return False

        window = self.max_seq_len
        n_buckets = int(gen.decode_buckets)
        if n_buckets > 0:
            last_pos = max(positions[i] for i in active) + rounds * (spec_k + 1) - 1
            w = max(64, self.max_seq_len >> n_buckets)
            while w <= last_pos:
                w *= 2
            window = min(w, self.max_seq_len)

        last = np.zeros((self.n_slots,), np.int32)
        for i in active:
            last[i] = self._slots[i].last_token
        try:
            self._key, sub = jax.random.split(self._key)
            g_d, lp_d, acc_d, keff_d, self.cache = self._spec_multi_jit(
                self.params, jnp.asarray(last), self.cache,
                jnp.asarray(self._hist_np), jnp.asarray(positions),
                jnp.asarray(k_cap), self._sampling, sub,
                window=window, rounds=rounds)
            g, lps, acc, keff = jax.device_get((g_d, lp_d, acc_d, keff_d))
        except Exception as e:
            # a fused-verify failure must never take down in-flight
            # requests; self.cache was not reassigned (the dispatch raised
            # before the tuple unpack), so plain decode remains intact
            self._spec_disabled = True
            log.error(
                "fused speculative dispatch failed; disabling speculation "
                "for this engine's lifetime and falling back to plain "
                "decode: %s", e)
            return False
        self.steps += rounds
        self._horizon_last = 1
        live = {i: self._slots[i] for i in active}
        for r in range(rounds):
            for i in list(live):
                st = live[i]
                kr = int(keff[r, i])
                a = min(int(acc[r, i]), kr)
                self.spec_drafted += kr
                if kr > 0:
                    st.acc_ema = 0.7 * st.acc_ema + 0.3 * a
                for j in range(a + 1):
                    st.next_pos += 1
                    st.generated += 1
                    st.last_token = int(g[r, i, j])
                    if j < a:
                        # count accepted drafts only as delivered, so
                        # tokens discarded past a mid-run EOS/stop don't
                        # inflate the acceptance rate
                        self.spec_accepted += 1
                    self._emit(st.request, st.last_token, float(lps[r, i, j]))
                    if self._retire_if_done(st):
                        self._slots[i] = None
                        del live[i]
                        break
        return True

    def _spec_step_single(self, active, positions, tokens, spec_k: int) -> bool:
        """One host-drafted speculative iteration (round-3 path; paged and
        multi-chip modes). Returns False when no slot has a draft."""
        n = int(getattr(self.config.generation, "speculation_ngram", 3) or 3)
        c = spec_k + 1
        props: Dict[int, List[int]] = {}
        for i in active:
            st = self._slots[i]
            room = self.max_seq_len - 1 - st.next_pos - 1  # drafts beyond col 0
            prop = self._propose_lookup(st, min(spec_k, max(0, room)), n)
            props[i] = prop
        if not any(props.values()):
            return False
        toks = np.zeros((self.n_slots, c), np.int32)
        lens = np.zeros((self.n_slots,), np.int32)
        for i in active:
            st = self._slots[i]
            row = [st.last_token] + props[i]
            toks[i, : len(row)] = row
            lens[i] = len(row)
        if self.ptm is not None:
            # page chains must cover every candidate position; a pool-dry
            # slot drops its drafts (falls back to one real token)
            for i in active:
                st = self._slots[i]
                try:
                    self.ptm.ensure(i, st.next_pos + int(lens[i]))
                except Exception:
                    toks[i, 1:] = 0
                    lens[i] = 1
                    props[i] = []
            if not any(props.values()):
                return False
        window = self.max_seq_len
        n_buckets = int(self.config.generation.decode_buckets)
        if n_buckets > 0:
            last_pos = max(positions[i] for i in active) + c - 1
            w = max(64, self.max_seq_len >> n_buckets)
            while w <= last_pos:
                w *= 2
            window = min(w, self.max_seq_len)
        try:
            self._key, sub = jax.random.split(self._key)
            if self.ptm is not None:
                ps_ = self.ptm.page_size
                last_pos = max(positions[i] for i in active) + c - 1
                window = min(-(-(last_pos + 1) // ps_) * ps_, self.max_seq_len)
                toks_d, lps_d, acc_d, self.cache = self._verify_jit(
                    self.params, jnp.asarray(toks), self.cache,
                    self.ptm.device_table(), jnp.asarray(positions),
                    jnp.asarray(lens), self._sampling, sub, window=window)
            else:
                toks_d, lps_d, acc_d, self.cache = self._verify_jit(
                    self.params, jnp.asarray(toks), self.cache,
                    jnp.asarray(positions), jnp.asarray(lens),
                    self._sampling, sub, window=window)
            g = np.asarray(toks_d)   # [S, C] accepted run (col acc = final)
            lps = np.asarray(lps_d)  # [S, C]
            acc = np.asarray(acc_d)  # [S] accepted draft count
        except Exception as e:
            # Speculation is an optimization: a verify dispatch failure
            # (e.g. a Mosaic lowering error for this model's head count)
            # must never take down in-flight requests. self.cache was not
            # reassigned (the dispatch raised before the tuple unpack), so
            # the plain decode path the caller falls through to is intact.
            self._spec_disabled = True
            log.error(
                "speculative verify dispatch failed; disabling speculation "
                "for this engine's lifetime and falling back to plain "
                "decode: %s", e)
            return False
        self.steps += 1
        self._horizon_last = 1
        for i in list(active):
            st = self._slots[i]
            prop = props[i]
            a = min(int(acc[i]), len(prop))
            self.spec_drafted += len(prop)
            seq = prop[:a] + [int(g[i, a])]
            for j, t in enumerate(seq):
                st.next_pos += 1
                st.generated += 1
                st.last_token = int(t)
                if j < a:
                    # count accepted drafts only as they are delivered, so
                    # tokens discarded past a mid-run EOS/stop don't inflate
                    # the acceptance rate
                    self.spec_accepted += 1
                self._emit(st.request, st.last_token, float(lps[i, j]))
                if self._retire_if_done(st):
                    # tokens past EOS/stop in the accepted run are discarded;
                    # their cache entries are masked by position (the same
                    # invariant the fused horizon relies on)
                    self._slots[i] = None
                    if self.ptm is not None:
                        self.ptm.release(i)
                    break
        return True

    def _loop(self) -> None:
        try:
            self._loop_inner()
        except Exception as e:  # scheduler must never die silently
            self._fail_outstanding(f"generation loop crashed: {e}")
            self._running = False

    def _loop_inner(self) -> None:
        while self._running:
            # admit pending requests into free slots
            while True:
                slot = self._free_slot()
                if slot is None:
                    break
                try:
                    # block only when the whole batch is idle; otherwise the
                    # decode step below must not wait on new arrivals
                    idle = (not any(self._slots) and self._pending.empty()
                            and self._chunking is None)
                    req = self._pending.get(block=idle)
                except queue.Empty:
                    break
                if req is None:  # shutdown signal
                    return
                if (
                    self._chunk_size > 0
                    and self._chunking is None
                    and len(req.prompt_ids) > self._chunk_size
                ):
                    # long prompt: admit in chunks interleaved with decode
                    # steps instead of one batch-freezing prefill
                    self._chunking = {"req": req, "slot": slot, "progress": 0}
                    break
                try:
                    self._admit(req, slot)
                except Exception as e:
                    req.error = str(e)
                    req.token_queue.put(None)
                    req.done.set()
                if self._pending.empty():
                    break

            # advance at most ONE prefill chunk between decode steps: the
            # long admission makes progress, active slots keep their cadence
            if self._chunking is not None:
                self._advance_chunk()

            # retire client-aborted slots before spending a step on them
            for i, st in enumerate(self._slots):
                if st is not None and st.request.aborted and self._retire_if_done(st):
                    self._slots[i] = None
                    if self.ptm is not None:
                        self.ptm.release(i)

            active = [i for i, s in enumerate(self._slots) if s is not None]
            if not active:
                continue

            # one batched decode step
            tokens = np.zeros((self.n_slots,), np.int32)
            positions = np.full((self.n_slots,), -1, np.int32)
            for i in active:
                st = self._slots[i]
                tokens[i] = st.last_token
                positions[i] = st.next_pos
            if self.ptm is not None:
                # grow page chains for the token each active slot is writing
                for i in list(active):
                    st = self._slots[i]
                    try:
                        self.ptm.ensure(i, st.next_pos + 1)
                    except Exception as e:
                        st.request.error = str(e)
                        st.request.finish_reason = "kv_pages_exhausted"
                        st.request.token_queue.put(None)
                        st.request.done.set()
                        self.ptm.release(i)
                        self._slots[i] = None
                        positions[i] = -1
                        active.remove(i)
                if not active:
                    continue
            # fused horizon: when nothing is waiting to be admitted, run up
            # to decode_horizon steps in one dispatch — host round-trips
            # cost ~4 ms each, a large fraction of a decode step. Bounded
            # by each slot's remaining budget and the sequence capacity so
            # the scan never writes past either.
            max_pos = max(positions[i] for i in active)
            horizon = 1
            h_cfg = int(getattr(self.config.generation, "decode_horizon", 1) or 1)
            if h_cfg > 1 and self._pending.empty() and self._chunking is None \
                    and not any(self._slots[i].request.aborted for i in active):
                rem = min(self._slots[i].request.max_new_tokens
                          - self._slots[i].generated for i in active)
                cap = self.max_seq_len - 1 - max_pos
                horizon = max(1, min(h_cfg, rem, cap))
                # adaptive: bound the burst's wall time to target_burst_ms
                # using the measured per-token EMA (see GenerationConfig)
                tgt = float(getattr(self.config.generation,
                                    "target_burst_ms", 0.0) or 0.0)
                if tgt > 0 and self._tok_ms_ema is not None:
                    horizon = max(1, min(horizon,
                                         int(tgt / max(self._tok_ms_ema, 1e-6))))
                # power-of-2 bucket: every distinct horizon compiles its
                # own fused scan graph (minutes each via the remote-compile
                # relay), and the remaining-budget clamp otherwise produces
                # arbitrary values near the end of each request
                if horizon > 1:
                    horizon = 1 << (horizon.bit_length() - 1)
            # static KV window: smallest bucket covering every live position
            # (decode is KV-read bound; short contexts read proportionally
            # less HBM). Costs one decode compile per bucket, so it is
            # config-gated (generation.decode_buckets levels; 0 = off).
            window = self.max_seq_len
            n_buckets = int(self.config.generation.decode_buckets)
            from tpuserve.parallel.sharding import mesh_sp
            if mesh_sp(self.mesh) > 1:
                n_buckets = 0  # sp decode reads full L (window is ignored
                # by the seq island; buckets would only add recompiles)
            if n_buckets > 0:
                last_pos = max_pos + horizon - 1  # last position the scan writes
                smallest = max(64, self.max_seq_len >> n_buckets)
                window = smallest
                while window <= last_pos:
                    window *= 2
                window = min(window, self.max_seq_len)
            if self.ptm is not None and horizon > 1:
                # page chains must cover every position the horizon writes
                for i in active:
                    try:
                        self.ptm.ensure(i, self._slots[i].next_pos + horizon)
                    except Exception:
                        horizon = 1
                        break
            # ---- speculative decoding (prompt-lookup): when every active
            # slot is unpenalized and at least one has a draft, verify all
            # drafts in ONE dispatch. Greedy slots accept the argmax-matching
            # prefix (outputs exactly the greedy sequence); sampled slots use
            # point-mass rejection sampling (spec_accept) — outputs are
            # distributed exactly as token-by-token sampling. Only the
            # repetition penalty disables speculation: its presence mask
            # would have to evolve inside the accepted run.
            spec_k = int(getattr(self.config.generation, "speculation_tokens", 0) or 0)
            if (spec_k > 0 and self._verify_jit is not None
                    and not self._spec_disabled
                    and self._pending.empty() and self._chunking is None
                    and all(self._slots[i].request.repetition_penalty == 1.0
                            and not self._slots[i].request.aborted
                            for i in active)):
                if self._spec_step(active, positions, tokens, spec_k):
                    continue
            try:
                self._publish(("decode", tokens, positions, window, horizon))
                t_disp = time.monotonic()
                step_tokens, step_lps = self._dev_decode(
                    tokens, positions, window, horizon)  # [H, S] each
                # per-token EMA for the adaptive horizon (np.asarray above is
                # a real host fetch, so the window covers device work). The
                # first sample of a (window, horizon) combo includes compile
                # time — the EMA starts high, collapses the horizon, then
                # converges down as steady-state samples arrive (0.7 decay).
                per_tok = (time.monotonic() - t_disp) * 1000.0 / step_tokens.shape[0]
                self._tok_ms_ema = per_tok if self._tok_ms_ema is None \
                    else 0.7 * self._tok_ms_ema + 0.3 * per_tok
                self._horizon_last = horizon
            except Exception as e:
                for i in active:
                    st = self._slots[i]
                    st.request.error = str(e)
                    st.request.token_queue.put(None)
                    st.request.done.set()
                    self._slots[i] = None
                continue
            self.steps += step_tokens.shape[0]
            for h in range(step_tokens.shape[0]):
                for i in list(active):
                    st = self._slots[i]
                    if st is None or self._slots[i] is None:
                        continue
                    st.next_pos += 1
                    st.generated += 1
                    st.last_token = int(step_tokens[h, i])
                    self._emit(st.request, st.last_token, float(step_lps[h, i]))
                    if self._retire_if_done(st):
                        # tokens the scan produced past EOS/limit for this
                        # slot are discarded; its cache tail is masked by
                        # position on every future read
                        self._slots[i] = None
                        active.remove(i)
                        if self.ptm is not None:
                            self.ptm.release(i)
