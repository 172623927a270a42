"""Packed INT4 KV cache: pack/unpack roundtrip, the wide kernel's
two-half-dot unpack vs the XLA reference, and the end-to-end serving path.

The decode step is HBM-bound at ~97% of the chip's deliverable bandwidth
(docs/design.md), so halving KV bytes is a direct step-time lever; the
accuracy gate for the scheme (per-(pos, head) scales, qmax 7) is measured
at KL ~0.0096 on the real serving path (ACCURACY.json kv_int4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models import llama
from tpuserve.models.llama import (
    KVCache,
    LlamaParams,
    pack_kv_codes,
    unpack_kv_codes,
)
from tpuserve.ops.decode_attention import decode_attention_wide_cache


class TestPacking:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        codes = jnp.asarray(rng.integers(-8, 8, (3, 5, 256)).astype(np.int8))
        packed = pack_kv_codes(codes)
        assert packed.dtype == jnp.uint8 and packed.shape == (3, 5, 128)
        np.testing.assert_array_equal(np.asarray(unpack_kv_codes(packed)),
                                      np.asarray(codes))

    def test_create_int4(self):
        p = LlamaParams.tiny()
        c = KVCache.create(p, 2, 32, quantized=True, flat=True, kv_bits=4)
        assert c.k.dtype == jnp.uint8
        assert c.k.shape[-1] == p.n_kv_heads * p.head_dim // 2
        assert c.kv_bits == 4 and c.quantized
        with pytest.raises(ValueError):
            KVCache.create(p, 2, 32, quantized=True, flat=False, kv_bits=4)


def _mk_case(seed=0, s_dim=4, n_kv=4, rep=2, hd=128, l_max=256, n_layers=2):
    rng = np.random.default_rng(seed)
    n_heads = n_kv * rep
    w = n_kv * hd
    q = jnp.asarray(rng.normal(size=(s_dim, n_heads, hd)).astype(np.float32))
    codes_k = rng.integers(-8, 8, (n_layers, s_dim, l_max, w)).astype(np.int8)
    codes_v = rng.integers(-8, 8, (n_layers, s_dim, l_max, w)).astype(np.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.05, (s_dim, n_kv, l_max)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.01, 0.05, (s_dim, n_kv, l_max)).astype(np.float32))
    positions = jnp.asarray([l_max - 1, 17, 0, -1][:s_dim], jnp.int32)
    return q, codes_k, codes_v, ks, vs, positions


def _xla_ref(q, codes_k, codes_v, ks, vs, positions, n_kv, hd, layer=1):
    """Dense reference over the int4 CODES (so only the kernel's packing/
    unpacking and P-quantization differ)."""
    s_dim, n_heads, _ = q.shape
    rep = n_heads // n_kv
    l_max = codes_k.shape[2]
    k = codes_k[layer].reshape(s_dim, l_max, n_kv, hd).astype(np.float32)
    v = codes_v[layer].reshape(s_dim, l_max, n_kv, hd).astype(np.float32)
    k = k * np.asarray(ks).transpose(0, 2, 1)[:, :, :, None]
    v = v * np.asarray(vs).transpose(0, 2, 1)[:, :, :, None]
    out = np.zeros((s_dim, n_heads, hd), np.float32)
    for si in range(s_dim):
        pos = int(positions[si])
        if pos < 0:
            continue
        for h in range(n_heads):
            g = h // rep
            scores = (np.asarray(q)[si, h] @ k[si, : pos + 1, g].T)
            scores -= scores.max()
            pr = np.exp(scores) / np.exp(scores).sum()
            out[si, h] = pr @ v[si, : pos + 1, g]
    return out


class TestWideCacheInt4:
    def test_kernel_matches_xla_reference(self):
        q, ck, cv, ks, vs, positions = _mk_case()
        kf = pack_kv_codes(jnp.asarray(ck))
        vf = pack_kv_codes(jnp.asarray(cv))
        out = decode_attention_wide_cache(
            q, kf, vf, ks, vs, positions, 1, interpret=True)
        ref = _xla_ref(q, ck, cv, ks, vs, positions, n_kv=4, hd=128)
        live = np.asarray(positions) >= 0
        # atol covers the kernel's int8 P@V requantization noise (~5e-3 of
        # the row max) on near-zero outputs
        np.testing.assert_allclose(np.asarray(out)[live], ref[live],
                                   rtol=5e-2, atol=8e-3)

    def test_rejects_unaligned_w(self):
        q, ck, cv, ks, vs, positions = _mk_case(n_kv=1, rep=8, hd=128)
        with pytest.raises(ValueError):
            decode_attention_wide_cache(
                q, pack_kv_codes(jnp.asarray(ck)), pack_kv_codes(jnp.asarray(cv)),
                ks, vs, positions, 0, interpret=True)


class TestMultiCandidateInt4:
    def test_multi_kernel_matches_single(self):
        """C=1 multi-candidate over an int4 cache == the single wide kernel
        (same math, candidate-major plumbing)."""
        from tpuserve.ops.decode_attention import decode_attention_wide_cache_multi

        q, ck, cv, ks, vs, positions = _mk_case()
        kf = pack_kv_codes(jnp.asarray(ck))
        vf = pack_kv_codes(jnp.asarray(cv))
        single = decode_attention_wide_cache(
            q, kf, vf, ks, vs, positions, 1, interpret=True)
        multi = decode_attention_wide_cache_multi(
            q[:, None], kf, vf, ks, vs, positions, 1, interpret=True)
        live = np.asarray(positions) >= 0
        np.testing.assert_allclose(np.asarray(multi[:, 0])[live],
                                   np.asarray(single)[live],
                                   rtol=2e-2, atol=4e-3)

    def test_multi_kernel_candidates_match_reference(self):
        """C=3 rows see growing causal horizons over the packed cache."""
        from tpuserve.ops.decode_attention import decode_attention_wide_cache_multi

        cands = 3
        q1, ck, cv, ks, vs, _ = _mk_case(s_dim=2)
        rng = np.random.default_rng(7)
        q = jnp.asarray(rng.normal(size=(2, cands, 8, 128)).astype(np.float32))
        positions = jnp.asarray([100, 9], jnp.int32)
        kf = pack_kv_codes(jnp.asarray(ck))
        vf = pack_kv_codes(jnp.asarray(cv))
        out = decode_attention_wide_cache_multi(
            q, kf, vf, ks, vs, positions, 0, interpret=True)
        for c in range(cands):
            ref = _xla_ref(np.asarray(q[:, c]), ck, cv, ks, vs,
                           positions + c, n_kv=4, hd=128, layer=0)
            np.testing.assert_allclose(np.asarray(out[:, c]), ref,
                                       rtol=5e-2, atol=8e-3)


class TestServingPathInt4:
    def test_decode_close_to_fp_cache(self):
        """Full prefill + decode on flat int4 vs fp32 caches (the XLA read
        path on CPU): next-token distributions must stay close."""
        p = LlamaParams.tiny()
        params = llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        ctx, dec = 24, 8
        prompt = rng.integers(0, p.vocab_size, (1, ctx)).astype(np.int32)

        def run(kv_bits):
            if kv_bits == 0:
                cache = KVCache.create(p, 1, ctx + dec + 1, quantized=False,
                                       dtype=jnp.float32, flat=True)
            else:
                cache = KVCache.create(p, 1, ctx + dec + 1, quantized=True,
                                       flat=True, kv_bits=kv_bits)
            logits, cache = llama.prefill(
                params, p, jnp.asarray(prompt), cache, jnp.int32(0),
                jnp.int32(ctx))
            rows = []
            tok = int(jnp.argmax(logits[0]))
            for t in range(dec):
                lg, cache = llama.decode_step(
                    params, p, jnp.asarray([tok], jnp.int32), cache,
                    jnp.asarray([ctx + t], jnp.int32))
                lf = np.asarray(lg[0], np.float64)
                m = lf.max()
                rows.append(lf - m - np.log(np.exp(lf - m).sum()))
                tok = int(lf.argmax())
            return np.stack(rows)

        lp_fp, lp4 = run(0), run(4)
        kl = float((np.exp(lp_fp) * (lp_fp - lp4)).sum(-1).mean())
        assert kl < 0.05, kl

    def test_chunked_prefill_int4(self):
        """Chunked prefill reads the packed cache back (unpack path)."""
        p = LlamaParams.tiny()
        params = llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        ctx = 32
        prompt = jnp.asarray(rng.integers(0, p.vocab_size, (1, ctx)).astype(np.int32))

        cache_a = KVCache.create(p, 1, 48, quantized=True, flat=True, kv_bits=4)
        logits_a, _ = llama.prefill(params, p, prompt, cache_a,
                                    jnp.int32(0), jnp.int32(ctx))
        cache_b = KVCache.create(p, 1, 48, quantized=True, flat=True, kv_bits=4)
        start = jnp.int32(0)
        for off in range(0, ctx, 16):
            logits_b, cache_b = llama.prefill_chunk(
                params, p, prompt[:, off : off + 16], cache_b, jnp.int32(0),
                jnp.int32(off), jnp.int32(min(16, ctx - off)),
                jnp.int32(off + 16))
        # full prefill attends over the UNQUANTIZED in-flight k/v and only
        # writes the int4 cache; chunked prefill reads the quantized prefix
        # back — the ~0.03 logit gap IS the int4 read noise, so gate the
        # decision (argmax) and a loose distance
        assert int(np.argmax(logits_a)) == int(np.argmax(logits_b))
        np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                                   rtol=0.1, atol=0.06)


class TestPagedInt4:
    """Round-4: packed int4 KV composed with the paged pool (VERDICT r3
    #7). Pool pages store two codes/byte on the flat W dim; the paged wide
    kernel runs the same biased-nibble two-half-dot unpack per page."""

    def test_pool_create_int4(self):
        from tpuserve.serving.paged_kv import PagedKVCache

        p = LlamaParams.tiny()
        c = PagedKVCache.create(p, 5, 16, quantized=True, flat=True, kv_bits=4)
        assert c.k.dtype == jnp.uint8 and c.kv_bits == 4
        assert c.k.shape[-1] == p.n_kv_heads * p.head_dim // 2
        with pytest.raises(ValueError):
            PagedKVCache.create(p, 5, 16, quantized=True, flat=False, kv_bits=4)

    def test_paged_int4_decode_matches_contiguous_int4(self):
        """Same quantization arithmetic, different storage: paged int4
        must track contiguous int4 step for step."""
        from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager

        p = LlamaParams.tiny()
        params = llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
        prompt = [5, 17, 100, 42, 7]
        ps, n_pages, max_len = 16, 9, 64
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, : len(prompt)] = prompt

        cacheC = KVCache.create(p, 2, max_len, quantized=True, flat=True,
                                kv_bits=4)
        logitsC, cacheC = llama.prefill(params, p, jnp.asarray(tokens), cacheC,
                                        jnp.int32(0), jnp.int32(len(prompt)))
        cacheP = PagedKVCache.create(p, n_pages, ps, quantized=True, flat=True,
                                     kv_bits=4)
        ptm = PageTableManager(n_pages, ps, n_slots=2, max_len=max_len)
        ptm.ensure(0, 16)
        logitsP, cacheP = llama.prefill_paged(
            params, p, jnp.asarray(tokens), cacheP, ptm.device_table(),
            jnp.int32(0), jnp.int32(len(prompt)))
        np.testing.assert_allclose(np.asarray(logitsP), np.asarray(logitsC),
                                   rtol=1e-3, atol=1e-3)
        tok, pos = int(np.argmax(np.asarray(logitsC)[0])), len(prompt)
        for _ in range(4):
            t = jnp.asarray(np.array([tok, 0], np.int32))
            pv = jnp.asarray(np.array([pos, -1], np.int32))
            logitsC, cacheC = llama.decode_step(params, p, t, cacheC, pv)
            ptm.ensure(0, pos + 1)
            logitsP, cacheP = llama.decode_step_paged(
                params, p, t, cacheP, ptm.device_table(), pv)
            np.testing.assert_allclose(np.asarray(logitsP)[0],
                                       np.asarray(logitsC)[0],
                                       rtol=1e-3, atol=1e-3)
            assert int(np.argmax(np.asarray(logitsP)[0])) == \
                int(np.argmax(np.asarray(logitsC)[0]))
            tok = int(np.argmax(np.asarray(logitsC)[0]))
            pos += 1

    def test_paged_kernel_int4_matches_xla(self, monkeypatch):
        """The paged wide kernel's int4 path (interpret mode) vs the XLA
        gather+unpack path, at a kernel-eligible W (W/2 % 128 == 0)."""
        import tpuserve.models.llama as llama_mod
        import tpuserve.ops.decode_attention as da_mod
        from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager

        p = LlamaParams(vocab_size=128, dim=64, n_layers=1, n_heads=4,
                        n_kv_heads=2, head_dim=128, ffn_dim=128)
        params = llama.init_params(jax.random.PRNGKey(1), p, dtype=jnp.float32)
        prompt = [5, 17, 100, 42, 7, 9, 64, 3]
        ps, n_pages = 16, 9
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, : len(prompt)] = prompt

        def run(mode):
            cache = PagedKVCache.create(p, n_pages, ps, quantized=True,
                                        flat=True, kv_bits=4)
            ptm = PageTableManager(n_pages, ps, n_slots=2, max_len=64)
            ptm.ensure(0, 16)
            _, cache = llama.prefill_paged(
                params, p, jnp.asarray(tokens), cache, ptm.device_table(),
                jnp.int32(0), jnp.int32(len(prompt)))
            if mode == "pallas":
                monkeypatch.setattr(llama_mod, "_decode_attn_mode",
                                    lambda _p: mode)
                orig = da_mod.decode_attention_wide_paged
                monkeypatch.setattr(
                    da_mod, "decode_attention_wide_paged",
                    lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
            else:
                monkeypatch.setattr(llama_mod, "_decode_attn_mode",
                                    lambda _p: "xla")
            t = jnp.asarray(np.array([11, 0], np.int32))
            pv = jnp.asarray(np.array([len(prompt), -1], np.int32))
            logits, _ = llama.decode_step_paged(
                params, p, t, cache, ptm.device_table(), pv)
            monkeypatch.undo()
            return np.asarray(logits)

        logits_xla = run("xla")
        logits_pl = run("pallas")
        np.testing.assert_allclose(logits_pl[0], logits_xla[0],
                                   rtol=5e-2, atol=5e-2)
        assert np.all(logits_pl[1] == 0.0)

    def test_paged_int4_engine(self, tmp_path):
        """Paged + int4-KV engine: serves, matches the contiguous int4
        engine token for token, returns its pages."""
        import json
        import os

        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        p = LlamaParams.tiny()

        def repo(name, paged):
            vdir = os.path.join(str(tmp_path), name, "1")
            os.makedirs(vdir, exist_ok=True)
            cfg = {
                "name": name, "platform": "llm", "architecture": "llama",
                "model_params": {"vocab_size": p.vocab_size, "dim": p.dim,
                                 "n_layers": p.n_layers, "n_heads": p.n_heads,
                                 "n_kv_heads": p.n_kv_heads,
                                 "head_dim": p.head_dim, "ffn_dim": p.ffn_dim,
                                 "init": "random"},
                "generation": {"max_seq_len": 64, "max_slots": 3,
                               "page_size": 16, "paged": paged,
                               "eos_token_id": 2, "max_new_tokens": 6},
                "quantization": {"kv_cache": "int4"},
            }
            with open(os.path.join(vdir, "config.json"), "w") as f:
                json.dump(cfg, f)
            return vdir

        vd_p, vd_c = repo("pg4", True), repo("ct4", False)
        eng_p = GenerationEngine(vd_p, ModelConfig.from_file(
            os.path.join(vd_p, "config.json")))
        eng_c = GenerationEngine(vd_c, ModelConfig.from_file(
            os.path.join(vd_c, "config.json")))
        eng_p.start()
        eng_c.start()
        try:
            assert eng_p.cache.kv_bits == 4 and eng_c.cache.kv_bits == 4
            for prompt in ([5, 17, 100], [9, 9], [3, 1, 4, 1, 5]):
                rp = eng_p.generate(prompt, max_new_tokens=5)
                rc = eng_c.generate(prompt, max_new_tokens=5)
                assert rp["output_ids"] == rc["output_ids"]
            assert eng_p.ptm.free_pages == eng_p.ptm._alloc.total_pages
        finally:
            eng_p.stop()
            eng_c.stop()


class TestChunkedPackTP:
    """Round-4: packed int4 KV composed with tensor parallelism (VERDICT
    r3 #7). pack_chunks = tp packs split-half PER SHARD, so the byte
    array shards on head boundaries and every shard_map island reads its
    local bytes with the standard unpack."""

    def test_chunked_roundtrip(self):
        rng = np.random.default_rng(0)
        codes = jnp.asarray(rng.integers(-8, 8, (3, 5, 256)).astype(np.int8))
        for chunks in (1, 2, 4):
            packed = pack_kv_codes(codes, chunks)
            assert packed.shape == (3, 5, 128)
            np.testing.assert_array_equal(
                np.asarray(unpack_kv_codes(packed, chunks)), np.asarray(codes))

    def test_chunked_pack_is_shardable(self):
        """Slicing the chunk-packed bytes on a chunk boundary must equal
        packing the corresponding W slice locally — THE property a tp
        shard relies on."""
        rng = np.random.default_rng(1)
        w, chunks = 256, 4
        codes = jnp.asarray(rng.integers(-8, 8, (6, w)).astype(np.int8))
        packed = pack_kv_codes(codes, chunks)
        wc, wb = w // chunks, w // 2 // chunks
        for c in range(chunks):
            local = np.asarray(packed[:, c * wb:(c + 1) * wb])
            want = np.asarray(pack_kv_codes(codes[:, c * wc:(c + 1) * wc]))
            np.testing.assert_array_equal(local, want)

    def test_decode_tp_matches_single_chip(self):
        """decode_step over a tp mesh with a per-shard-packed int4 cache
        must reproduce the single-chip int4 decode token for token."""
        from tpuserve.parallel import make_mesh
        from tpuserve.parallel.sharding import (
            set_active_mesh, shard_cache, shard_llama_params)

        p = LlamaParams(vocab_size=128, dim=32, n_layers=2, n_heads=4,
                        n_kv_heads=2, head_dim=16, ffn_dim=64)
        params = llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
        prompt = np.zeros((1, 16), np.int32)
        prompt[0, :5] = [5, 17, 100, 42, 7]

        def run(tp):
            mesh = make_mesh(tp=tp, dp=1) if tp > 1 else None
            cache = KVCache.create(p, 2, 48, quantized=True, flat=True,
                                   kv_bits=4, pack_chunks=max(tp, 1))
            if mesh is not None:
                params_r = shard_llama_params(params, mesh)
                cache = shard_cache(cache, mesh)
                set_active_mesh(mesh)
            else:
                params_r = params
            try:
                logits, cache = llama.prefill(
                    params_r, p, jnp.asarray(prompt), cache, jnp.int32(0),
                    jnp.int32(5))
                toks = [int(np.argmax(np.asarray(logits)[0]))]
                pos = 5
                for _ in range(4):
                    t = jnp.asarray(np.array([toks[-1], 0], np.int32))
                    pv = jnp.asarray(np.array([pos, -1], np.int32))
                    lg, cache = llama.decode_step(params_r, p, t, cache, pv)
                    toks.append(int(np.argmax(np.asarray(lg)[0])))
                    pos += 1
            finally:
                set_active_mesh(None)
            return toks

        assert run(1) == run(2)

    def test_engine_accepts_int4_tp(self, tmp_path):
        """The engine must build (and serve) an int4-KV cache under tp,
        packing per shard."""
        import json
        import os

        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        vdir = os.path.join(str(tmp_path), "i4tp", "1")
        os.makedirs(vdir)
        cfg = {
            "name": "i4tp", "platform": "llm", "architecture": "llama",
            "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 2,
                             "n_heads": 4, "n_kv_heads": 2, "head_dim": 16,
                             "ffn_dim": 64, "init": "random"},
            "generation": {"max_seq_len": 48, "max_slots": 2,
                           "eos_token_id": -1, "max_new_tokens": 6},
            "quantization": {"kv_cache": "int4"},
            "sharding": {"tensor_parallel": 2},
        }
        with open(os.path.join(vdir, "config.json"), "w") as f:
            json.dump(cfg, f)
        eng = GenerationEngine(vdir, ModelConfig.from_file(
            os.path.join(vdir, "config.json")))
        eng.start()
        try:
            assert eng.cache.kv_bits == 4 and eng.cache.pack_chunks == 2
            out = eng.generate([5, 9, 13], max_new_tokens=5)
            assert out["num_generated"] == 5
        finally:
            eng.stop()
