"""Paged KV cache tests: allocator bookkeeping (native or fallback), paged
model math == contiguous math, engine equivalence, page exhaustion, and
capacity behavior beyond the contiguous reservation model."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.repository.config import ModelConfig
from tpuserve.serving.engine import GenerationEngine
from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager, make_allocator
from tpuserve.utils.errors import ResourceExhaustedError

P = LlamaParams.tiny()


class TestPageTableManager:
    def test_alloc_grow_release(self):
        ptm = PageTableManager(n_pages=9, page_size=16, n_slots=2, max_len=64)
        assert ptm.free_pages == 8  # page 0 reserved
        ptm.ensure(0, 20)  # 2 pages
        assert ptm.free_pages == 6
        table = np.asarray(ptm.device_table())
        assert (table[0][:2] > 0).all() and (table[0][2:] == 0).all()
        assert (table[1] == 0).all()
        ptm.ensure(0, 33)  # grows to 3, keeps existing pages
        table2 = np.asarray(ptm.device_table())
        np.testing.assert_array_equal(table2[0][:2], table[0][:2])
        assert table2[0][2] > 0
        ptm.release(0)
        assert ptm.free_pages == 8
        assert (np.asarray(ptm.device_table()) == 0).all()

    def test_exhaustion_raises(self):
        ptm = PageTableManager(n_pages=3, page_size=16, n_slots=2, max_len=64)
        ptm.ensure(0, 32)  # 2 pages = all
        with pytest.raises(ResourceExhaustedError):
            ptm.ensure(1, 16)

    def test_zero_page_never_allocated(self):
        ptm = PageTableManager(n_pages=5, page_size=16, n_slots=4, max_len=64)
        for s in range(4):
            ptm.ensure(s, 16)
        table = np.asarray(ptm.device_table())
        assert (table[:, 0] != 0).all()
        assert len(set(table[:, 0].tolist())) == 4  # distinct pages


class TestPagedModelMath:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_paged_matches_contiguous(self, quantized):
        """prefill+decode through pages == contiguous cache, same tokens."""
        params = llama.init_params(jax.random.PRNGKey(0), P, dtype=jnp.float32)
        prompt = [5, 17, 100, 42, 7]
        ps, n_pages, max_len = 16, 9, 64

        # contiguous reference
        cacheC = KVCache.create(P, 2, max_len, quantized=quantized, dtype=jnp.float32)
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, : len(prompt)] = prompt
        logitsC, cacheC = llama.prefill(
            params, P, jnp.asarray(tokens), cacheC, jnp.int32(0), jnp.int32(len(prompt))
        )

        # paged
        cacheP = PagedKVCache.create(P, n_pages, ps, quantized=quantized, dtype=jnp.float32)
        ptm = PageTableManager(n_pages, ps, n_slots=2, max_len=max_len)
        ptm.ensure(0, 16)  # bucket
        logitsP, cacheP = llama.prefill_paged(
            params, P, jnp.asarray(tokens), cacheP, ptm.device_table(),
            jnp.int32(0), jnp.int32(len(prompt)),
        )
        np.testing.assert_allclose(
            np.asarray(logitsP), np.asarray(logitsC), rtol=1e-4, atol=1e-4
        )

        # several decode steps, both paths fed identical tokens
        tokC = tokP = int(np.argmax(np.asarray(logitsC)[0]))
        pos = len(prompt)
        for _ in range(4):
            t = np.array([tokC, 0], np.int32)
            pv = np.array([pos, -1], np.int32)
            logitsC, cacheC = llama.decode_step(params, P, jnp.asarray(t), cacheC, jnp.asarray(pv))
            ptm.ensure(0, pos + 1)
            logitsP, cacheP = llama.decode_step_paged(
                params, P, jnp.asarray(np.array([tokP, 0], np.int32)), cacheP,
                ptm.device_table(), jnp.asarray(pv),
            )
            np.testing.assert_allclose(
                np.asarray(logitsP)[0], np.asarray(logitsC)[0], rtol=1e-3, atol=1e-3
            )
            tokC = int(np.argmax(np.asarray(logitsC)[0]))
            tokP = int(np.argmax(np.asarray(logitsP)[0]))
            assert tokP == tokC
            pos += 1

    @pytest.mark.parametrize("flat", [False, True])
    def test_paged_pallas_kernel_matches_xla(self, monkeypatch, flat):
        """decode_step_paged's wide paged kernel (page table in the scalar-
        prefetch index map) must match the XLA gather path."""
        import tpuserve.models.llama as llama_mod
        import tpuserve.ops.decode_attention as da_mod

        params = llama.init_params(jax.random.PRNGKey(0), P, dtype=jnp.float32)
        prompt = [5, 17, 100, 42, 7]
        ps, n_pages = 16, 9
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, : len(prompt)] = prompt

        def run(mode):
            cache = PagedKVCache.create(P, n_pages, ps, quantized=True, flat=flat)
            ptm = PageTableManager(n_pages, ps, n_slots=2, max_len=64)
            ptm.ensure(0, 16)
            _, cache = llama.prefill_paged(
                params, P, jnp.asarray(tokens), cache, ptm.device_table(),
                jnp.int32(0), jnp.int32(len(prompt)))
            if mode == "pallas":
                monkeypatch.setattr(llama_mod, "_decode_attn_mode", lambda _p: mode)
                orig = da_mod.decode_attention_wide_paged
                monkeypatch.setattr(
                    da_mod, "decode_attention_wide_paged",
                    lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
            t = jnp.asarray(np.array([11, 0], np.int32))
            pv = jnp.asarray(np.array([len(prompt), -1], np.int32))
            logits, _ = llama.decode_step_paged(
                params, P, t, cache, ptm.device_table(), pv)
            return np.asarray(logits)

        logits_xla = run("xla")
        logits_pl = run("pallas")
        np.testing.assert_allclose(logits_pl[0], logits_xla[0], rtol=5e-2, atol=5e-2)
        assert np.all(logits_pl[1] == 0.0)


def _paged_repo(tmp_path, name="paged_llm", paged=True, num_pages=0, max_slots=3,
                **gen_extra):
    vdir = os.path.join(str(tmp_path), name, "1")
    os.makedirs(vdir, exist_ok=True)
    cfg = {
        "name": name, "platform": "llm", "architecture": "llama",
        "model_params": {"vocab_size": P.vocab_size, "dim": P.dim,
                          "n_layers": P.n_layers, "n_heads": P.n_heads,
                          "n_kv_heads": P.n_kv_heads, "head_dim": P.head_dim,
                          "ffn_dim": P.ffn_dim, "init": "random"},
        "generation": {"max_seq_len": 64, "max_slots": max_slots, "page_size": 16,
                        "paged": paged, "num_pages": num_pages,
                        "eos_token_id": 2, "max_new_tokens": 6, **gen_extra},
        "quantization": {"kv_cache": "int8"},
    }
    with open(os.path.join(vdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    return vdir


class TestPagedEngine:
    def test_paged_engine_matches_contiguous(self, tmp_path):
        vd_p = _paged_repo(tmp_path, "paged_llm", paged=True)
        vd_c = _paged_repo(tmp_path, "contig_llm", paged=False)
        eng_p = GenerationEngine(vd_p, ModelConfig.from_file(os.path.join(vd_p, "config.json")))
        eng_c = GenerationEngine(vd_c, ModelConfig.from_file(os.path.join(vd_c, "config.json")))
        eng_p.start()
        eng_c.start()
        try:
            for prompt in ([5, 17, 100], [9, 9], [3, 1, 4, 1, 5]):
                rp = eng_p.generate(prompt, max_new_tokens=5)
                rc = eng_c.generate(prompt, max_new_tokens=5)
                assert rp["output_ids"] == rc["output_ids"]
            # all pages returned after retirement
            assert eng_p.ptm.free_pages == eng_p.ptm._alloc.total_pages
        finally:
            eng_p.stop()
            eng_c.stop()

    def test_page_exhaustion_fails_request_cleanly(self, tmp_path):
        # pool of 3 usable pages; one slot's 16-token bucket = 1 page, so the
        # third concurrent long generation runs out mid-decode or at admit
        vdir = _paged_repo(tmp_path, "tight_llm", num_pages=4, max_slots=3)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            # total need per request: 14 prompt + 10 new = 24 tokens = 2 pages;
            # 3 concurrent requests x 2 > 3 usable pages -> some must fail,
            # and their released pages let at least one finish
            reqs = [eng.submit([7] * 14, max_new_tokens=10) for _ in range(3)]
            done = [r.done.wait(timeout=120) for r in reqs]
            assert all(done)
            outcomes = [(r.error, r.finish_reason, len(r.output_ids)) for r in reqs]
            finished_ok = [o for o in outcomes if o[0] is None]
            exhausted = [o for o in outcomes if o[0] is not None]
            assert finished_ok, outcomes  # someone made progress
            for err, reason, _ in exhausted:
                assert "exhausted" in err.lower() or reason == "kv_pages_exhausted"
            # pool fully recovered
            assert eng.ptm.free_pages == eng.ptm._alloc.total_pages
        finally:
            eng.stop()

    def test_capacity_beats_contiguous_reservation(self, tmp_path):
        """With page_size 16 and a pool of 8 usable pages, 3 slots x 64-token
        reservation would need 12 pages — but short sequences fit fine."""
        vdir = _paged_repo(tmp_path, "cap_llm", num_pages=9, max_slots=3)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            results = [eng.generate([5, 9, 2 + i], max_new_tokens=4) for i in range(4)]
            assert all(r["num_generated"] >= 1 for r in results)
        finally:
            eng.stop()


class TestPrefixSharing:
    """Page-granular prompt-prefix sharing (generation.prefix_sharing):
    hash-chained full-page blocks, refcounts, LRU eviction."""

    def test_admit_shared_match_and_refcount(self):
        ptm = PageTableManager(n_pages=17, page_size=4, n_slots=4, max_len=32,
                               prefix_sharing=True)
        prompt = list(range(10))  # 2 full pages + 2-token tail
        assert ptm.admit_shared(0, prompt) == (8, 0)  # registered, no match
        ptm.ensure(0, 10)
        assert ptm.admit_shared(1, prompt) == (8, 8)  # full prefix hit
        ptm.ensure(1, 10)
        t = np.asarray(ptm.device_table())
        np.testing.assert_array_equal(t[0][:2], t[1][:2])  # same shared pages
        assert t[0][2] != t[1][2]  # private tails differ
        # diverging prompt shares only the first block
        _, matched = ptm.admit_shared(2, prompt[:4] + [99] * 6)
        assert matched == 4
        # shorter than a page: nothing shareable
        assert ptm.admit_shared(3, [1, 2, 3]) == (0, 0)
        # hash CHAIN: same block content under a different prefix must miss
        ptm.release(3)
        _, matched = ptm.admit_shared(3, [99] * 4 + prompt[4:8] + [1, 2])
        assert matched == 0

    def test_final_token_never_shared(self):
        """An exact-multiple prompt keeps its last page private so prefill
        always has >= 1 token to produce first-token logits from."""
        ptm = PageTableManager(n_pages=9, page_size=4, n_slots=2, max_len=32,
                               prefix_sharing=True)
        shared, _ = ptm.admit_shared(0, [1, 2, 3, 4, 5, 6, 7, 8])
        assert shared == 4  # (l-1)//ps = 1 block

    def test_lru_eviction_under_pressure(self):
        ptm = PageTableManager(n_pages=5, page_size=4, n_slots=2, max_len=16,
                               prefix_sharing=True)  # 4 usable pages
        ptm.admit_shared(0, list(range(9)))  # registers 2 blocks
        ptm.ensure(0, 9)  # +1 private
        ptm.release(0)  # private freed; blocks stay cached at refcount 0
        assert ptm.cached_blocks == 2
        # a different prompt needing all 4 pages forces LRU eviction
        shared, matched = ptm.admit_shared(1, [50 + i for i in range(13)])
        assert (shared, matched) == (12, 0)
        ptm.ensure(1, 13)
        assert ptm.cached_blocks == 3  # old 2 evicted, 3 new cached
        ptm.release(1)

    def test_referenced_blocks_never_evicted(self):
        ptm = PageTableManager(n_pages=4, page_size=4, n_slots=2, max_len=16,
                               prefix_sharing=True)  # 3 usable pages
        ptm.admit_shared(0, list(range(9)))  # 2 blocks, refcount 1
        ptm.ensure(0, 9)  # +1 private: pool full
        with pytest.raises(ResourceExhaustedError):
            ptm.ensure(1, 16)  # nothing evictable (blocks referenced)
        assert ptm.cached_blocks == 2


class TestPrefixSharingModelMath:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_suffix_prefill_matches_full(self, quantized):
        """Admitting a matched prompt via prefill_paged_suffix must produce
        the same last-token logits and the same decode continuation as a
        fresh full prefill of the identical prompt."""
        params = llama.init_params(jax.random.PRNGKey(0), P, dtype=jnp.float32)
        ps, n_pages, max_len = 8, 17, 64
        rng = np.random.default_rng(4)
        prompt = rng.integers(3, P.vocab_size, size=21).tolist()

        ptm = PageTableManager(n_pages, ps, n_slots=2, max_len=max_len,
                               prefix_sharing=True)
        cache = PagedKVCache.create(P, n_pages, ps, quantized=quantized,
                                    dtype=jnp.float32)
        # slot 0 registers the blocks and prefills them (the writer)
        assert ptm.admit_shared(0, prompt) == (16, 0)
        ptm.ensure(0, 32)
        tokens = np.zeros((1, 32), np.int32)
        tokens[0, : len(prompt)] = prompt
        logits0, cache = llama.prefill_paged(
            params, P, jnp.asarray(tokens), cache, ptm.device_table(),
            jnp.int32(0), jnp.int32(len(prompt)))

        # slot 1 matches the 2-block prefix and prefills only the suffix
        shared, matched = ptm.admit_shared(1, prompt)
        assert matched == 16
        ptm.ensure(1, 32)
        suffix = prompt[16:]
        stoks = np.zeros((1, 8), np.int32)
        stoks[0, : len(suffix)] = suffix
        logits1, cache = llama.prefill_paged_suffix(
            params, P, jnp.asarray(stoks), cache, ptm.device_table(),
            jnp.int32(1), jnp.int32(16), jnp.int32(len(suffix)), window=32)
        tol = dict(rtol=2e-2, atol=2e-2) if quantized else dict(rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(logits1), np.asarray(logits0), **tol)

        # decode continuation: both slots carry the same context
        tok = int(np.argmax(np.asarray(logits0)[0]))
        pos = len(prompt)
        for _ in range(3):
            ptm.ensure(0, pos + 1)
            ptm.ensure(1, pos + 1)
            logits, cache = llama.decode_step_paged(
                params, P, jnp.asarray(np.array([tok, tok], np.int32)), cache,
                ptm.device_table(), jnp.asarray(np.array([pos, pos], np.int32)))
            l0, l1 = np.asarray(logits)[0], np.asarray(logits)[1]
            np.testing.assert_allclose(l1, l0, **tol)
            assert int(np.argmax(l0)) == int(np.argmax(l1))
            tok = int(np.argmax(l0))
            pos += 1


class TestPrefixSharingEngine:
    def _repo(self, tmp_path, name, sharing):
        vdir = os.path.join(str(tmp_path), name, "1")
        os.makedirs(vdir, exist_ok=True)
        cfg = {
            "name": name, "platform": "llm", "architecture": "llama",
            "model_params": {"vocab_size": P.vocab_size, "dim": P.dim,
                              "n_layers": P.n_layers, "n_heads": P.n_heads,
                              "n_kv_heads": P.n_kv_heads, "head_dim": P.head_dim,
                              "ffn_dim": P.ffn_dim, "init": "random"},
            "generation": {"max_seq_len": 64, "max_slots": 3, "page_size": 16,
                            "paged": True, "prefix_sharing": sharing,
                            "eos_token_id": 2, "max_new_tokens": 8},
            "quantization": {"kv_cache": "int8"},
        }
        with open(os.path.join(vdir, "config.json"), "w") as f:
            json.dump(cfg, f)
        return vdir

    def test_sharing_engine_matches_plain(self, tmp_path):
        """Same greedy outputs with sharing on/off; the second admission of
        a shared prefix is served from the block cache."""
        vd_s = self._repo(tmp_path, "share_llm", True)
        vd_p = self._repo(tmp_path, "plain_llm", False)
        eng_s = GenerationEngine(vd_s, ModelConfig.from_file(os.path.join(vd_s, "config.json")))
        eng_p = GenerationEngine(vd_p, ModelConfig.from_file(os.path.join(vd_p, "config.json")))
        eng_s.start()
        eng_p.start()
        try:
            rng = np.random.default_rng(9)
            prefix = rng.integers(3, P.vocab_size, size=32).tolist()
            prompts = [prefix + [7, 8], prefix + [9, 10, 11], prefix[:16] + [4] * 5]
            for prompt in prompts:
                rs = eng_s.generate(prompt, max_new_tokens=6)
                rp = eng_p.generate(prompt, max_new_tokens=6)
                assert rs["output_ids"] == rp["output_ids"], prompt
            assert eng_s.ptm.prefix_hits > 0
            assert eng_s.ptm.prefix_hit_tokens >= 32 + 16
            assert eng_p.ptm.prefix_hits == 0
            # retired slots free their private pages; only cached blocks stay
            held = eng_s.ptm._alloc.total_pages - eng_s.ptm.free_pages
            assert held == eng_s.ptm.cached_blocks
        finally:
            eng_s.stop()
            eng_p.stop()


def test_allocator_backend_selection():
    alloc = make_allocator(8, 16)
    from tpuserve.bindings import native

    if native.available():
        assert type(alloc).__name__ == "NativeKvAllocator"
    assert alloc.ensure(1, 20)
    assert alloc.page_table(1) is not None and len(alloc.page_table(1)) == 2
    assert alloc.release(1)


class TestPagedChunkedPrefill:
    """Paged long-prompt admission in chunks (rides the prefix-sharing
    suffix path: every chunk is a page-aligned suffix prefill)."""

    def test_paged_chunked_matches_unchunked(self, tmp_path):
        prompt = list(range(3, 44))  # 41 tokens > chunk 16
        vd_a = _paged_repo(tmp_path, "pchunk_off")
        vd_b = _paged_repo(tmp_path, "pchunk_on", prefill_chunk=16)
        outs = {}
        for name, vd in (("off", vd_a), ("on", vd_b)):
            eng = GenerationEngine(vd, ModelConfig.from_file(os.path.join(vd, "config.json")))
            eng.start()
            try:
                outs[name] = eng.generate(prompt, max_new_tokens=6)["output_ids"]
            finally:
                eng.stop()
        assert outs["off"] == outs["on"]

    def test_paged_chunked_with_prefix_sharing(self, tmp_path):
        """Second request shares the first's prefix pages; only the suffix
        chunks prefill. Tokens identical to a fresh engine."""
        prompt = list(range(3, 44))
        vd = _paged_repo(tmp_path, "pchunk_share", prefill_chunk=16,
                         prefix_sharing=True)
        eng = GenerationEngine(vd, ModelConfig.from_file(os.path.join(vd, "config.json")))
        eng.start()
        try:
            r1 = eng.generate(prompt, max_new_tokens=6)
            hits0 = eng.ptm.prefix_hit_tokens
            r2 = eng.generate(prompt, max_new_tokens=6)
            assert eng.ptm.prefix_hit_tokens > hits0  # cache actually hit
            assert r1["output_ids"] == r2["output_ids"]
        finally:
            eng.stop()

    def test_paged_chunk_must_be_page_multiple(self, tmp_path):
        from tpuserve.utils.errors import BackendError

        vd = _paged_repo(tmp_path, "pchunk_bad", prefill_chunk=24)
        eng = GenerationEngine(vd, ModelConfig.from_file(os.path.join(vd, "config.json")))
        with pytest.raises(BackendError):
            eng.start()


class TestRunAffineAllocation:
    """Round-4 allocation policy: chains should be physically contiguous
    (native/src/kv_allocator.cpp policy; _PyKvAllocator mirrors it).
    Scattered chains cost ~7% decode throughput (STATUS.md r3 sweep)."""

    @staticmethod
    def _n_runs(chain):
        return 1 + sum(1 for a, b in zip(chain, chain[1:]) if b != a + 1)

    @staticmethod
    def _py_alloc(n_pages, page_size):
        from tpuserve.serving.paged_kv import _PyKvAllocator

        return _PyKvAllocator(n_pages, page_size)

    def _allocators(self, n_pages, page_size):
        out = [self._py_alloc(n_pages, page_size)]
        from tpuserve.bindings import native

        if native.available():
            out.append(native.NativeKvAllocator(n_pages, page_size))
        return out

    def test_bulk_allocation_is_one_run(self):
        for alloc in self._allocators(64, 16):
            for s in range(4):
                assert alloc.ensure(s, 16 * 8)  # 8 pages at once
            for s in range(4):
                chain = alloc.page_table(s)
                assert self._n_runs(chain) == 1, (type(alloc).__name__, chain)

    def test_interleaved_growth_stays_contiguous(self):
        # the decode steady state: slots cross page boundaries one page at
        # a time, staggered — soft tail reservations keep each chain in
        # few (not n_pages) physical runs
        for alloc in self._allocators(256, 16):
            for step in range(1, 13):
                for s in range(4):
                    assert alloc.ensure(s, 16 * step)
            for s in range(4):
                chain = alloc.page_table(s)
                assert len(chain) == 12
                assert self._n_runs(chain) <= 3, (type(alloc).__name__, chain)

    def test_reservations_are_soft(self):
        # reservations must not block allocation when the pool is tight:
        # seq 0 takes 2 pages (reserving a continuation), seq 1 must still
        # be able to take every remaining page
        for alloc in self._allocators(8, 16):
            assert alloc.ensure(0, 32)  # 2 pages + soft reservation
            assert alloc.free_pages == 6
            assert alloc.ensure(1, 16 * 6)  # all 6 remaining
            assert alloc.free_pages == 0
            assert len(alloc.page_table(1)) == 6

    def test_native_matches_python_exactly(self):
        from tpuserve.bindings import native

        if not native.available():
            pytest.skip("native lib not built")
        py = self._py_alloc(128, 16)
        nat = native.NativeKvAllocator(128, 16)
        rng = np.random.default_rng(7)
        sizes = {}
        for it in range(300):
            op = rng.integers(0, 10)
            seq = int(rng.integers(0, 8))
            if op < 7:
                sizes[seq] = sizes.get(seq, 0) + int(rng.integers(1, 40))
                rp, rn = py.ensure(seq, sizes[seq]), nat.ensure(seq, sizes[seq])
                assert rp == rn, (it, seq, sizes[seq])
                if not rp:
                    sizes.pop(seq)
                    py.release(seq)
                    nat.release(seq)
            else:
                sizes.pop(seq, None)
                assert py.release(seq) == nat.release(seq)
            assert py.free_pages == nat.free_pages, it
        for seq in sizes:
            assert py.page_table(seq) == list(nat.page_table(seq)), seq
