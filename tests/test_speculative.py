"""Speculative decoding: batched verification step + prompt-lookup drafts.

No reference counterpart (the reference has no generation machinery);
north-star serving work: accepted drafts amortize the weight stream that
dominates decode, with EXACT greedy outputs (acceptance compares the
model's own argmax, so speculation never changes what is generated).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams

P = LlamaParams(vocab_size=128, dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                head_dim=8, ffn_dim=64)


class TestVerifyStep:
    @pytest.mark.parametrize("quantized", [False, True])
    def test_matches_sequential_decode(self, quantized):
        """verify_step over [t0, t1, t2] == three sequential decode_steps:
        same logits at every position, same final cache."""
        dtype = jnp.float32
        params = llama.init_params(jax.random.PRNGKey(2), P, dtype=dtype)
        n_slots, max_len = 2, 32
        kw = {} if quantized else {"dtype": jnp.float32}
        prompt = jnp.asarray([[7, 11, 23, 5]], jnp.int32)

        cache_a = KVCache.create(P, n_slots, max_len, quantized=quantized, **kw)
        cache_b = KVCache.create(P, n_slots, max_len, quantized=quantized, **kw)
        _, cache_a = llama.prefill(params, P, prompt, cache_a, jnp.int32(0), jnp.int32(4))
        _, cache_b = llama.prefill(params, P, prompt, cache_b, jnp.int32(0), jnp.int32(4))

        chain = [9, 14, 3]
        # sequential reference
        seq_logits = []
        pos = 4
        for t in chain:
            lg, cache_a = llama.decode_step(
                params, P, jnp.asarray([t, 0], jnp.int32), cache_a,
                jnp.asarray([pos, -1], jnp.int32))
            seq_logits.append(np.asarray(lg[0]))
            pos += 1
        # one verification step
        toks = jnp.asarray([[9, 14, 3], [0, 0, 0]], jnp.int32)
        vlogits, cache_b = llama.verify_step(
            params, P, toks, cache_b, jnp.asarray([4, -1], jnp.int32),
            jnp.asarray([3, 0], jnp.int32))
        tol = dict(rtol=5e-2, atol=5e-2) if quantized else dict(rtol=1e-4, atol=1e-4)
        for j in range(3):
            np.testing.assert_allclose(np.asarray(vlogits[0, j]), seq_logits[j], **tol)
        assert np.all(np.asarray(vlogits[1]) == 0.0)  # inactive slot
        # caches agree on the written region
        np.testing.assert_allclose(
            np.asarray(cache_b.k[:, 0, :7], jnp.float32),
            np.asarray(cache_a.k[:, 0, :7], jnp.float32), rtol=1e-5, atol=1e-5)
        if quantized:
            np.testing.assert_allclose(
                np.asarray(cache_b.k_scale[:, 0, :, :7], jnp.float32),
                np.asarray(cache_a.k_scale[:, 0, :, :7], jnp.float32),
                rtol=1e-5, atol=1e-6)

    def test_padded_rows_do_not_corrupt(self):
        """Rows past `lengths` must leave the cache untouched."""
        params = llama.init_params(jax.random.PRNGKey(3), P, dtype=jnp.float32)
        cache = KVCache.create(P, 2, 16, quantized=False, dtype=jnp.float32)
        marker = cache.k.at[:].set(7.0)
        cache = KVCache(k=marker, v=marker, k_scale=None, v_scale=None,
                        flat=cache.flat)
        toks = jnp.asarray([[5, 9, 13], [3, 0, 0]], jnp.int32)
        _, cache = llama.verify_step(
            params, P, toks, cache, jnp.asarray([0, 0], jnp.int32),
            jnp.asarray([3, 1], jnp.int32))
        k = np.asarray(cache.k, np.float32)
        assert not np.any(k[:, 0, :3] == 7.0)   # slot 0 wrote 3 positions
        assert not np.any(k[:, 1, :1] == 7.0)   # slot 1 wrote 1
        assert np.all(k[:, 1, 1:] == 7.0)       # slot 1 padding untouched
        assert np.all(k[:, 0, 3:] == 7.0)


def _write_repo(tmp_path, name, **gen_extra):
    vdir = os.path.join(str(tmp_path), name, "1")
    os.makedirs(vdir, exist_ok=True)
    cfg = {
        "name": name, "platform": "llm", "architecture": "llama",
        "inputs": [{"name": "input_ids", "shape": [1, -1], "data_type": "INT32"}],
        "outputs": [{"name": "output_ids", "shape": [1, -1], "data_type": "INT32"}],
        "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 2,
                          "n_heads": 4, "n_kv_heads": 2, "head_dim": 8,
                          "ffn_dim": 64, "init": "random"},
        "generation": {"max_seq_len": 96, "max_slots": 4, "eos_token_id": 2,
                        "max_new_tokens": 8, **gen_extra},
        "quantization": {"weights": "none", "group_size": 16, "kv_cache": "int8"},
    }
    with open(os.path.join(vdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    return vdir


class TestPromptLookup:
    def test_proposer_matches_history(self):
        from tpuserve.serving.engine import GenerationEngine, Request, _SlotState

        req = Request(prompt_ids=[1, 2, 3, 4, 5, 1, 2, 3], max_new_tokens=8)
        st = _SlotState(request=req, next_pos=8, generated=0, last_token=3)
        eng = GenerationEngine.__new__(GenerationEngine)  # proposer is pure
        prop = eng._propose_lookup(st, k=3, n=3)
        assert prop == [4, 5, 1]  # [1,2,3] recurs at the start; continue it

    def test_proposer_prefers_match_with_full_continuation(self):
        # Repetitive tail: the MOST RECENT occurrence of the trailing
        # n-gram abuts the end of the sequence (1 token of continuation);
        # the proposer must instead copy from an earlier occurrence that
        # has a full k-token continuation, else every verify dispatch
        # delivers ~2 tokens and speculation loses (.r3_spec_bench.log).
        from tpuserve.serving.engine import GenerationEngine, Request, _SlotState

        period = [7, 8, 9, 10, 11, 12]
        hist = period * 5  # trailing [10,11,12] recurs every 6 tokens
        req = Request(prompt_ids=list(hist), max_new_tokens=8)
        st = _SlotState(request=req, next_pos=len(hist), generated=0,
                        last_token=hist[-1])
        eng = GenerationEngine.__new__(GenerationEngine)
        prop = eng._propose_lookup(st, k=5, n=3)
        assert prop == [7, 8, 9, 10, 11]  # full k, not the 0-token tail match

    def test_proposer_falls_back_to_longest_continuation(self):
        from tpuserve.serving.engine import GenerationEngine, Request, _SlotState

        # only one (short-continuation) match exists -> still propose it
        req = Request(prompt_ids=[1, 2, 3, 4, 1, 2, 3], max_new_tokens=8)
        st = _SlotState(request=req, next_pos=7, generated=0, last_token=3)
        eng = GenerationEngine.__new__(GenerationEngine)
        assert eng._propose_lookup(st, k=5, n=3) == [4, 1, 2, 3]

    def test_proposer_no_match(self):
        from tpuserve.serving.engine import GenerationEngine, Request, _SlotState

        req = Request(prompt_ids=[1, 2, 3, 4, 5], max_new_tokens=8)
        st = _SlotState(request=req, next_pos=5, generated=0, last_token=5)
        eng = GenerationEngine.__new__(GenerationEngine)
        assert eng._propose_lookup(st, k=3, n=3) == []


class TestSpeculativeEngine:
    def _gen(self, tmp_path, name, prompt, n_tok, **gen_extra):
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        vdir = _write_repo(tmp_path, name, **gen_extra)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            out = eng.generate(prompt, max_new_tokens=n_tok, logprobs=True)
            stats = eng.serving_stats()
        finally:
            eng.stop()
        return out, stats

    def test_exact_greedy_equivalence(self, tmp_path):
        """Speculation must NEVER change greedy outputs — acceptance
        compares the model's own argmax. Repetitive prompts make the
        lookup fire; random-init weights make most drafts reject: both
        paths are exercised."""
        prompts = [
            [5, 9, 13, 5, 9, 13, 5, 9, 13, 5, 9],  # periodic: lookup fires
            [7, 21, 3, 44, 8, 100, 62],             # aperiodic: no drafts
        ]
        for pi, prompt in enumerate(prompts):
            ref, _ = self._gen(tmp_path, f"spec_ref{pi}", prompt, 16)
            out, stats = self._gen(tmp_path, f"spec_on{pi}", prompt, 16,
                                   speculation_tokens=4)
            assert out["output_ids"] == ref["output_ids"], prompt
            assert out["finish_reason"] == ref["finish_reason"]
            assert len(out["logprobs"]) == out["num_generated"]
        # the periodic prompt must actually have drafted
        _, stats = self._gen(tmp_path, "spec_stats",
                             [5, 9, 13] * 6, 16, speculation_tokens=4)
        assert stats.get("spec_drafted", 0) > 0

    def test_sampled_slots_speculate(self, tmp_path):
        """temperature > 0 no longer disables speculation: sampled slots go
        through point-mass rejection sampling (spec_accept). Free sampling
        on a random-init model rarely produces the n-gram recurrences the
        lookup needs, so this only asserts robust completion; the
        deterministic top_k=1 test below asserts actual drafting."""
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        vdir = _write_repo(tmp_path, "spec_tmp", speculation_tokens=4)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            out = eng.generate([5, 9, 13] * 4, max_new_tokens=8,
                               temperature=0.8, seed=1)
            assert out["num_generated"] >= 1
            assert out.get("finish_reason") in ("eos", "max_new_tokens", "stop")
        finally:
            eng.stop()

    def test_penalized_slots_fall_back(self, tmp_path):
        """repetition_penalty != 1 is the one knob that disables speculation
        (its presence mask would have to evolve inside the accepted run)."""
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        vdir = _write_repo(tmp_path, "spec_pen", speculation_tokens=4)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            out = eng.generate([5, 9, 13] * 4, max_new_tokens=8,
                               repetition_penalty=1.3)
            assert out["num_generated"] >= 1
            assert eng.serving_stats().get("spec_drafted", 0) == 0
        finally:
            eng.stop()

    def test_topk1_sampled_spec_matches_plain(self, tmp_path):
        """top_k=1 makes sampling deterministic (a point mass), so the
        rejection-sampled speculative path must produce exactly the same
        tokens as the plain sampled path — a deterministic end-to-end probe
        of the sampled acceptance machinery."""
        prompt = [5, 9, 13] * 6
        ref, _ = self._gen_sampled(tmp_path, "tk1_ref", prompt, 16)
        out, stats = self._gen_sampled(tmp_path, "tk1_spec", prompt, 16,
                                       speculation_tokens=4)
        assert out["output_ids"] == ref["output_ids"]
        assert stats.get("spec_drafted", 0) > 0

    def _gen_sampled(self, tmp_path, name, prompt, n_tok, **gen_extra):
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        vdir = _write_repo(tmp_path, name, **gen_extra)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            out = eng.generate(prompt, max_new_tokens=n_tok,
                               temperature=0.9, top_k=1, seed=7)
            stats = eng.serving_stats()
        finally:
            eng.stop()
        return out, stats


class TestSpecAccept:
    """Unit tests for the device-side acceptance rule (point-mass rejection
    sampling): exactness is the whole point — emitted tokens must be
    distributed exactly as token-by-token sampling from the processed
    distribution, draft or no draft."""

    def _setup(self, seed=0, s=2, c=3, v=8):
        from tpuserve.serving.sampling import SamplingParams

        rng = np.random.default_rng(seed)
        logits = jnp.asarray(rng.normal(size=(s, c, v)).astype(np.float32))
        params = SamplingParams.create(s)
        return logits, params

    def test_greedy_reproduces_prefix_match(self):
        """temperature<=0 rows: accepted = longest draft prefix matching the
        model's own argmax; final token = argmax at the first mismatch."""
        from tpuserve.serving.sampling import spec_accept

        logits, params = self._setup()
        g = np.asarray(jnp.argmax(logits, axis=-1))  # [S, C]
        # slot 0: draft matches argmax at position 0, mismatches at 1
        draft = np.zeros((2, 3), np.int32)
        draft[0, 1] = g[0, 0]
        draft[0, 2] = (g[0, 1] + 1) % 8
        draft[1, 1] = (g[1, 0] + 3) % 8
        lens = jnp.asarray([3, 2], jnp.int32)
        out, lp, acc = spec_accept(logits, jnp.asarray(draft), lens, params,
                                   jax.random.PRNGKey(0))
        out, acc = np.asarray(out), np.asarray(acc)
        assert acc[0] == 1 and out[0, 0] == g[0, 0] and out[0, 1] == g[0, 1]
        assert acc[1] == 0 and out[1, 0] == g[1, 0]
        # logprobs are under the unfiltered model distribution
        lf = np.asarray(logits[0, 1], np.float64)
        expect = lf[g[0, 1]] - np.log(np.exp(lf).sum())
        np.testing.assert_allclose(np.asarray(lp)[0, 1], expect, rtol=1e-4)

    def test_marginal_first_token_exact(self):
        """The first emitted token's marginal over accept∪residual must be
        EXACTLY p_0 — the defining property of rejection sampling. Monte
        Carlo over 4000 keys, both for a low- and a high-probability draft."""
        from tpuserve.serving.sampling import SamplingParams, spec_accept

        logits, _ = self._setup(seed=3)
        params = SamplingParams.create(2, temperature=1.0)
        p0 = np.asarray(jax.nn.softmax(logits[0, 0]))
        for draft_tok in (int(np.argmax(p0)), int(np.argmin(p0))):
            draft = jnp.asarray(
                [[0, draft_tok, 1], [0, 2, 3]], jnp.int32)
            lens = jnp.asarray([3, 3], jnp.int32)
            keys = jax.random.split(jax.random.PRNGKey(42), 4000)
            outs, _, _ = jax.vmap(
                lambda k: spec_accept(logits, draft, lens, params, k))(keys)
            first = np.asarray(outs)[:, 0, 0]
            freq = np.bincount(first, minlength=8) / len(first)
            np.testing.assert_allclose(freq, p0, atol=0.03)

    def test_conditional_second_token_exact(self):
        """Conditioned on the first draft being accepted, the second emitted
        token must follow p_1 exactly (accept∪residual at position 1)."""
        from tpuserve.serving.sampling import SamplingParams, spec_accept

        logits, _ = self._setup(seed=5)
        params = SamplingParams.create(2, temperature=1.0)
        p1 = np.asarray(jax.nn.softmax(logits[0, 1]))
        draft_tok0 = int(np.argmax(np.asarray(jax.nn.softmax(logits[0, 0]))))
        draft = jnp.asarray([[0, draft_tok0, 2], [0, 1, 1]], jnp.int32)
        lens = jnp.asarray([3, 3], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(7), 6000)
        outs, _, accs = jax.vmap(
            lambda k: spec_accept(logits, draft, lens, params, k))(keys)
        outs, accs = np.asarray(outs), np.asarray(accs)
        sel = outs[accs[:, 0] >= 1, 0, 1]
        assert len(sel) > 500  # the high-prob draft accepts often
        freq = np.bincount(sel, minlength=8) / len(sel)
        np.testing.assert_allclose(freq, p1, atol=0.05)

    def test_masks_respected(self):
        """top_k masking flows into acceptance: a draft outside the top-k is
        always rejected, and the emitted token always lies inside top-k."""
        from tpuserve.serving.sampling import SamplingParams, spec_accept

        logits, _ = self._setup(seed=11, s=1)
        params = SamplingParams.create(1, temperature=1.0, top_k=2)
        order = np.argsort(-np.asarray(logits[0, 0]))
        outside = int(order[5])
        draft = jnp.asarray([[0, outside, 0]], jnp.int32)
        lens = jnp.asarray([2], jnp.int32)
        keys = jax.random.split(jax.random.PRNGKey(1), 200)
        outs, _, accs = jax.vmap(
            lambda k: spec_accept(logits, draft, lens, params, k))(keys)
        assert np.all(np.asarray(accs) == 0)
        assert set(np.asarray(outs)[:, 0, 0]) <= {int(order[0]), int(order[1])}


class TestSpecCompositions:
    def test_spec_with_decode_buckets(self, tmp_path):
        """Speculation + KV window bucketing: windows cover the drafted
        positions; outputs stay exactly greedy."""
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        prompt = [5, 9, 13] * 5
        outs = {}
        for name, extra in (("b_ref", {}),
                            ("b_spec", {"speculation_tokens": 4,
                                         "decode_buckets": 3})):
            vdir = _write_repo(tmp_path, name, **extra)
            eng = GenerationEngine(vdir, ModelConfig.from_file(
                os.path.join(vdir, "config.json")))
            eng.start()
            try:
                outs[name] = eng.generate(prompt, max_new_tokens=12)["output_ids"]
            finally:
                eng.stop()
        assert outs["b_ref"] == outs["b_spec"]

    def test_spec_with_moe(self, tmp_path):
        """verify_step flows through the MoE FFN (same _forward_block)."""
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        def write(name, extra):
            vdir = os.path.join(str(tmp_path), name, "1")
            os.makedirs(vdir, exist_ok=True)
            cfg = {
                "name": name, "platform": "llm", "architecture": "mixtral",
                "inputs": [{"name": "input_ids", "shape": [1, -1], "data_type": "INT32"}],
                "outputs": [{"name": "output_ids", "shape": [1, -1], "data_type": "INT32"}],
                "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 2,
                                  "n_heads": 4, "n_kv_heads": 2, "head_dim": 8,
                                  "ffn_dim": 48, "n_experts": 4,
                                  "n_experts_per_tok": 2, "init": "random"},
                "generation": {"max_seq_len": 96, "max_slots": 4,
                                "eos_token_id": 2, "max_new_tokens": 8, **extra},
                "quantization": {"weights": "int8", "group_size": 16,
                                  "kv_cache": "int8"},
            }
            with open(os.path.join(vdir, "config.json"), "w") as f:
                json.dump(cfg, f)
            return vdir

        prompt = [5, 9, 13] * 5
        outs = {}
        for name, extra in (("m_ref", {}), ("m_spec", {"speculation_tokens": 3})):
            vdir = write(name, extra)
            eng = GenerationEngine(vdir, ModelConfig.from_file(
                os.path.join(vdir, "config.json")))
            eng.start()
            try:
                outs[name] = eng.generate(prompt, max_new_tokens=10)["output_ids"]
            finally:
                eng.stop()
        assert outs["m_ref"] == outs["m_spec"]


def test_spec_with_tp_dp_sharding(tmp_path):
    """Speculation under a (dp=2, tp=4) mesh: verify_step flows through the
    GSPMD paths (qmatmul_sharded islands handle the [S, C, D] activations);
    outputs match the unsharded speculative engine exactly."""
    from tpuserve.repository.config import ModelConfig
    from tpuserve.serving.engine import GenerationEngine

    def write(name, sharding):
        vdir = os.path.join(str(tmp_path), name, "1")
        os.makedirs(vdir, exist_ok=True)
        cfg = {
            "name": name, "platform": "llm", "architecture": "llama",
            "inputs": [{"name": "input_ids", "shape": [1, -1], "data_type": "INT32"}],
            "outputs": [{"name": "output_ids", "shape": [1, -1], "data_type": "INT32"}],
            "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 2,
                              "n_heads": 8, "n_kv_heads": 4, "head_dim": 8,
                              "ffn_dim": 64, "init": "random"},
            "generation": {"max_seq_len": 96, "max_slots": 4, "eos_token_id": 2,
                            "max_new_tokens": 10, "speculation_tokens": 3},
            "quantization": {"weights": "int8", "group_size": 16, "kv_cache": "int8"},
        }
        if sharding:
            cfg["sharding"] = sharding
        with open(os.path.join(vdir, "config.json"), "w") as f:
            json.dump(cfg, f)
        return vdir

    prompt = [5, 9, 13] * 5
    outs = {}
    for name, sh in (("sp_solo2", None),
                     ("sp_mesh", {"tensor_parallel": 4, "data_parallel": 2})):
        vd = write(name, sh)
        eng = GenerationEngine(vd, ModelConfig.from_file(os.path.join(vd, "config.json")))
        eng.start()
        try:
            outs[name] = eng.generate(prompt, max_new_tokens=10)["output_ids"]
        finally:
            eng.stop()
    assert outs["sp_solo2"] == outs["sp_mesh"]


class TestPagedSpeculation:
    def test_paged_verify_matches_sequential(self):
        """verify_step_paged over a drafted chain == sequential paged
        decode steps."""
        from tpuserve.serving.paged_kv import PagedKVCache, PageTableManager

        params = llama.init_params(jax.random.PRNGKey(4), P, dtype=jnp.float32)
        ps, n_pages = 8, 9
        ptm = PageTableManager(n_pages, ps, n_slots=2, max_len=32)
        ptm.ensure(0, 12)
        prompt = jnp.asarray([[7, 11, 23, 5]], jnp.int32)
        ca = PagedKVCache.create(P, n_pages, ps, quantized=True)
        cb = PagedKVCache.create(P, n_pages, ps, quantized=True)
        _, ca = llama.prefill_paged(params, P, prompt, ca, ptm.device_table(),
                                    jnp.int32(0), jnp.int32(4))
        _, cb = llama.prefill_paged(params, P, prompt, cb, ptm.device_table(),
                                    jnp.int32(0), jnp.int32(4))
        chain = [9, 14, 3]
        seq_logits = []
        pos = 4
        for t in chain:
            lg, ca = llama.decode_step_paged(
                params, P, jnp.asarray([t, 0], jnp.int32), ca,
                ptm.device_table(), jnp.asarray([pos, -1], jnp.int32))
            seq_logits.append(np.asarray(lg[0]))
            pos += 1
        vlogits, cb = llama.verify_step_paged(
            params, P, jnp.asarray([[9, 14, 3], [0, 0, 0]], jnp.int32), cb,
            ptm.device_table(), jnp.asarray([4, -1], jnp.int32),
            jnp.asarray([3, 0], jnp.int32))
        for j in range(3):
            np.testing.assert_allclose(np.asarray(vlogits[0, j]),
                                       seq_logits[j], rtol=5e-2, atol=5e-2)
        assert np.all(np.asarray(vlogits[1]) == 0.0)

    def test_paged_spec_engine_exact(self, tmp_path):
        """Paged + speculation == paged plain greedy, token for token; all
        pages return after retirement (no leak on in-spec retirement)."""
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        prompt = [5, 9, 13] * 5
        outs = {}
        for name, extra in (("pg_ref", {}), ("pg_spec", {"speculation_tokens": 3})):
            vdir = _write_repo(tmp_path, name, paged=True, page_size=16, **extra)
            eng = GenerationEngine(vdir, ModelConfig.from_file(
                os.path.join(vdir, "config.json")))
            eng.start()
            try:
                outs[name] = eng.generate(prompt, max_new_tokens=12)["output_ids"]
                assert eng.ptm.free_pages == eng.ptm._alloc.total_pages
            finally:
                eng.stop()
        assert outs["pg_ref"] == outs["pg_spec"]


class TestMultiCandidateKernel:
    """decode_attention_wide_cache_multi (the speculative-verification
    kernel): C candidates stream the cache once, per-row causal horizons."""

    @pytest.mark.parametrize("quantized", [True, False])
    @pytest.mark.parametrize("flat", [True, False])
    def test_matches_per_candidate_single_kernel(self, quantized, flat):
        """Row c of the multi kernel == the single-candidate wide kernel run
        at position pos+c (same cache)."""
        from tpuserve.ops.decode_attention import (
            decode_attention_wide_cache, decode_attention_wide_cache_multi)

        rng = np.random.default_rng(9)
        n_layers, s, l, n_kv, rep, hd, cands = 2, 3, 64, 4, 2, 32, 3
        h = n_kv * rep
        q = jnp.asarray((rng.normal(size=(s, cands, h, hd)) / np.sqrt(hd)
                         ).astype(np.float32))
        if quantized:
            k = rng.integers(-127, 127, size=(n_layers, s, l, n_kv, hd)).astype(np.int8)
            v = rng.integers(-127, 127, size=(n_layers, s, l, n_kv, hd)).astype(np.int8)
            ks = jnp.asarray(rng.uniform(0.001, 0.02, size=(n_layers, s, n_kv, l)).astype(np.float32))
            vs = jnp.asarray(rng.uniform(0.001, 0.02, size=(n_layers, s, n_kv, l)).astype(np.float32))
            ks_l, vs_l = ks[1], vs[1]
        else:
            k = rng.normal(size=(n_layers, s, l, n_kv, hd)).astype(np.float32)
            v = rng.normal(size=(n_layers, s, l, n_kv, hd)).astype(np.float32)
            ks_l = vs_l = None
        kj, vj = jnp.asarray(k), jnp.asarray(v)
        if flat:
            kj = kj.reshape(n_layers, s, l, n_kv * hd)
            vj = vj.reshape(n_layers, s, l, n_kv * hd)
        positions = jnp.asarray(np.array([5, -1, l - cands], np.int32))
        out = np.asarray(decode_attention_wide_cache_multi(
            q, kj, vj, ks_l, vs_l, positions, 1, block_l=32, interpret=True))
        tol = dict(rtol=5e-2, atol=1e-2) if quantized else dict(rtol=1e-5, atol=1e-6)
        for ci in range(cands):
            ref = np.asarray(decode_attention_wide_cache(
                q[:, ci], kj, vj, ks_l, vs_l, positions + ci, 1,
                block_l=32, interpret=True))
            # active slots only: the single kernel zeroes pos<0 while the
            # multi kernel leaves non-first candidates of inactive slots
            # as documented garbage for the caller's valid mask
            np.testing.assert_allclose(out[0, ci], ref[0], **tol)
            np.testing.assert_allclose(out[2, ci], ref[2], **tol)
        assert np.all(out[1, 0] == 0.0)  # inactive slot, candidate 0

    def test_verify_step_kernel_route_matches_xla(self, monkeypatch):
        """llama.verify_step with the forced pallas mode (interpret) == the
        XLA route, end to end through the layer stack."""
        import tpuserve.models.llama as llama_mod
        import tpuserve.ops.decode_attention as da_mod

        params = llama.init_params(jax.random.PRNGKey(2), P, dtype=jnp.float32)
        prompt = jnp.asarray([[7, 11, 23, 5]], jnp.int32)
        toks = jnp.asarray([[9, 14, 3], [0, 0, 0]], jnp.int32)

        def run(mode):
            cache = KVCache.create(P, 2, 32, quantized=True,
                                   flat=(mode == "pallas"))
            _, cache = llama.prefill(params, P, prompt, cache,
                                     jnp.int32(0), jnp.int32(4))
            if mode == "pallas":
                monkeypatch.setattr(llama_mod, "_decode_attn_mode",
                                    lambda _p: "pallas")
                orig = da_mod.decode_attention_wide_cache_multi
                monkeypatch.setattr(
                    da_mod, "decode_attention_wide_cache_multi",
                    lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
            lg, _ = llama.verify_step(
                params, P, toks, cache, jnp.asarray([4, -1], jnp.int32),
                jnp.asarray([3, 0], jnp.int32))
            monkeypatch.undo()
            return np.asarray(lg)

        ref = run("xla")
        out = run("pallas")
        np.testing.assert_allclose(out[0], ref[0], rtol=5e-2, atol=5e-2)


class TestFusedSpeculation:
    """Round-4 fused multi-round speculation (speculation_rounds > 1):
    on-device drafting (llama.draft_lookup) + a lax.scan of verify rounds
    per dispatch (engine spec_multi_fn)."""

    _gen = TestSpeculativeEngine._gen

    def test_device_draft_matches_host_proposer(self):
        """llama.draft_lookup must reproduce _propose_lookup's match
        choice (rightmost full-continuation, else longest-continuation)
        over randomized low-vocab histories."""
        import jax
        import jax.numpy as jnp

        from tpuserve.models.llama import draft_lookup
        from tpuserve.serving.engine import GenerationEngine, Request, _SlotState

        rng = np.random.default_rng(3)
        L, S, n, k = 80, 8, 3, 4
        jl = jax.jit(draft_lookup, static_argnums=(2, 3))
        for _ in range(20):
            hist = np.zeros((S, L), np.int32)
            lens = rng.integers(1, L, S).astype(np.int32)
            for s in range(S):
                hist[s, :lens[s]] = rng.integers(0, rng.integers(2, 7), lens[s])
            d, keff = jl(jnp.asarray(hist), jnp.asarray(lens), n, k,
                         jnp.full((S,), k, np.int32))
            d, keff = np.asarray(d), np.asarray(keff)
            eng = GenerationEngine.__new__(GenerationEngine)
            for s in range(S):
                req = Request(prompt_ids=hist[s, :lens[s]].tolist(),
                              max_new_tokens=1)
                st = _SlotState(request=req, next_pos=lens[s] - 1,
                                generated=0, last_token=int(hist[s, lens[s] - 1]))
                want = eng._propose_lookup(st, k=k, n=n)
                assert d[s, :keff[s]].tolist() == want, (s, hist[s, :lens[s]])

    def test_fused_rounds_match_single_round_and_plain(self, tmp_path):
        prompt = [5, 9, 13] * 6
        ref, _ = self._gen(tmp_path, "fz_ref", prompt, 24)
        one, s1 = self._gen(tmp_path, "fz_one", prompt, 24,
                            speculation_tokens=4, speculation_rounds=1)
        fz, s4 = self._gen(tmp_path, "fz_four", prompt, 24,
                           speculation_tokens=4, speculation_rounds=4)
        assert fz["output_ids"] == ref["output_ids"]
        assert one["output_ids"] == ref["output_ids"]
        assert s4.get("spec_drafted", 0) > 0

    def test_random_prompt_never_drafts(self, tmp_path):
        """The O(1) n-gram gate: a match-free history must not pay a
        verify dispatch at all."""
        prompt = [7, 21, 3, 44, 8, 100, 62, 115, 31]
        out, stats = self._gen(tmp_path, "fz_rand", prompt, 16,
                               speculation_tokens=4, speculation_rounds=4)
        ref, _ = self._gen(tmp_path, "fz_rand_ref", prompt, 16)
        assert out["output_ids"] == ref["output_ids"]

    def test_break_even_guard_disables_drafting(self, tmp_path):
        """speculation_min_gain above any achievable expected gain must
        suppress fused dispatches (except 1-in-16 probes) while keeping
        outputs exact."""
        prompt = [5, 9, 13] * 6
        ref, _ = self._gen(tmp_path, "fz_gref", prompt, 16)
        out, stats = self._gen(tmp_path, "fz_guard", prompt, 16,
                               speculation_tokens=4, speculation_rounds=4,
                               speculation_min_gain=1e9)
        assert out["output_ids"] == ref["output_ids"]
        # 16 tokens at horizon<=4: well under 16 spec attempts, so the
        # probe never fires and nothing is drafted
        assert stats.get("spec_drafted", 0) == 0

    def test_fused_respects_capacity_and_eos(self, tmp_path):
        """Sequences that hit max_seq_len / max_new inside a fused burst
        must truncate exactly like plain decode."""
        prompt = [5, 9, 13] * 6
        ref, _ = self._gen(tmp_path, "fz_cref", prompt, 40)
        out, _ = self._gen(tmp_path, "fz_cap", prompt, 40,
                           speculation_tokens=4, speculation_rounds=4)
        assert out["output_ids"] == ref["output_ids"]
        assert out["finish_reason"] == ref["finish_reason"]
        assert out["num_generated"] == ref["num_generated"]


def test_fused_rounds_match_single_round_engine(tmp_path):
    """speculation_rounds=4 (fused on-device drafting) generates EXACTLY
    the tokens of speculation_rounds=1 (host-drafted verify) with the same
    accepted-token count (r5: the 7B rep-leg acceptance difference,
    0.99 host vs 0.48 fused, is a drafted-count accounting artifact —
    the host proposer clips drafts to the available continuation while
    the device drafts full k; delivered tokens and speedup are equal)."""
    import json
    import os

    import numpy as np

    from tpuserve.repository.config import ModelConfig
    from tpuserve.serving.engine import GenerationEngine

    def build(name, rounds):
        vdir = tmp_path / name / "1"
        vdir.mkdir(parents=True)
        cfg = {
            "name": name, "platform": "llm", "architecture": "llama",
            "inputs": [{"name": "input_ids", "shape": [1, -1],
                        "data_type": "INT32"}],
            "outputs": [{"name": "output_ids", "shape": [1, -1],
                         "data_type": "INT32"}],
            "model_params": {"vocab_size": 512, "dim": 128, "n_layers": 2,
                             "n_heads": 4, "n_kv_heads": 4, "head_dim": 32,
                             "ffn_dim": 256, "seed": 1, "init": "random"},
            "generation": {"max_seq_len": 512, "max_slots": 4,
                           "eos_token_id": -1, "max_new_tokens": 160,
                           "speculation_tokens": 8,
                           "speculation_rounds": rounds,
                           "decode_horizon": 1},
        }
        with open(vdir / "config.json", "w") as f:
            json.dump(cfg, f)
        mc = ModelConfig.from_file(os.path.join(str(vdir), "config.json"))
        eng = GenerationEngine(str(vdir), mc)
        eng.start()
        return eng

    rng = np.random.default_rng(0)
    prompt = (rng.integers(100, 500, 12).tolist() * 10)[:96]
    outs, accepted = {}, {}
    for rounds in (1, 4):
        eng = build(f"spec_r{rounds}", rounds)
        try:
            o = eng.generate(prompt, max_new_tokens=120, temperature=0.0)
            outs[rounds] = o["output_ids"]
            accepted[rounds] = eng.spec_accepted
            assert eng.spec_drafted > 0
        finally:
            eng.stop()
    assert outs[1] == outs[4]
    assert accepted[1] == accepted[4]
