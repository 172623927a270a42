"""LLM stack tests at tiny scale on CPU: model math consistency
(incremental KV decode == whole-sequence forward), INT8 KV accuracy,
continuous-batching engine behavior, sampling."""

import json
import os
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.repository.config import ModelConfig
from tpuserve.serving.engine import GenerationEngine
from tpuserve.serving.sampling import SamplingParams, sample

P = LlamaParams.tiny()


@pytest.fixture(scope="module")
def params():
    return llama.init_params(jax.random.PRNGKey(0), P, dtype=jnp.float32)


def _full_logits(params, tokens_1d):
    """Whole-sequence forward via the zoo apply path."""
    cfg = ModelConfig(name="m", architecture="llama", model_params={
        "vocab_size": P.vocab_size, "dim": P.dim, "n_layers": P.n_layers,
        "n_heads": P.n_heads, "n_kv_heads": P.n_kv_heads, "head_dim": P.head_dim,
        "ffn_dim": P.ffn_dim,
    })
    from tpuserve.models.registry import get_architecture

    arch = get_architecture(cfg)
    out = arch.apply(params, {"input_ids": jnp.asarray(tokens_1d, jnp.int32)[None, :]})
    return np.asarray(out["logits"][0])  # [L, V]


class TestIncrementalConsistency:
    @pytest.mark.parametrize("quantized_kv", [False, True])
    def test_prefill_decode_matches_full_forward(self, params, quantized_kv):
        """Greedy continuation via prefill+decode must match argmax of the
        full forward at every step (exact for bf16 KV; close for int8 KV)."""
        prompt = [5, 17, 100, 42, 7]
        n_steps = 6
        cache = KVCache.create(P, n_slots=2, max_len=64, quantized=quantized_kv,
                               dtype=jnp.float32)

        # pad prompt to bucket 16 like the engine does
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, : len(prompt)] = prompt
        logits, cache = llama.prefill(
            params, P, jnp.asarray(tokens), cache, jnp.int32(1), jnp.int32(len(prompt))
        )
        seq = list(prompt)
        incremental = []
        tok = int(np.argmax(np.asarray(logits)[0]))
        incremental.append(tok)
        seq.append(tok)
        pos = len(prompt)
        for _ in range(n_steps - 1):
            t = np.zeros((2,), np.int32)
            p_ = np.full((2,), -1, np.int32)
            t[1] = seq[-1]
            p_[1] = pos
            logits, cache = llama.decode_step(params, P, jnp.asarray(t), cache, jnp.asarray(p_))
            tok = int(np.argmax(np.asarray(logits)[1]))
            incremental.append(tok)
            seq.append(tok)
            pos += 1

        # reference: greedy via repeated full forward
        ref_seq = list(prompt)
        for _ in range(n_steps):
            lg = _full_logits(params, ref_seq)
            ref_seq.append(int(np.argmax(lg[-1])))
        expected = ref_seq[len(prompt):]

        if quantized_kv:
            # int8 KV may flip rare near-ties; require strong agreement
            agree = sum(a == b for a, b in zip(incremental, expected))
            assert agree >= n_steps - 1, (incremental, expected)
        else:
            assert incremental == expected

    def test_inactive_slots_untouched(self, params):
        """Decode with one active slot must not corrupt other slots' cache."""
        cache = KVCache.create(P, n_slots=3, max_len=32, quantized=False, dtype=jnp.float32)
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, :3] = [1, 2, 3]
        _, cache = llama.prefill(params, P, jnp.asarray(tokens), cache, jnp.int32(0), jnp.int32(3))
        before = np.asarray(cache.k[:, 0, :3])
        t = np.array([0, 9, 0], np.int32)
        p_ = np.array([-1, 5, -1], np.int32)
        _, cache = llama.decode_step(params, P, jnp.asarray(t), cache, jnp.asarray(p_))
        np.testing.assert_array_equal(np.asarray(cache.k[:, 0, :3]), before)


class TestSampling:
    def test_greedy(self):
        logits = jnp.asarray(np.array([[0.0, 5.0, 1.0], [3.0, 0.0, -1.0]], np.float32))
        sp = SamplingParams.create(2, temperature=0.0)
        out = np.asarray(sample(logits, sp, jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(out, [1, 0])

    def test_top_k_restricts_support(self):
        logits = jnp.asarray(np.array([[10.0, 9.0, -50.0, -50.0]] * 1, np.float32))
        sp = SamplingParams.create(1, temperature=1.0, top_k=2)
        seen = set()
        for s in range(50):
            out = np.asarray(sample(logits, sp, jax.random.PRNGKey(s)))
            seen.add(int(out[0]))
        assert seen <= {0, 1} and len(seen) == 2

    def test_top_p_keeps_head(self):
        logits = jnp.asarray(np.array([[10.0, 1.0, 0.0, -1.0]], np.float32))
        sp = SamplingParams.create(1, temperature=1.0, top_p=0.5)
        for s in range(20):
            out = np.asarray(sample(logits, sp, jax.random.PRNGKey(s)))
            assert int(out[0]) == 0  # p(0) ~ 0.9997 > 0.5 -> only the head survives

    def test_per_slot_mixed(self):
        logits = jnp.asarray(np.tile(np.array([[1.0, 2.0, 3.0]], np.float32), (2, 1)))
        sp = SamplingParams.create(2, temperature=0.0)
        sp = sp.update_slot(1, temperature=1.0, top_k=1, top_p=1.0)
        out = np.asarray(sample(logits, sp, jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(out, [2, 2])  # top_k=1 == greedy


def _write_llm_repo(tmp_path, quant="none", kv="none", max_slots=4, name="tiny_llm",
                    **gen_extra):
    vdir = os.path.join(str(tmp_path), name, "1")
    os.makedirs(vdir, exist_ok=True)
    cfg = {
        "name": name,
        "platform": "llm",
        "architecture": "llama",
        "inputs": [{"name": "input_ids", "shape": [1, -1], "data_type": "INT32"}],
        "outputs": [{"name": "output_ids", "shape": [1, -1], "data_type": "INT32"}],
        "model_params": {
            "vocab_size": P.vocab_size, "dim": P.dim, "n_layers": P.n_layers,
            "n_heads": P.n_heads, "n_kv_heads": P.n_kv_heads, "head_dim": P.head_dim,
            "ffn_dim": P.ffn_dim, "init": "random",
        },
        "generation": {"max_seq_len": 128, "max_slots": max_slots, "eos_token_id": 2,
                        "max_new_tokens": 8, **gen_extra},
        "quantization": {"weights": quant, "group_size": 32, "kv_cache": kv},
    }
    with open(os.path.join(vdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    return vdir


class TestGenerationEngine:
    def test_generate_deterministic(self, tmp_path):
        vdir = _write_llm_repo(tmp_path)
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            r1 = eng.generate([5, 17, 100], max_new_tokens=6)
            r2 = eng.generate([5, 17, 100], max_new_tokens=6)
            assert r1["output_ids"][:3] == [5, 17, 100]
            assert r1["num_generated"] <= 6
            assert r1["output_ids"] == r2["output_ids"]  # greedy determinism
            assert r1["finish_reason"] in ("max_new_tokens", "eos")
        finally:
            eng.stop()

    def test_continuous_batching_concurrent(self, tmp_path):
        """Concurrent requests share decode steps; per-request results match
        solo runs (batch isolation)."""
        vdir = _write_llm_repo(tmp_path, max_slots=4)
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            prompts = [[5, 17], [100, 42, 7], [3], [9, 9, 9, 9]]
            solo = [eng.generate(p, max_new_tokens=5)["output_ids"] for p in prompts]

            results = [None] * len(prompts)

            def run(i):
                results[i] = eng.generate(prompts[i], max_new_tokens=5)["output_ids"]

            threads = [threading.Thread(target=run, args=(i,)) for i in range(len(prompts))]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert results == solo
            # batching actually happened: fewer decode steps than sum of solo
            assert eng.steps > 0
        finally:
            eng.stop()

    def test_more_requests_than_slots(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, max_slots=2)
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            reqs = [eng.submit([i + 1, i + 2], max_new_tokens=4) for i in range(5)]
            for r in reqs:
                assert r.done.wait(timeout=120)
                assert r.error is None
                assert 1 <= len(r.output_ids) <= 4
        finally:
            eng.stop()

    def test_quantized_weights_and_kv(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, quant="int8", kv="int8", name="tiny_llm_q")
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            r = eng.generate([5, 17, 100], max_new_tokens=4)
            assert r["num_generated"] >= 1
            assert eng.memory_usage_bytes() > 0
        finally:
            eng.stop()

    def test_error_paths(self, tmp_path):
        vdir = _write_llm_repo(tmp_path)
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            from tpuserve.utils.errors import InvalidArgumentError

            with pytest.raises(InvalidArgumentError):
                eng.generate([])
            with pytest.raises(InvalidArgumentError):
                eng.generate(list(range(500)))  # > max_seq_len
        finally:
            eng.stop()

    def test_via_manager_and_backend(self, tmp_path):
        """LLM served through the standard Model/Manager path (infer with
        input_ids tensor)."""
        _write_llm_repo(tmp_path)
        from tpuserve.engine import InferenceManager
        from tpuserve.utils.tensor import Tensor

        m = InferenceManager(str(tmp_path))
        try:
            m.load_model("tiny_llm")
            ids = np.asarray([[5, 17, 100]], np.int32)
            out = m.run_inference("tiny_llm", [Tensor.from_numpy("input_ids", ids)])
            assert out[0].name == "output_ids"
            got = out[0].numpy()[0].tolist()
            assert got[:3] == [5, 17, 100]
            assert len(got) > 3
        finally:
            m.shutdown()


class TestChunkedPrefill:
    def test_prefill_chunk_matches_whole_prefill(self, params):
        """Chunked prefill (3 chunks of 8) must reproduce the single-shot
        prefill logits AND identical cache contents for the live prefix."""
        prompt = list(np.random.RandomState(0).randint(3, 200, size=20))
        cache_a = KVCache.create(P, n_slots=2, max_len=64, quantized=False,
                                 dtype=jnp.float32)
        tokens = np.zeros((1, 32), np.int32)
        tokens[0, : len(prompt)] = prompt
        logits_a, cache_a = llama.prefill(
            params, P, jnp.asarray(tokens), cache_a, jnp.int32(1), jnp.int32(len(prompt))
        )

        cache_b = KVCache.create(P, n_slots=2, max_len=64, quantized=False,
                                 dtype=jnp.float32)
        cs = 8
        logits_b = None
        for c0 in range(0, len(prompt), cs):
            n = min(cs, len(prompt) - c0)
            chunk = np.zeros((1, cs), np.int32)
            chunk[0, :n] = prompt[c0 : c0 + n]
            logits_b, cache_b = llama.prefill_chunk(
                params, P, jnp.asarray(chunk), cache_b, jnp.int32(1),
                jnp.int32(c0), jnp.int32(n), window=32,
            )
        np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_a),
                                   rtol=1e-4, atol=1e-4)
        l = len(prompt)
        np.testing.assert_allclose(np.asarray(cache_b.k[:, 1, :l]),
                                   np.asarray(cache_a.k[:, 1, :l]), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cache_b.v[:, 1, :l]),
                                   np.asarray(cache_a.v[:, 1, :l]), rtol=1e-5, atol=1e-5)

    def test_engine_chunked_matches_unchunked(self, tmp_path):
        """Engine output with prefill_chunk=16 must be token-identical to
        the unchunked engine on a 40-token greedy prompt."""
        prompt = list(np.random.RandomState(1).randint(3, 200, size=40))
        vdir_a = _write_llm_repo(tmp_path, name="plain_llm")
        cfg_a = ModelConfig.from_file(os.path.join(vdir_a, "config.json"))
        eng_a = GenerationEngine(vdir_a, cfg_a)
        eng_a.start()
        try:
            r_a = eng_a.generate(prompt, max_new_tokens=6)
        finally:
            eng_a.stop()

        vdir_b = _write_llm_repo(tmp_path, name="chunked_llm", prefill_chunk=16)
        cfg_b = ModelConfig.from_file(os.path.join(vdir_b, "config.json"))
        eng_b = GenerationEngine(vdir_b, cfg_b)
        assert eng_b._chunk_size == 16
        eng_b.start()
        try:
            r_b = eng_b.generate(prompt, max_new_tokens=6)
            # decode keeps running for other slots while a chunked admission
            # is in flight: run a long + a short prompt concurrently
            req_long = eng_b.submit(prompt, max_new_tokens=6)
            r_short = eng_b.generate([5, 9, 3], max_new_tokens=4)
            req_long.done.wait(timeout=60)
            assert req_long.error is None
            assert list(req_long.output_ids) == r_b["generated_ids"]
            assert r_short["num_generated"] >= 1
        finally:
            eng_b.stop()
        assert r_b["output_ids"] == r_a["output_ids"]


class TestEngineRobustness:
    def test_stop_fails_outstanding_requests(self, tmp_path):
        """stop() must complete queued requests with an error, not strand
        blocked callers."""
        vdir = _write_llm_repo(tmp_path, max_slots=1, name="tiny_stop")
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        # occupy the slot with a long generation, queue more behind it
        r1 = eng.submit([5, 9], max_new_tokens=2000)
        r2 = eng.submit([7, 7], max_new_tokens=5)
        eng.stop()
        assert r1.done.wait(timeout=10)
        assert r2.done.wait(timeout=10)
        assert r2.error is not None  # never admitted

    def test_generate_after_stop_raises(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, name="tiny_stop2")
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        eng.stop()
        from tpuserve.utils.errors import BackendError

        with pytest.raises(BackendError):
            eng.generate([1, 2, 3])


class TestWindowedDecode:
    def test_window_matches_full(self, params):
        """Static KV window == full-length decode for in-window positions."""
        cache = KVCache.create(P, n_slots=2, max_len=64, quantized=False, dtype=jnp.float32)
        tokens16 = np.zeros((1, 16), np.int32)
        tokens16[0, :5] = [5, 17, 100, 42, 7]
        _, cache = llama.prefill(params, P, jnp.asarray(tokens16), cache,
                                 jnp.int32(0), jnp.int32(5))
        t = jnp.asarray(np.array([11, 0], np.int32))
        pos = jnp.asarray(np.array([5, -1], np.int32))
        full, _ = llama.decode_step(params, P, t, cache, pos)
        windowed, _ = llama.decode_step(params, P, t, cache, pos, window=16)
        np.testing.assert_allclose(np.asarray(windowed)[0], np.asarray(full)[0],
                                   rtol=1e-5, atol=1e-5)

    def test_bucketed_engine_same_output(self, params, tmp_path):
        """decode_buckets on/off produce identical greedy generations."""
        outs = {}
        for buckets in (0, 2):
            name = f"tiny_buckets_{buckets}"
            vdir = _write_llm_repo(tmp_path, name=name)
            cfgd = json.load(open(os.path.join(vdir, "config.json")))
            cfgd["generation"]["decode_buckets"] = buckets
            json.dump(cfgd, open(os.path.join(vdir, "config.json"), "w"))
            cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
            eng = GenerationEngine(vdir, cfg)
            eng.start()
            try:
                outs[buckets] = eng.generate([5, 17, 100], max_new_tokens=6)["output_ids"]
            finally:
                eng.stop()
        assert outs[0] == outs[2]


class TestAdaptiveHorizon:
    """target_burst_ms bounds the fused decode burst's wall time: the engine
    tracks a per-token EMA and shrinks the horizon when steps are slow
    relative to the SLO; 0 keeps the fixed decode_horizon behavior."""

    def _run(self, tmp_path, name, max_new=24, **gen_extra):
        vdir = _write_llm_repo(tmp_path, name=name, **gen_extra)
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            out = eng.generate([5, 17, 100], max_new_tokens=max_new)
            stats = eng.serving_stats()
        finally:
            eng.stop()
        return out, stats

    def test_tiny_slo_collapses_horizon(self, tmp_path):
        """An unmeetable SLO (1e-6 ms/burst) forces per-step dispatch after
        the first EMA sample, without changing the generated tokens."""
        ref, _ = self._run(tmp_path, "ah_ref")
        out, stats = self._run(tmp_path, "ah_tiny", decode_horizon=8,
                               target_burst_ms=1e-6)
        assert stats["decode_horizon_last"] == 1
        assert stats["decode_token_ms_ema"] > 0
        assert out["output_ids"] == ref["output_ids"]

    def test_loose_slo_keeps_bursts(self, tmp_path):
        """A generous SLO (1e9 ms) leaves the configured horizon in place.
        max_new 17 = prefill token + two full 8-bursts, so even the LAST
        burst is full-width (the remaining-budget clamp + power-of-2
        bucketing legitimately shrink tail bursts at other counts)."""
        out, stats = self._run(tmp_path, "ah_loose", max_new=17,
                               decode_horizon=8, target_burst_ms=1e9)
        assert stats["decode_horizon_last"] == 8
        ref, _ = self._run(tmp_path, "ah_ref2", max_new=17)
        assert out["output_ids"] == ref["output_ids"]


class TestBf16KvScales:
    """quantization.kv_scale_dtype=bfloat16 halves the decode kernel's scale
    stream; dequant error stays within the int8-KV noise floor."""

    def test_reconstruction_error_bound(self):
        from tpuserve.models.llama import _quantize_kv

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(64, 4, 32)).astype(np.float32))
        q, s = _quantize_kv(x)
        deq_f32 = np.asarray(q, np.float32) * np.asarray(s)[..., None]
        deq_bf16 = np.asarray(q, np.float32) * np.asarray(
            s.astype(jnp.bfloat16), np.float32)[..., None]
        ref = np.asarray(x)
        err_f32 = np.abs(deq_f32 - ref).max() / np.abs(ref).max()
        err_bf16 = np.abs(deq_bf16 - ref).max() / np.abs(ref).max()
        assert err_bf16 < err_f32 + 0.005  # bf16 scale adds <= 2^-9 relative

    def test_engine_runs_and_stores_bf16(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, quant="int8", kv="int8",
                               name="bf16sc")
        import json as _json
        cfgp = os.path.join(vdir, "config.json")
        cfg = _json.load(open(cfgp))
        cfg["quantization"]["kv_scale_dtype"] = "bfloat16"
        _json.dump(cfg, open(cfgp, "w"))
        eng = GenerationEngine(vdir, ModelConfig.from_file(cfgp))
        eng.start()
        try:
            assert eng.cache.k_scale.dtype == jnp.bfloat16
            r = eng.generate([5, 17, 100], max_new_tokens=6)
            assert r["num_generated"] >= 1
            r2 = eng.generate([5, 17, 100], max_new_tokens=6)
            assert r["output_ids"] == r2["output_ids"]  # deterministic
        finally:
            eng.stop()


class TestSamplingFeatures:
    """Repetition penalty, stop token ids, per-token logprobs (serving-API
    parity features; reference has no generation API at all)."""

    def test_repetition_penalty_masks_present_token(self):
        from tpuserve.serving.sampling import SamplingParams, sample

        logits = jnp.asarray([[1.0, 0.9, -3.0, -5.0]])
        params = SamplingParams.create(1, temperature=0.0, repetition_penalty=5.0)
        presence = jnp.zeros((1, 4), jnp.bool_).at[0, 0].set(True)
        tok = int(sample(logits, params, jax.random.PRNGKey(0), presence)[0])
        assert tok == 1  # token 0 penalized 1.0 -> 0.2, so 0.9 wins
        params1 = SamplingParams.create(1, temperature=0.0, repetition_penalty=1.0)
        tok1 = int(sample(logits, params1, jax.random.PRNGKey(0), presence)[0])
        assert tok1 == 0  # penalty off

    def test_engine_repetition_penalty_reduces_repeats(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, name="rp_engine")
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            base = eng.generate([5, 17, 100], max_new_tokens=16)
            pen = eng.generate([5, 17, 100], max_new_tokens=16,
                               repetition_penalty=1e6)
            # an extreme penalty forbids reuse: every generated token (until
            # a possible eos) must be new
            gen = pen["output_ids"][3:]
            seen = set([5, 17, 100])
            for t in gen:
                if t == 2:  # eos
                    break
                assert t not in seen
                seen.add(t)
            # default rp=1.0 must reproduce the unpenalized sequence
            base2 = eng.generate([5, 17, 100], max_new_tokens=16,
                                 repetition_penalty=1.0)
            assert base["output_ids"] == base2["output_ids"]
        finally:
            eng.stop()

    def test_stop_token_ids(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, name="stop_engine")
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            ref = eng.generate([5, 17, 100], max_new_tokens=8)
            assert ref["num_generated"] >= 2
            first = ref["generated_ids"][0]
            out = eng.generate([5, 17, 100], max_new_tokens=8,
                               stop_token_ids=[first])
            assert out["finish_reason"] == "stop"
            assert out["num_generated"] == 1
        finally:
            eng.stop()

    def test_logprobs_returned(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, name="lp_engine")
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            out = eng.generate([5, 17, 100], max_new_tokens=6, logprobs=True)
            lps = out["logprobs"]
            assert len(lps) == out["num_generated"]
            assert all(lp <= 0.0 for lp in lps)
            # greedy tokens should usually carry substantial probability;
            # at minimum the values are finite
            assert all(np.isfinite(lp) for lp in lps)
            out2 = eng.generate([5, 17, 100], max_new_tokens=6)
            assert "logprobs" not in out2
        finally:
            eng.stop()


class TestMinP:
    def test_min_p_masks_tail(self):
        """min_p keeps only tokens with p >= min_p * p_max: with a sharp
        distribution and min_p=0.5, sampling can only pick the two strong
        tokens regardless of the key."""
        from tpuserve.serving.sampling import SamplingParams, sample

        logits = jnp.asarray([[5.0, 4.9, 0.0, -2.0]])
        params = SamplingParams.create(1, temperature=1.0, min_p=0.5)
        picks = {int(sample(logits, params, jax.random.PRNGKey(k))[0])
                 for k in range(40)}
        assert picks <= {0, 1}
        assert len(picks) == 2  # both survivors actually reachable

    def test_min_p_engine_runs(self, tmp_path):
        vdir = _write_llm_repo(tmp_path, name="minp_engine")
        cfg = ModelConfig.from_file(os.path.join(vdir, "config.json"))
        eng = GenerationEngine(vdir, cfg)
        eng.start()
        try:
            out = eng.generate([5, 17, 100], max_new_tokens=6,
                               temperature=0.9, min_p=0.2, seed=3)
            assert out["num_generated"] >= 1
        finally:
            eng.stop()
