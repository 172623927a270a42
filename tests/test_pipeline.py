"""Pipeline parallelism (layers staged over a "pp" mesh axis) on the
8-device virtual CPU mesh. The reference has no PP (SURVEY §2b); this is
capacity-scaling work: per-chip weight footprint drops pp x while decode
runs a microbatch-rotation pipeline (parallel/pipeline.py)."""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.parallel.mesh import make_pipeline_mesh
from tpuserve.parallel.pipeline import (
    _layer_view,
    place_pipeline_params,
    pp_decode_step,
    pp_prefill,
    stack_layer_params,
)
from tpuserve.quant.core import QTensor, quantize_param_tree

P4 = LlamaParams(vocab_size=128, dim=32, n_layers=4, n_heads=4, n_kv_heads=2,
                 head_dim=8, ffn_dim=64)


def _params(p, quant=None, dtype=jnp.float32):
    raw = llama.fuse_params(llama.init_params(jax.random.PRNGKey(5), p, dtype=dtype), p)
    if quant:
        raw = quantize_param_tree(
            raw, bits=quant, group_size=16,
            predicate=lambda n, a: a.ndim == 2 and n.endswith("kernel"))
    return raw


class TestStacking:
    def test_layer_view_roundtrip_dense(self):
        raw = _params(P4)
        stacked = stack_layer_params(raw, P4)
        for l in range(P4.n_layers):
            view = _layer_view(stacked, l)
            for key, val in view.items():
                orig = raw[f"layers.{l}/" + key[len("L/"):]]
                np.testing.assert_array_equal(np.asarray(val), np.asarray(orig))

    def test_layer_view_roundtrip_quantized(self):
        raw = _params(P4, quant=8)
        stacked = stack_layer_params(raw, P4)
        view = _layer_view(stacked, 2)
        orig = raw["layers.2/wqkv/kernel"]
        got = view["L/wqkv/kernel"]
        assert isinstance(got, QTensor)
        np.testing.assert_array_equal(np.asarray(got.q), np.asarray(orig.q))
        np.testing.assert_array_equal(np.asarray(got.scale), np.asarray(orig.scale))
        assert got.group_size == orig.group_size

    def test_shared_params_pass_through(self):
        raw = _params(P4, quant=8)
        stacked = stack_layer_params(raw, P4)
        assert "embed/weight" in stacked
        assert isinstance(stacked["lm_head/kernel"], QTensor)


class TestPipelineForward:
    @pytest.mark.parametrize("quant_kv", [False, True])
    def test_prefill_and_decode_match_single_device(self, quant_kv):
        """pp=4 staged prefill + decode == the single-device path, token
        positions spanning fill/drain edge cases (slot-microbatch mapping,
        inactive slots, masked bubble writes)."""
        raw = _params(P4)
        mesh = make_pipeline_mesh(4)
        stacked = place_pipeline_params(stack_layer_params(raw, P4), mesh)

        n_slots, max_len = 8, 32
        dt = jnp.int8 if quant_kv else jnp.float32
        cache_ref = KVCache.create(P4, n_slots, max_len, quantized=quant_kv,
                                   dtype=jnp.float32 if not quant_kv else None)
        cache_pp = KVCache.create(P4, n_slots, max_len, quantized=quant_kv,
                                  dtype=jnp.float32 if not quant_kv else None)
        from tpuserve.parallel.pipeline import shard_cache_pp
        cache_pp = shard_cache_pp(cache_pp, mesh)

        prompt = jnp.asarray([[7, 11, 23, 5, 19, 3]], jnp.int32)
        ref_l, cache_ref = llama.prefill(raw, P4, prompt, cache_ref,
                                         jnp.int32(2), jnp.int32(6))
        pp_l, cache_pp = jax.jit(
            lambda pr, t, c, s, ln: pp_prefill(pr, P4, t, c, s, ln, mesh),
            donate_argnums=(2,))(stacked, prompt, cache_pp, jnp.int32(2), jnp.int32(6))
        np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                                   rtol=2e-3, atol=2e-3)

        tokens = jnp.asarray([3, 9, int(jnp.argmax(ref_l[0])), 1, 0, 5, 2, 8], jnp.int32)
        positions = jnp.asarray([0, 0, 6, -1, 0, 0, -1, 0], jnp.int32)
        ref_d, _ = llama.decode_step(raw, P4, tokens, cache_ref, positions)
        pp_d, _ = jax.jit(
            lambda pr, t, c, pos: pp_decode_step(pr, P4, t, c, pos, mesh),
            donate_argnums=(2,))(stacked, tokens, cache_pp, positions)
        np.testing.assert_allclose(np.asarray(pp_d), np.asarray(ref_d),
                                   rtol=2e-3, atol=2e-3)
        assert np.all(np.asarray(pp_d)[3] == 0.0)  # inactive slot


class TestPipelineTensorParallel:
    """pp x tp composition: layers stage over "pp" while each stage's
    weights/heads shard over "tp" (stage-local Megatron split) — the
    BASELINE.md config-4 topology (70B multi-host wants pp x tp)."""

    @pytest.mark.parametrize("quant", [None, 8])
    def test_pp2_tp2_matches_single_device(self, quant):
        raw = _params(P4, quant=quant)
        mesh = make_pipeline_mesh(2, 2)
        stacked = place_pipeline_params(
            stack_layer_params(raw, P4, tp=2), mesh)

        n_slots, max_len = 8, 32
        quant_kv = quant is not None
        mk = lambda: KVCache.create(
            P4, n_slots, max_len, quantized=quant_kv,
            dtype=None if quant_kv else jnp.float32)
        cache_ref, cache_pp = mk(), mk()
        from tpuserve.parallel.pipeline import shard_cache_pp
        cache_pp = shard_cache_pp(cache_pp, mesh)

        prompt = jnp.asarray([[7, 11, 23, 5, 19, 3]], jnp.int32)
        ref_l, cache_ref = llama.prefill(raw, P4, prompt, cache_ref,
                                         jnp.int32(2), jnp.int32(6))
        pp_l, cache_pp = jax.jit(
            lambda pr, t, c, s, ln: pp_prefill(pr, P4, t, c, s, ln, mesh),
            donate_argnums=(2,))(stacked, prompt, cache_pp,
                                 jnp.int32(2), jnp.int32(6))
        np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                                   rtol=2e-3, atol=2e-3)

        tokens = jnp.asarray([3, 9, int(jnp.argmax(ref_l[0])), 1, 0, 5, 2, 8],
                             jnp.int32)
        positions = jnp.asarray([0, 0, 6, -1, 0, 0, -1, 0], jnp.int32)
        ref_d, _ = llama.decode_step(raw, P4, tokens, cache_ref, positions)
        pp_d, _ = jax.jit(
            lambda pr, t, c, pos: pp_decode_step(pr, P4, t, c, pos, mesh),
            donate_argnums=(2,))(stacked, tokens, cache_pp, positions)
        np.testing.assert_allclose(np.asarray(pp_d), np.asarray(ref_d),
                                   rtol=2e-3, atol=2e-3)
        assert np.all(np.asarray(pp_d)[3] == 0.0)

    @pytest.mark.parametrize("tp", [1, 2])
    def test_pp2_dp2_matches_single_device(self, tp):
        """dp composition: whole-pipeline replicas, slots sharded over
        "dp", weights replicated — with and without stage-local tp."""
        quant = 8
        raw = _params(P4, quant=quant)
        mesh = make_pipeline_mesh(2, tp, 2)
        stacked = place_pipeline_params(
            stack_layer_params(raw, P4, tp=tp), mesh)

        n_slots, max_len = 8, 32
        mk = lambda: KVCache.create(P4, n_slots, max_len, quantized=True)
        cache_ref, cache_pp = mk(), mk()
        from tpuserve.parallel.pipeline import shard_cache_pp
        cache_pp = shard_cache_pp(cache_pp, mesh)

        # prefill one slot in EACH dp group's range (slots 0-3 / 4-7)
        for slot in (2, 5):
            prompt = jnp.asarray([[7, 11, 23, 5, 19, 3]], jnp.int32)
            ref_l, cache_ref = llama.prefill(raw, P4, prompt, cache_ref,
                                             jnp.int32(slot), jnp.int32(6))
            pp_l, cache_pp = jax.jit(
                lambda pr, t, c, s, ln: pp_prefill(pr, P4, t, c, s, ln, mesh),
                donate_argnums=(2,))(stacked, prompt, cache_pp,
                                     jnp.int32(slot), jnp.int32(6))
            np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                                       rtol=2e-3, atol=2e-3)

        tokens = jnp.asarray([3, 9, int(jnp.argmax(ref_l[0])), 1,
                              0, int(jnp.argmax(ref_l[0])), 2, 8], jnp.int32)
        positions = jnp.asarray([0, 0, 6, -1, 0, 6, -1, 0], jnp.int32)
        ref_d, _ = llama.decode_step(raw, P4, tokens, cache_ref, positions)
        pp_d, _ = jax.jit(
            lambda pr, t, c, pos: pp_decode_step(pr, P4, t, c, pos, mesh),
            donate_argnums=(2,))(stacked, tokens, cache_pp, positions)
        np.testing.assert_allclose(np.asarray(pp_d), np.asarray(ref_d),
                                   rtol=2e-3, atol=2e-3)
        assert np.all(np.asarray(pp_d)[3] == 0.0)

    def test_tp_shuffle_roundtrip(self):
        """Rank-major fused-column shuffle: concatenating every rank's
        slice of [q|k|v] recovers the per-projection splits."""
        from tpuserve.parallel.pipeline import _tp_shuffle_cols
        qd, kvd, tp = 8, 4, 2
        w = jnp.arange(2 * (qd + 2 * kvd)).reshape(2, qd + 2 * kvd)
        out = np.asarray(_tp_shuffle_cols(w, [qd, kvd, kvd], tp))
        width = (qd + 2 * kvd) // tp
        for r in range(tp):
            sl = out[:, r * width:(r + 1) * width]
            ql, kl, vl = (qd // tp), (kvd // tp), (kvd // tp)
            np.testing.assert_array_equal(
                sl[:, :ql], np.asarray(w)[:, r * ql:(r + 1) * ql])
            np.testing.assert_array_equal(
                sl[:, ql:ql + kl],
                np.asarray(w)[:, qd + r * kl:qd + (r + 1) * kl])
            np.testing.assert_array_equal(
                sl[:, ql + kl:],
                np.asarray(w)[:, qd + kvd + r * vl:qd + kvd + (r + 1) * vl])


def _write_pp_repo(tmp_path, name, sharding=None, quant="int8", **gen_extra):
    vdir = os.path.join(str(tmp_path), name, "1")
    os.makedirs(vdir, exist_ok=True)
    cfg = {
        "name": name, "platform": "llm", "architecture": "llama",
        "inputs": [{"name": "input_ids", "shape": [1, -1], "data_type": "INT32"}],
        "outputs": [{"name": "output_ids", "shape": [1, -1], "data_type": "INT32"}],
        "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 4,
                          "n_heads": 4, "n_kv_heads": 2, "head_dim": 8,
                          "ffn_dim": 64, "init": "random"},
        "generation": {"max_seq_len": 64, "max_slots": 4, "eos_token_id": 2,
                        "max_new_tokens": 6, **gen_extra},
        "quantization": {"weights": quant, "group_size": 16, "kv_cache": "int8"},
    }
    if sharding:
        cfg["sharding"] = sharding
    with open(os.path.join(vdir, "config.json"), "w") as f:
        json.dump(cfg, f)
    return vdir


class TestPipelineEngine:
    def _gen(self, tmp_path, name, **kw):
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        vdir = _write_pp_repo(tmp_path, name, **kw)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        eng.start()
        try:
            return eng.generate([5, 17, 100, 9], max_new_tokens=6)
        finally:
            eng.stop()

    def test_pp_matches_unsharded(self, tmp_path):
        """int8-quantized engine with pipeline_parallel=4 (1 layer/stage)
        generates the same greedy tokens as single-device."""
        ref = self._gen(tmp_path, "pp_solo")
        out = self._gen(tmp_path, "pp4", sharding={"pipeline_parallel": 4})
        assert ref["output_ids"] == out["output_ids"]

    def test_pp_tp_matches_unsharded(self, tmp_path):
        """pp=2 x tp=2 generates the same greedy tokens as single-device."""
        ref = self._gen(tmp_path, "pptp_solo")
        out = self._gen(tmp_path, "pp2tp2", sharding={
            "pipeline_parallel": 2, "tensor_parallel": 2})
        assert ref["output_ids"] == out["output_ids"]

    def test_pp_dp_matches_unsharded(self, tmp_path):
        """pp=2 x dp=2 generates the same greedy tokens as single-device."""
        ref = self._gen(tmp_path, "ppdp_solo")
        out = self._gen(tmp_path, "pp2dp2", sharding={
            "pipeline_parallel": 2, "data_parallel": 2})
        assert ref["output_ids"] == out["output_ids"]

    def test_pp_sp_matches_unsharded(self, tmp_path):
        """pp=2 x sp=2 (KV length sharded inside the rotation island, r5)
        generates the same greedy tokens as single-device."""
        ref = self._gen(tmp_path, "ppsp_solo")
        out = self._gen(tmp_path, "pp2sp2", sharding={
            "pipeline_parallel": 2, "sequence_parallel": 2})
        assert ref["output_ids"] == out["output_ids"]

    def test_pp_rejects_compositions(self, tmp_path):
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine
        from tpuserve.utils.errors import BackendError

        cases = [
            # sp composes now (r5), but never with tp under pp (v1)
            dict(sharding={"pipeline_parallel": 2, "sequence_parallel": 2,
                           "tensor_parallel": 2}),
            # tp composes now, but head counts must divide (n_kv_heads=2)
            dict(sharding={"pipeline_parallel": 2, "tensor_parallel": 4}),
            # pp x paged composes now (v1), but only pp-pure meshes and
            # never with prefix sharing
            dict(sharding={"pipeline_parallel": 2, "tensor_parallel": 2},
                 paged=True, page_size=16),
            dict(sharding={"pipeline_parallel": 2}, paged=True, page_size=16,
                 prefix_sharing=True),
            dict(sharding={"pipeline_parallel": 2}, prefill_chunk=16),
            dict(sharding={"pipeline_parallel": 3}),  # n_layers % pp != 0
        ]
        for i, kw in enumerate(cases):
            vdir = _write_pp_repo(tmp_path, f"pp_bad{i}", **kw)
            eng = GenerationEngine(
                vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
            with pytest.raises(BackendError):
                eng.start()


    def test_pp_paged_matches_unsharded(self, tmp_path):
        """pp=2 over a paged pool (pp x paged v1) generates the same
        greedy tokens as a single-device paged engine, and returns its
        pages on retirement."""
        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        vd_ref = _write_pp_repo(tmp_path, "pppg_solo", paged=True, page_size=16)
        vd_pp = _write_pp_repo(tmp_path, "pppg2",
                               sharding={"pipeline_parallel": 2},
                               paged=True, page_size=16)
        eng_r = GenerationEngine(vd_ref, ModelConfig.from_file(
            os.path.join(vd_ref, "config.json")))
        eng_p = GenerationEngine(vd_pp, ModelConfig.from_file(
            os.path.join(vd_pp, "config.json")))
        eng_r.start()
        eng_p.start()
        try:
            for prompt in ([5, 17, 100, 9], [9, 9], [3, 1, 4, 1, 5]):
                rr = eng_r.generate(prompt, max_new_tokens=6)
                rp = eng_p.generate(prompt, max_new_tokens=6)
                assert rr["output_ids"] == rp["output_ids"], prompt
            # release happens just after done.set(): give the loop a beat
            for _ in range(100):
                if eng_p.ptm.free_pages == eng_p.ptm._alloc.total_pages:
                    break
                time.sleep(0.05)
            assert eng_p.ptm.free_pages == eng_p.ptm._alloc.total_pages
        finally:
            eng_r.stop()
            eng_p.stop()


class TestPipelineMoE:
    """pp x MoE (VERDICT r4 #6): per-layer expert stacks nest one level
    deeper at stack time (QExperts holding [L, E, ...] arrays); the layer
    view slices back to an ordinary [E, ...] QExperts so the island's
    _moe_ffn dense loop runs unchanged."""

    P_MOE = LlamaParams(vocab_size=128, dim=32, n_layers=4, n_heads=4,
                        n_kv_heads=2, head_dim=8, ffn_dim=64, n_experts=4,
                        n_experts_per_tok=2)

    def _moe_params(self, quant=None):
        p = self.P_MOE
        raw = llama.fuse_params(
            llama.init_params(jax.random.PRNGKey(9), p, dtype=jnp.float32), p)
        if quant:
            def pred(n, a):
                if "router" in n:
                    return False
                return a.ndim in (2, 3) and n.endswith("kernel")
            raw = quantize_param_tree(raw, bits=quant, group_size=16,
                                      predicate=pred)
        return raw

    def test_stack_roundtrip_experts(self):
        from tpuserve.quant.core import QExperts

        raw = self._moe_params(quant=8)
        p = self.P_MOE
        assert any(isinstance(v, QExperts) for v in raw.values())
        stacked = stack_layer_params(raw, p)
        for l in range(p.n_layers):
            view = _layer_view(stacked, l)
            for key, val in view.items():
                orig = raw[f"layers.{l}/" + key[len("L/"):]]
                if isinstance(orig, QExperts):
                    assert isinstance(val, QExperts)
                    assert val.orig_shape == orig.orig_shape
                    np.testing.assert_array_equal(np.asarray(val.q),
                                                  np.asarray(orig.q))
                    np.testing.assert_array_equal(np.asarray(val.scale),
                                                  np.asarray(orig.scale))

    @pytest.mark.parametrize("quant", [None, 8])
    def test_pp2_moe_matches_single_device(self, quant):
        raw = self._moe_params(quant=quant)
        p = self.P_MOE
        mesh = make_pipeline_mesh(2)
        stacked = place_pipeline_params(stack_layer_params(raw, p), mesh)

        n_slots, max_len = 4, 32
        cache_ref = KVCache.create(p, n_slots, max_len, quantized=False,
                                   dtype=jnp.float32)
        cache_pp = KVCache.create(p, n_slots, max_len, quantized=False,
                                  dtype=jnp.float32)
        from tpuserve.parallel.pipeline import shard_cache_pp
        cache_pp = shard_cache_pp(cache_pp, mesh)

        prompt = jnp.asarray([[7, 11, 23, 5]], jnp.int32)
        ref_l, cache_ref = llama.prefill(raw, p, prompt, cache_ref,
                                         jnp.int32(1), jnp.int32(4))
        pp_l, cache_pp = jax.jit(
            lambda pr, t, c, s, ln: pp_prefill(pr, p, t, c, s, ln, mesh),
            donate_argnums=(2,))(stacked, prompt, cache_pp, jnp.int32(1),
                                 jnp.int32(4))
        np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                                   rtol=2e-3, atol=2e-3)

        tokens = jnp.asarray([3, int(jnp.argmax(ref_l[0])), 1, 0], jnp.int32)
        positions = jnp.asarray([0, 4, -1, 0], jnp.int32)
        ref_d, _ = llama.decode_step(raw, p, tokens, cache_ref, positions)
        pp_d, _ = jax.jit(
            lambda pr, t, c, pos: pp_decode_step(pr, p, t, c, pos, mesh),
            donate_argnums=(2,))(stacked, tokens, cache_pp, positions)
        np.testing.assert_allclose(np.asarray(pp_d), np.asarray(ref_d),
                                   rtol=2e-3, atol=2e-3)
        assert np.all(np.asarray(pp_d)[2] == 0.0)  # inactive slot


class TestPipelineSequenceParallel:
    """pp x sp (r5, VERDICT r4 #6): each stage's KV length shards over an
    "sp" axis; the rotation island computes partial softmax per L-shard and
    merges with pmax/psum over "sp" (flash-decoding); KV writes land only
    on the owner shard."""

    @pytest.mark.parametrize("quant_kv", [False, True])
    def test_pp2_sp2_matches_single_device(self, quant_kv):
        raw = _params(P4)
        mesh = make_pipeline_mesh(2, sp=2)
        stacked = place_pipeline_params(stack_layer_params(raw, P4), mesh)

        n_slots, max_len = 8, 32
        cache_ref = KVCache.create(P4, n_slots, max_len, quantized=quant_kv,
                                   dtype=jnp.float32 if not quant_kv else None)
        cache_pp = KVCache.create(P4, n_slots, max_len, quantized=quant_kv,
                                  dtype=jnp.float32 if not quant_kv else None)
        from tpuserve.parallel.pipeline import shard_cache_pp
        cache_pp = shard_cache_pp(cache_pp, mesh)

        # prompt longer than one L shard (l_loc = 16) exercises the
        # cross-shard prefill write split
        prompt_ids = [7, 11, 23, 5, 19, 3, 8, 2, 31, 9, 4, 27, 6, 13, 21, 1,
                      17, 29]
        c = 32
        prompt = jnp.asarray([prompt_ids + [0] * (c - len(prompt_ids))],
                             jnp.int32)
        n = len(prompt_ids)
        ref_l, cache_ref = llama.prefill(raw, P4, prompt, cache_ref,
                                         jnp.int32(2), jnp.int32(n))
        pp_l, cache_pp = jax.jit(
            lambda pr, t, cch, s, ln: pp_prefill(pr, P4, t, cch, s, ln, mesh),
            donate_argnums=(2,))(stacked, prompt, cache_pp, jnp.int32(2),
                                 jnp.int32(n))
        np.testing.assert_allclose(np.asarray(pp_l), np.asarray(ref_l),
                                   rtol=2e-3, atol=2e-3)

        # several decode steps so positions cross the shard-1 boundary
        tokens = np.zeros((8,), np.int32)
        positions = np.full((8,), -1, np.int32)
        tokens[2] = int(jnp.argmax(ref_l[0]))
        positions[2] = n
        tokens[5] = 3
        positions[5] = 0
        for step in range(4):
            ref_d, cache_ref = llama.decode_step(
                raw, P4, jnp.asarray(tokens), cache_ref,
                jnp.asarray(positions))
            pp_d, cache_pp = jax.jit(
                lambda pr, t, cch, pos: pp_decode_step(pr, P4, t, cch, pos,
                                                       mesh),
                donate_argnums=(2,))(stacked, jnp.asarray(tokens), cache_pp,
                                     jnp.asarray(positions))
            np.testing.assert_allclose(np.asarray(pp_d), np.asarray(ref_d),
                                       rtol=3e-3, atol=3e-3,
                                       err_msg=f"step {step}")
            assert np.all(np.asarray(pp_d)[0] == 0.0)  # inactive slot
            for i in (2, 5):
                tokens[i] = int(np.argmax(np.asarray(ref_d)[i]))
                positions[i] += 1
