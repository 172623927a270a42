"""Multi-chip sharding tests on the 8-device virtual CPU mesh: mesh
construction, TP/DP sharded decode correctness vs single-device, and the
driver dryrun entry points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuserve.models import llama
from tpuserve.models.llama import KVCache, LlamaParams
from tpuserve.parallel import make_mesh
from tpuserve.parallel.sharding import shard_cache, shard_llama_params


P_TINY = LlamaParams(vocab_size=128, dim=32, n_layers=2, n_heads=8, n_kv_heads=4,
                     head_dim=8, ffn_dim=64)


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(tp=4, dp=2)
        assert mesh.axis_names == ("dp", "tp")
        assert mesh.devices.shape == (2, 4)

    def test_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh(tp=16, dp=2)


class TestShardedDecode:
    def test_sharded_matches_single_device(self):
        """TP/DP-sharded decode must produce the same logits as unsharded."""
        params = llama.init_params(jax.random.PRNGKey(1), P_TINY, dtype=jnp.float32)
        n_slots, max_len = 4, 32
        tokens = jnp.array([7, 9, 0, 3], jnp.int32)
        positions = jnp.array([0, 0, -1, 0], jnp.int32)

        cache0 = KVCache.create(P_TINY, n_slots, max_len, quantized=False, dtype=jnp.float32)
        ref_logits, _ = llama.decode_step(params, P_TINY, tokens, cache0, positions)

        mesh = make_mesh(tp=4, dp=2)
        sparams = shard_llama_params(params, mesh)
        scache = shard_cache(
            KVCache.create(P_TINY, n_slots, max_len, quantized=False, dtype=jnp.float32), mesh
        )
        stokens = jax.device_put(tokens, NamedSharding(mesh, P("dp")))
        spos = jax.device_put(positions, NamedSharding(mesh, P("dp")))

        def decode(params, tokens, cache, positions):
            return llama.decode_step(params, P_TINY, tokens, cache, positions)

        logits, _ = jax.jit(decode)(sparams, stokens, scache, spos)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-4
        )


class TestQuantizedSharding:
    def test_per_channel_scales_row_sharded(self):
        """W8A8-style per-channel scales ([1, N]) on row-sharded weights
        (wo/w_down) must replicate dim 0 instead of crashing device_put
        (ADVICE r1 medium)."""
        from tpuserve.quant.core import quantize_param_tree

        params = llama.init_params(jax.random.PRNGKey(2), P_TINY, dtype=jnp.float32)
        qparams = quantize_param_tree(
            params, bits=8, group_size=0,
            predicate=lambda n, a: a.ndim == 2 and n.endswith("kernel"),
            act_bits=8,
        )
        mesh = make_mesh(tp=4, dp=2)
        sp = shard_llama_params(qparams, mesh)  # raised before the fix
        qt = sp["layers.0/wo/kernel"]
        assert qt.scale.shape[0] == 1  # per-channel
        jax.block_until_ready(qt.scale)


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as ge

        fn, args = ge.entry()
        logits, cache = jax.jit(fn)(*args)
        assert logits.shape[0] == args[1].shape[0]
        jax.block_until_ready(logits)

    def test_dryrun_multichip(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardedEngine:
    def test_engine_with_tp_dp_sharding(self, tmp_path):
        """config.sharding drives real TP/DP placement in the LLM engine;
        sharded generation matches the single-device engine exactly."""
        import json
        import os

        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine

        base = {
            "platform": "llm", "architecture": "llama",
            "model_params": {"vocab_size": 128, "dim": 32, "n_layers": 2,
                              "n_heads": 8, "n_kv_heads": 4, "head_dim": 8,
                              "ffn_dim": 64, "init": "random"},
            "generation": {"max_seq_len": 64, "max_slots": 4, "eos_token_id": 2,
                            "max_new_tokens": 6},
            "quantization": {"weights": "int8", "group_size": 16, "kv_cache": "int8"},
        }
        outs = {}
        for name, sharding in (("solo", {}), ("tp4dp2", {"tensor_parallel": 4, "data_parallel": 2})):
            vdir = os.path.join(str(tmp_path), name, "1")
            os.makedirs(vdir)
            cfg = dict(base, name=name, sharding=sharding)
            with open(os.path.join(vdir, "config.json"), "w") as f:
                json.dump(cfg, f)
            eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
            eng.start()
            try:
                if sharding:
                    assert eng.mesh is not None
                    assert eng.mesh.devices.shape == (2, 4)
                outs[name] = eng.generate([5, 17, 100], max_new_tokens=5)["output_ids"]
            finally:
                eng.stop()
        assert outs["solo"] == outs["tp4dp2"]

    def test_sharded_paged_rejected(self, tmp_path):
        import json
        import os

        from tpuserve.repository.config import ModelConfig
        from tpuserve.serving.engine import GenerationEngine
        from tpuserve.utils.errors import BackendError

        vdir = os.path.join(str(tmp_path), "bad", "1")
        os.makedirs(vdir)
        with open(os.path.join(vdir, "config.json"), "w") as f:
            json.dump({
                "name": "bad", "platform": "llm", "architecture": "llama",
                "model_params": {"vocab_size": 64, "dim": 32, "n_layers": 1,
                                  "n_heads": 4, "n_kv_heads": 4, "head_dim": 8,
                                  "ffn_dim": 64, "init": "random"},
                "generation": {"max_seq_len": 64, "max_slots": 4, "paged": True},
                "sharding": {"tensor_parallel": 4},
            }, f)
        eng = GenerationEngine(vdir, ModelConfig.from_file(os.path.join(vdir, "config.json")))
        with pytest.raises(BackendError):
            eng.start()
