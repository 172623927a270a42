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
