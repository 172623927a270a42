"""GPTQ quantizer (quant/gptq.py): algorithm invariants + serving-path
integration. Ground truth is the defining property — lower OUTPUT error
||(W - Q) X||_F than round-to-nearest on correlated calibration data —
plus the degenerate case H = I where error compensation vanishes and GPTQ
must equal RTN bit-for-bit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.models import llama
from tpuserve.models.llama import LlamaParams
from tpuserve.quant.core import QTensor, dequantize, quantize
from tpuserve.quant.gptq import collect_and_quantize_llama, gptq_quantize


def _problem(seed=0, k=256, n=64, t=512):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
    mixer = rng.normal(size=(k, k)) * 0.1 + np.eye(k)
    x = (rng.normal(size=(t, k)) @ mixer).astype(np.float64)
    return w, x, x.T @ x


class TestGptqWeight:
    def test_identity_hessian_equals_rtn(self):
        """H = I ⇒ the Cholesky factor is diagonal ⇒ zero error propagation
        ⇒ GPTQ must reduce exactly to clip-search RTN (codes AND scales —
        both search the same clip grid)."""
        w, _, _ = _problem()
        qt_g = gptq_quantize(w, np.eye(w.shape[0]) * 512.0, bits=4, group_size=64)
        qt_r = quantize(jnp.asarray(w), bits=4, group_size=64, clip_search=True)
        assert (np.asarray(qt_g.q) == np.asarray(qt_r.q)).all()
        np.testing.assert_allclose(np.asarray(qt_g.scale),
                                   np.asarray(qt_r.scale), rtol=1e-5)

    @pytest.mark.parametrize("bits,gs", [(4, 64), (4, 128), (8, 64)])
    def test_beats_rtn_output_error(self, bits, gs):
        w, x, h = _problem()
        qt_g = gptq_quantize(w, h, bits=bits, group_size=gs)
        qt_r = quantize(jnp.asarray(w), bits=bits, group_size=gs,
                        clip_search=False)

        def out_err(qt):
            dq = np.asarray(dequantize(qt, jnp.float32), np.float64)
            return np.linalg.norm(x @ (w - dq))

        assert out_err(qt_g) < 0.9 * out_err(qt_r)

    def test_undercalibrated_no_worse_than_rtn_heldout(self):
        """T << K rank-deficient Hessian: diagonal shrinkage must keep
        GPTQ from overfitting the calibration subspace (measured failure
        mode: held-out output error ~1.3x RTN without it)."""
        rng = np.random.default_rng(3)
        k, n = 512, 128
        w = rng.normal(size=(k, n)).astype(np.float32) * 0.05
        mixer = rng.normal(size=(k, k)) * 0.1 + np.eye(k)
        calib = rng.normal(size=(96, k)) @ mixer   # 96 samples << K=512
        heldout = rng.normal(size=(2048, k)) @ mixer
        qt_g = gptq_quantize(w, calib.T @ calib, bits=4, group_size=128,
                             n_samples=96)
        qt_r = quantize(jnp.asarray(w), bits=4, group_size=128,
                        clip_search=False)

        def out_err(qt):
            dq = np.asarray(dequantize(qt, jnp.float32), np.float64)
            return np.linalg.norm(heldout @ (w - dq))

        assert out_err(qt_g) < 1.05 * out_err(qt_r)

    def test_qtensor_format_identical_to_core(self):
        """Packed layout must round-trip through the SAME dequantize the
        kernels assume: packed uint8 [K//2, N], scales [groups, N]."""
        w, _, h = _problem(k=128, n=32)
        qt = gptq_quantize(w, h, bits=4, group_size=64)
        assert qt.q.dtype == jnp.uint8 and qt.q.shape == (64, 32)
        assert qt.scale.shape == (2, 32) and qt.group_size == 64
        dq = np.asarray(dequantize(qt, jnp.float32))
        # every dequantized value must be an exact code*scale product
        codes = dq / np.repeat(np.asarray(qt.scale), 64, axis=0)
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)

    def test_single_group_and_int8(self):
        w, _, h = _problem(k=64, n=16)
        qt = gptq_quantize(w, h, bits=8, group_size=0)
        assert qt.bits == 8 and qt.group_size == 0
        assert qt.scale.shape == (1, 16)

    def test_dead_input_rows(self):
        """Rows never activated in calibration (H diag 0) freeze to 0."""
        w, x, _ = _problem(k=64, n=16)
        x[:, 7] = 0.0
        qt = gptq_quantize(w, x.T @ x, bits=8, group_size=0)
        dq = np.asarray(dequantize(qt, jnp.float32))
        assert np.abs(dq[7]).max() == 0.0


class TestGptqModel:
    def test_sequential_quantize_tree(self):
        p = LlamaParams.tiny()
        params = llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        calib = rng.integers(0, p.vocab_size, (2, 32)).astype(np.int32)
        qg = collect_and_quantize_llama(params, p, calib, bits=4, group_size=32)
        n_q = sum(isinstance(v, QTensor) for v in qg.values())
        # every 2-D kernel: 7 per layer + lm_head
        expect = 7 * p.n_layers + (0 if p.tie_embeddings else 1)
        assert n_q == expect
        # model still runs and is close to fp32
        from tpuserve.models.llama import KVCache

        cache_f = KVCache.create(p, 1, 40, quantized=False, dtype=jnp.float32)
        cache_q = KVCache.create(p, 1, 40, quantized=False, dtype=jnp.float32)
        toks = jnp.asarray(calib[:1, :16])
        lf, _ = llama.prefill(params, p, toks, cache_f, jnp.int32(0), jnp.int32(16))
        lq, _ = llama.prefill(qg, p, toks, cache_q, jnp.int32(0), jnp.int32(16))
        pf = jax.nn.softmax(lf[0].astype(jnp.float32))
        pq = jax.nn.log_softmax(lq[0].astype(jnp.float32))
        kl = float(jnp.sum(pf * (jnp.log(pf + 1e-20) - pq)))
        assert kl < 0.05, kl

    def test_fused_weights_supported(self):
        p = LlamaParams.tiny()
        params = llama.fuse_params(
            llama.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32), p)
        calib = np.random.default_rng(0).integers(
            0, p.vocab_size, (2, 32)).astype(np.int32)
        qg = collect_and_quantize_llama(params, p, calib, bits=4, group_size=32)
        assert isinstance(qg["layers.0/wqkv/kernel"], QTensor)
        assert isinstance(qg["layers.0/w_gateup/kernel"], QTensor)


class TestGptqServing:
    def test_engine_config_roundtrip(self):
        from tpuserve.repository.config import QuantizationConfig
        from tpuserve.utils.errors import InvalidArgumentError

        cfg = QuantizationConfig.from_dict(
            {"weights": "int4", "method": "gptq"})
        assert cfg.method == "gptq" and cfg.calibration == "synthetic"
        with pytest.raises(InvalidArgumentError):
            QuantizationConfig.from_dict({"weights": "int4", "method": "awq"})
        with pytest.raises(InvalidArgumentError):
            QuantizationConfig.from_dict(
                {"weights": "int8", "method": "gptq", "activations": "int8"})


class TestActOrder:
    def test_act_order_helps_on_anisotropic_hessian(self):
        """Within-group desc-diagonal ordering must cut the Hessian-
        weighted output error on anisotropic activations (and never
        change the QTensor layout)."""
        rng = np.random.default_rng(5)
        k, n, gs = 256, 64, 128
        w = rng.normal(0, 0.02, (k, n))
        # anisotropic activations: a few massive channels
        x = rng.normal(0, 1.0, (1024, k))
        boost = np.ones(k); boost[rng.choice(k, 4, replace=False)] = 12.0
        x *= boost
        h = x.T @ x

        def out_err(qt):
            dq = np.asarray(dequantize(qt), np.float64)
            d = dq - w
            return float(np.trace(d.T @ h @ d))

        q_no = gptq_quantize(w, h, bits=4, group_size=gs, act_order=False)
        q_ao = gptq_quantize(w, h, bits=4, group_size=gs, act_order=True)
        assert q_ao.q.shape == q_no.q.shape and q_ao.scale.shape == q_no.scale.shape
        assert out_err(q_ao) < out_err(q_no) * 0.98

    def test_act_order_identity_hessian_is_noop_quality(self):
        """With an isotropic Hessian the ordering is arbitrary — quality
        must not regress."""
        rng = np.random.default_rng(6)
        k, n = 128, 32
        w = rng.normal(0, 0.02, (k, n))
        h = np.eye(k) * 100.0
        q_no = gptq_quantize(w, h, bits=4, group_size=64, act_order=False)
        q_ao = gptq_quantize(w, h, bits=4, group_size=64, act_order=True)
        d_no = np.abs(np.asarray(dequantize(q_no)) - w).max()
        d_ao = np.abs(np.asarray(dequantize(q_ao)) - w).max()
        assert d_ao <= d_no * 1.001


class TestLorc:
    def test_lorc_reduces_weighted_residual(self):
        from tpuserve.quant.gptq import lorc_factors

        rng = np.random.default_rng(7)
        k, n = 256, 128
        w = rng.normal(0, 0.02, (k, n))
        x = rng.normal(0, 1.0, (1024, k))
        boost = np.ones(k); boost[rng.choice(k, 4, replace=False)] = 10.0
        x *= boost
        h = x.T @ x
        qt = gptq_quantize(w, h, bits=4, group_size=128)
        a, b = lorc_factors(w, qt, h, r=16)
        assert a.shape == (k, 16) and b.shape == (16, n)
        dq = np.asarray(dequantize(qt), np.float64)
        resid = w - dq
        corr = np.asarray(a, np.float64) @ np.asarray(b, np.float64)

        def werr(R):
            return float(np.trace(R.T @ h @ R))

        assert werr(resid - corr) < 0.6 * werr(resid)

    def test_lorc_serving_path(self):
        """An engine-shaped param dict with @lorc keys must apply the
        correction through Llama.apply (models/llama._lorc)."""
        import jax

        from tpuserve.models import llama as L
        from tpuserve.models.llama import Llama
        from tpuserve.quant.gptq import collect_and_quantize_llama

        p = LlamaParams.tiny()
        params = L.init_params(jax.random.PRNGKey(0), p, dtype=jnp.float32)
        calib = np.random.default_rng(0).integers(
            0, p.vocab_size, (8, 64)).astype(np.int32)
        q0 = collect_and_quantize_llama(dict(params), p, calib, bits=4,
                                        group_size=32)
        q32 = collect_and_quantize_llama(dict(params), p, calib, bits=4,
                                         group_size=32, lowrank_r=8)
        assert any(k.endswith("@lorc_a") for k in q32)
        arch = Llama.__new__(Llama)
        arch.params_cfg = {k: getattr(p, k) for k in (
            "vocab_size", "dim", "n_layers", "n_heads", "n_kv_heads",
            "head_dim", "ffn_dim", "rope_theta", "rms_eps", "tie_embeddings")}
        toks = np.random.default_rng(1).integers(
            0, p.vocab_size, (2, 16)).astype(np.int32)
        lg_fp = np.asarray(arch.apply(params, {"input_ids": jnp.asarray(toks)})["logits"], np.float64)
        lg_0 = np.asarray(arch.apply(q0, {"input_ids": jnp.asarray(toks)})["logits"], np.float64)
        lg_32 = np.asarray(arch.apply(q32, {"input_ids": jnp.asarray(toks)})["logits"], np.float64)
        # correction must move logits toward fp32
        assert np.abs(lg_32 - lg_fp).mean() < np.abs(lg_0 - lg_fp).mean()

    def test_lorc_config_gate(self):
        from tpuserve.repository.config import QuantizationConfig
        from tpuserve.utils.errors import InvalidArgumentError

        cfg = QuantizationConfig.from_dict(
            {"weights": "int4", "method": "gptq", "lowrank_correction": 32})
        assert cfg.lowrank_correction == 32
        with pytest.raises(InvalidArgumentError):
            QuantizationConfig.from_dict(
                {"weights": "int4", "method": "rtn", "lowrank_correction": 32})
