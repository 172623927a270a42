"""Quantization core tests: roundtrip error bounds, packing, qmatmul XLA
path, param-tree quantization, quantized-model accuracy gates."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.quant import QTensor, dequantize, qmatmul, quantize, quantize_param_tree
from tpuserve.quant.core import unpack_int4


@pytest.fixture()
def w(rng):
    return rng.normal(size=(256, 64)).astype(np.float32)


class TestQuantize:
    def test_int8_roundtrip_error(self, w):
        qt = quantize(w, bits=8, group_size=128)
        deq = np.asarray(dequantize(qt))
        # symmetric int8: max error <= scale/2 per group
        scale = np.repeat(np.asarray(qt.scale), 128, axis=0)
        assert np.all(np.abs(deq - w) <= scale / 2 + 1e-7)

    def test_int4_pack_unpack(self, w):
        qt = quantize(w, bits=4, group_size=128)
        assert qt.q.dtype == jnp.uint8
        assert qt.q.shape == (128, 64)  # K/2 packed
        unpacked = np.asarray(unpack_int4(qt.q))
        assert unpacked.shape == (256, 64)
        assert unpacked.min() >= -8 and unpacked.max() <= 7

    def test_int4_roundtrip_error(self, w):
        # plain RTN: every element within half a quantization step
        qt = quantize(w, bits=4, group_size=64, clip_search=False)
        deq = np.asarray(dequantize(qt))
        scale = np.repeat(np.asarray(qt.scale), 64, axis=0)
        assert np.all(np.abs(deq - w) <= scale / 2 + 1e-6)

    def test_int4_clip_search_reduces_mse(self, w):
        """Clipped scaling trades bounded outlier error for a smaller step;
        total reconstruction MSE must never be worse than plain RTN."""
        rtn = np.asarray(dequantize(quantize(w, bits=4, group_size=64, clip_search=False)))
        clip = np.asarray(dequantize(quantize(w, bits=4, group_size=64, clip_search=True)))
        assert np.sum((clip - w) ** 2) <= np.sum((rtn - w) ** 2) + 1e-6

    def test_per_channel_mode(self, w):
        qt = quantize(w, bits=8, group_size=0)
        assert qt.scale.shape == (1, 64)

    def test_memory_halving(self, w):
        q8 = quantize(w, bits=8)
        q4 = quantize(w, bits=4)
        assert q4.q.nbytes == q8.q.nbytes // 2

    def test_odd_k_int4_rejected(self):
        with pytest.raises(ValueError):
            quantize(np.ones((3, 4), np.float32), bits=4, group_size=0)


class TestQMatmul:
    def test_matches_float_matmul_int8(self, rng, w):
        x = rng.normal(size=(4, 256)).astype(np.float32)
        qt = quantize(w, bits=8, group_size=128)
        out = np.asarray(qmatmul(jnp.asarray(x), qt, use_pallas=False))
        ref = x @ w
        rel = np.abs(out - ref) / (np.abs(ref) + 1e-3)
        assert np.median(rel) < 0.01  # int8 weight-only ~1% median error

    def test_matches_dequant_exactly(self, rng, w):
        """qmatmul == x @ dequantize(qt) — the fused path must be exact wrt
        its own dequantization."""
        x = rng.normal(size=(4, 256)).astype(np.float32)
        qt = quantize(w, bits=4, group_size=128)
        out = np.asarray(qmatmul(jnp.asarray(x), qt, use_pallas=False))
        ref = x @ np.asarray(dequantize(qt))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


class TestParamTree:
    def test_quantizes_kernels_only(self, rng):
        params = {
            "dense1/kernel": rng.normal(size=(256, 64)).astype(np.float32),
            "dense1/bias": rng.normal(size=(64,)).astype(np.float32),
        }
        qparams = quantize_param_tree(params, bits=8)
        assert isinstance(qparams["dense1/kernel"], QTensor)
        assert not isinstance(qparams["dense1/bias"], QTensor)

    def test_small_kernel_stays_unquantized_for_int4_odd(self, rng):
        params = {"d/kernel": rng.normal(size=(3, 5)).astype(np.float32)}
        qparams = quantize_param_tree(params, bits=4)
        assert not isinstance(qparams["d/kernel"], QTensor)


class TestQuantizedModelServing:
    def test_int8_mlp_accuracy(self, tmp_path, rng):
        """Quantized serving accuracy gate at MLP scale: INT8 outputs close
        to FP32 (BASELINE.md gate analogue)."""
        import json
        import os

        from tpuserve.engine import InferenceManager
        from tpuserve.fixtures import create_test_model
        from tpuserve.utils.tensor import Tensor

        create_test_model(str(tmp_path))
        # a second copy with int8 quantization enabled, wide enough to quantize
        vdir = tmp_path / "test_model_int8" / "1"
        vdir.mkdir(parents=True)
        from safetensors.numpy import save_file

        w = {
            "dense1/kernel": rng.normal(size=(64, 128)).astype(np.float32),
            "dense1/bias": rng.normal(size=(128,)).astype(np.float32),
            "dense2/kernel": rng.normal(size=(128, 16)).astype(np.float32),
            "dense2/bias": rng.normal(size=(16,)).astype(np.float32),
        }
        save_file(w, str(vdir / "model.safetensors"))
        cfg = {
            "name": "test_model_int8",
            "platform": "jax",
            "architecture": "mlp",
            "inputs": [{"name": "input", "shape": [1, 64], "data_type": "FP32"}],
            "outputs": [{"name": "output", "shape": [1, 16], "data_type": "FP32"}],
            "model_params": {"features": [128, 16]},
            "quantization": {"weights": "int8", "group_size": 64},
        }
        (vdir / "config.json").write_text(json.dumps(cfg))

        m = InferenceManager(str(tmp_path))
        try:
            m.load_model("test_model_int8")
            x = rng.normal(size=(1, 64)).astype(np.float32)
            out = m.run_inference("test_model_int8", [Tensor.from_numpy("input", x)])[0].numpy()
            h = np.maximum(x @ w["dense1/kernel"] + w["dense1/bias"], 0)
            ref = h @ w["dense2/kernel"] + w["dense2/bias"]
            rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
            assert np.median(rel) < 0.05
        finally:
            m.shutdown()


class TestFp8Activations:
    """FP8 e4m3 activation rounding (BASELINE.md north star). v5e has no
    fp8 MXU so it is a precision contract (bf16 compute), and unlike
    act_bits=8 it composes with grouped INT4 weights."""

    def test_fp8_round_resolution(self, rng):
        from tpuserve.quant.core import fp8_round

        x = rng.normal(size=(4, 256)).astype(np.float32) * 3
        r = np.asarray(fp8_round(jnp.asarray(x))).astype(np.float32)
        rel = np.abs(r - x) / (np.abs(x) + 1e-3)
        assert np.median(rel) < 0.04  # e4m3: ~3 mantissa bits -> ~3% step
        assert np.median(rel) > 1e-4  # and it genuinely rounded

    def test_fp8_with_grouped_int4_weights(self, rng, w):
        """The combination the r1 verdict flagged as impossible with int8
        activations: fp8 acts x grouped-int4 weights."""
        import dataclasses as dc

        x = rng.normal(size=(4, 256)).astype(np.float32)
        qt = dc.replace(quantize(w, bits=4, group_size=64), act_fp8=True)
        out = np.asarray(qmatmul(jnp.asarray(x), qt))
        # isolate the fp8 contribution: reference through the SAME int4
        # weights, fp32 activations — fp8 rounding must add only an e4m3-
        # sized delta on top of the (much larger) int4 weight error
        ref = x @ np.asarray(dequantize(qt)).astype(np.float32)
        rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
        assert np.median(rel) < 0.05

    def test_param_tree_act_fp8_keeps_groups(self, rng):
        params = {"d/kernel": rng.normal(size=(64, 32)).astype(np.float32)}
        qp = quantize_param_tree(params, bits=4, group_size=32, act_fp8=True)
        assert qp["d/kernel"].act_fp8
        assert qp["d/kernel"].group_size == 32  # grouped scales preserved

    def test_serving_with_fp8_activations(self, tmp_path):
        import json

        from safetensors.numpy import save_file

        from tpuserve.engine import InferenceManager
        from tpuserve.utils.tensor import Tensor

        # local deterministic stream: the shared session rng makes the
        # median-error gate below order-dependent across the suite
        rng = np.random.default_rng(7)

        vdir = tmp_path / "mlp_fp8" / "1"
        vdir.mkdir(parents=True)
        w1 = rng.normal(size=(64, 128)).astype(np.float32)
        w2 = rng.normal(size=(128, 16)).astype(np.float32)
        save_file({"dense1/kernel": w1, "dense1/bias": np.zeros(128, np.float32),
                   "dense2/kernel": w2, "dense2/bias": np.zeros(16, np.float32)},
                  str(vdir / "model.safetensors"))
        (vdir / "config.json").write_text(json.dumps({
            "name": "mlp_fp8", "platform": "jax", "architecture": "mlp",
            "inputs": [{"name": "input", "shape": [1, 64], "data_type": "FP32"}],
            "outputs": [{"name": "output", "shape": [1, 16], "data_type": "FP32"}],
            "model_params": {"features": [128, 16]},
            "quantization": {"weights": "int4", "group_size": 32, "activations": "fp8"},
        }))
        m = InferenceManager(str(tmp_path))
        try:
            m.load_model("mlp_fp8")
            x = rng.normal(size=(1, 64)).astype(np.float32)
            out = m.run_inference("mlp_fp8", [Tensor.from_numpy("input", x)])[0].numpy()
            # reference replicates the served math (int4 weights + e4m3
            # activation rounding); the residual is only bf16 compute noise
            from tpuserve.quant.core import fp8_round

            d1 = np.asarray(dequantize(quantize(w1, bits=4, group_size=32)))
            d2 = np.asarray(dequantize(quantize(w2, bits=4, group_size=32)))
            h = np.maximum(np.asarray(fp8_round(jnp.asarray(x))).astype(np.float32) @ d1, 0)
            ref = np.asarray(fp8_round(jnp.asarray(h))).astype(np.float32) @ d2
            rel = np.abs(out - ref) / (np.abs(ref) + 1e-1)
            # fp8-rounding geometry check (served path == replicated math up
            # to bf16 compute noise); threshold has slack for data draw
            assert np.median(rel) < 0.05
        finally:
            m.shutdown()


class TestInt8Activations:
    def test_w8a8_matches_float(self, rng, w):
        from tpuserve.quant.core import _w8a8_matmul, quantize_activation
        import dataclasses as dc

        x = rng.normal(size=(4, 256)).astype(np.float32)
        qt = dc.replace(quantize(w, bits=8, group_size=0), act_bits=8)
        out = np.asarray(qmatmul(jnp.asarray(x), qt))
        ref = x @ w
        rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
        assert np.median(rel) < 0.02  # w8a8 ~2% median error

    def test_act_quant_roundtrip(self, rng):
        from tpuserve.quant.core import quantize_activation

        x = rng.normal(size=(3, 64)).astype(np.float32) * 5
        q, s = quantize_activation(jnp.asarray(x))
        deq = np.asarray(q).astype(np.float32) * np.asarray(s)
        assert np.max(np.abs(deq - x)) <= np.max(np.asarray(s)) / 2 + 1e-5

    def test_group_scales_rejected_for_w8a8(self, rng, w):
        import dataclasses as dc

        qt = dc.replace(quantize(w, bits=8, group_size=128), act_bits=8)
        with pytest.raises(ValueError):
            qmatmul(jnp.asarray(rng.normal(size=(2, 256)).astype(np.float32)), qt)

    def test_param_tree_act_bits(self, rng):
        params = {"d/kernel": rng.normal(size=(64, 32)).astype(np.float32)}
        qp = quantize_param_tree(params, bits=8, group_size=128, act_bits=8)
        assert qp["d/kernel"].act_bits == 8
        assert qp["d/kernel"].group_size == 0  # forced per-channel

    def test_mixed_repo_model_with_int8_activations(self, tmp_path, rng):
        """configs[2] scenario: model served with INT8 weights AND INT8
        activations end-to-end through the manager."""
        import json

        from safetensors.numpy import save_file

        from tpuserve.engine import InferenceManager
        from tpuserve.utils.tensor import Tensor

        vdir = tmp_path / "bert_a8" / "1"
        vdir.mkdir(parents=True)
        w1 = rng.normal(size=(64, 128)).astype(np.float32)
        w2 = rng.normal(size=(128, 16)).astype(np.float32)
        save_file({"dense1/kernel": w1, "dense1/bias": np.zeros(128, np.float32),
                   "dense2/kernel": w2, "dense2/bias": np.zeros(16, np.float32)},
                  str(vdir / "model.safetensors"))
        (vdir / "config.json").write_text(json.dumps({
            "name": "bert_a8", "platform": "jax", "architecture": "mlp",
            "inputs": [{"name": "input", "shape": [1, 64], "data_type": "FP32"}],
            "outputs": [{"name": "output", "shape": [1, 16], "data_type": "FP32"}],
            "model_params": {"features": [128, 16]},
            "quantization": {"weights": "int8", "activations": "int8"},
        }))
        m = InferenceManager(str(tmp_path))
        try:
            m.load_model("bert_a8")
            x = rng.normal(size=(1, 64)).astype(np.float32)
            out = m.run_inference("bert_a8", [Tensor.from_numpy("input", x)])[0].numpy()
            ref = np.maximum(x @ w1, 0) @ w2
            rel = np.abs(out - ref) / (np.abs(ref) + 1e-1)
            assert np.median(rel) < 0.05
        finally:
            m.shutdown()


class TestW4A8:
    """INT4 grouped weights x dynamic-INT8 activations (r5): the fused
    kernel keeps both dot operands int8 (native int8 MXU, biased nibbles,
    -8 folded via row sums) and the per-row activation scale multiplies
    the output. The XLA reference contracts per group so the (group,
    column) weight scales apply exactly."""

    def _mk(self, k=64, n=48, b=5, gs=32, seed=0):
        import dataclasses

        rng = np.random.default_rng(seed)
        w = rng.normal(0, 0.3, (k, n)).astype(np.float32)
        x = rng.normal(0, 1.0, (b, k)).astype(np.float32)
        qt = quantize(jnp.asarray(w), bits=4, group_size=gs)
        qt8 = dataclasses.replace(qt, act_bits=8)
        return jnp.asarray(x), qt8, w

    def test_kernel_matches_reference(self):
        from tpuserve.ops.quant_matmul import quant_matmul
        from tpuserve.quant.core import _w4a8_matmul_ref

        x, qt8, _ = self._mk()
        got = quant_matmul(x, qt8, interpret=True)
        ref = _w4a8_matmul_ref(x, qt8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_qmatmul_routes_and_tracks_float(self):
        from tpuserve.quant.core import dequantize, qmatmul

        x, qt8, w = self._mk(k=128, n=64, b=4, gs=32, seed=1)
        out = qmatmul(x, qt8, use_pallas=False)
        ref = np.asarray(x) @ np.asarray(dequantize(qt8))
        err = np.abs(np.asarray(out) - ref)
        scale = np.abs(ref).mean() + 1e-6
        # int8 act quantization noise on top of int4 weights: a few percent
        assert err.mean() / scale < 0.05, (err.mean(), scale)

    def test_param_tree_accepts_w4a8(self):
        from tpuserve.quant.core import quantize_param_tree

        params = {"wq/kernel": jnp.asarray(
            np.random.default_rng(2).normal(0, 0.1, (64, 32)), jnp.float32)}
        q = quantize_param_tree(params, bits=4, group_size=32, act_bits=8)
        qt = q["wq/kernel"]
        assert qt.bits == 4 and qt.act_bits == 8 and qt.group_size == 32
