"""Pallas kernel tests (interpreter mode on the CPU test platform; the same
kernels compile for TPU — exercised by bench.py and __graft_entry__)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpuserve.ops.quant_matmul import quant_matmul
from tpuserve.quant import dequantize, quantize


@pytest.fixture()
def x(rng):
    return rng.normal(size=(4, 256)).astype(np.float32)


def _ref(x, qt):
    return x @ np.asarray(dequantize(qt))


class TestQuantMatmulKernel:
    @pytest.mark.parametrize("bits,gs", [(8, 128), (8, 0), (4, 128), (4, 64), (4, 0)])
    def test_matches_dequant_reference(self, rng, x, bits, gs):
        w = rng.normal(size=(256, 256)).astype(np.float32)
        qt = quantize(w, bits=bits, group_size=gs)
        out = np.asarray(quant_matmul(jnp.asarray(x), qt, interpret=True, block_n=128))
        np.testing.assert_allclose(out, _ref(x, qt), rtol=2e-2, atol=2e-2)

    def test_bf16_activations(self, rng, x):
        w = rng.normal(size=(256, 128)).astype(np.float32)
        qt = quantize(w, bits=8, group_size=128)
        xb = jnp.asarray(x, jnp.bfloat16)
        out = np.asarray(quant_matmul(xb, qt, interpret=True, block_n=128)).astype(np.float32)
        ref = _ref(x, qt)
        rel = np.abs(out - ref) / (np.abs(ref) + 1e-2)
        assert np.median(rel) < 0.02  # bf16 activation rounding

    def test_batch_padding(self, rng):
        """Batch sizes below/off the sublane tile are padded and sliced."""
        w = rng.normal(size=(128, 128)).astype(np.float32)
        qt = quantize(w, bits=8, group_size=0)
        for b in (1, 3, 8, 17):
            x = rng.normal(size=(b, 128)).astype(np.float32)
            out = np.asarray(quant_matmul(jnp.asarray(x), qt, interpret=True, block_n=128))
            assert out.shape == (b, 128)
            np.testing.assert_allclose(out, _ref(x, qt), rtol=2e-2, atol=2e-2)

    def test_n_padding(self, rng, x):
        """N not divisible by block_n gets padded and sliced."""
        w = rng.normal(size=(256, 192)).astype(np.float32)
        qt = quantize(w, bits=8, group_size=128)
        out = np.asarray(quant_matmul(jnp.asarray(x), qt, interpret=True, block_n=128))
        assert out.shape == (4, 192)
        np.testing.assert_allclose(out, _ref(x, qt), rtol=2e-2, atol=2e-2)

    def test_3d_leading_dims(self, rng):
        w = rng.normal(size=(128, 128)).astype(np.float32)
        qt = quantize(w, bits=4, group_size=64)
        x = rng.normal(size=(2, 5, 128)).astype(np.float32)
        out = np.asarray(quant_matmul(jnp.asarray(x), qt, interpret=True, block_n=128))
        assert out.shape == (2, 5, 128)
        ref = (x.reshape(-1, 128) @ np.asarray(dequantize(qt))).reshape(2, 5, 128)
        np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)

    def test_large_per_channel_group_splits(self, rng):
        """int8 with per-channel scales on K>1024 splits into sub-blocks."""
        w = rng.normal(size=(2048, 128)).astype(np.float32)
        qt = quantize(w, bits=8, group_size=0)
        x = rng.normal(size=(4, 2048)).astype(np.float32)
        out = np.asarray(quant_matmul(jnp.asarray(x), qt, interpret=True, block_n=128))
        np.testing.assert_allclose(out, _ref(x, qt), rtol=2e-2, atol=2e-2)

    def test_wrong_k_rejected(self, rng, x):
        w = rng.normal(size=(128, 128)).astype(np.float32)
        qt = quantize(w, bits=8)
        with pytest.raises(ValueError):
            quant_matmul(jnp.asarray(x), qt, interpret=True)
