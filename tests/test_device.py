"""Device layer tests (≙ reference test/cuda_test.cpp, minus the
hardware-required exit: we run on the CPU test platform)."""

import numpy as np
import pytest

from tpuserve import device
from tpuserve.utils.dtypes import DataType, byte_size
from tpuserve.utils.tensor import Tensor


def test_device_count():
    assert device.get_device_count() == 8  # virtual CPU slice from conftest


def test_device_info():
    info = device.get_device_info(0)
    assert info.device_id == 0
    assert info.platform in ("cpu", "tpu")
    assert "Device 0" in info.describe()
    with pytest.raises(IndexError):
        device.get_device_info(999)


def test_memory_info():
    mem = device.get_memory_info(0)
    assert mem.total_bytes > 0
    assert mem.free_bytes + mem.used_bytes == mem.total_bytes
    d = mem.to_dict()
    assert set(d) == {"device_id", "total_mb", "used_mb", "free_mb", "used_percent"}


def test_vector_add_smoke():
    a = np.arange(1000, dtype=np.float32)
    b = np.ones(1000, dtype=np.float32)
    out = np.asarray(device.vector_add(a, b))
    np.testing.assert_allclose(out, a + b, atol=1e-6)


def test_vector_add_unaligned_length():
    a = np.random.default_rng(0).normal(size=777).astype(np.float32)
    b = np.random.default_rng(1).normal(size=777).astype(np.float32)
    out = np.asarray(device.vector_add(a, b))
    np.testing.assert_allclose(out, a + b, atol=1e-5)


class TestDtypes:
    def test_roundtrip_strings(self):
        for dt in DataType:
            assert DataType.from_string(dt.value) == dt

    def test_reference_aliases(self):
        assert DataType.from_string("FLOAT32") == DataType.FP32
        assert DataType.from_string("float32") == DataType.FP32
        assert DataType.from_string("BFLOAT16") == DataType.BF16
        assert DataType.from_string("garbage") == DataType.INVALID

    def test_byte_size(self):
        assert byte_size(DataType.FP32, (2, 3)) == 24
        assert byte_size(DataType.INT4, (2, 3)) == 3
        assert byte_size(DataType.INT4, (1, 3)) == 2  # rounds up

    def test_np_mappings(self):
        assert DataType.BF16.np_dtype is not None
        assert DataType.INT4.np_dtype is not None
        assert DataType.FP8E4M3.np_dtype is not None


class TestTensor:
    def test_from_numpy(self):
        t = Tensor.from_numpy("x", np.zeros((2, 3), np.float32))
        assert t.dtype == DataType.FP32
        assert t.shape == (2, 3)
        assert t.element_count == 6
        assert t.nbytes == 24

    def test_from_list(self):
        t = Tensor.from_list("x", [1.0, 2.0, 3.0], DataType.FP32, (1, 3))
        assert t.shape == (1, 3)
        np.testing.assert_array_equal(t.numpy(), [[1, 2, 3]])

    def test_dynamic_shape_validation(self):
        t = Tensor.from_numpy("x", np.zeros((4, 3), np.float32))
        assert t.validate_against([-1, 3])
        assert not t.validate_against([4, 2])
        assert not t.validate_against([4, 3, 1])

    def test_jax_roundtrip(self):
        t = Tensor.from_numpy("x", np.arange(6, dtype=np.float32).reshape(2, 3))
        arr = t.jax()
        np.testing.assert_array_equal(np.asarray(arr), t.numpy())
