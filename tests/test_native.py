"""Native runtime binding tests. Skipped when libtpuserve.so is not built
(CI builds it via scripts/build_native.sh)."""

import os

import pytest

from tpuserve.bindings import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libtpuserve.so not built (scripts/build_native.sh)"
)


def test_version():
    assert native.version() == "0.1.0"


class TestNativeRepository:
    def test_scan_and_versions(self, tmp_path):
        for ver in ("1", "2", "10"):
            d = tmp_path / "m" / ver
            d.mkdir(parents=True)
            (d / "config.json").write_text("{}")
        (tmp_path / "m" / "10" / "model.safetensors").write_bytes(b"")
        repo = native.NativeRepository(str(tmp_path))
        assert repo.scan() == {"m": ["10", "2", "1"]}
        assert repo.latest_version("m") == "10"
        assert repo.has_model("m", "2")
        assert not repo.has_model("ghost")
        assert repo.model_type("m", "10") == "jax"

    def test_python_repository_uses_native(self, tmp_path):
        from tpuserve.fixtures import create_test_model
        from tpuserve.repository import ModelRepository

        create_test_model(str(tmp_path))
        repo = ModelRepository(str(tmp_path))
        assert repo.uses_native
        assert repo.get_model_names() == ["test_model"]
        assert repo.get_latest_version("test_model") == "1"

    def test_python_matches_native_semantics(self, tmp_path):
        """Same repo scanned by both implementations must agree."""
        from tpuserve.fixtures import create_test_model
        from tpuserve.repository import ModelRepository

        for v in ("1", "3", "20"):
            create_test_model(str(tmp_path), version=v)
        os.environ["TPUSERVE_NATIVE"] = "0"
        try:
            py_repo = ModelRepository(str(tmp_path))
            assert not py_repo.uses_native
            py_result = py_repo.to_dict()
        finally:
            os.environ.pop("TPUSERVE_NATIVE")
        nat_repo = ModelRepository(str(tmp_path))
        assert nat_repo.uses_native
        assert nat_repo.to_dict() == py_result


class TestNativeLifecycle:
    def test_state_machine(self):
        lc = native.NativeLifecycle()
        assert lc.get_state("m:1") == "UNAVAILABLE"
        ok, _ = lc.begin_load("m:1")
        assert ok
        ok, state = lc.begin_load("m:1")
        assert not ok and state == "LOADING"
        assert lc.finish_load("m:1", True)
        assert lc.get_state("m:1") == "LOADED"
        ok, _ = lc.begin_unload("m:1")
        assert ok
        assert lc.finish_unload("m:1")
        assert lc.get_state("m:1") == "UNLOADED"

    def test_stats(self):
        lc = native.NativeLifecycle()
        lc.record_inference("m", 1000)
        lc.record_inference("m", 3000)
        lc.record_error("m")
        stats = lc.stats("m")
        assert stats["inference_count"] == 2
        assert stats["error_count"] == 1
        assert stats["avg_inference_ns"] == 2000
        assert stats["p50_inference_ns"] in (1000, 3000)


class TestNativeKvAllocator:
    def test_alloc_release(self):
        kv = native.NativeKvAllocator(8, 16)
        assert kv.total_pages == 8 and kv.free_pages == 8
        assert kv.ensure(1, 33)  # 3 pages
        assert kv.free_pages == 5
        table = kv.page_table(1)
        assert len(table) == 3 and len(set(table)) == 3
        assert not kv.ensure(2, 100)  # exhausted
        assert kv.release(1)
        assert kv.free_pages == 8
        assert kv.page_table(1) is None

    def test_growth_is_incremental(self):
        kv = native.NativeKvAllocator(16, 16)
        kv.ensure(7, 10)
        first = kv.page_table(7)
        kv.ensure(7, 40)
        grown = kv.page_table(7)
        assert grown[: len(first)] == first  # existing pages stay put
        assert len(grown) == 3
